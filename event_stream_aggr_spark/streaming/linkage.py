"""Streaming entity resolution (round 12): the W5×ER intersection.

``streaming/near_dedup.py`` gates CONTENT (drop near-duplicate text);
this module gates IDENTITY: each arriving record is linked against the
registry of entities the stream has already admitted — the incremental
form of ``operators/linkage.py``'s Fellegi-Sunter linker, and the shape
a 100 TB ingest uses to keep one golden record per real-world entity
while shards arrive over months.

Mechanism: the batch linker's blocking + scoring (``scored_pairs`` —
equi-join blocking on exact name and nation×balance-band, literal
log2(m/u) weights, the T_MATCH threshold) folded over micro-batches via
the repo's versioned merge store (``streaming/state_store.py``, same
epoch-gated atomic-pointer-swap protocol as the sketch/near-dedup
maintainers):

- state at ``root``: the entity REGISTRY — one row per admitted
  entity: (entity_id, name, seg, bal, nation), i.e. the canonical
  record's compare fields, never its payload. Growth is proportional
  to distinct entities admitted.
- per epoch: arrivals score against the registry AND against each
  other. Within-batch 'match' pairs form entities by CONNECTED
  COMPONENTS (operators/cluster.py — the same transitive semantics as
  the offline qer02, so a single-batch run and the batch job agree);
  a component that contains any registry match adopts the minimum
  matched entity_id (two members matching two different store
  entities is an entity-merge signal — min wins, deterministically);
  a component with no store match founds ONE new entity under its
  minimum rec_id. Assignments (rec_id, entity_id, is_new) land in
  ``out_dir/epoch=N`` (overwrite — replay-idempotent); new entities
  fold into the registry; the epoch commits.
- linked records NEVER update the registry: the first-admitted record
  stays canonical (first-writer-wins, the same discipline as the band
  store's ``canon``).
- redelivery of a committed epoch is a no-op; an epoch id below the
  committed one is the fresh-checkpoint-against-nonempty-store
  signature and raises (protocol shared with ``near_dedup_sink``).

Batch-boundary semantics, stated precisely (pinned in
tests/test_streaming_linkage.py): the registry holds CANONICAL records
only, so an arrival links across batches only by matching a canonical
record (or a same-batch peer). An arrival that would match only a
non-canonical alias admitted earlier (A~B admitted with B linked to A;
later C matches B but not A) founds a duplicate entity — the
first-writer-wins trade every streaming ER makes, the exact analogue
of ``near_dedup_sink``'s B-never-entered-the-store case; offline qer02
over the full corpus is the reconciliation job. Records are assumed
exact/near-deduped upstream (this repo's W4 gates) and rec_ids unique
across the stream.

Scale shape (100 TB): every scoring join is an equi-join on a blocking
key (name; nation×balance-band) — arrival×registry cost is sum of
block products, never |batch|×|registry|; the component step runs on
the match-pair graph of ONE micro-batch (bounded by batch size, one
AQE-splittable shuffle per round, rounds bounded by that graph's
diameter — in a deduped feed, 1-2); the per-epoch dataflow is
DISK_ONLY-checkpointed once so the output write and the registry fold
never recompute the scoring. The registry itself is APPEND-ONLY
(entities are founded once, never updated), so the fold writes only
the epoch's NEW entities as a delta — O(|batch|), not O(|registry|) —
under ``state_store``'s append protocol (periodic compaction bounds
the committed read set; round 14, the r13 stage budget's
fold/commit-tail ask).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.linkage import (
    BLOCK_CAP,
    block_key_counts,
    purged_from_counts,
    scored_pairs,
)
from event_stream_aggr_spark.streaming import state_store as ss

#: Registry / record compare-field schema (rec_id + these four).
FIELDS = ("name", "seg", "bal", "nation")

#: Priority offset for the seeded component labels (link_batch): store
#: entity labels live in [0, _REC_OFF), record labels at rec_id +
#: _REC_OFF, so a single long min-aggregation prefers the min matched
#: store entity over any rec id. Requires ids < 2^62.
_REC_OFF = 1 << 62


def _as_a(records: DataFrame, id_col: str) -> DataFrame:
    return records.select(
        F.col(id_col).alias("a_id"),
        F.col("name").alias("a_name"),
        F.col("seg").alias("a_seg"),
        F.col("bal").cast("decimal(13,2)").alias("a_bal"),
        F.col("nation").alias("a_nation"),
    )


def _as_b(records: DataFrame, id_col: str) -> DataFrame:
    return records.select(
        F.col(id_col).alias("b_id"),
        F.col("name").alias("b_name"),
        F.col("seg").alias("b_seg"),
        F.col("bal").cast("decimal(13,2)").alias("b_bal"),
        F.col("nation").alias("b_nation"),
    )


def _pair_fn(blocking: str):
    """Resolve the blocking strategy to a scored-pair kernel: 'flat'
    = the two-pass equi-join blocking with wholesale purging (qer01's
    kernel, the original gate); 'composed' = qer05's pass-diverse
    refinement ladders (name chain without segment; balance chain
    without name), whose measured completeness survives block density
    that purge-cliffs or spills the flat kernel (SCALING_AUDIT r14) —
    the production upgrade for dense/skewed identity feeds."""
    from event_stream_aggr_spark.operators.linkage import (
        composed_scored_pairs,
    )

    if blocking == "flat":
        return scored_pairs
    if blocking == "composed":
        return composed_scored_pairs
    raise ValueError(
        f"unknown blocking strategy {blocking!r}: expected 'flat' or "
        "'composed'"
    )


def link_batch(
    records: DataFrame,
    registry: DataFrame | None,
    id_col: str = "rec_id",
    block_cap: int = BLOCK_CAP,
    cc_gen: list[int] | None = None,
    blocking: str = "flat",
    purged_store_out: list[DataFrame] | None = None,
    purged_batch_out: list[DataFrame] | None = None,
    metric_gen: list[int] | None = None,
    carry_fields: bool = False,
) -> DataFrame:
    """One linking round: assign every record an entity id.

    Returns (rec_id, entity_id, is_new) at record grain. ``registry``
    rows carry (entity_id, name, seg, bal, nation) or None for a cold
    store. Pure dataflow — no state I/O; ``entity_resolution_sink``
    wraps it in the epoch protocol, and tests pin single-batch
    equivalence against the offline component semantics.

    ``carry_fields`` (round 15, second half): append the raw compare
    FIELDS (untouched source types — NOT the scoring projection's
    decimal cast) to every assignment row. The assembly already scans
    the records once, so carrying them is free of extra scans, and it
    lets the sink derive the epoch's new-entity delta from its own
    materialized assignments checkpoint instead of re-scanning the
    micro-batch source and semi-joining per epoch (the fold/commit
    tail's last source re-read).

    ``cc_gen``: forwarded to ``connected_components(gen_out=...)`` —
    collects the component step's still-registered checkpoint block
    ids (edge list + final label generation + the store-match mark) so
    a per-epoch caller can free them after its own eager checkpoint of
    the returned assignments supersedes their lineage.

    ``purged_store_out`` / ``purged_batch_out`` (round-15 ADVICE, the
    composed path only): receive each pairing's two purged-key frames
    (name ladder, balance ladder) from ``composed_scored_pairs`` so
    the sink's purge counters count the SAME frames the scoring run
    evaluated instead of rebuilding the ladders; ``metric_gen``
    collects the ladder block-count persists those frames read —
    freed by the sink after the metrics land."""
    from event_stream_aggr_spark.operators.cluster import connected_components
    from event_stream_aggr_spark.operators.linkage import (
        composed_scored_pairs,
    )

    _pair_fn(blocking)  # validate the strategy name
    if blocking == "composed":

        def pair_fn(x, y, cap, out=None):
            return composed_scored_pairs(
                x, y, cap, purged_out=out, persist_gen=metric_gen
            )

    else:

        def pair_fn(x, y, cap, out=None):
            return scored_pairs(x, y, cap)

    recs_a = _as_a(records, id_col)

    # store matches: min entity_id among registry rows scoring >=
    # T_MATCH. Lazily DISK_ONLY-marked because BOTH the component
    # seed and the final assembly join read it — the mark makes the
    # store-scoring join run once (materialized by the component
    # loop's first action), not once per reference; the generation
    # rides ``cc_gen`` so the sink frees it with the component blocks.
    from event_stream_aggr_spark.operators.lifecycle import (
        disk_checkpoint_lazy,
    )

    if registry is not None:
        store_match = (
            pair_fn(
                recs_a,
                _as_b(registry, "entity_id"),
                block_cap,
                out=purged_store_out,
            )
            .filter(F.col("decision") == "match")
            .groupBy(F.col("a_id").alias("rid"))
            .agg(F.min("b_id").alias("store_ent"))
        )
        store_match, sm_gen = disk_checkpoint_lazy(store_match)
        if cc_gen is not None:
            cc_gen.extend(sm_gen)
    else:
        store_match = None

    # within-batch entities: transitive closure over 'match' pairs
    # (identical to qer02's offline rule; component = min rec_id).
    # Round 15 (the r14 stage budget's batch_components_assembly
    # lever): the registry links SEED the min-label iteration as a
    # zeroth label generation, priority-encoded into one long ordering
    # — a record matching store entity e starts at label e, every
    # other record at rec_id + _REC_OFF — so min-label propagation
    # computes the adoption rule directly: a component's min label is
    # its min matched store entity when any member matched (store
    # labels < _REC_OFF always win), else _REC_OFF + its min rec_id.
    # The previous shape recomputed plain components, then joined
    # store matches back and ran a window-min over the component key —
    # one extra shuffle plus a window pass per epoch, now gone.
    # Envelope: ids (rec and entity) must lie in [0, 2^62) — entity
    # ids are founded from rec ids, so one bound covers both; beyond
    # it, escalate to struct(min-priority, id) labels.
    batch_pairs = pair_fn(
        recs_a, _as_b(records, id_col), block_cap, out=purged_batch_out
    ).filter(
        (F.col("decision") == "match") & (F.col("a_id") < F.col("b_id"))
    )
    init = (
        store_match.select(
            F.col("rid").alias("node"),
            F.col("store_ent").cast("long").alias("component"),
        )
        if store_match is not None
        else None
    )
    comp = connected_components(
        batch_pairs,
        a_col="a_id",
        b_col="b_id",
        gen_out=cc_gen,
        init=init,
        label_offset=_REC_OFF,
        # both kernels emit each pair exactly once (P1/pass-A single
        # equi-join + membership-deduped P2/pass-B union) and the
        # a_id < b_id filter above makes the order strict, so the edge
        # dedup Exchange inside connected_components is redundant here
        # — one full edge-list shuffle per EPOCH removed (round 15,
        # second half; guide §2.4)
        pairs_unique=True,
    )

    # assembly: decode the encoded component when the record was in
    # the match graph; else its direct store match (no-edge record);
    # else itself (isolated new entity). One left join per side, no
    # component-grain window.
    carried = [F.col(f) for f in FIELDS] if carry_fields else []
    assigned = records.select(
        F.col(id_col).alias("rid"), *carried
    ).join(comp, F.col("rid") == comp["node"], "left")
    if store_match is not None:
        assigned = assigned.join(store_match, "rid", "left")
    else:
        assigned = assigned.withColumn(
            "store_ent", F.lit(None).cast("long")
        )
    decoded = F.when(
        F.col("component") < F.lit(_REC_OFF), F.col("component")
    ).otherwise(F.col("component") - F.lit(_REC_OFF))
    return assigned.select(
        F.col("rid").alias("rec_id"),
        F.coalesce(decoded, F.col("store_ent"), F.col("rid")).alias(
            "entity_id"
        ),
        *carried,
    ).withColumn("is_new", F.col("entity_id") == F.col("rec_id"))


def _write_metrics_row(
    spark,
    dir_path: str,
    epoch: int,
    sp1: int,
    sp2: int,
    bp1: int,
    bp2: int,
    mode: str,
) -> None:
    """Land the per-epoch purge-metrics row as parquet WITHOUT a Spark
    job (round 15, the fold/commit tail): the row is one tuple the
    driver already holds, so a ``createDataFrame`` + 1-task write job
    per epoch (task scheduling + the parquet commit protocol) buys
    nothing. pyarrow serializes the row and the bytes land through the
    session's Hadoop ``FileSystem`` — the same file:/hdfs:/object-store
    portability as the state store's markers. Overwrite semantics match
    the Spark write this replaces (delete + rewrite; an epoch replay
    rewrites the same row). Schema is pinned byte-for-byte to the old
    write: (epoch long, store_purged_p1/p2 long, batch_purged_p1/p2
    long, mode string) — consumers read it with ``spark.read.parquet``
    unchanged (tests/test_streaming_linkage.py)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "epoch": pa.array([int(epoch)], pa.int64()),
            "store_purged_p1": pa.array([int(sp1)], pa.int64()),
            "store_purged_p2": pa.array([int(sp2)], pa.int64()),
            "batch_purged_p1": pa.array([int(bp1)], pa.int64()),
            "batch_purged_p2": pa.array([int(bp2)], pa.int64()),
            "mode": pa.array([str(mode)], pa.string()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf)
    fs, jdir = ss._fs(spark, dir_path)
    fs.delete(jdir, True)
    _, jfile = ss._fs(spark, dir_path.rstrip("/") + "/part-00000.parquet")
    out = fs.create(jfile, True)
    try:
        out.write(bytearray(buf.getvalue()))
    finally:
        out.close()


def _purged_pair_counts(frames: list[DataFrame]) -> DataFrame:
    """One row (n_purged_p1, n_purged_p2) for the COMPOSED blocking
    strategy from the purged-key frames ``link_batch`` forwarded out
    of the scoring run itself (round-15 ADVICE): p1 = the name
    ladder's purged blocks, p2 = the balance ladder's — the per-pass
    recall-loss counters of qer05's report. Block-grain only, and the
    frames read the ladder's PERSISTED block-count generations (see
    ``ladder_candidates(persist_gen=...)``), so these counts re-scan
    neither the micro-batch nor the registry."""
    pa, pb = frames
    return pa.agg(F.count(F.lit(1)).alias("n_purged_p1")).crossJoin(
        F.broadcast(pb.agg(F.count(F.lit(1)).alias("n_purged_p2")))
    )


def entity_resolution_sink(
    root: str,
    out_dir: str,
    id_col: str = "rec_id",
    block_cap: int = BLOCK_CAP,
    blocking: str = "auto",
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function: link each micro-batch against the
    entity registry at ``root``, write assignments to
    ``out_dir/epoch=<id>``, fold newly founded entities into the
    registry. Use::

        stream.writeStream.foreachBatch(
            entity_resolution_sink(root, out_dir)
        ).option("checkpointLocation", ckpt).trigger(availableNow=True).start()

    ``blocking`` (round 15, the r14 verdict's measured-default ask):

    - ``'auto'`` (default) — per epoch, FLAT two-pass blocking until
      flat would PURGE a block for THIS epoch's arrivals (any P1/P2
      block of the batch or batch-vs-registry pairing whose join
      product exceeds ``block_cap``), then qer05's composed
      refinement ladders for that epoch. The crossover is exact and
      data-driven, not a tuned constant: below it the two kernels
      link identically (no block purges ⇒ flat loses nothing) and
      flat is the cheaper plan (2 equi-join passes vs 2 refinement
      ladders + a membership pass — the BENCH gate rows price both);
      above it flat silently drops recall (the dense-grid audit's
      cliff: flat 0.803→spill, composed 1.000) while composed's kept
      blocks stay <= cap. The probe costs one block-grain action over
      count frames the flat metrics path materializes anyway, and the
      chosen kernel lands in the ``mode`` column of every purge-
      metrics row, so the decision is observable per epoch.
    - ``'flat'`` / ``'composed'`` — force the kernel.
    """
    if blocking not in ("auto", "flat", "composed"):
        raise ValueError(
            f"unknown blocking strategy {blocking!r}: expected 'auto', "
            "'flat' or 'composed'"
        )
    from event_stream_aggr_spark.operators.lifecycle import (
        disk_checkpoint_lazy,
        free_blocks,
    )

    # one cursor per sink closure = per store root (single-writer
    # invariant): after the first cold epoch, read-resolution and
    # commit/vacuum run with zero filesystem listings (round 15, the
    # r14 append-floor tune)
    cursor = ss.AppendCursor()

    # Incremental REGISTRY block counts for the auto probe (round 15,
    # second half): the registry is append-only, so
    # counts(registry@N) = counts(@N-1) + counts(delta N) — the probe's
    # second full registry scan per epoch becomes a block-grain fold of
    # the just-written delta (read from the delta's own parquet, a
    # stable lineage independent of the epoch's freed checkpoints).
    # Derived cache, never authority: a cold/stale cache (restart,
    # compaction epoch, crash before the advance) recomputes from the
    # registry; correctness never depends on it. ``gen`` holds the
    # live cached generation; ``pending_free`` holds the superseded
    # generation the lazy merge still reads until the next probe's
    # action materializes the successor.
    sc_cache: dict = {"epoch": None, "df": None, "gen": [], "pending_free": []}

    def _store_counts_df(spark, state, committed):
        from event_stream_aggr_spark.operators.lifecycle import (
            disk_checkpoint_lazy,
            free_blocks,
        )

        if sc_cache["df"] is not None and sc_cache["epoch"] == committed:
            return sc_cache["df"]
        free_blocks(spark, sc_cache["gen"] + sc_cache["pending_free"])
        sc_cache["gen"], sc_cache["pending_free"] = [], []
        df, gen = disk_checkpoint_lazy(
            block_key_counts(_as_b(state, "entity_id"), "b")
        )
        sc_cache.update(epoch=committed, df=df, gen=gen)
        return df

    def _advance_store_counts(spark, epoch_id, committed, n_new, wrote):
        from event_stream_aggr_spark.operators.lifecycle import (
            disk_checkpoint_lazy,
            free_blocks,
        )

        if sc_cache["df"] is None or sc_cache["epoch"] != committed:
            return
        if n_new == 0:
            sc_cache["epoch"] = epoch_id  # registry unchanged
            return
        if wrote != "delta":
            # compaction absorbed the epoch's rows into a snapshot —
            # no standalone delta to fold; recompute cold next epoch
            free_blocks(
                spark, sc_cache["gen"] + sc_cache["pending_free"]
            )
            sc_cache.update(epoch=None, df=None, gen=[], pending_free=[])
            return
        delta = spark.read.parquet(root.rstrip("/") + f"/d{epoch_id}")
        merged = (
            sc_cache["df"]
            .unionByName(block_key_counts(_as_b(delta, "entity_id"), "b"))
            .groupBy("gid", "k1", "k2n", "k2b")
            .agg(F.sum("c").alias("c"))
        )
        mdf, mgen = disk_checkpoint_lazy(merged)
        # the old generation feeds the lazy merge until the next
        # probe's action materializes it — free it then, not now
        sc_cache["pending_free"].extend(sc_cache["gen"])
        sc_cache.update(epoch=epoch_id, df=mdf, gen=mgen)

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        state, committed = ss.read_append_state(spark, root, cursor=cursor)
        if epoch_id < committed:
            raise ValueError(
                f"entity_resolution_sink at {root}: batch id {epoch_id} is "
                f"below the committed epoch {committed}. Batch ids only move "
                "forward within one checkpoint lineage, so this store was "
                "built by a DIFFERENT (or deleted) streaming checkpoint; "
                "silently linking would corrupt entity identity. Point the "
                "query at its original checkpointLocation, or start a new "
                "state root."
            )
        if epoch_id == committed:
            # post-commit redelivery: assignments already on disk and
            # this epoch's entities already folded in
            return
        # Every generation this epoch registers (component checkpoints,
        # lazy metric count frames, the assignments checkpoint) is
        # freed in ONE finally — an exception anywhere in the body must
        # not leak a generation until nondeterministic driver GC
        # (round-15 ADVICE: the success-path-only frees did exactly
        # that). Lists are cleared at their early success-path free so
        # the finally never double-frees (free_blocks skips absent ids
        # anyway).
        cc_gen: list[int] = []
        cnt_gen: list[int] = []
        blocks: list[int] = []
        purged_store: list[DataFrame] = []
        purged_batch: list[DataFrame] = []
        # ONE source scan per epoch (round 15, second half): the
        # narrow (id + compare-FIELDS) projection is lazily DISK_ONLY-
        # marked, so the probe's counts, both scoring pairings (each
        # of which reads its input twice), the component assembly, and
        # the delta derivation all read the materialized blocks — the
        # micro-batch source itself is scanned exactly once, by
        # whichever action fires first. Freed in the epoch's finally.
        recs = batch.select(F.col(id_col), *[F.col(f) for f in FIELDS])
        recs, r_gen = disk_checkpoint_lazy(recs)
        blocks.extend(r_gen)
        recs_a = _as_a(recs, id_col)
        mode = blocking
        batch_counts = store_counts = None
        probe_row = None
        try:
            if blocking == "auto":
                # Exact per-epoch crossover (docstring): flat purges a
                # block this epoch ⇔ flat loses recall this epoch ⇔
                # composed earns its extra passes. The probe is the
                # SAME block-grain count frames the flat metrics path
                # materializes, and its ONE action collects the full
                # four-counter metrics row — when flat wins (the
                # common case) the purge-metrics write below is a
                # literal 1-row frame, zero recompute, so the probe's
                # cost IS the observability cost, not an addition to
                # it.
                batch_counts, bc_gen = disk_checkpoint_lazy(
                    block_key_counts(recs_a, "a")
                )
                cnt_gen.extend(bc_gen)
                batch_probe = purged_from_counts(
                    batch_counts, batch_counts, block_cap
                ).select(
                    F.col("n_purged_p1").alias("batch_purged_p1"),
                    F.col("n_purged_p2").alias("batch_purged_p2"),
                )
                if state is not None:
                    # registry-side counts from the incremental cache:
                    # amortized O(|delta|) per epoch instead of a
                    # second full registry scan (the scoring join's
                    # scan remains the only per-epoch registry pass).
                    # The cached generation lives ACROSS epochs (not
                    # on cnt_gen); _store_counts_df/_advance own it.
                    store_counts = _store_counts_df(
                        spark, state, committed
                    )
                    probe = purged_from_counts(
                        batch_counts, store_counts, block_cap
                    ).crossJoin(F.broadcast(batch_probe))
                else:
                    probe = batch_probe.select(
                        F.lit(0).cast("long").alias("n_purged_p1"),
                        F.lit(0).cast("long").alias("n_purged_p2"),
                        "batch_purged_p1",
                        "batch_purged_p2",
                    )
                probe_row = probe.first()
                # the probe's action just materialized the cache's
                # current generation — the superseded one it was
                # lazily merged from is now free
                free_blocks(spark, sc_cache["pending_free"])
                sc_cache["pending_free"] = []
                mode = (
                    "composed"
                    if (
                        probe_row["n_purged_p1"]
                        + probe_row["n_purged_p2"]
                        + probe_row["batch_purged_p1"]
                        + probe_row["batch_purged_p2"]
                    )
                    else "flat"
                )
            assignments = link_batch(
                recs,
                state,
                id_col=id_col,
                block_cap=block_cap,
                cc_gen=cc_gen,
                blocking=mode,
                carry_fields=True,
                purged_store_out=purged_store,
                purged_batch_out=purged_batch,
                # ladder block-count persists ride the metric free
                # list: the purge counters below read them, then the
                # post-metrics free (or the finally) releases them
                metric_gen=cnt_gen,
            )
            # ONE evaluation of the scoring dataflow per epoch: the
            # output write and the registry fold below both probe the
            # materialized blocks (near_dedup_sink's lifecycle). The
            # materializing action is a (count, sum(is_new)) aggregate
            # instead of disk_checkpoint's plain count, so the n_new
            # the append fold needs rides the SAME job (round 15: one
            # job per epoch back).
            assignments, a_gen = disk_checkpoint_lazy(assignments)
            blocks.extend(a_gen)
            n_new = int(
                assignments.agg(
                    F.coalesce(
                        F.sum(F.col("is_new").cast("long")), F.lit(0)
                    ).alias("n_new")
                ).first()["n_new"]
            )
            # assignments is now eagerly materialized, so nothing
            # reads the component step's lineage any more — free its
            # edge-list and label checkpoints NOW instead of holding
            # them across the epoch's writes.
            free_blocks(spark, cc_gen)
            cc_gen.clear()
            assignments.select("rec_id", "entity_id", "is_new").write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/epoch={epoch_id}")
            # Purge observability (qer03's n_purged_blocks, per epoch):
            # as the registry grows, a hot blocking key crossing
            # BLOCK_CAP silently drops its arrivals to 'new entity' —
            # these counters make that recall loss visible in the
            # stream, not only in the offline reconciliation audit.
            # Written OUTSIDE the epoch=* glob tests/consumers read.
            # Round-14 (ADVICE): ONE grouping-sets scan of the batch
            # and one of the registry, materialized (metadata-sized)
            # then probed by all four counters — previously four fresh
            # groupBy/join plans re-read the micro-batch source 6x and
            # the registry 2x per epoch just for these counters. The
            # batch count frame serves as BOTH sides of the
            # batch-pairing counter (same rows either way) and the
            # a-side of the store pairing.
            if mode == "flat" and probe_row is not None:
                # 'auto' chose flat: the decision probe's single
                # action already collected all four counters — the
                # metrics row needs no further dataflow at all.
                counter_row = probe_row
            elif mode == "flat":
                # forced flat: LAZY marks (not eager checkpoints) —
                # the count frames' blocks materialize inside the
                # metrics collect itself (one action total), and every
                # later reference in that plan reads the DISK_ONLY
                # blocks, so the micro-batch and registry are still
                # scanned once each without two extra per-epoch jobs.
                batch_counts, bc_gen = disk_checkpoint_lazy(
                    block_key_counts(recs_a, "a")
                )
                cnt_gen.extend(bc_gen)
                if state is not None:
                    store_counts, sc_gen = disk_checkpoint_lazy(
                        block_key_counts(_as_b(state, "entity_id"), "b")
                    )
                    cnt_gen.extend(sc_gen)
                    store_purged = purged_from_counts(
                        batch_counts, store_counts, block_cap
                    )
                else:
                    store_purged = None
                batch_purged = purged_from_counts(
                    batch_counts, batch_counts, block_cap
                )
                counter_row = None
            else:
                # composed blocking: p1/p2 reinterpret as the name /
                # balance LADDERS' purged-block counts (qer05's
                # per-pass counters). The frames come out of the
                # scoring run itself (link_batch's purged_*_out) and
                # read its persisted block-count generations — no
                # ladder rebuild, no batch/registry re-scan (round-15
                # ADVICE).
                store_purged = (
                    _purged_pair_counts(purged_store)
                    if purged_store
                    else None
                )
                batch_purged = _purged_pair_counts(purged_batch)
                counter_row = None
            if counter_row is None:
                batch_purged = batch_purged.select(
                    F.col("n_purged_p1").alias("batch_purged_p1"),
                    F.col("n_purged_p2").alias("batch_purged_p2"),
                )
                counter_row = (
                    store_purged.crossJoin(F.broadcast(batch_purged))
                    if store_purged is not None
                    else batch_purged.select(
                        F.lit(0).cast("long").alias("n_purged_p1"),
                        F.lit(0).cast("long").alias("n_purged_p2"),
                        "batch_purged_p1",
                        "batch_purged_p2",
                    )
                ).first()
            # the row is driver-held either way (the auto probe
            # collected it; the forced/composed paths' one action
            # just did) — land it without a per-epoch Spark write
            # job (round 15, the fold/commit tail). ``mode`` is the
            # kernel that actually linked this epoch — under 'auto'
            # this is the decision's audit trail.
            _write_metrics_row(
                spark,
                f"{out_dir}/purge_metrics/epoch={epoch_id}",
                epoch_id,
                counter_row["n_purged_p1"],
                counter_row["n_purged_p2"],
                counter_row["batch_purged_p1"],
                counter_row["batch_purged_p2"],
                mode,
            )
            free_blocks(spark, cnt_gen)
            cnt_gen.clear()
            # n_new came from the checkpoint's materializing aggregate
            # above (round-15 ADVICE): an idle or all-linked epoch
            # appends nothing — no empty delta part dirs, no spurious
            # compaction rewrites of an unchanged registry.
            # carry_fields=True means the assignments checkpoint holds
            # the raw compare FIELDS — the delta is a filter+project
            # over its DISK_ONLY blocks, not a source re-scan plus
            # semi-join (round 15, second half).
            new_entities = assignments.filter("is_new").select(
                F.col("rec_id").alias("entity_id"),
                *[F.col(f) for f in FIELDS],
            )
            # Registry fold = APPEND (round 14, the r13 stage budget's
            # named dominator): entities are founded once and never
            # updated, so the epoch writes ONLY its new entities as a
            # delta — O(|batch|), not O(|registry|) — with periodic
            # compaction bounding the read set (ss append protocol).
            wrote = ss.append_commit(
                spark,
                root,
                new_entities,
                epoch_id,
                committed,
                n_new=n_new,
                state=state,
                cursor=cursor,
            )
            _advance_store_counts(spark, epoch_id, committed, n_new, wrote)
        finally:
            free_blocks(spark, blocks + cc_gen + cnt_gen)

    # introspection hook for tests: the incremental registry-count
    # cache (equality vs a cold recompute is pinned in
    # tests/test_streaming_linkage.py)
    apply._sc_cache = sc_cache
    return apply
