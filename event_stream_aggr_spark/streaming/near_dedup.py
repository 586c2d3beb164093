"""Streaming near-dedup (round 11): the W4×L2 intersection.

``streaming/dedup.py`` drops EXACT redeliveries by content hash; this
module drops NEAR-duplicates of anything the corpus has already
admitted — the ingest-time gate a 100 TB training-data pipeline puts
in front of its document store (arriving shards are near-deduped
against months of prior intake, not just within their own batch).

Mechanism: ``operators.dedup.band_canonical_dedup`` (MinHash band
buckets, greedy smaller-id-wins) folded over micro-batches via the
repo's versioned merge store (``streaming/state_store.py`` — the same
epoch-gated, atomic-pointer-swap discipline the sketch maintainers
use, with the same replay contract):

- state at ``root``: the band buckets of every KEPT doc so far, as
  ``(bucket struct, canon id)`` rows — a few longs per admitted doc,
  never text; growth is proportional to the corpus actually admitted,
  and a bucket-grain ``left_semi`` against it is an equi-join AQE can
  split.
- per epoch: drop batch docs hitting any stored bucket (cross-batch
  near-dups), apply the within-batch greedy rule, write the kept docs
  to ``out_dir/epoch=N`` (``overwrite`` — replay-idempotent), fold
  the kept docs' buckets into the store, commit the epoch.
- redelivery of a committed epoch is a no-op (outputs already on
  disk, merging the buckets again would be harmless for membership
  but would still cost a write — the gate skips it, exactly like
  ``merge_state_sink``); an epoch id BELOW the committed one is the
  fresh-checkpoint-against-nonempty-store signature and raises.

Batch-boundary semantics, stated precisely (and pinned in
tests/test_streaming_near_dedup.py): a single-batch run admits
EXACTLY the qd17 kernel's set. Across batches, only the ADMITTED
corpus vetoes an arrival — so on duplicate-chain corpora
(A~B, B~C, A≁C) boundaries matter at the chain's middle: same-batch
C is dropped (greedy: its bucket's min id B is smaller, even though B
itself was dropped), while next-batch C is admitted (B never entered
the store). Both sides of that divergence are deliberate: within a
batch the greedy rule stays a two-join dataflow (no peel loop), and
across batches "compare against what the corpus actually kept" is the
only semantics that doesn't require remembering rejected docs forever
— the store stays proportional to the ADMITTED corpus. Every
first-writer streaming dedup has this property; transitive-closure
dedup is qd08's offline job.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from event_stream_aggr_spark.streaming import state_store as ss


def near_dedup_sink(
    root: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function: near-dedup each micro-batch against
    the band store at ``root``, write kept rows (full input schema) to
    ``out_dir/epoch=<id>``, fold kept buckets into the store.

    Use::

        stream.writeStream.foreachBatch(
            near_dedup_sink(root, out_dir)
        ).option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    """
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.dedup import band_canonical_dedup

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        state, committed = ss.read_state(spark, root)
        if epoch_id < committed:
            raise ValueError(
                f"near_dedup_sink at {root}: batch id {epoch_id} is below "
                f"the committed epoch {committed}. Batch ids only move "
                "forward within one checkpoint lineage, so this store was "
                "built by a DIFFERENT (or deleted) streaming checkpoint; "
                "silently gating would drop real data. Point the query at "
                "its original checkpointLocation, or start a new state root."
            )
        if epoch_id == committed:
            # post-commit redelivery: kept rows for this epoch are
            # already on disk and its buckets already folded in
            return
        kept_ids, kept_buckets = band_canonical_dedup(
            batch, id_col=id_col, text_col=text_col, bands=bands,
            seen_buckets=state,
        )
        kept_rows = batch.join(kept_ids, id_col, "left_semi")
        # output BEFORE the state commit: a crash in between replays
        # this epoch, which rewrites the same rows (overwrite) and
        # folds the buckets exactly once
        kept_rows.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )
        entries = kept_buckets.select(
            "bucket", F.col(id_col).cast("long").alias("canon")
        )
        if state is not None:
            # first-writer wins per bucket: earlier epochs' canon ids
            # stay canonical (min over the union is deterministic and
            # epoch-order-independent for membership; the store only
            # ever grows by NEW buckets)
            entries = (
                state.unionByName(entries)
                .groupBy("bucket")
                .agg(F.min("canon").alias("canon"))
            )
        entries.write.mode("overwrite").parquet(
            ss._join(root, f"v{epoch_id}")
        )
        ss._commit(spark, root, epoch_id)
        ss._vacuum(spark, root, keep_from=committed)

    return apply
