"""Streaming weighted reservoir (round 15): qs05's deterministic
Efraimidis-Spirakis draw as a bounded-state stream maintainer — the
"hold a reproducible quality-weighted sample of the feed at all
times" primitive a 100 TB curation pipeline uses for monitoring,
eval-set refresh, and debugging without ever re-scanning the corpus.

Semantics: per stratum (e.g. language), keep the R rows with the
SMALLEST Efraimidis-Spirakis exponential keys k = -ln(u)/w, u derived
from md5(id) (``operators.sampling.weighted_sample_keys`` — integer
micro-nat quantization, so the key is bit-identical across engines,
partitionings and cluster sizes). That selection is a per-stratum
top-R, which is an IDEMPOTENT, ASSOCIATIVE fold over row sets:

    topR(A ∪ B) = topR(topR(A) ∪ topR(B))

so the stream fold over any micro-batch slicing equals the one-shot
batch draw over the union of all arrivals — pinned exactly in
tests/test_streaming_reservoir.py — and the state is bounded at
R × |strata| rows FOREVER, independent of stream length.

Built on ``state_store.merge_state_sink`` (epoch-gated pre-image
merge store): the per-epoch merge is state ∪ scored-batch → window
top-R — the merge reads R×|strata| + |batch| rows, one exchange on
the strata key. Redelivery of a committed epoch is a no-op via the
epoch gate (required: re-unioning an already-folded batch would
duplicate (id, key) rows under the window count); a fresh checkpoint
against a non-empty store raises, same as every maintainer. Row ids
are assumed unique across the stream (the repo's standard upstream
exact-dedup contract).

Scale shape (100 TB): the batch side scores with a narrow per-row
expression (no shuffle); the merge's single exchange carries
|batch| + R×|strata| rows; with FEW hot strata the known hazard is
per-stratum window skew — ONE task ranks a whole stratum's epoch
arrivals. ``two_phase=True`` is the shipped remedy: a pre-top-R over
(input-partition id, stratum) grains bounds every window group at one
input partition's rows, and the final per-stratum window then sees
≤ R × n_input_partitions rows. Exact by the same fold law (top-R is
associative and idempotent, so any grouping of the pre-reduction
preserves the result — equivalence pinned bit-for-bit in the tests);
costs a second exchange, so the simple window stays the default at
reservoir-sized epochs.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.streaming import state_store as ss


def reservoir_merge(
    state: DataFrame | None,
    batch: DataFrame,
    r: int,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    strata_cols: Sequence[str] = ("lang",),
    two_phase: bool = False,
) -> DataFrame:
    """One fold: per-stratum R smallest E-S keys over
    state ∪ scored(batch). Pure dataflow; rows with non-positive
    weights carry zero inclusion probability and are dropped.
    ``two_phase`` bounds per-stratum window skew (module docstring)."""
    from pyspark.sql import Window as W

    from event_stream_aggr_spark.operators.sampling import (
        weighted_sample_keys,
    )

    strata = list(strata_cols)
    scored = (
        batch.filter(F.col(weight_col) > 0)
        .select(
            *strata,
            F.col(id_col),
            F.col(weight_col),
            weighted_sample_keys(
                F.col(id_col), F.col(weight_col)
            ).alias("es_key"),
        )
    )
    cand = scored if state is None else state.unionByName(scored)
    if two_phase:
        pre = W.partitionBy(
            F.spark_partition_id(), *strata
        ).orderBy("es_key", id_col)
        cand = (
            cand.withColumn("_prn", F.row_number().over(pre))
            .filter(F.col("_prn") <= r)
            .drop("_prn")
        )
    w = W.partitionBy(*strata).orderBy("es_key", id_col)
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= r)
        .drop("_rn")
    )


def weighted_reservoir_sink(
    root: str,
    r: int = 25,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    strata_cols: Sequence[str] = ("lang",),
    two_phase: bool = False,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining the per-stratum
    weighted reservoir at ``root``. Read the live sample any time with
    ``state_store.read_state(spark, root)``. Use::

        stream.writeStream.foreachBatch(
            weighted_reservoir_sink(root, r=25)
        ).option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    """
    return ss.merge_state_sink(
        root,
        lambda state, batch: reservoir_merge(
            state,
            batch,
            r,
            id_col=id_col,
            weight_col=weight_col,
            strata_cols=strata_cols,
            two_phase=two_phase,
        ),
    )
