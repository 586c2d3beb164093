"""Streaming skyline (Pareto frontier) maintenance — q86's stateful
twin, and the rare streaming operator with an EXACT batch-equivalence
proof instead of a boundary caveat:

- dominance is TRANSITIVE, so dominated-ness is MONOTONE: once any
  point dominates P, a frontier successor always will — P can never
  re-enter the frontier, so dropping it from state loses nothing;
- the frontier is MERGE-CLOSED: frontier(A ∪ B) =
  frontier(frontier(A) ∪ frontier(B)) — the state only ever needs the
  current frontier, never history;
- per-point part counts are additive at (brand, price, size) grain
  and only frontier points' counts are ever read, so summing counts
  on merge reproduces the batch count exactly.

Together: folding micro-batches through (union → re-aggregate →
sweep) yields, after ANY partition of the input into batches in ANY
order, byte-identical state to running q86 over the whole corpus —
pinned by tests/test_streaming_skyline.py including a Hypothesis
random-split guard.

Rows with a NULL coordinate are excluded at batch intake (see
``_to_points``); q86's corpus has none, and a stream that wants them
must impute upstream — dominance over missing coordinates is
undefined, and silently ordering nulls would diverge across engines.

State lives in the repo's versioned merge store
(``streaming/state_store.py``): same epoch-gated atomic-pointer
protocol as the sketch/near-dedup/ER maintainers (redelivery no-op,
below-committed raise).

Scale shape (100 TB): per epoch the batch collapses to distinct
(brand, price, size) points in one map-side-combinable aggregate; the
union with state re-aggregates at point grain (state is FRONTIER-
sized — bounded by the data's price/size cardinality, typically tiny);
the sweep is ONE window partitioned by brand (per-brand linear scan),
never global, never a self-join. The oracle-grade proof burden sits in
the batch twin (q86's quadratic NOT EXISTS oracle).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_aggr_spark.streaming import state_store as ss

#: Point-grain state schema: the frontier under (minimize price,
#: maximize size) per brand, with the additive part count.
POINT_COLS = ("p_brand", "price", "p_size")


def frontier_sweep(pts: DataFrame) -> DataFrame:
    """The O(n log n) skyline sweep over (brand, price, size, n_parts)
    point rows — same rule as q86: per brand, ordered (price asc,
    size desc), keep points whose size strictly exceeds the running
    max of everything before them. Input must be at distinct point
    grain; output is the frontier at the same grain."""
    from pyspark.sql import Window as W

    sweep = (
        W.partitionBy("p_brand")
        .orderBy(F.col("price").asc(), F.col("p_size").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("_run_max", F.max("p_size").over(sweep))
        .filter(
            F.col("_run_max").isNull() | (F.col("p_size") > F.col("_run_max"))
        )
        .drop("_run_max")
    )


def _to_points(batch: DataFrame) -> DataFrame:
    """Collapse a batch to distinct points. Rows with a NULL coordinate
    are EXCLUDED explicitly (contract, pinned in tests): a point
    missing price or size is unrankable under dominance, and without
    this filter the sweep would drop null-SIZE rows silently while
    null-PRICE rows rode Spark's nulls-first ASC ordering into state —
    an asymmetric accident, not a semantics (and a cross-engine hazard:
    DuckDB's ASC default is nulls LAST)."""
    return (
        batch.filter(
            F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
        )
        .groupBy("p_brand", F.col("p_retailprice").alias("price"), "p_size")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def skyline_sink(root: str) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function maintaining the per-brand Pareto
    frontier of arriving part rows in the merge store at ``root``.
    Read the maintained frontier with ``ss.read_state(spark, root)``.

    Use::

        parts_stream.writeStream.foreachBatch(skyline_sink(root))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
    """

    def apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        state, committed = ss.read_state(spark, root)
        if epoch_id < committed:
            raise ValueError(
                f"skyline_sink at {root}: batch id {epoch_id} is below the "
                f"committed epoch {committed}. Batch ids only move forward "
                "within one checkpoint lineage, so this store was built by a "
                "DIFFERENT (or deleted) streaming checkpoint; merging would "
                "double-count points. Point the query at its original "
                "checkpointLocation, or start a new state root."
            )
        if epoch_id == committed:
            return  # post-commit redelivery: already folded
        pts = _to_points(batch)
        if state is not None:
            pts = (
                state.unionByName(pts)
                .groupBy(*POINT_COLS)
                .agg(F.sum("n_parts").alias("n_parts"))
            )
        frontier = frontier_sweep(pts)
        frontier.write.mode("overwrite").parquet(
            ss._join(root, f"v{epoch_id}")
        )
        ss._commit(spark, root, epoch_id)
        ss._vacuum(spark, root, keep_from=committed)

    return apply
