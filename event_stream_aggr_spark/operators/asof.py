"""As-of (event-correlation) join — SURVEY.md §2.5 J5.

Spark has no builtin as-of join. The scalable recipe implemented here
is union + sort-within-partition + ``last(..., ignorenulls=True)``:

1. tag left/right rows and union them on (keys, ts);
2. one shuffle partitions by the join keys;
3. a running ``last`` over the time-ordered union carries the most
   recent right-side values forward onto each left row.

Cost: ONE shuffle of (|L| + |R|) rows + a per-partition sort — no join
explosion, no per-row probing, skew bounded by the key distribution
(AQE-salvageable). This is the same dataflow a dedicated streaming
engine uses for temporal joins, and it beats both the naive
range-join (|L| x |R| candidate pairs) and per-group
``pd.merge_asof`` (Python boundary) at scale.

Tie semantics: right rows sort *before* left rows at equal timestamps,
so an exact-timestamp match is visible to the left row — the same
inclusive (>=) contract as DuckDB's ASOF JOIN, which the oracle uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of-backward join: for each left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` keys.

    ``right_cols`` are the right-side columns to carry (may include
    ``right_ts`` itself). Left rows with no prior right row keep NULLs
    (LEFT ASOF semantics).

    ``tolerance`` (same numeric unit as the ts columns, e.g. epoch
    seconds) rejects matches older than ``left_ts - tolerance`` — the
    ``pd.merge_asof(tolerance=...)`` contract: too-stale matches become
    NULLs, the left row is kept.
    """
    on = list(on)
    right_cols = list(right_cols)
    carry = [c for c in right_cols if c != right_ts]

    # The internal tagging columns would silently clobber same-named
    # input columns — refuse instead of producing wrong joins.
    reserved = {"_ts", "_is_left", "_r_ts", "_asof_ts"}
    reserved |= {f"_r_{c}" for c in carry} | {f"_asof_{c}" for c in carry}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(clash)}; "
            "rename these input columns before joining"
        )

    left_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    for c in ["_r_ts", *[f"_r_{c}" for c in carry]]:
        left_tagged = left_tagged.withColumn(c, F.lit(None))
    # cast null placeholders to the right-side types for a clean union
    right_schema = dict(right.dtypes)
    left_tagged = left_tagged.withColumn("_r_ts", F.col("_r_ts").cast(right_schema[right_ts]))
    for c in carry:
        left_tagged = left_tagged.withColumn(f"_r_{c}", F.col(f"_r_{c}").cast(right_schema[c]))

    right_tagged = (
        right.withColumn("_ts", F.col(right_ts))
        .withColumn("_is_left", F.lit(0))
        .withColumn("_r_ts", F.col(right_ts))
    )
    for c in carry:
        right_tagged = right_tagged.withColumn(f"_r_{c}", F.col(c))
    for c in left.columns:
        if c not in on and c not in right_tagged.columns:
            right_tagged = right_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    union_cols = on + ["_ts", "_is_left", "_r_ts"] + [f"_r_{c}" for c in carry] + [
        c for c in left.columns if c not in on and c != left_ts
    ]
    u = left_tagged.select(union_cols).unionByName(right_tagged.select(union_cols))

    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias("_asof_ts"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}") for c in carry],
    )

    def gate(col: Column) -> Column:
        if tolerance is None:
            return col
        fresh = (F.col("_ts") - F.col("_asof_ts")) <= F.lit(tolerance)
        return F.when(F.col("_asof_ts").isNotNull() & fresh, col)

    out_cols = (
        on
        + [F.col("_ts").alias(left_ts)]
        + [c for c in left.columns if c not in on and c != left_ts]
        + [gate(F.col("_asof_ts")).alias(right_ts)]
        + [gate(F.col(f"_asof_{c}")).alias(c) for c in carry]
    )
    return filled.filter(F.col("_is_left") == 1).select(out_cols)
