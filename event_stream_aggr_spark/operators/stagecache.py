"""Session-scoped materialized-stage memo (pipeline stage reuse).

A curation pipeline's registered queries are independently runnable,
but several share expensive intermediate stages (the k-means
assignment; the semantic-dup drop set derived from it). Recomputing a
shared stage per query multiplies the most expensive work in a
composed run — the r4 bench's top three entries were the SAME Lloyd
iteration paid three times.

``memoized_stage`` materializes a stage once per (Spark application,
stage name, semantic hash of the source plan) via an eager
``localCheckpoint`` and hands every consumer the same DataFrame. The
semantic hash keys on the ANALYZED input plan, so different corpora
(different paths/SFs) never collide, while re-loads of the same corpus
hit. Entries live for the application's lifetime — bounded (one per
stage × corpus) and reclaimed with the session's block manager.

The 100 TB analogue is a materialized intermediate table (parquet /
Delta) per corpus snapshot with downstream stages reading it; the memo
is that contract inside one session. Results are value-identical to
recomputation, so consumers' cross-engine oracles are unaffected.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_MEMO: dict[tuple, DataFrame] = {}


def memoized_stage(
    name: str,
    source: DataFrame,
    build: Callable[[], DataFrame],
    params: tuple = (),
) -> DataFrame:
    """Return the materialized stage ``name`` derived from ``source``,
    building (and eagerly checkpointing) it on first use.

    ``params`` must carry every non-source input the built plan depends
    on (query terms, k, thresholds, …) — the memo keys on the SOURCE
    plan's semantic hash plus ``params``, so two builds that differ
    only in a parameter would otherwise silently alias."""
    spark = source.sparkSession
    key = (
        spark.sparkContext.applicationId,
        name,
        source._jdf.queryExecution().analyzed().semanticHash(),
        params,
    )
    df = _MEMO.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        _MEMO[key] = df
    return df
