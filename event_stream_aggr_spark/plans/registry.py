"""Query registry: every operator ships as (Spark plan, DuckDB oracle) pair.

The driver harness (/root/repo/__spark_entry__.py) runs each Spark query
and its oracle SQL side-by-side and hash-compares values. Registering
both together keeps names/aliases in sync (the compare sorts columns by
name, so aliases must match exactly).

Cross-engine determinism rules applied throughout the registered
queries (see ARCHITECTURE.md §"Oracle determinism"):

- Sums over doubles are order-dependent in the last bits; any aggregate
  whose accumulation order can vary is computed as an exact DECIMAL sum
  and only then cast to DOUBLE (order-independent, bit-exact in both
  engines).
- Averages are DECIMAL-sum / count in DOUBLE arithmetic (identical bits).
- Float-vector math (embeddings) cannot be made exact → round to 4-6
  decimals in BOTH engines before output/ranking.
- Every top-k / row_number order includes a unique tiebreaker column.
- Timestamps in output are formatted to strings (identical in both
  engines; avoids tz-awareness dtype mismatches in the compare).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    bench: bool = False  # part of the bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", bench, tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries; return the registry."""
    import event_stream_aggr_spark.operators.dedup  # noqa: F401
    import event_stream_aggr_spark.operators.features  # noqa: F401
    import event_stream_aggr_spark.operators.maintenance  # noqa: F401
    import event_stream_aggr_spark.operators.multimodal  # noqa: F401
    import event_stream_aggr_spark.operators.packing  # noqa: F401
    import event_stream_aggr_spark.operators.sampling  # noqa: F401
    import event_stream_aggr_spark.operators.similarity  # noqa: F401
    import event_stream_aggr_spark.operators.text  # noqa: F401
    import event_stream_aggr_spark.plans.relational  # noqa: F401

    return QUERIES
