"""Enrichment joins (SURVEY.md §2.5 J1) — the reference's dormant
IP-geo lookup (internal/iplookup/iplookup.go:28-89) generalized.

Two shapes:

- ``enrich_with_dim``: the dimension is a DataFrame → broadcast left
  join. Zero shuffle of the fact side at any scale.
- ``enrich_with_lookup``: the dimension is an external callable (HTTP
  service, model endpoint). The reference dedups keys before issuing
  lookups (iplookup.go:30-34 builds a set first) — the same
  semi-join reduction here: ``distinct()`` on the key column, ONE
  Arrow-batched ``mapInPandas`` pass over the deduped keys (batched
  calls, not per-row — the reference's per-IP HTTP GET at 100 TB would
  be billions of calls; deduped it's |distinct keys|), then broadcast
  the resolved map back onto the fact table. Catalyst cannot invent
  this across a UDF boundary (SURVEY.md §4), so the operator encodes it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast-dimension enrichment join."""
    return fact.join(F.broadcast(dim), on, how)


def enrich_with_lookup(
    fact: DataFrame,
    key_col: str,
    lookup: Callable[[list], list[dict]],
    result_schema: str,
    max_batch: int = 1000,
) -> DataFrame:
    """External-service enrichment with distinct-before-lookup.

    ``lookup(keys)`` resolves a batch of distinct keys to dicts (must
    include the key under ``key_col``; failed keys may be omitted →
    NULL enrichment, matching iplookup's error-per-IP contract,
    iplookup_test.go:31-39). ``result_schema`` is the DDL schema of the
    lookup output (key column included).
    """

    # Parse the DDL driver-side: naive comma-splitting breaks on types
    # that contain commas (decimal(10,2), map<string,long>, struct<...>).
    from pyspark.sql.types import _parse_datatype_string

    out_cols = _parse_datatype_string(result_schema).fieldNames()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf[key_col].tolist()
            out: list[dict] = []
            for i in range(0, len(keys), max_batch):
                out.extend(lookup(keys[i : i + max_batch]))
            yield pd.DataFrame(out, columns=out_cols)

    resolved = fact.select(key_col).distinct().mapInPandas(op, schema=result_schema)
    return fact.join(F.broadcast(resolved), key_col, "left")
