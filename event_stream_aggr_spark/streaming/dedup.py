"""Streaming dedup (SURVEY.md §2.8 W4).

The reference's at-least-once contract means a redelivered message is
REPROCESSED and its alerts produced twice, keyed by the same
``event_hash_sha256`` (app.go:182,220) — dedup is left to downstream
consumers. Here the hash is used as a first-class dedup identity:
``dropDuplicatesWithinWatermark`` keeps per-key state only inside the
watermark horizon, so state is bounded at any scale (a plain
``dropDuplicates`` on a stream would grow state forever at 100 TB/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_by_hash(
    df: DataFrame,
    hash_col: str = "event_hash_sha256",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered events by content hash.

    Batch DataFrames: plain dropDuplicates. Streaming with ``ts_col``:
    watermark-bounded state.
    """
    if df.isStreaming and ts_col is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [hash_col]
        )
    return df.dropDuplicates([hash_col])
