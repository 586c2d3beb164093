"""Event-time windowed aggregations (SURVEY.md §2.8 W1-W3).

The reference buckets with integer floor division (roundTime,
processor.go:105-107) and aggregates on a processing-time ticker
(app.go:115-123) with NO late-data policy — redelivered/late events
either duplicate or land in the wrong interval. Here windows are
event-time with watermarks: a strict upgrade, documented as such
(SURVEY.md W3).

State-size note for 100 TB streams: watermark delay bounds state to
(#keys x windows-in-delay); choose the delay from the source's real
out-of-orderness (Kafka per-partition ordering usually keeps this
small), never "large to be safe".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """W1: non-overlapping event-time windows (streaming form of
    roundTime bucketing)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window_duration), *keys).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """W2: overlapping windows (each event lands in duration/slide
    windows — state multiplies accordingly)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, window_duration, slide_duration), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap_duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """W2: session windows (gap-based, dynamic extent). The batch
    analogue is q27_sessionization (lag + cumsum)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap_duration), *keys).agg(*aggs)
