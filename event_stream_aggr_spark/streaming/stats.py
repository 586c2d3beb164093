"""Interval stats (SURVEY.md §2.4 A1 / §3 E3) — the reference's only
aggregation, in its two idiomatic Spark forms.

Reference semantics (app.go:75-110, ticker app.go:115-123): every
``log_interval`` seconds report batches processed, events out, failed
count, avg per-batch latency ms, events/s, and a running total —
accumulated under a mutex, snapshot-and-reset per tick (app.go:66-73).

Spark replaces the user-space accumulation entirely:

1. ``IntervalStatsListener`` — a ``StreamingQueryListener`` reading
   per-micro-batch progress (no locks, no state in the data path;
   this is the idiomatic choice and the default).
2. ``windowed_stats`` — the same numbers as a declarative windowed
   aggregation over the stream itself, when stats must be a *table*
   (e.g. written to a sink) rather than logs.

Plus ``running_totals_with_state`` (W5): the reference's cross-interval
running ``total`` counter (app.go:99) as an explicitly-stateful
per-key operator via ``applyInPandasWithState`` — kept for the one
shape the listener can't express (arbitrary user state).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.listener import (
    QueryProgressEvent,
    StreamingQueryListener,
)


class IntervalStatsListener(StreamingQueryListener):
    """Collects the reference's log line from query progress events.

    ``snapshots`` accumulates one dict per micro-batch:
    events (= numInputRows), events/s, batch duration ms, running total
    — app.go:101-109's numbers without any user-space accumulation.
    """

    def __init__(self) -> None:
        self.snapshots: list[dict[str, Any]] = []
        self._total = 0

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: QueryProgressEvent) -> None:  # noqa: N802
        p = event.progress
        self._total += p.numInputRows
        self.snapshots.append(
            {
                "batch_id": p.batchId,
                "events": p.numInputRows,
                "events_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": p.batchDuration,
                "total": self._total,
            }
        )

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass


def windowed_stats(
    df: DataFrame,
    ts_col: str,
    interval: str = "10 seconds",
    failed_predicate: Column | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """A1 as a declarative stream aggregation: per-interval event count,
    failure count, and rate — joinable/sinkable as a table."""
    failed = failed_predicate if failed_predicate is not None else F.lit(False)
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, interval))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.when(failed, 1).otherwise(0)).alias("failed"),
        )
    )
    secs = F.col("window.end").cast("long") - F.col("window.start").cast("long")
    return out.select(
        "window",
        "events",
        "failed",
        (F.col("events") / secs).alias("events_per_sec"),
    )


RUNNING_TOTAL_SCHEMA = "key string, batch_events long, total long"
RUNNING_TOTAL_STATE_SCHEMA = "total long"


def running_totals_with_state(df: DataFrame, key_col: str) -> DataFrame:
    """W5: per-key running total across micro-batches via
    applyInPandasWithState (the reference's ``total`` counter,
    app.go:99, as bounded keyed state)."""

    def fn(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(b) for b in batches)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "batch_events": [n], "total": [total]})

    return (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=RUNNING_TOTAL_SCHEMA,
            stateStructType=RUNNING_TOTAL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _build_running_total_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total long")

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            n = sum(len(pdf) for pdf in rows)
            prev = self._total.get()
            total = (prev[0] if prev is not None else 0) + n
            self._total.update((total,))
            yield pd.DataFrame(
                {"key": [key[0]], "batch_events": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    return _Processor()


def running_totals_transform_with_state(df: DataFrame, key_col: str) -> DataFrame:
    """W5 via the Spark 4 ``transformWithStateInPandas`` API — typed
    ValueState + explicit lifecycle, the modern replacement for
    applyInPandasWithState. Environment requirements (gated — this
    container lacks them, the test importorskips): ``google.protobuf``
    on workers (the state protocol is proto-serialized) and the RocksDB
    state store provider for bounded off-heap keyed state at scale
    (spark.sql.streaming.stateStore.providerClass=
    ...state.RocksDBStateStoreProvider)."""
    return (
        df.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=_build_running_total_processor(),
            outputStructType=RUNNING_TOTAL_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Streaming EWMA (q69's streaming twin): trailing-window keyed state
# ---------------------------------------------------------------------------

EWMA_OUT_SCHEMA = (
    "event_id long, user_id long, value double, n_window long, ewma double"
)
EWMA_STATE_SCHEMA = "vals array<double>"


def _round_half_up(v: float) -> float:
    """Spark's ROUND (BigDecimal HALF_UP) for the magnitudes used here —
    Python's builtin round() is half-EVEN and would diverge from the
    batch q69 exactly at .5 boundaries."""
    import math

    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def ewma_with_state(df: DataFrame) -> DataFrame:
    """W5 + q69: per-user trailing-window EWMA over an event stream via
    ``applyInPandasWithState``. State per key is the last EWMA_W values
    (bounded — the same reason q69's batch window is trailing-bounded);
    each micro-batch's rows are processed in (ts, event_id) order, so
    with in-order arrival (per-key monotone event time, e.g. a
    ts-range-partitioned replay or a per-key-ordered Kafka partition)
    the stream reproduces the batch q69 EXACTLY — asserted by
    tests/test_stream_batch_equiv.py. Arithmetic replicates the batch
    integer-microunit fold, including HALF_UP rounding.

    This is the state-edge pandas exception of §2.9's UDF discipline:
    the fold itself is a per-row loop over bounded state, the shape
    ``applyInPandasWithState`` exists for."""
    from event_stream_aggr_spark.plans.relational import _EWMA_WEIGHTS, EWMA_W

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hist: list[float] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(batches))
        rows = rows.sort_values(["ts", "event_id"])
        out = []
        for r in rows.itertuples():
            hist.append(float(r.value))
            if len(hist) > EWMA_W:
                hist.pop(0)
            rarr = hist[::-1]
            num = sum(
                _round_half_up(x * _EWMA_WEIGHTS[k] * 1e6)
                for k, x in enumerate(rarr)
            )
            den = sum(
                _round_half_up(_EWMA_WEIGHTS[k] * 1e6) for k in range(len(rarr))
            )
            ewma = _round_half_up(num / den * 1e4) / 1e4
            out.append((r.event_id, key[0], r.value, len(rarr), ewma))
        state.update((hist,))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "value", "n_window", "ewma"]
        )

    return (
        df.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_OUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CEP_OUT_SCHEMA = "event_id long, user_id long, ctsm long, ptsm long"
CEP_STATE_SCHEMA = "last_click long, last_error long"


def cep_match_with_state(df: DataFrame) -> DataFrame:
    """q74's streaming twin — CEP is natively a streaming feature, and
    this is its online form: per-user state carries just the LATEST
    click and error timestamps (constant state per key, the NFA's two
    registers); each purchase row checks `click within the 30-min
    window AND latest error < that click` exactly as q74's RANGE frame
    does. With in-order per-key arrival (the same replay contract as
    ``ewma_with_state``) the stream emits row-for-row what the batch
    query computes — asserted by tests/test_stream_batch_equiv.py.

    Input must carry ``tsm`` (epoch micros, the NTZ-safe integer time
    used across the engine). Same §2.9 state-edge pandas exception as
    the EWMA: a per-row fold over two scalars is the
    ``applyInPandasWithState`` shape.
    """
    from event_stream_aggr_spark.plans.relational import CEP_WINDOW_S

    win_us = CEP_WINDOW_S * 1_000_000

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_click, last_error = state.get if state.exists else (None, None)
        rows = pd.concat(list(batches)).sort_values(["tsm", "event_id"])
        out = []
        for r in rows.itertuples():
            if r.event_type == "click":
                last_click = int(r.tsm)
            elif r.event_type == "error":
                last_error = int(r.tsm)
            elif r.event_type == "purchase":
                p = int(r.tsm)
                if (
                    last_click is not None
                    and p - win_us <= last_click < p
                    and (
                        last_error is None
                        or last_error < last_click
                        or last_error < p - win_us
                    )
                ):
                    out.append((int(r.event_id), int(key[0]), last_click, p))
        state.update((last_click, last_error))
        yield pd.DataFrame(out, columns=["event_id", "user_id", "ctsm", "ptsm"])

    return (
        df.select("event_id", "event_type", "user_id", "tsm")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CEP_OUT_SCHEMA,
            stateStructType=CEP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


THROTTLE_OUT_SCHEMA = (
    "event_id long, event_type string, hnum long, kept boolean"
)
THROTTLE_STATE_SCHEMA = "hnum long, n long"


def throttle_with_state(df: DataFrame, n: int = 3) -> DataFrame:
    """q78's streaming twin — the online alert throttle: per signature
    key the state is two scalars (current hour, alerts seen in it);
    each arriving alert is tagged kept/suppressed and the counter
    resets when the hour rolls over. With in-order per-key arrival
    (the engine's replay contract) the kept/suppressed tagging matches
    the batch q78 rank exactly.

    Input must carry ``hnum`` (hour number) and arrive per-key
    time-ordered; same §2.9 state-edge dispensation as the CEP/EWMA
    twins.
    """

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cur_h, cnt = state.get if state.exists else (None, 0)
        rows = pd.concat(list(batches)).sort_values(["hnum", "event_id"])
        out = []
        for r in rows.itertuples():
            if cur_h is None or r.hnum != cur_h:
                cur_h, cnt = int(r.hnum), 0
            cnt += 1
            out.append((int(r.event_id), key[0], int(r.hnum), cnt <= n))
        state.update((cur_h, cnt))
        yield pd.DataFrame(
            out, columns=["event_id", "event_type", "hnum", "kept"]
        )

    return (
        df.select("event_id", "event_type", "hnum")
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=THROTTLE_OUT_SCHEMA,
            stateStructType=THROTTLE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TRANSITION_OUT_SCHEMA = "user_id long, prev_type string, next_type string"
TRANSITION_STATE_SCHEMA = "last_type string, last_tsm long, last_eid long"


def transitions_with_state(df: DataFrame) -> DataFrame:
    """q80's streaming twin — online Markov transition extraction: per
    user the state is the last-seen event (type, tsm, event_id); each
    arriving event emits one (prev_type → next_type) transition row
    and advances the state, so a downstream counting aggregation over
    the emitted rows equals the batch q80 lag-window counts exactly
    once the same events have flowed through (per-key time-ordered
    arrival, the engine's replay contract — same §2.9 state-edge
    dispensation as the CEP/EWMA/throttle twins).

    Input must carry ``tsm`` (event-time micros); the (tsm, event_id)
    sort inside the batch pins the same tiebreak as the batch window.
    State is three scalars per user — bounded, no growth with stream
    length.
    """

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_type, last_tsm, last_eid = (
            state.get if state.exists else (None, None, None)
        )
        rows = pd.concat(list(batches)).sort_values(["tsm", "event_id"])
        out = []
        for r in rows.itertuples():
            if last_type is not None:
                out.append((int(key[0]), last_type, r.event_type))
            last_type, last_tsm, last_eid = (
                r.event_type,
                int(r.tsm),
                int(r.event_id),
            )
        state.update((last_type, last_tsm, last_eid))
        yield pd.DataFrame(
            out, columns=["user_id", "prev_type", "next_type"]
        )

    return (
        df.select("event_id", "event_type", "user_id", "tsm")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TRANSITION_OUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


IVU_OUT_SCHEMA = (
    "user_id long, n_islands long, n_intervals long, covered_sec long"
)
IVU_STATE_SCHEMA = (
    "cur_start long, cur_end long, cur_n long,"
    " closed_islands long, closed_intervals long, closed_cov long"
)


def ivu_fold(state: tuple, starts: list, hold_s: int) -> tuple:
    """The pure island-merge fold behind interval_union_with_state:
    advance the 6-scalar state by a time-sorted run of interval
    starts. Module-level (not closed over) so the cross-batch logic
    is property-testable without a Spark session
    (tests/test_property_interval_state.py)."""
    (cur_start, cur_end, cur_n,
     closed_islands, closed_intervals, closed_cov) = state
    for s in starts:
        e = s + hold_s
        if cur_start is None:
            cur_start, cur_end, cur_n = s, e, 1
        elif s > cur_end:
            closed_islands += 1
            closed_intervals += cur_n
            closed_cov += cur_end - cur_start
            cur_start, cur_end, cur_n = s, e, 1
        else:
            cur_end = max(cur_end, e)
            cur_n += 1
    return (cur_start, cur_end, cur_n,
            closed_islands, closed_intervals, closed_cov)


def ivu_totals(state: tuple) -> tuple:
    """(n_islands, n_intervals, covered_sec) INCLUDING the open island."""
    (cur_start, cur_end, cur_n,
     closed_islands, closed_intervals, closed_cov) = state
    open_island = int(cur_start is not None)
    return (
        closed_islands + open_island,
        closed_intervals + cur_n,
        closed_cov + ((cur_end - cur_start) if open_island else 0),
    )


def interval_union_with_state(df: DataFrame, hold_s: int = 300) -> DataFrame:
    """qj02's streaming twin — online interval UNION (merge overlapping
    activity holds into islands): per user the state is the OPEN
    island (start, running max end, interval count) plus the closed
    totals; each arriving event's [s, s+hold] either extends the open
    island (s <= cur_end) or closes it and opens a new one. One totals
    row per user per micro-batch (update mode) reports islands /
    intervals / covered seconds INCLUDING the open island, so after
    the same events have flowed through an in-order replay the latest
    row per user equals batch qj02 exactly
    (tests/test_stream_batch_equiv.py).

    Order contract: rows sort (tsm, event_id) inside the batch; across
    batches the engine's per-key time-ordered arrival applies (the
    same §2.9 state-edge dispensation as the EWMA/CEP/throttle twins).
    Equal-timestamp events are order-robust here: a tied event always
    lands inside the island its twin opened (s <= cur_end since
    cur_end >= s + hold), so batch-boundary ties cannot split islands.

    State is six scalars per user — bounded however long the stream
    runs; n_intervals is monotone per user, so "latest row" is
    recoverable from an unordered sink as max(n_intervals).

    Input must carry ``tsm`` (event-time micros); holds are integer
    SECONDS of epoch time (s = tsm div 1e6), matching batch qj02."""

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        st = tuple(state.get) if state.exists else (None, None, 0, 0, 0, 0)
        rows = pd.concat(list(batches)).sort_values(["tsm", "event_id"])
        st = ivu_fold(
            st, [int(t) // 1_000_000 for t in rows.tsm], hold_s
        )
        state.update(st)
        yield pd.DataFrame(
            [(int(key[0]), *ivu_totals(st))],
            columns=["user_id", "n_islands", "n_intervals", "covered_sec"],
        )

    return (
        df.select("event_id", "user_id", "tsm")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=IVU_OUT_SCHEMA,
            stateStructType=IVU_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


MED_OUT_SCHEMA = (
    "event_id long, user_id long, value double,"
    " n_window long, rolling_median double"
)
MED_STATE_SCHEMA = "vals array<double>"


def rolling_median_with_state(df: DataFrame) -> DataFrame:
    """q72's streaming twin — rolling EXACT median over the user's
    last MED_W values via ``applyInPandasWithState``. State per key is
    the bounded trailing value window (same shape as the EWMA twin);
    each row emits the sorted-selection median, with the even-window
    halving and the 4dp HALF_UP rounding replicating the batch
    expression bit-for-bit, so an in-order replay equals batch q72
    row for row (tests/test_stream_batch_equiv.py)."""
    from event_stream_aggr_spark.plans.relational import MED_W

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hist: list[float] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(batches)).sort_values(["tsm", "event_id"])
        out = []
        for r in rows.itertuples():
            hist.append(float(r.value))
            if len(hist) > MED_W:
                hist.pop(0)
            arr = sorted(hist)
            n = len(arr)
            med = arr[(n - 1) // 2] if n % 2 == 1 else (
                (arr[n // 2 - 1] + arr[n // 2]) / 2
            )
            out.append(
                (
                    int(r.event_id),
                    int(key[0]),
                    float(r.value),
                    n,
                    _round_half_up(med * 1e4) / 1e4,
                )
            )
        state.update((hist,))
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "user_id", "value", "n_window", "rolling_median"
            ],
        )

    return (
        df.select("event_id", "user_id", "value", "tsm")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=MED_OUT_SCHEMA,
            stateStructType=MED_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SLD_OUT_SCHEMA = "window_start string, n_events long, n_users long"
SLD_STATE_SCHEMA = "users array<long>, n_events long"


def sliding_distinct_with_state(df: DataFrame, window_hours: int = 6) -> DataFrame:
    """q73's streaming twin — sliding-window (window_hours h, 1 h
    slide) event count + EXACT distinct users. Window membership is a
    map-side explode (each event belongs to window_hours windows);
    the stateful operator keys on the window start hour and keeps the
    exact seen-user set plus the running event count, emitting the
    window's latest totals each micro-batch (update mode; n_events is
    monotone per key, so an unordered sink recovers "latest" as
    max(n_events) — same contract as the interval-union twin).

    State is the per-window distinct-user set — EXACT, like the batch
    q73 (bounded by |users| per window, not stream length, since the
    set deduplicates). The 100 TB state diet is the qi02 HLL-monoid
    twin: swap the array for a sketch and the union stays mergeable;
    this operator keeps the exact form so parity with batch q73 is
    bit-for-bit (tests/test_stream_batch_equiv.py).

    Input must carry ``tsm`` (event-time micros)."""
    from datetime import datetime, timezone

    def fmt(w: int) -> str:
        return datetime.fromtimestamp(w * 3600, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    exploded = df.select(
        F.explode(
            F.expr(
                f"sequence(tsm div 3600000000 - {window_hours - 1},"
                " tsm div 3600000000)"
            )
        ).alias("w"),
        "user_id",
    )

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            users, n_events = set(state.get[0]), int(state.get[1])
        else:
            users, n_events = set(), 0
        rows = pd.concat(list(batches))
        n_events += len(rows)
        users.update(int(u) for u in rows.user_id)
        state.update((sorted(users), n_events))
        yield pd.DataFrame(
            [(fmt(int(key[0])), n_events, len(users))],
            columns=["window_start", "n_events", "n_users"],
        )

    return exploded.groupBy("w").applyInPandasWithState(
        fn,
        outputStructType=SLD_OUT_SCHEMA,
        stateStructType=SLD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
