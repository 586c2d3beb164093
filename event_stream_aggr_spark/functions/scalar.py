"""Scalar derivations of the reference, as Catalyst column expressions.

Every function here is a *composition of JVM builtins* (whole-stage
codegen'd, no Python in the hot path) reproducing the reference's Go
helpers exactly, corner cases included:

- ``iso_micro_timestamp``  ← ``parseUnixMicroTimestampToString``
  (reference internal/processor/processor.go:16-18; golden value in
  processor_test.go:14-18)
- ``priority_label``       ← ``ParsePriority`` (processor.go:109-120)
- ``parse_snort_event_time`` ← event-time parse w/ epoch-seconds
  fallback (internal/app/app.go:195-198)
- ``sha256_hex``           ← ``generateHashSHA256`` (processor.go:100-103)
- ``round_time``           ← ``roundTime`` bucketing (processor.go:105-107)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Snort 3 alert-clock format (Go layout "06/01/02-15:04:05.999999",
#: reference internal/app/app.go:195).
SNORT_TS_FORMAT = "yy/MM/dd-HH:mm:ss.SSSSSS"

#: Go's ``.999999`` fraction layout accepts 0-6 fraction digits (trailing
#: zeros omitted, or the whole fraction absent). Java patterns pin the
#: digit count, so parsing tries each width, longest first.
SNORT_TS_FORMATS = [
    f"yy/MM/dd-HH:mm:ss.{'S' * n}" for n in range(6, 0, -1)
] + ["yy/MM/dd-HH:mm:ss"]


def iso_micro_timestamp(micros: Column | str) -> Column:
    """µs epoch → UTC ISO-8601 string, ms precision, trailing zeros
    suppressed.

    Go's ``.999`` fraction layout truncates to milliseconds and drops
    trailing zeros (and the dot when the fraction is zero):
    ``1738296906927463 → "2025-01-31T04:15:06.927Z"``,
    ``...927000 → "...06.927Z"``? no — ``927`` ms keeps all digits;
    ``...920000 µs → "...06.92Z"``; ``...000000 µs → "...06Z"``.
    Reference: processor.go:16-18, golden processor_test.go:14-18.

    Built from ``date_format`` (pads ``SSS``) + two regexp strips to
    reproduce the suppression — still pure JVM expressions.
    """
    c = F.col(micros) if isinstance(micros, str) else micros
    padded = F.date_format(F.timestamp_micros(c), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    no_zeros = F.regexp_replace(padded, r"0+Z$", "Z")
    return F.regexp_replace(no_zeros, r"\.Z$", "Z")


def iso_micro_timestamp_ntz(ts: Column | str) -> Column:
    """F1's formatting applied to a TIMESTAMP_NTZ column (same
    truncate-to-ms + suppress-trailing-zeros contract, but the input is
    already a naive timestamp, so the result is independent of the
    session timezone)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    padded = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    no_zeros = F.regexp_replace(padded, r"0+Z$", "Z")
    return F.regexp_replace(no_zeros, r"\.Z$", "Z")


def priority_label(priority: Column | str) -> Column:
    """1→High, 2→Medium, 3→Low, else→Informational (processor.go:109-120)."""
    c = F.col(priority) if isinstance(priority, str) else priority
    return (
        F.when(c == 1, F.lit("High"))
        .when(c == 2, F.lit("Medium"))
        .when(c == 3, F.lit("Low"))
        .otherwise(F.lit("Informational"))
    )


def parse_snort_event_time(ts: Column | str, fallback_seconds: Column | str) -> Column:
    """Parse the Snort alert clock; on failure fall back to epoch seconds.

    Reference semantics (app.go:195-198): ``time.Parse`` of the string,
    else ``time.Unix(event.GetSnortSeconds(), 0)``. ``try_to_timestamp``
    keeps this ANSI-safe (malformed input → NULL → coalesce), exactly
    the reference's error path, with no exception handling in the plan.

    Go's ``.999999`` accepts 0-6 fraction digits; a coalesce over the
    fixed-width Java patterns (6 → 0 digits) reproduces that, so
    ``...ss.9`` or a fraction-less clock parses instead of silently
    falling back to epoch seconds.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    fb = F.col(fallback_seconds) if isinstance(fallback_seconds, str) else fallback_seconds
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in SNORT_TS_FORMATS]
    return F.coalesce(*attempts, F.timestamp_seconds(fb))


def sha256_hex(data: Column | str) -> Column:
    """SHA-256 lowercase hex digest (processor.go:100-103)."""
    c = F.col(data) if isinstance(data, str) else data
    return F.sha2(c, 256)


def round_time(ts_seconds: Column | str, bucket_seconds: int) -> Column:
    """Integer floor-to-bucket: ``(t / n) * n`` (processor.go:105-107).

    The tumbling-window bucketing primitive of the wider pipeline; the
    streaming engine uses ``F.window`` instead (streaming/windows.py),
    this exists for parity + batch bucketing.
    """
    c = F.col(ts_seconds) if isinstance(ts_seconds, str) else ts_seconds
    return (c / bucket_seconds).cast("long") * bucket_seconds
