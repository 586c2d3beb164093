from event_stream_aggr_spark.functions.scalar import (  # noqa: F401
    iso_micro_timestamp,
    parse_snort_event_time,
    priority_label,
    round_time,
    sha256_hex,
)
