from event_stream_aggr_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    stream_parquet_dir,
)
