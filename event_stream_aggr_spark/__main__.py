"""CLI entry (E1): ``python -m event_stream_aggr_spark`` — the
reference's ``sensor_events_handler_aggr`` command (cmd/root.go:21-26)
on Spark Structured Streaming.

Flags mirror cmd/root.go:56-62; config resolution is config.py (viper
parity). ``--print-config`` dumps the resolved config as one JSON line
and exits — the hermetic smoke path for containers without a Kafka
broker/connector jar. Without it, the full pipeline starts: Kafka
source → protobuf decode → flatten/envelope → Kafka sink.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m event_stream_aggr_spark",
        description=(
            "Kafka consumer that reads sensor events and produces alerts "
            "(Spark Structured Streaming engine)"
        ),
    )
    p.add_argument("--kafka-brokers", dest="kafka_brokers")          # root.go:57
    p.add_argument("--input-topic", dest="input_kafka_topic")        # root.go:58
    p.add_argument("--schema-registry-url", dest="schema_registry_url")  # root.go:59
    p.add_argument("--output-topic", dest="output_kafka_topic")      # root.go:60
    p.add_argument("-v", "--verbose", action="count", default=None, dest="verbose")
    p.add_argument("--checkpoint", default="/tmp/event_stream_aggr_spark_ckpt")
    p.add_argument(
        "--print-config",
        action="store_true",
        help="resolve config (defaults < .env < env < flags), print JSON, exit",
    )
    p.add_argument(
        "--list-queries",
        action="store_true",
        help="print the registered query names (one per line) and exit",
    )
    p.add_argument(
        "--run-query",
        metavar="NAME",
        help="run one registered query on the batch tables and print "
        "rows as JSON lines (the engine's ad-hoc batch mode)",
    )
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="parquet table directory for --run-query",
    )
    p.add_argument(
        "--limit",
        type=int,
        default=100,
        help="max rows to print for --run-query",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from event_stream_aggr_spark.config import load_config

    args = build_parser().parse_args(argv)
    conf = load_config(
        overrides={
            k: getattr(args, k)
            for k in (
                "kafka_brokers",
                "input_kafka_topic",
                "schema_registry_url",
                "output_kafka_topic",
                "verbose",
            )
        }
    )
    if args.print_config:
        print(json.dumps(conf.as_dict(), sort_keys=True))
        return 0

    if args.list_queries or args.run_query:
        from event_stream_aggr_spark.plans.registry import load_all

        specs = load_all()
        if args.list_queries:
            for name in specs:
                print(name)
            return 0
        if args.run_query not in specs:
            print(f"unknown query {args.run_query!r}; see --list-queries", file=sys.stderr)
            return 2
        from event_stream_aggr_spark.session import get_spark

        spark = get_spark(app_name=f"query:{args.run_query}")
        df = specs[args.run_query].fn(spark, args.sf_dir)
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
        return 0

    from event_stream_aggr_spark.plans.snort import with_kafka_envelope
    from event_stream_aggr_spark.session import get_spark
    from event_stream_aggr_spark.sources.kafka import (
        read_kafka_stream,
        write_kafka_stream,
    )
    from event_stream_aggr_spark.sources.protobuf_wire import decode_sensor_events_py

    spark = get_spark(app_name="event_stream_aggr_spark")
    raw = read_kafka_stream(spark, conf.kafka_brokers, conf.input_kafka_topic)
    alerts = with_kafka_envelope(decode_sensor_events_py(raw))
    # value: JSON here; on a registry-enabled cluster swap in
    # sources.kafka.encode_avro + the Schema Registry wire format.
    # Both sink encodings share the avro_payload_columns() contract so
    # the JSON record matches the reference's SnortAlert field set
    # (schema.go:36-43) — no engine-internal columns leak.
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.sources.kafka import avro_payload_columns

    payload = alerts.select(
        "key",
        "headers",
        F.to_json(F.struct(*avro_payload_columns(alerts.columns)))
        .cast("binary")
        .alias("value"),
    )
    q = write_kafka_stream(
        payload, conf.kafka_brokers, conf.output_kafka_topic, args.checkpoint
    ).start()
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
