"""E1 config/entry parity (cmd/root.go:28-67): defaults, .env file,
environment, and flag precedence; module smoke via subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from event_stream_aggr_spark.config import Config, load_config


def test_defaults_match_reference():
    # cmd/root.go:44-50
    c = Config()
    assert c.kafka_brokers == "localhost:9092"
    assert c.input_kafka_topic == "sensor_events"
    assert c.schema_registry_url == "http://localhost:8081"
    assert c.output_kafka_topic == "snort_alerts"
    assert (c.max_workers, c.log_interval, c.verbose) == (0, 10, 0)


def test_precedence_dotenv_env_flags(tmp_path):
    dotenv = tmp_path / ".env"
    dotenv.write_text(
        "# comment\nKAFKA_BROKERS=dotenv:9092\nINPUT_KAFKA_TOPIC='from_dotenv'\n"
        "LOG_INTERVAL=99\n"
    )
    environ = {"KAFKA_BROKERS": "env:9092", "MAX_WORKERS": "4"}
    c = load_config(
        environ=environ,
        dotenv_path=str(dotenv),
        overrides={"kafka_brokers": "flag:9092", "verbose": 2},
    )
    assert c.kafka_brokers == "flag:9092"       # flag beats env beats .env
    assert c.input_kafka_topic == "from_dotenv"  # .env only → wins, quotes stripped
    assert c.max_workers == 4                    # env, int-coerced
    assert c.log_interval == 99                  # .env, int-coerced
    assert c.verbose == 2


def test_missing_dotenv_is_not_an_error(tmp_path):
    c = load_config(environ={}, dotenv_path=str(tmp_path / "nope.env"))
    assert c == Config()


def test_module_entry_smoke(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["OUTPUT_KAFKA_TOPIC"] = "alerts_override"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "event_stream_aggr_spark",
            "--print-config",
            "--input-topic",
            "events_in",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # no .env here: exercises the missing-file path
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    conf = json.loads(out.stdout.strip())
    assert conf["input_kafka_topic"] == "events_in"       # flag
    assert conf["output_kafka_topic"] == "alerts_override"  # env
    assert conf["kafka_brokers"] == "localhost:9092"        # default


def test_unparsable_int_coerces_to_zero_like_viper(tmp_path):
    c = load_config(
        environ={"MAX_WORKERS": "", "LOG_INTERVAL": "ten"},
        dotenv_path=str(tmp_path / "none.env"),
    )
    assert c.max_workers == 0 and c.log_interval == 0


def test_list_and_run_query_modes():
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-m", "event_stream_aggr_spark", "--list-queries"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    names = out.stdout.split()
    assert out.returncode == 0 and "q01_pricing_summary" in names

    run = subprocess.run(
        [sys.executable, "-m", "event_stream_aggr_spark",
         "--run-query", "qd01_exact_dedup",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert run.returncode == 0
    rows = [json.loads(line) for line in run.stdout.strip().splitlines()]
    assert 0 < len(rows) <= 5 and "keeper_doc_id" in rows[0]

    bad = subprocess.run(
        [sys.executable, "-m", "event_stream_aggr_spark", "--run-query", "nope"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert bad.returncode == 2 and "unknown query" in bad.stderr
