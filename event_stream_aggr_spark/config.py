"""Config layer (E1) — the reference's viper env/.env/flag stack
(cmd/root.go:28-67) re-expressed without third-party deps.

Same keys, same defaults (cmd/root.go:44-50), same precedence
(viper semantics): defaults < .env file < process environment <
explicit flags. Key lookup is case-insensitive; the environment uses
upper-case names (``KAFKA_BROKERS=...``), exactly how viper's
``AutomaticEnv`` binds them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


@dataclass
class Config:
    # defaults: cmd/root.go:44-50
    kafka_brokers: str = "localhost:9092"
    input_kafka_topic: str = "sensor_events"
    schema_registry_url: str = "http://localhost:8081"
    output_kafka_topic: str = "snort_alerts"
    max_workers: int = 0
    log_interval: int = 10
    verbose: int = 0

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}


def _parse_dotenv(path: str) -> dict[str, str]:
    """Minimal KEY=VALUE .env reader (viper.SetConfigType("env"),
    cmd/root.go:31-38): '#' comments and blank lines skipped, optional
    surrounding quotes stripped. A missing file is not an error (the
    reference logs and continues, root.go:36-38)."""
    out: dict[str, str] = {}
    if not os.path.isfile(path):
        return out
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            v = v.strip()
            if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                v = v[1:-1]
            out[k.strip().lower()] = v
    return out


def load_config(
    environ: dict[str, str] | None = None,
    dotenv_path: str = "./.env",
    overrides: dict[str, object] | None = None,
) -> Config:
    """Resolve the config with viper precedence (root.go:28-67)."""
    conf = Config()
    environ = os.environ if environ is None else environ
    layers: list[dict] = [
        _parse_dotenv(dotenv_path),
        {k.lower(): v for k, v in environ.items()},
        {k.lower(): v for k, v in (overrides or {}).items() if v is not None},
    ]
    for f in fields(Config):
        for layer in layers:  # later layers win: dotenv < env < flags
            if f.name in layer:
                setattr(conf, f.name, _coerce(layer[f.name], getattr(conf, f.name)))
    return conf


def _coerce(raw: object, current: object) -> object:
    if isinstance(current, int) and not isinstance(raw, int):
        # viper GetInt parity: unparsable/empty values coerce to the
        # zero value instead of crashing startup (cast.ToInt semantics)
        try:
            return int(str(raw))
        except ValueError:
            return 0
    return raw
