"""Pure-Python Avro binary codec for the SnortAlert output record (S4,
internal/schema/schema.go:36-43: the reference serializes alerts with a
Confluent Avro GenericSerializer).

The spark-avro jar is absent in this container, so ``to_avro``
(sources/kafka.encode_avro) cannot execute here. This module makes the
S4 contract RUN anyway:

- ``avro_schema_of``: Spark StructType → Avro record schema (JSON
  dict), nullable field → ``["null", T]`` union — the same mapping
  spark-avro applies, so the schema JSON is reusable with the real jar.
- ``encode_record`` / ``decode_record``: the Avro binary encoding from
  the public spec — zigzag-varint longs, length-prefixed UTF-8 strings
  and bytes, union-index prefixes, single-block arrays, record fields
  in schema order.
- ``encode_avro_py``: the jar-free executable sink stage (Arrow-batched
  ``mapInPandas``) producing the same (key, headers, value BINARY)
  frame ``sources.kafka.encode_avro`` would; compose with
  ``sources.registry.frame_confluent`` for the registry wire format.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from event_stream_aggr_spark.sources.kafka import avro_payload_columns

# ---------------------------------------------------------------------------
# Schema mapping
# ---------------------------------------------------------------------------

_PRIMITIVES: dict[type, str] = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_type(dt: T.DataType, name: str) -> Any:
    for cls, avro in _PRIMITIVES.items():
        if isinstance(dt, cls):
            return avro
    if isinstance(dt, T.StructType):
        return avro_schema_of(dt, name=f"{name}_record")
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType, name)}
    raise TypeError(f"no Avro mapping for {dt.simpleString()} ({name})")


def avro_schema_of(
    struct: T.StructType, name: str = "SnortAlert", namespace: str = "pb"
) -> dict:
    """StructType → Avro record schema; nullable → ["null", T] union."""
    fields = []
    for f in struct.fields:
        ft = _avro_type(f.dataType, f.name)
        if f.nullable:
            ft = ["null", ft]
        fields.append({"name": f.name, "type": ft})
    return {"type": "record", "name": name, "namespace": namespace, "fields": fields}


# ---------------------------------------------------------------------------
# Binary encoding (Avro spec)
# ---------------------------------------------------------------------------


def _zigzag_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_dec(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(n: int) -> bytes:
    n = _zigzag_enc(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:  # Avro longs are <=10 varint bytes
            raise ValueError("varint exceeds 10 bytes")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_dec(result), pos
        shift += 7


def _is_null(value: Any, nan_is_null: bool = True) -> bool:
    """Null under Arrow→pandas conventions: None, pd.NA — and NaN only
    when ``nan_is_null`` (a nullable int64 column crossing mapInPandas
    becomes float64 with NaN for the nulls — the dtype Spark hands us,
    so NaN in an *integer* union column means SQL NULL). For genuine
    double/float branches NaN is a legal IEEE payload and must encode
    literally, so callers pass nan_is_null=False there."""
    if value is None:
        return True
    if nan_is_null and isinstance(value, float) and value != value:
        return True
    try:
        import pandas as pd

        return value is pd.NA
    except ImportError:  # pragma: no cover
        return False


def _encode(value: Any, schema: Any) -> bytes:
    if isinstance(schema, list):  # union: zigzag index then value
        branch = next(s for s in schema if s != "null")
        if _is_null(value, nan_is_null=branch not in ("double", "float")):
            idx = schema.index("null")
            return _write_long(idx)
        idx = schema.index(branch)
        return _write_long(idx) + _encode(value, branch)
    if isinstance(schema, dict):
        if schema["type"] == "record":
            out = bytearray()
            for f in schema["fields"]:
                out += _encode(value.get(f["name"]) if value is not None else None, f["type"])
            return bytes(out)
        if schema["type"] == "array":
            items = list(value if value is not None else [])
            out = bytearray()
            if items:
                out += _write_long(len(items))
                for it in items:
                    out += _encode(it, schema["items"])
            out += _write_long(0)
            return bytes(out)
        raise TypeError(f"unsupported complex type {schema['type']}")
    if schema in ("long", "int"):
        return _write_long(int(value))
    if schema == "string":
        b = str(value).encode()
        return _write_long(len(b)) + b
    if schema == "bytes":
        b = bytes(value)
        return _write_long(len(b)) + b
    if schema == "boolean":
        return b"\x01" if value else b"\x00"
    if schema in ("double", "float"):
        import struct as _s

        return _s.pack("<d" if schema == "double" else "<f", float(value))
    raise TypeError(f"unsupported Avro type {schema!r}")


def _decode(buf: bytes, pos: int, schema: Any) -> tuple[Any, int]:
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        if schema[idx] == "null":
            return None, pos
        return _decode(buf, pos, schema[idx])
    if isinstance(schema, dict):
        if schema["type"] == "record":
            out = {}
            for f in schema["fields"]:
                out[f["name"]], pos = _decode(buf, pos, f["type"])
            return out, pos
        if schema["type"] == "array":
            items = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    v, pos = _decode(buf, pos, schema["items"])
                    items.append(v)
        raise TypeError(f"unsupported complex type {schema['type']}")
    if schema in ("long", "int"):
        return _read_long(buf, pos)
    if schema == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode(), pos + n
    if schema == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if schema == "boolean":
        return buf[pos] == 1, pos + 1
    if schema in ("double", "float"):
        import struct as _s

        width, fmt = (8, "<d") if schema == "double" else (4, "<f")
        return _s.unpack(fmt, buf[pos : pos + width])[0], pos + width
    raise TypeError(f"unsupported Avro type {schema!r}")


#: Public alias: Confluent's protobuf message-index framing uses this
#: same zigzag-varint encoding (sources/registry.py imports it).
write_zigzag_varint = _write_long


def encode_record(value: dict, schema: dict) -> bytes:
    return _encode(value, schema)


def decode_record(buf: bytes, schema: dict) -> dict:
    out, pos = _decode(buf, 0, schema)
    if pos != len(buf):
        raise ValueError(f"trailing bytes: consumed {pos} of {len(buf)}")
    return out


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------


def encode_avro_py(df: DataFrame) -> DataFrame:
    """S4 executable path: alert rows → (envelope cols, value BINARY
    Avro). Jar-free analogue of ``sources.kafka.encode_avro`` — same
    payload-column selection, same record schema."""
    import pandas as pd

    payload_cols = avro_payload_columns(df.columns)
    payload_struct = T.StructType([df.schema[c] for c in payload_cols])
    schema = avro_schema_of(payload_struct)
    keep = [c for c in df.columns if c not in payload_cols]
    out_schema = T.StructType(
        [df.schema[c] for c in keep] + [T.StructField("value", T.BinaryType(), False)]
    )

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            values = [
                encode_record({c: row[c] for c in payload_cols}, schema)
                for _, row in pdf.iterrows()
            ]
            out = pdf[keep].copy()
            out["value"] = values
            yield out

    return df.mapInPandas(op, schema=out_schema)
