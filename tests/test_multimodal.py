"""Multimodal plumbing: binary payloads + Arrow-batched decode stage."""

from __future__ import annotations

from event_stream_aggr_spark.operators.multimodal import attach_binary, decode_features
from event_stream_aggr_spark.tables import load_table


def test_attach_binary_schema(spark, sf_dir):
    mm = attach_binary(load_table(spark, sf_dir, "documents"))
    d = dict(mm.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<uri:string,mime:string,n_bytes:bigint")


def test_decode_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x")], "doc_id long, text string"
    )
    feats = {r.doc_id: r for r in decode_features(attach_binary(docs)).collect()}
    # fake decoder contract: [n_bytes, first_byte, n % 257, first % 17]
    assert feats[1].features == [11.0, float(ord("h")), 11.0, float(ord("h") % 17)]
    assert feats[1].mime == "text/plain" and feats[1].n_bytes == 11
    assert feats[2].features[0] == 1.0


def test_payload_not_in_decoded_schema(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    out = decode_features(attach_binary(docs))
    assert "payload" not in out.columns  # media bytes dropped post-decode


def test_metadata_scan_prunes_payload_column(spark, tmp_path):
    """Pointer-style contract: a metadata-only query over a multimodal
    parquet table must not read the payload bytes (columnar pruning —
    the property that makes 100 TB of media filterable)."""
    from event_stream_aggr_spark.operators.multimodal import attach_binary
    from event_stream_aggr_spark.tables import load_table

    path = str(tmp_path / "mm.parquet")
    attach_binary(load_table(spark, "/root/testdata/sf0.001", "documents")).write.parquet(path)
    meta_only = spark.read.parquet(path).select("doc_id", "meta.n_bytes")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "payload" not in read_schema[0]


def test_binaryfile_ingest_to_features(spark, tmp_path):
    from event_stream_aggr_spark.operators.multimodal import (
        decode_features,
        read_binary_files,
    )

    (tmp_path / "a.txt").write_bytes(b"hello world")
    (tmp_path / "b.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "skip.bin").write_bytes(b"xx")
    mm = read_binary_files(spark, str(tmp_path), glob="*.{txt,png}")
    rows = {r.meta.uri.rsplit("/", 1)[-1]: r for r in mm.collect()}
    assert set(rows) == {"a.txt", "b.png"}  # pathGlobFilter pruned skip.bin
    assert rows["a.txt"].meta.mime == "text/plain"
    assert rows["b.png"].meta.mime == "image/png"
    assert rows["a.txt"].meta.n_bytes == 11
    assert bytes(rows["b.png"].payload) == b"\x89PNG fake"
    feats = {r.mime: r.features for r in decode_features(mm).collect()}
    assert feats["text/plain"][0] == 11.0          # n_bytes feature
    assert feats["image/png"][1] == float(0x89)    # first-byte feature
