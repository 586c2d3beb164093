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


def test_image_patches_strided_gather_known_payload(spark):
    """qm04's patchifier on a hand-computed raster: a 512-byte payload
    (16 rows x 32 bytes) yields 2x4 patches; each 8x8 patch gathers 8
    strided runs — checked against byte arithmetic done by hand here,
    independent of the SQL oracle."""
    from event_stream_aggr_spark.operators.multimodal import extract_patches

    payload = bytes(range(256)) * 2  # 512 bytes, values 0..255 twice
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = {(r.patch_y, r.patch_x): r for r in extract_patches(df).collect()}
    assert set(rows) == {(py, px) for py in range(2) for px in range(4)}
    for (py, px), r in rows.items():
        vals = []
        for rr in range(8):
            start = (py * 8 + rr) * 32 + px * 8
            vals.extend(payload[start : start + 8])
        assert r.energy == sum(vals) and r.peak == max(vals)


def test_image_patches_partial_rowblock_emits_nothing(spark):
    """Payloads shorter than one full 8-row block produce zero patches
    (tail truncation — the oracle's n_chars >= 256 filter mirror)."""
    from event_stream_aggr_spark.operators.multimodal import extract_patches

    df = spark.createDataFrame(
        [(1, b"x" * 255), (2, b"y" * 256)], "doc_id long, payload binary"
    )
    rows = extract_patches(df).collect()
    assert {r.doc_id for r in rows} == {2}
    assert len(rows) == 4  # one row-block -> 1x4 patches
