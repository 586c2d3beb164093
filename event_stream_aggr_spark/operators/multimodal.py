"""Multimodal column plumbing (SURVEY.md §2.10 L5).

At 100 TB, media NEVER travels through the query plan as inline bytes
unless a stage actually decodes it. The pattern implemented here:

- **pointer-style rows**: a typed metadata struct (uri, mime, n_bytes)
  plus an optional inline ``payload BINARY`` column. Filters/joins run
  on metadata only (column pruning keeps the binary out of scans that
  don't need it — parquet is columnar, so ``select`` without payload
  reads zero payload bytes).
- **decode/feature stages as Arrow-batched pandas iterators**
  (``mapInPandas``): the engine hands each task a batch of payloads;
  the Python side is a vectorized library call. Real image/audio codecs
  aren't in this container, so ``decode_features`` dispatches to a
  deterministic fake featureizer; the Spark-side plumbing (schema,
  batching, partitioning) is real and tested.

``spark.read.format("binaryFile")`` is the ingest path for directories
of media files (binds path/length/content columns); here the driver
tables stand in via ``attach_binary``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

FEATURE_DIM = 4

FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes long, features array<double>"
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Documents → multimodal rows: payload binary + metadata struct."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("uri"),
            F.lit("text/plain").alias("mime"),
            F.length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder (image resize / audio
    frame-sample / video keyframe). Real codecs are not in this
    container — a production build swaps this for PIL/librosa/ffmpeg
    calls on the same batch path.
    """
    n = len(payload)
    head = payload[0] if n else 0
    return [float(n), float(head), float(n % 257), float(head % 17)]


def decode_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (payload, meta).

    Each pandas batch decodes vectorized; output schema is fixed and
    narrow (features only, payload dropped) so downstream stages never
    carry the media bytes.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "features": [_fake_decode(p) for p in pdf["payload"]],
                }
            )

    return multimodal.mapInPandas(op, schema=FEATURES_SCHEMA)


@register(
    "qm01_multimodal_features",
    tags=("multimodal",),
    oracle="""
SELECT 'text/plain' AS mime,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(length(text)) AS DOUBLE) AS sum_feat_len,
       CAST(SUM(ascii(text)) AS DOUBLE) AS sum_feat_head,
       CAST(SUM(length(text) % 257) AS DOUBLE) AS sum_feat_lenmod,
       CAST(SUM(ascii(text) % 17) AS DOUBLE) AS sum_feat_headmod
FROM documents
""",
)
def qm01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline (L5): binary payload + metadata → Arrow-batch
    decode → per-mime feature stats.

    The fake featureizer emits [n_bytes, first_byte, n%257, head%17] —
    integer-valued doubles, so their sums are exact and order-free, and
    the oracle recomputes the whole decode in SQL (documents are ASCII:
    octet length == char length, ascii() == first payload byte). This
    hash-checks the Arrow decode path end-to-end, not just row counts.
    """
    d = load_table(spark, sf_dir, "documents")
    feats = decode_features(attach_binary(d))
    return feats.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.element_at("features", 1)).alias("sum_feat_len"),
        F.sum(F.element_at("features", 2)).alias("sum_feat_head"),
        F.sum(F.element_at("features", 3)).alias("sum_feat_lenmod"),
        F.sum(F.element_at("features", 4)).alias("sum_feat_headmod"),
    )


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """L5 ingest: a directory of media files → multimodal rows via the
    built-in ``binaryFile`` source (path/length/content bound by the
    format, predicate pushdown on path/length works at the source).

    ``pathGlobFilter`` prunes by extension BEFORE reading content —
    at 100 TB the filter must act on file listings, not loaded bytes.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.element_at(F.split(F.col("path"), r"\."), -1)
    mime = (
        F.when(ext == "txt", F.lit("text/plain"))
        .when(ext.isin("jpg", "jpeg"), F.lit("image/jpeg"))
        .when(ext == "png", F.lit("image/png"))
        .when(ext == "wav", F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return raw.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("uri"),
            mime.alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


FRAME_BYTES = 32
FRAME_STRIDE = 4  # sample every 4th frame

FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def sample_frames(multimodal: DataFrame, frame_bytes: int = FRAME_BYTES,
                  stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling stage (the video analogue of decode_features):
    treat the payload as a sequence of fixed-size frames, emit every
    ``stride``-th frame's digest — a 1-row → N-row Arrow-batched
    generator, the batch shape a real keyframe extractor has. A
    production build swaps the md5 for an ffmpeg/PIL call on the same
    path; the digest keeps this container's stand-in deterministic."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for i in range(0, len(buf) // frame_bytes, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(
                            buf[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return multimodal.select("doc_id", "payload").mapInPandas(op, schema=FRAMES_SCHEMA)


@register(
    "qm02_frame_samples",
    tags=("multimodal",),
    oracle=f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
                CAST(floor(n_chars / {FRAME_BYTES}) AS BIGINT) - 1,
                {FRAME_STRIDE})) AS frame_idx
  FROM documents WHERE n_chars >= {FRAME_BYTES})
SELECT doc_id, frame_idx,
       md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                  {FRAME_BYTES})) AS frame_md5
FROM f
""",
)
def qm02_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (L5, the video-shaped op): every 4th 32-byte
    frame of each payload, digested. The oracle replays the identical
    framing in SQL (documents are ASCII, so byte slices == substr) —
    the Arrow generator stage is hash-checked row-for-row, including
    the variable fan-out (docs shorter than one frame emit nothing).

    Scale: the only stage that touches payload bytes is the sampler
    itself; its output is (id, idx, digest) — frames never re-enter
    the plan, mirroring how a keyframe index is built once and joined
    thereafter."""
    d = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary(d))


SEG_BYTES = 40
SEG_HOP = 20  # 50% overlap — the STFT/VAD windowing shape

SEGMENTS_SCHEMA = "doc_id long, seg_idx long, n_bytes long, energy long, peak long"


def segment_audio(
    multimodal: DataFrame, seg_bytes: int = SEG_BYTES, hop: int = SEG_HOP
) -> DataFrame:
    """Audio segmentation stage (the STFT/VAD-shaped op): overlapping
    fixed-size windows over the payload, per-window integer energy
    stats — a 1-row → N-row Arrow generator like ``sample_frames`` but
    with overlap (hop < window), which is what distinguishes audio
    windowing from video framing. A production build computes FFT bins
    or VAD scores per window on this same path; the stand-in emits
    only exact integers (sum/max of sample bytes) so the oracle can
    hash-check the full fan-out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, energies, peaks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                n_seg = (len(buf) - seg_bytes) // hop + 1 if len(buf) >= seg_bytes else 0
                for s in range(n_seg):
                    w = buf[s * hop : s * hop + seg_bytes]
                    ids.append(doc_id)
                    idxs.append(s)
                    ns.append(len(w))
                    energies.append(sum(w))
                    peaks.append(max(w))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "seg_idx": idxs,
                    "n_bytes": ns,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(op, schema=SEGMENTS_SCHEMA)


@register(
    "qm03_audio_segments",
    tags=("multimodal",),
    oracle=f"""
WITH segs AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
                CAST(floor((n_chars - {SEG_BYTES}) / {SEG_HOP}) AS BIGINT), 1))
           AS seg_idx
  FROM documents WHERE n_chars >= {SEG_BYTES}),
win AS (
  SELECT doc_id, seg_idx,
         substr(text, CAST(seg_idx * {SEG_HOP} + 1 AS BIGINT), {SEG_BYTES}) AS w
  FROM segs),
chars AS (
  SELECT doc_id, seg_idx, w, unnest(string_split(w, '')) AS ch FROM win)
SELECT doc_id, seg_idx,
       CAST(length(MIN(w)) AS BIGINT) AS n_bytes,
       CAST(SUM(ascii(ch)) AS BIGINT) AS energy,
       CAST(MAX(ascii(ch)) AS BIGINT) AS peak,
       ROUND(CAST(SUM(ascii(ch)) AS DOUBLE) / {SEG_BYTES}, 6) AS mean_amp
FROM chars GROUP BY doc_id, seg_idx
""",
)
def qm03_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing (L5): 40-byte windows at 20-byte hop (50%
    overlap) over each payload, per-window energy/peak, Arrow-batched.
    The oracle replays the identical windowing in SQL (ASCII corpus:
    byte == char == ascii()), hash-checking the overlap fan-out
    row-for-row. The Python stage emits ONLY exact integers; the
    rounded mean amplitude is a Spark-side expression (HALF_UP round,
    matching DuckDB — Python's banker's rounding never touches data).

    Scale: same contract as qm02 — payload bytes die inside the
    sampler; only (id, idx, small ints) re-enter the plan."""
    d = load_table(spark, sf_dir, "documents")
    segs = segment_audio(attach_binary(d))
    return segs.select(
        "*",
        F.round(F.col("energy").cast("double") / SEG_BYTES, 6).alias("mean_amp"),
    )


IMG_ROW_BYTES = 32  # treat payload as a 32-byte-wide raster
PATCH = 8           # 8×8 patches → 4 patch columns per row-block

PATCHES_SCHEMA = (
    "doc_id long, patch_y long, patch_x long, energy long, peak long"
)


def extract_patches(
    multimodal: DataFrame, row_bytes: int = IMG_ROW_BYTES, patch: int = PATCH
) -> DataFrame:
    """Image-patch extraction stage (the ViT-tokenizer-shaped op):
    treat the payload as a ``row_bytes``-wide 2-D raster and emit one
    row per non-overlapping ``patch``×``patch`` tile with integer
    energy stats. Unlike qm02/qm03's 1-D framing, each output row
    gathers STRIDED slices of the payload (8 non-contiguous runs) —
    the access pattern a real patchifier/tokenizer has. A production
    build swaps the stat for a projection of decoded pixels on this
    same Arrow path; the stand-in emits only exact integers so the
    oracle can hash-check the full 2-D fan-out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pys, pxs, energies, peaks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                h = len(buf) // row_bytes
                for py in range(h // patch):
                    for px in range(row_bytes // patch):
                        vals = []
                        for r in range(patch):
                            start = (py * patch + r) * row_bytes + px * patch
                            vals.extend(buf[start : start + patch])
                        ids.append(doc_id)
                        pys.append(py)
                        pxs.append(px)
                        energies.append(sum(vals))
                        peaks.append(max(vals))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "patch_y": pys,
                    "patch_x": pxs,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        op, schema=PATCHES_SCHEMA
    )


@register(
    "qm04_image_patches",
    tags=("multimodal",),
    oracle=f"""
WITH grid AS (
  SELECT doc_id, text, py, unnest(generate_series(0, {IMG_ROW_BYTES // PATCH} - 1)) AS px
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(0,
                  CAST(floor(floor(n_chars / {IMG_ROW_BYTES}) / {PATCH}) AS BIGINT) - 1))
             AS py
    FROM documents WHERE n_chars >= {IMG_ROW_BYTES * PATCH})),
rows_ AS (
  SELECT doc_id, py, px, text, unnest(generate_series(0, {PATCH} - 1)) AS r
  FROM grid),
cells AS (
  SELECT doc_id, py, px,
         substr(text,
                CAST((py * {PATCH} + r) * {IMG_ROW_BYTES} + px * {PATCH} + 1 AS BIGINT),
                {PATCH}) AS s
  FROM rows_),
ch AS (SELECT doc_id, py, px, unnest(string_split(s, '')) AS c FROM cells)
SELECT doc_id, py AS patch_y, px AS patch_x,
       CAST(SUM(ascii(c)) AS BIGINT) AS energy,
       CAST(MAX(ascii(c)) AS BIGINT) AS peak
FROM ch GROUP BY doc_id, py, px
""",
)
def qm04_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D patch extraction (L5, the image-shaped op): the payload as a
    32-byte-wide raster, tiled into non-overlapping 8×8 patches with
    per-patch energy/peak. The oracle replays the identical strided
    gather in SQL (ASCII corpus: byte == char == ascii()), so the 2-D
    tiling arithmetic — row stride, patch origin, tail truncation (a
    partial row-block emits nothing) — is hash-checked row-for-row.

    Scale: same contract as qm02/qm03 — payload bytes die inside the
    patchifier; only (id, grid coords, small ints) re-enter the plan,
    which is exactly how a ViT-style preprocessor feeds a training
    shard writer without ever shuffling media bytes."""
    d = load_table(spark, sf_dir, "documents")
    return extract_patches(attach_binary(d))


# ---------------------------------------------------------------------------
# qm05: modality alignment / coverage audit (docs ↔ embeddings)
# ---------------------------------------------------------------------------


@register(
    "qm05_modality_coverage",
    tags=("multimodal", "audit"),
    oracle="""
WITH j AS (
  SELECT d.source, d.doc_id, e.vec_id, e.label
  FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(vec_id) AS BIGINT) AS n_with_embedding,
       CAST(COUNT(*) - COUNT(vec_id) AS BIGINT) AS n_missing,
       ROUND(CAST(COUNT(vec_id) AS DOUBLE) / COUNT(*), 6) AS coverage,
       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
FROM j GROUP BY source
""",
)
def qm05_modality_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality alignment audit (L5 plumbing every multimodal
    pipeline runs before training: "does every text sample have its
    paired embedding/image, and where are the holes?"): per source,
    document count, how many docs have a paired vector (doc_id =
    vec_id), the missing count, coverage ratio, and the label
    diversity among the matched vectors.

    Scale shape: the pairing is one equi-join on the shared id (fact ⋈
    fact — shuffle-keyed on the id, AQE-splittable); everything after
    is source-grain. The LEFT join keeps unmatched docs so the audit
    counts holes rather than silently dropping them (the anti-join
    failure mode this audit exists to catch)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    j = d.select("source", "doc_id").join(
        e.select("vec_id", "label"), d["doc_id"] == e["vec_id"], "left"
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("vec_id").alias("n_with_embedding"),
        (F.count(F.lit(1)) - F.count("vec_id")).alias("n_missing"),
        F.round(F.count("vec_id").cast("double") / F.count(F.lit(1)), 6).alias(
            "coverage"
        ),
        F.countDistinct("label").alias("n_labels"),
    )


# ---------------------------------------------------------------------------
# qm06: media dedup over binary payloads (exact + chunk-fingerprint)
# ---------------------------------------------------------------------------

FP_EDGE_BYTES = 32  # head/tail chunk width in the cheap fingerprint


@register(
    "qm06_media_dedup",
    tags=("multimodal", "dedup"),
    oracle=f"""
WITH media AS (
  SELECT doc_id, text AS payload, CAST(length(text) AS BIGINT) AS n_bytes
  FROM documents),
fp AS (
  SELECT doc_id, n_bytes,
         md5(payload) AS exact_hash,
         md5(CAST(n_bytes AS VARCHAR) || ':' ||
             substr(payload, 1, {FP_EDGE_BYTES}) || ':' ||
             substr(payload, GREATEST(CAST(n_bytes AS INT) - {FP_EDGE_BYTES} + 1, 1),
                    {FP_EDGE_BYTES})) AS chunk_fp
  FROM media),
ec AS (SELECT exact_hash, CAST(COUNT(*) AS BIGINT) AS edf,
              MIN(doc_id) AS canonical FROM fp GROUP BY exact_hash),
cc AS (SELECT chunk_fp, CAST(COUNT(*) AS BIGINT) AS cdf FROM fp GROUP BY chunk_fp)
SELECT f.doc_id, f.n_bytes, f.chunk_fp,
       CAST(e.edf > 1 AS BIGINT) AS is_exact_dup,
       e.canonical,
       CAST(c.cdf > 1 AND e.edf = 1 AS BIGINT) AS is_near_candidate
FROM fp f JOIN ec e USING (exact_hash) JOIN cc c USING (chunk_fp)
""",
)
def qm06_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup for media payloads — the L1/L2 story applied to the
    multimodal column: exact duplicates by full-payload digest (keep
    the lowest doc_id as canonical), plus a cheap chunk fingerprint
    (length + head/tail 32-byte chunks, the CDC-style screen) that
    routes NEAR-duplicate candidates — same shell, different middle,
    e.g. re-encoded or watermarked variants — to an expensive
    perceptual compare (the qm01 decode path) without ever comparing
    full payloads pairwise.

    Scale shape: both digests are computed in the scan pass, so only
    fixed-width hashes shuffle — payload bytes never leave their
    partition (the L5 rule); dedup itself is two digest-keyed hash
    aggregations joined back at digest grain. The oracle replays both
    digests over the ASCII stand-in payloads byte-for-byte.
    """
    media = attach_binary(load_table(spark, sf_dir, "documents"))
    n_bytes = F.col("meta.n_bytes")
    fp = media.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.md5("payload").alias("exact_hash"),
        F.md5(
            F.concat(
                n_bytes.cast("string").cast("binary"),
                F.lit(":").cast("binary"),
                F.expr(f"substring(payload, 1, {FP_EDGE_BYTES})"),
                F.lit(":").cast("binary"),
                F.expr(
                    f"substring(payload, greatest(cast(meta.n_bytes as int)"
                    f" - {FP_EDGE_BYTES} + 1, 1), {FP_EDGE_BYTES})"
                ),
            )
        ).alias("chunk_fp"),
    )
    ec = fp.groupBy("exact_hash").agg(
        F.count(F.lit(1)).alias("edf"), F.min("doc_id").alias("canonical")
    )
    cc = fp.groupBy("chunk_fp").agg(F.count(F.lit(1)).alias("cdf"))
    return (
        fp.join(ec, "exact_hash")
        .join(cc, "chunk_fp")
        .select(
            "doc_id",
            "n_bytes",
            "chunk_fp",
            (F.col("edf") > 1).cast("long").alias("is_exact_dup"),
            "canonical",
            ((F.col("cdf") > 1) & (F.col("edf") == 1)).cast("long").alias(
                "is_near_candidate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# qm07: perceptual dHash near-dup candidates (banded LSH over the hash bits)
# ---------------------------------------------------------------------------

DHASH_GRID = 8        # 8 rows × 8 cols from the first 64 payload bytes
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)  # 56 gradient bits (sign-safe)
DHASH_BANDS = 4
DHASH_BAND_BITS = DHASH_BITS // DHASH_BANDS  # 14 → 16k buckets per band

DHASH_SCHEMA = "doc_id long, dhash long"


def perceptual_dhash(multimodal: DataFrame) -> DataFrame:
    """dHash stage: view the first 8×8 bytes of the payload as a tiny
    raster and set bit r·7+c when cell (r,c) < cell (r,c+1) — the
    difference-hash gradient signature real image pipelines compute on
    a downscaled grayscale (a production build downscales the decoded
    pixels on this same Arrow path; the stand-in hashes raw bytes so
    the oracle can replay it). 56 bits keeps the hash in positive
    BIGINT range."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if len(buf) < DHASH_GRID * DHASH_GRID:
                    continue
                h = 0
                for r in range(DHASH_GRID):
                    row = buf[r * DHASH_GRID : (r + 1) * DHASH_GRID]
                    for c in range(DHASH_GRID - 1):
                        if row[c] < row[c + 1]:
                            h |= 1 << (r * (DHASH_GRID - 1) + c)
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "dhash": hashes})

    return multimodal.select("doc_id", "payload").mapInPandas(
        op, schema=DHASH_SCHEMA
    )


def _dhash_sql() -> str:
    """DuckDB CTE replaying the dHash bit-for-bit from text (ASCII
    corpus: byte == ascii(char), the qm03/qm04 contract)."""
    return f"""hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN ascii(substr(text, r * {DHASH_GRID} + c + 1, 1))
                          < ascii(substr(text, r * {DHASH_GRID} + c + 2, 1))
                       THEN CAST(1 AS BIGINT) << (r * {DHASH_GRID - 1} + c)
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, {DHASH_GRID - 1})) AS r),
       LATERAL (SELECT unnest(generate_series(0, {DHASH_GRID - 2})) AS c)
  WHERE n_chars >= {DHASH_GRID * DHASH_GRID}
  GROUP BY doc_id)"""


@register(
    "qm07_perceptual_neardup",
    tags=("multimodal", "dedup"),
    oracle=f"""
WITH {_dhash_sql()},
bands AS (
  SELECT doc_id, b,
         (dhash >> (b * {DHASH_BAND_BITS})) & {2**DHASH_BAND_BITS - 1} AS bv
  FROM hashes,
       LATERAL (SELECT unnest(generate_series(0, {DHASH_BANDS - 1})) AS b)),
cand AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_bands
  FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
  WHERE a.doc_id < c.doc_id
  GROUP BY a.doc_id, c.doc_id)
SELECT cand.doc_a, cand.doc_b, cand.n_shared_bands,
       CAST(bit_count(xor(ha.dhash, hb.dhash)) AS BIGINT) AS hamming
FROM cand
JOIN hashes ha ON ha.doc_id = cand.doc_a
JOIN hashes hb ON hb.doc_id = cand.doc_b
""",
)
def qm07_perceptual_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate candidates over media payloads (L5 ∩
    L2): a 56-bit dHash gradient signature per payload, banded into
    {DHASH_BANDS}×{DHASH_BAND_BITS}-bit LSH buckets; payloads sharing
    any band bucket become candidate pairs, reported with their true
    Hamming distance — the image-dedup recipe (pHash/dHash + banding)
    beside qm06's EXACT payload digests: qm06 catches byte-identical
    re-uploads, qm07 catches re-encoded/near-identical ones (low
    Hamming) while the band join keeps it sub-quadratic.

    Scale shape (100 TB): the hash leaves the Arrow sampler as ONE
    64-bit integer per payload (payload bytes never shuffle); banding
    is a {DHASH_BANDS}× fan-out of that integer relation; candidates
    come from a band equi-join (never all-pairs — qd04's banding
    argument); the Hamming verify joins hashes back by id. Integer
    end-to-end — bit-exact cross-engine.
    """
    d = load_table(spark, sf_dir, "documents")
    hashes = perceptual_dhash(attach_binary(d))
    bands = hashes.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.expr(
                            f"(dhash >> {b * DHASH_BAND_BITS})"
                            f" & {2**DHASH_BAND_BITS - 1}"
                        ).alias("bv"),
                    )
                    for b in range(DHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", F.col("band.b").alias("b"), F.col("band.bv").alias("bv"))
    a = bands.select(F.col("doc_id").alias("doc_a"), "b", "bv")
    c = bands.select(F.col("doc_id").alias("doc_b"), "b", "bv")
    cand = (
        a.join(c, ["b", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    ha = hashes.select(F.col("doc_id").alias("doc_a"), F.col("dhash").alias("_ha"))
    hb = hashes.select(F.col("doc_id").alias("doc_b"), F.col("dhash").alias("_hb"))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_bands",
            F.expr("bit_count(_ha ^ _hb)").cast("long").alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# qm08: payload integrity audit (ingest QA over the binary column)
# ---------------------------------------------------------------------------

INTEGRITY_MIN_BYTES = 64  # payloads below this are flagged as truncated


@register(
    "qm08_payload_integrity",
    tags=("multimodal", "audit"),
    oracle=f"""
WITH m AS (
  SELECT d.source,
         length(d.text) AS n_bytes,          -- ASCII: octets == chars
         length(d.text) AS meta_bytes,       -- attach_binary meta contract
         ascii(d.text) AS head
  FROM documents d)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(CASE WHEN n_bytes <> meta_bytes THEN 1 ELSE 0 END) AS BIGINT)
         AS n_meta_mismatch,
       CAST(SUM(CASE WHEN n_bytes = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       CAST(SUM(CASE WHEN n_bytes < {INTEGRITY_MIN_BYTES} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_truncated,
       CAST(SUM(CASE WHEN head < 32 OR head > 126 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bad_head,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM m GROUP BY source
""",
)
def qm08_payload_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest QA over the binary payload column (the checks a media
    lakehouse runs BEFORE any decode spends GPU/CPU on a corrupt
    blob): per source — metadata/payload length agreement (the
    attach_binary contract), empty payloads, truncation below the
    smallest decodable size, bad magic/head bytes (here: printable
    ASCII, standing in for real magic-number checks), and the byte
    envelope. All-zero violation columns on this consistent corpus is
    the PASSING baseline the audit exists to defend — any nonzero
    after an ingest change localizes the breakage to a source.

    Scale shape (100 TB): metadata-only audit — length() and the
    FIRST byte; parquet reads the binary column but no decode runs,
    and the whole audit is ONE map-side-combinable aggregation to
    |sources| rows. The real-media variant swaps the head check for
    per-mime magic numbers on the same dataflow."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_binary(d).join(
        d.select("doc_id", "source"), "doc_id"
    ).select(
        "source",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.n_bytes").alias("meta_bytes"),
        # first payload byte as unsigned int (ASCII corpus)
        F.ascii(F.col("payload").cast("string")).alias("head"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(
            (F.col("n_bytes") != F.col("meta_bytes")).cast("int")
        ).cast("long").alias("n_meta_mismatch"),
        F.sum((F.col("n_bytes") == 0).cast("int")).cast("long").alias("n_empty"),
        F.sum(
            (F.col("n_bytes") < INTEGRITY_MIN_BYTES).cast("int")
        ).cast("long").alias("n_truncated"),
        F.sum(
            ((F.col("head") < 32) | (F.col("head") > 126)).cast("int")
        ).cast("long").alias("n_bad_head"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.sum("n_bytes").alias("total_bytes"),
    )
