"""Property-based tests for the training-pipeline operators: packing,
chunking, and decontamination hold their invariants for ARBITRARY
corpora, not just the synthetic tables. Each property is checked by
driving the same Spark expressions the registered queries use."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.dedup import ngram_hashes
from event_stream_aggr_spark.operators.packing import pack_assignments

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)


@given(docs=_corpus, budget=st.integers(min_value=1, max_value=30))
@_settings
def test_packing_partitions_every_doc_exactly_once(spark, docs, budget):
    rows = [Row(source="s", doc_id=i, text=t) for i, t in enumerate(docs)]
    placed = pack_assignments(spark.createDataFrame(rows), budget=budget).collect()
    # exhaustive and disjoint: every doc appears once with one pack id
    assert sorted(r.doc_id for r in placed) == list(range(len(docs)))
    by_id = {r.doc_id: r for r in placed}
    # offsets are the prefix sums in doc_id order; packs are monotone
    offset = 0
    prev_pack = 0
    for i in range(len(docs)):
        r = by_id[i]
        assert r.start_offset == offset
        assert r.pack_id == offset // budget
        assert r.pack_id >= prev_pack
        offset += r.n_tokens
        prev_pack = r.pack_id


@given(docs=_corpus, n=st.integers(min_value=2, max_value=6))
@_settings
def test_ngram_count_invariant(spark, docs, n):
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    got = (
        spark.createDataFrame(rows)
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("n_tok"),
            F.size(ngram_hashes(F.col("text"), n)).alias("n_grams"),
        )
        .collect()
    )
    for r in got:
        # max(len - n + 1, 0) positional n-grams, never negative
        assert r.n_grams == max(r.n_tok - n + 1, 0)


@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=50).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    size=st.integers(min_value=2, max_value=10),
)
@_settings
def test_chunking_covers_all_tokens_without_gaps(spark, docs, size):
    stride = max(size - 1, 1)  # overlap of 1
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    d = spark.createDataFrame(rows)
    t = F.filter(F.split("text", " "), lambda x: x != "")
    n_full = F.floor(
        F.greatest(F.size(t) - size, F.lit(0)) / F.lit(float(stride))
    )
    has_tail = F.when(
        (F.greatest(F.size(t) - size, F.lit(0)) % stride) > 0, 1
    ).otherwise(0)
    chunks = (
        d.select("doc_id", t.alias("t"), (n_full + has_tail).alias("last"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            F.size("t").alias("n_tok"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("last").cast("long"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            "n_tok",
            "i",
            (F.col("i") * stride).alias("start"),
            F.least(F.col("i") * stride + size, F.col("n_tok")).alias("end"),
        )
        .collect()
    )
    per_doc: dict[int, list] = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.i)
        n_tok = rs[0].n_tok
        # first chunk starts at 0; consecutive chunks overlap (no gap);
        # the last chunk reaches the final token
        assert rs[0].start == 0
        for a, b in zip(rs, rs[1:]):
            assert b.start <= a.end  # no token falls between chunks
        assert rs[-1].end == n_tok
        assert rs[-1].start < n_tok
