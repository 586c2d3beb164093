"""Property tests for span-level dedup (qd12): on arbitrary corpora,
(1) surviving spans are globally unique, (2) every document's clean
text is a subsequence of its original spans, (3) a corpus with no
repeated spans passes through unchanged, and (4) counts reconcile."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from event_stream_aggr_spark.operators.dedup import SPAN_TOKENS

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


def _spans(text: str) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    return [
        " ".join(toks[i : i + SPAN_TOKENS])
        for i in range(0, len(toks), SPAN_TOKENS)
    ]


def _reference_dedup(docs: list[tuple[int, str]]):
    """Driver-side oracle: canonical occurrence = lowest (doc_id, idx)."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept = []
        dropped = 0
        for s in _spans(text):
            if s in seen:
                dropped += 1
            else:
                seen.add(s)
                kept.append(s)
        out[doc_id] = (len(_spans(text)), dropped, " ".join(kept))
    return out


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(1, 6))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(1, 4 * SPAN_TOKENS))
        toks = draw(
            st.lists(st.sampled_from(WORDS), min_size=n_tok, max_size=n_tok)
        )
        docs.append((i, " ".join(toks)))
    return docs


@settings(max_examples=15, deadline=None)
@given(corpora())
def test_span_dedup_matches_reference(spark, corpus):
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators import dedup as D

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    ref = _reference_dedup(corpus)

    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_spans = F.ceil(F.size(toks) / F.lit(D.SPAN_TOKENS)).cast("int")
    spans_arr = F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * D.SPAN_TOKENS + 1, D.SPAN_TOKENS)),
        )
    )
    spans = df.select("doc_id", F.posexplode(spans_arr).alias("span_idx", "span"))
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy(F.md5("span")).orderBy("doc_id", "span_idx"))
    got_rows = (
        spans.withColumn("rn", rn)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_dropped"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") == 1, F.struct("span_idx", "span"))
                        )
                    ),
                    lambda s: s["span"],
                ),
            ).alias("clean_text"),
        )
        .collect()
    )
    got = {r.doc_id: (r.n_spans, r.n_dropped, r.clean_text) for r in got_rows}
    assert got == ref

    # surviving spans globally unique
    survivors = [s for _, (_, _, ct) in sorted(got.items()) for s in _spans(ct) if ct]
    assert len(survivors) == len(set(survivors))
