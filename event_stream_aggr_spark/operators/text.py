"""Text-analysis operators (SURVEY.md §2.10 L4): token statistics,
quality scoring, language-ID signal, document fingerprinting.

All of these are whole-stage-codegen'd array/string builtins — no
Python in the row path — so at 100 TB they run at parquet-scan speed
and only the tiny per-group aggregates shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_aggr_spark.plans.registry import register
from event_stream_aggr_spark.tables import load_table

#: Tiny built-in stopword lists for the language-ID heuristic
#: (n-gram/stopword-hit scoring; real pipelines plug fastText etc. via
#: a pandas UDF — see operators/multimodal.py for that pattern).
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Non-empty whitespace tokens."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def tokenized_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared retrieval-side corpus stage: ``(doc_id, dl, toks)``
    for every document, tokenized ONCE per (session, corpus) via
    ``memoized_stage`` (the k-means-stage recipe, r5 VERDICT ask #5).

    qt17 / qr01 / qr02 each start from this relation — previously each
    re-ran the parquet scan + lowercase + split for its own BM25
    df/idf pass; now the composed text-retrieval path pays the corpus
    scan once and every later pass reads the materialized token
    arrays. The 100 TB analogue is the tokenized corpus as a
    materialized table (the index-build intermediate every retrieval
    stack persists) with the per-query term filters running over it.
    Value-identical to recomputation, so consumers' oracles (which
    re-derive it relationally) are unaffected.
    """
    from event_stream_aggr_spark.operators.stagecache import memoized_stage

    d = load_table(spark, sf_dir, "documents")
    src = d.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
    return memoized_stage(
        "bm25_tokenized_corpus",
        src,
        lambda: src.select(
            "doc_id", F.size("toks").cast("long").alias("dl"), "toks"
        ),
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_hits(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Count of tokens that are stopwords (with repeats — a ratio
    denominator-compatible count, not a distinct intersection)."""
    sw = list(stopwords)
    return F.size(F.filter(tokens(text), lambda x: x.isin(sw))).cast("long")


def quality_score(text: Column) -> Column:
    """Cheap quality heuristic: mean token length in [3, 10] and
    stopword ratio > 0 score positively. Deterministic rational math."""
    n_tok = token_count(text)
    mean_len = (F.length(text) - n_tok + 1).cast("double") / n_tok
    sw_ratio = stopword_hits(text).cast("double") / n_tok
    return (
        F.when((mean_len >= 3) & (mean_len <= 10), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(sw_ratio > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (the classic shingle-set fingerprint)."""
    sorted_toks = F.array_sort(F.array_distinct(tokens(F.lower(text))))
    return F.md5(F.array_join(sorted_toks, " "))


# ---------------------------------------------------------------------------
# Registered oracle-checked queries
# ---------------------------------------------------------------------------


@register(
    "qt01_text_stats",
    bench=True,
    tags=("text",),
    oracle="""
WITH per_doc AS (
  SELECT lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens,
         n_chars
  FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM per_doc GROUP BY lang
""",
)
def qt01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-language corpus statistics (L4)."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select("lang", token_count(F.col("text")).alias("n_tokens"), "n_chars")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@register(
    "qt02_stopword_language_signal",
    tags=("text",),
    oracle=f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN {STOPWORDS_EN!r})) AS DOUBLE)
           / len(list_filter(string_split(text, ' '), x -> x <> ''))
           AS sw_ratio
  FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(SUM(sw_ratio) / COUNT(*), 6) AS avg_stopword_ratio
FROM per_doc GROUP BY lang
""",
)
def qt02_stopword_language_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID signal (L4): stopword-hit ratio per document,
    averaged per labeled language (the feature a langid classifier
    thresholds on)."""
    d = load_table(spark, sf_dir, "documents")
    ratio = stopword_hits(F.col("text")).cast("double") / token_count(F.col("text"))
    per_doc = d.select("lang", ratio.alias("sw_ratio"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("sw_ratio") / F.count(F.lit(1)), 6).alias("avg_stopword_ratio"),
    )


@register(
    "qt03_fingerprints",
    tags=("text",),
    oracle="""
WITH fp AS (
  SELECT source,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split(lower(text), ' '), x -> x <> ''))), ' '))
           AS fingerprint
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT fingerprint) AS n_unique_fingerprints
FROM fp GROUP BY source
""",
)
def qt03_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (L4): sorted-distinct-token md5 → unique
    content count per source."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique_fingerprints"),
        )
    )


@register(
    "qt04_quality_scores",
    tags=("text",),
    oracle=f"""
WITH per_doc AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tok,
         CAST(length(text) AS BIGINT) AS n_len,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN {STOPWORDS_EN!r})) AS BIGINT) AS sw
  FROM documents),
scored AS (
  SELECT CAST(
           CASE WHEN (CAST(n_len - n_tok + 1 AS DOUBLE) / n_tok) >= 3
                 AND (CAST(n_len - n_tok + 1 AS DOUBLE) / n_tok) <= 10
                THEN 0.5 ELSE 0.0 END
         + CASE WHEN sw > 0 THEN 0.5 ELSE 0.0 END AS DOUBLE) AS quality
  FROM per_doc)
SELECT quality, COUNT(*) AS n_docs FROM scored GROUP BY quality
""",
)
def qt04_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score distribution. The score is pure rational math
    (mean token length in [3, 10] + stopword-ratio > 0, each worth
    0.5), so the oracle recomputes it exactly; per-score doc counts
    hash-compare."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", quality_score(F.col("text")).alias("quality"))
        .groupBy("quality")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "qt05_bpe_style_token_counts",
    tags=("text",),
    oracle=r"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(lower(text),
            '[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS BIGINT) AS total_subword_tokens,
       CAST(SUM(len(regexp_extract_all(lower(text),
            '[a-z]+|[0-9]+|[^a-z0-9\s]+'))) AS DOUBLE) / COUNT(*)
         AS avg_subword_tokens
FROM documents GROUP BY lang
""",
)
def qt05_bpe_style_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counting (L4): a pre-tokenizer regex (letter
    runs | digit runs | punctuation runs — the GPT-2-style split
    classes) as a cost proxy for real BPE. Pure regexp_extract_all,
    codegen'd; a real tokenizer would slot in as a pandas UDF on the
    same column."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0
        )
    ).cast("long")
    per_doc = d.select("lang", n_tok.alias("n_tok"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_subword_tokens"),
        (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_subword_tokens"),
    )


@register(
    "qt06_repetition_stats",
    tags=("text",),
    oracle="""
WITH per_doc AS (
  SELECT lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tok,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                            x -> x <> ''))) AS BIGINT) AS n_dist
  FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_dist) AS BIGINT) AS total_distinct,
       1 - CAST(SUM(n_dist) AS DOUBLE) / SUM(n_tok) AS corpus_repetition,
       MAX(1 - CAST(n_dist AS DOUBLE) / n_tok) AS max_doc_repetition
FROM per_doc GROUP BY lang
""",
)
def qt06_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (L4): repeated-token ratio per document
    (1 - distinct/total), aggregated per language — the signal used to
    drop boilerplate/spam from training corpora.

    Determinism: the corpus ratio is ONE division of two exact integer
    sums; the per-doc max is a max over single-division doubles —
    both order-independent, so no rounding is needed anywhere."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize once; the two consumers below reference the attribute
    per_doc = d.select("lang", tokens(F.col("text")).alias("ts")).select(
        "lang",
        F.size("ts").cast("long").alias("n_tok"),
        F.size(F.array_distinct("ts")).cast("long").alias("n_dist"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_dist").alias("total_distinct"),
        (
            F.lit(1) - F.sum("n_dist").cast("double") / F.sum("n_tok")
        ).alias("corpus_repetition"),
        F.max(
            F.lit(1) - F.col("n_dist").cast("double") / F.col("n_tok")
        ).alias("max_doc_repetition"),
    )


VOCAB_K = 20


@register(
    "qt07_vocab_oov_rate",
    tags=("text",),
    oracle=f"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS n FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT {VOCAB_K})),
flagged AS (
  SELECT lang,
         CASE WHEN token IN (SELECT token FROM vocab) THEN 1 ELSE 0 END AS iv
  FROM toks)
SELECT lang,
       COUNT(*) AS total_tokens,
       CAST(SUM(iv) AS BIGINT) AS in_vocab_tokens,
       CAST(COUNT(*) - SUM(iv) AS DOUBLE) / COUNT(*) AS oov_rate
FROM flagged GROUP BY lang
""",
)
def qt07_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary pruning (L4): build the top-K corpus vocabulary
    (count desc, token asc — unique tiebreak), broadcast it back, and
    measure the out-of-vocabulary occurrence rate per language — the
    tokenizer-coverage metric of a training pipeline.

    Scale shape: the vocab is a K-row broadcast; the token stream never
    shuffles for the membership test (map-side join), only the tiny
    per-lang partial sums shuffle. The OOV rate is one division of
    exact integer sums → deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(VOCAB_K)
        .select("token", F.lit(1).alias("iv"))
    )
    flagged = toks.join(F.broadcast(vocab), "token", "left").select(
        "lang", F.coalesce(F.col("iv"), F.lit(0)).alias("iv")
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum("iv").cast("long").alias("in_vocab_tokens"),
        (
            (F.count(F.lit(1)) - F.sum("iv")).cast("double") / F.count(F.lit(1))
        ).alias("oov_rate"),
    )


@register(
    "qt08_bigram_counts",
    tags=("text",),
    oracle="""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
bi AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks)
SELECT bigram, COUNT(*) AS n
FROM bi GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 50
""",
)
def qt08_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language-model statistics (L4): top-50 corpus bigrams.
    The bigram construction is a pure array expression (sequence +
    transform over the token array — narrow, codegen'd, no shuffle);
    only per-bigram partial counts shuffle, proportional to vocab² at
    worst, not corpus size. Counts are integers → fully deterministic,
    with the bigram string as the unique tiebreaker."""
    d = load_table(spark, sf_dir, "documents")
    # size(t) < 2 guard: Spark's sequence(1, 0) DESCENDS (it is not
    # empty like DuckDB's generate_series), which would index t[0] and
    # throw under ANSI — single-token docs must be filtered out, which
    # also matches the oracle (empty list → no rows).
    bigrams = (
        d.select(tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                )
            ).alias("bigram")
        )
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


TFIDF_TOP_K = 3


@register(
    "qt09_tfidf_top_terms",
    tags=("text",),
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term) AS BIGINT) AS rank
  FROM scored)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
""",
)
def qt09_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (L4): top-3 characteristic terms per
    document — the classic relevance/topic signal a curation pipeline
    attaches before filtering or clustering.

    Scale dataflow: one shuffle builds per-(doc, term) counts; document
    frequency re-aggregates THAT relation (vocab-sized, tiny) and
    broadcasts back, so the token stream shuffles exactly once. The
    corpus size N joins as a broadcast 1-row literal. Per-doc top-k is
    a window over the (doc, term) relation — partitioned by doc_id, no
    global sort. ln() is the one transcendental: rounded to 6 decimals
    in both engines (the qe01/qe02 float recipe), term as tiebreaker.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.select(
            "*", F.row_number().over(w).cast("long").alias("rank")
        ).filter(F.col("rank") <= TFIDF_TOP_K)
    )


CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@register(
    "qt10_overlap_chunks",
    tags=("text",),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
chunks AS (
  SELECT doc_id,
         CAST(s.i AS BIGINT) AS chunk_idx,
         t[(s.i * {CHUNK_STRIDE} + 1):
           (s.i * {CHUNK_STRIDE} + {CHUNK_SIZE})] AS chunk
  FROM toks,
       LATERAL (SELECT unnest(generate_series(
           0, CAST(FLOOR(GREATEST(len(t) - {CHUNK_SIZE}, 0)
                         / {CHUNK_STRIDE}.0) AS BIGINT)
           + CASE WHEN (GREATEST(len(t) - {CHUNK_SIZE}, 0)
                        % {CHUNK_STRIDE}) > 0 THEN 1 ELSE 0 END
           + CASE WHEN len(t) = 0 THEN -1 ELSE 0 END)) AS i) s)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS BIGINT) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def qt10_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the RAG / pretraining
    chunker): 64-token windows with stride 48 (16-token overlap), each
    chunk addressed by (doc_id, chunk_idx) and content-hashed.

    Chunk count per doc is ceil(max(len-size,0)/stride)+1 — every token
    is covered and the final window is allowed to be short. The window
    construction is a pure array expression (sequence -> slice): narrow,
    codegen'd, zero shuffle; only the ordered output presentation
    shuffles. The md5 chunk hash doubles as the dedup identity for
    chunk-level exact dedup downstream (feed to qd01's hash-groupBy).
    """
    d = load_table(spark, sf_dir, "documents")
    # tokenize once behind a projection boundary; last_idx's two
    # size() consumers then read the attribute instead of re-splitting
    toked = d.select("doc_id", tokens(F.col("text")).alias("t"))
    n_full = F.floor(
        F.greatest(F.size("t") - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
    )
    has_tail = F.when(
        (F.greatest(F.size("t") - CHUNK_SIZE, F.lit(0)) % CHUNK_STRIDE) > 0, 1
    ).otherwise(0)
    last_idx = (n_full + has_tail).cast("long")
    # size(t) > 0 guard: Spark's sequence(0, -1) DESCENDS instead of
    # returning empty (unlike DuckDB's generate_series), so token-less
    # docs must be filtered out — which matches the oracle (its
    # len(t)=0 branch yields an empty series -> no rows).
    chunks = toked.select(
        "doc_id", "t", last_idx.alias("last_idx")
    ).filter(F.size("t") > 0).select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("last_idx"))
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(
            F.col("t"),
            (F.col("chunk_idx") * CHUNK_STRIDE + 1).cast("int"),
            CHUNK_SIZE,
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "qt11_char_entropy",
    tags=("text", "quality"),
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
counts AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n_c
  FROM chars WHERE ch <> '' GROUP BY doc_id, ch),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(n_c) AS BIGINT) AS n,
         SUM(n_c * ln(n_c)) AS s
  FROM counts GROUP BY doc_id)
SELECT doc_id,
       ROUND(ln(CAST(n AS DOUBLE)) - s / n, 6) AS char_entropy
FROM per_doc
ORDER BY char_entropy, doc_id LIMIT 20
""",
)
def qt11_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality score (L4): Shannon entropy of the
    per-document character distribution, lowest-20 (the repetitive /
    degenerate docs a quality filter would drop — the cheap proxy for
    a perplexity filter).

    H = ln(n) - sum(n_c ln n_c)/n from exact integer char counts, so
    the only float work is one ln per distinct char; rounded to 6
    (registry float rule — the sum over <=alphabet-size terms is
    order-dependent in the last bits only). Scale: the shuffle carries
    (doc_id, char) counts — bounded by alphabet size per doc, ~100
    bytes/doc regardless of document length; top-k plans as
    TakeOrderedAndProject, never a global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n_c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("n_c").alias("n"),
        F.sum(F.col("n_c") * F.log("n_c")).alias("s"),
    )
    return (
        per_doc.select(
            "doc_id",
            F.round(
                F.log(F.col("n").cast("double")) - F.col("s") / F.col("n"), 6
            ).alias("char_entropy"),
        )
        .orderBy("char_entropy", "doc_id")
        .limit(20)
    )


@register(
    "qt12_unigram_logprob",
    tags=("text", "quality"),
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
per_doc AS (
  SELECT doc_id,
         SUM(ln(CAST(c AS DOUBLE) / t)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM toks JOIN cnt USING (tok) CROSS JOIN tot
  GROUP BY doc_id)
SELECT doc_id, n AS n_tokens, ROUND(s / n, 6) AS avg_logp
FROM per_doc ORDER BY avg_logp, doc_id LIMIT 20
""",
)
def qt12_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model score (L4): per-document mean token
    log-probability under the corpus's own unigram distribution — the
    cheap, trainable-model-free stand-in for a perplexity quality
    filter (low avg_logp = rare-token-heavy docs). Lowest-20 reported.

    Two-pass broadcast-calibration dataflow (ARCHITECTURE rule 11):
    pass 1 aggregates the corpus unigram counts (vocab-sized — KBs even
    at 100 TB for whitespace tokens worth keeping); pass 2 joins the
    broadcast counts back onto the token stream map-side and reduces to
    the document grain — the token stream shuffles exactly once, to
    doc_id. Per-doc float sums rounded to 6 (registry float rule)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("t"))
    per_doc = (
        toks.join(F.broadcast(cnt), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.log(F.col("c").cast("double") / F.col("t"))).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.round(F.col("s") / F.col("n"), 6).alias("avg_logp"),
        )
        .orderBy("avg_logp", "doc_id")
        .limit(20)
    )


#: Literal char-bigram profiles for the n-gram language-ID heuristic.
#: Integer weights → exact scores, replayable verbatim in the SQL
#: oracle. Real pipelines swap in trained profiles (fastText etc. via
#: the pandas-UDF edge); the *dataflow* is what this operator pins.
LANGID_PROFILES: tuple[tuple[str, str, int], ...] = (
    ("en", "th", 5), ("en", "he", 4), ("en", "in", 3), ("en", "er", 2),
    ("en", "an", 2), ("en", "re", 2),
    ("de", "ch", 5), ("de", "en", 4), ("de", "ei", 3), ("de", "de", 2),
    ("de", "un", 2), ("de", "ge", 2),
    ("fr", "le", 5), ("fr", "es", 4), ("fr", "ou", 3), ("fr", "qu", 3),
    ("fr", "ai", 2), ("fr", "nt", 2),
    ("es", "la", 5), ("es", "el", 4), ("es", "os", 3), ("es", "ue", 3),
    ("es", "ar", 2), ("es", "en", 2),
)


def _langid_profile_values_sql() -> str:
    rows = ", ".join(f"('{l}', '{b}', {w})" for l, b, w in LANGID_PROFILES)
    return f"(VALUES {rows}) profiles(lang, bigram, w)"


@register(
    "qt13_language_id",
    bench=True,
    tags=("text", "langid"),
    oracle=f"""
WITH grams AS (
  SELECT doc_id, substr(lower(text), CAST(i AS INTEGER), 2) AS bigram
  FROM documents,
       LATERAL (SELECT unnest(range(1, CAST(length(text) AS BIGINT))) AS i) g
  WHERE length(text) >= 2),
scored AS (
  SELECT doc_id, lang, CAST(SUM(w) AS BIGINT) AS score
  FROM grams JOIN {_langid_profile_values_sql()} USING (bigram)
  GROUP BY doc_id, lang),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM scored)
SELECT d.doc_id,
       COALESCE(b.lang, 'und') AS pred_lang,
       COALESCE(b.score, 0) AS score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
""",
)
def qt13_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language identification (L4): score each document's
    char-bigram stream against small per-language profile tables and
    emit the argmax language ('und' when no profiled bigram occurs).
    The standard pre-fastText langid heuristic; on this synthetic
    corpus the prediction is a deterministic function of the text,
    which is exactly what the oracle pins.

    Scale shape (100 TB): ZERO shuffle, ZERO join, ZERO explode — a
    single codegen'd projection pass. Because every profiled bigram
    has two distinct characters (asserted below), its occurrences
    cannot self-overlap, so count(b in lt) is exactly
    (len(lt) − len(replace(lt, b, ''))) div 2 — per-language scores
    are literal-weighted sums of 24 replace-counts, computed inline
    per row. The earlier phrasing (bigram explode → broadcast-profile
    join → doc-grain conditional-sum agg) shuffled |chars| rows per
    doc; this one touches each row once and emits 3 columns. With
    TRAINED profiles (thousands of n-grams) the explode+join dataflow
    is the right one again — the cutover point is profile size, and
    both ends are pinned here (qt13 inline; qt12/qt22 join-based).
    Integer weights → exact scores, no float anywhere."""
    # round 16: opt IN to the adaptive scan parallelization — this is a
    # compute-bound zero/low-shuffle scan pass (paired A/B win; see
    # tables.PARALLELIZE_DEFAULT_ON for why documents is opt-in)
    d = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    # Materialize lower(text) behind a projection boundary: it feeds
    # all 24 replace() calls, and CollapseProject would otherwise
    # inline the lower() into every one.
    lowered = d.select("doc_id", F.lower(F.col("text")).alias("lt"))
    langs = sorted({lang for lang, _b, _w in LANGID_PROFILES})

    def count_bigram(b: str) -> F.Column:
        assert b[0] != b[1], "self-overlapping bigram breaks replace-count"
        return F.expr(f"(length(lt) - length(replace(lt, '{b}', ''))) div 2")

    scores = {
        lg: sum(
            (count_bigram(b) * w for l, b, w in LANGID_PROFILES if l == lg),
            F.lit(0),
        ).cast("long")
        for lg in langs
    }
    scored = lowered.select(
        "doc_id", *[scores[lg].alias(f"s_{lg}") for lg in langs]
    )
    # argmax with ties → alphabetically-first language: max over
    # (score, -ord) structs; all-zero scores → no profiled bigram
    # occurred → 'und' (weights are positive, so any hit scores > 0)
    cands = F.array(
        *[
            F.struct(
                F.col(f"s_{lg}").alias("score"),
                F.lit(-i).alias("nord"),
                F.lit(lg).alias("lang"),
            )
            for i, lg in enumerate(langs)
        ]
    )
    return scored.select(
        "doc_id", F.array_max(cands).alias("top")
    ).select(
        "doc_id",
        F.when(F.col("top.score") == 0, F.lit("und"))
        .otherwise(F.col("top.lang"))
        .alias("pred_lang"),
        F.col("top.score").alias("score"),
    )


@register(
    "qt14_quality_filter",
    bench=True,
    tags=("text", "quality"),
    oracle="""
WITH stats AS (
  SELECT doc_id,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(ts, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop,
         CAST(length(array_to_string(ts, '')) AS BIGINT) AS sum_len,
         CAST((SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM unnest(ts) AS u(tok) GROUP BY tok)) AS BIGINT) AS max_tok
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
        FROM documents)),
flags AS (
  SELECT doc_id, n_tokens,
         (n_tokens BETWEEN 50 AND 100000) AS ok_length,
         (sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens) AS ok_mean_tok,
         (n_stop * 50 >= 3 * n_tokens) AS ok_stopwords,
         (max_tok * 5 <= n_tokens) AS ok_repetition
  FROM stats WHERE n_tokens > 0)
SELECT doc_id, n_tokens,
       (ok_length AND ok_mean_tok AND ok_stopwords AND ok_repetition) AS keep,
       concat_ws(',',
         CASE WHEN NOT ok_length THEN 'length' END,
         CASE WHEN NOT ok_mean_tok THEN 'mean_tok' END,
         CASE WHEN NOT ok_stopwords THEN 'stopwords' END,
         CASE WHEN NOT ok_repetition THEN 'repetition' END) AS reject_reasons
FROM flags
""",
)
def qt14_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality filter (L4, the Gopher-rules shape):
    length window, mean-token-length window, minimum stopword ratio,
    and a max-single-token-frequency repetition cap — emitted as a
    keep/reject decision plus the list of violated rules (the audit
    trail a curation pipeline keeps alongside the drop).

    Every rule is evaluated in exact integer arithmetic (e.g. the
    6% stopword floor is ``n_stop * 50 >= 3 * n_tokens``) — no float
    thresholds, so both engines agree bit-for-bit. Scale shape: a
    ZERO-shuffle scan pass — every stat including the repetition cap
    is an array expression (max token frequency = longest run in the
    sorted token array, a run-length fold instead of exploding and
    shuffling the token stream). The filter emits every doc with its
    verdict; the downstream pipeline applies ``WHERE keep``."""
    # round 16: opt IN to the adaptive scan parallelization — this is a
    # compute-bound zero/low-shuffle scan pass (paired A/B win; see
    # tables.PARALLELIZE_DEFAULT_ON for why documents is opt-in)
    d = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    # Tokenize ONCE behind a projection boundary: the four consumers
    # below would otherwise each re-split the document (4× the split
    # cost per row; CollapseProject won't inline a non-trivial expr
    # used this many times).
    toked = d.select("doc_id", tokens(F.col("text")).alias("ts"))
    # max single-token frequency WITHOUT shuffling the token stream:
    # sort the token array and fold a (prev, run, best) accumulator
    # over it — equal tokens are adjacent after the sort, so the
    # longest run IS the max frequency. O(n log n) CPU per row beats
    # exploding and shuffling |tokens| rows twice at any corpus size;
    # the whole filter becomes a zero-shuffle scan pass. (The lambda
    # reads only its own arguments — rule 19 safe.)
    run_state = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def _runmax(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_tok = F.aggregate(
        F.array_sort("ts"), run_state, _runmax, lambda acc: acc["best"]
    )
    per_tok = toked.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        F.size(
            F.filter("ts", lambda x: x.isin(list(STOPWORDS_EN)))
        ).cast("long").alias("n_stop"),
        F.length(F.concat_ws("", F.col("ts"))).cast("long").alias("sum_len"),
        max_tok.alias("max_tok"),
    )
    flags = per_tok.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        F.col("n_tokens").between(50, 100000).alias("ok_length"),
        (
            (F.col("sum_len") >= 3 * F.col("n_tokens"))
            & (F.col("sum_len") <= 10 * F.col("n_tokens"))
        ).alias("ok_mean_tok"),
        (F.col("n_stop") * 50 >= 3 * F.col("n_tokens")).alias("ok_stopwords"),
        (F.col("max_tok") * 5 <= F.col("n_tokens")).alias("ok_repetition"),
    )
    reason = F.concat_ws(
        ",",
        F.when(~F.col("ok_length"), F.lit("length")),
        F.when(~F.col("ok_mean_tok"), F.lit("mean_tok")),
        F.when(~F.col("ok_stopwords"), F.lit("stopwords")),
        F.when(~F.col("ok_repetition"), F.lit("repetition")),
    )
    return flags.select(
        "doc_id",
        "n_tokens",
        (
            F.col("ok_length")
            & F.col("ok_mean_tok")
            & F.col("ok_stopwords")
            & F.col("ok_repetition")
        ).alias("keep"),
        reason.alias("reject_reasons"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (the scrubbing pass a public-web corpus runs
# before anything else; Dolma/C4-style regex family)
# ---------------------------------------------------------------------------

#: Deliberately simple patterns that parse identically under Java regex
#: (Spark) and RE2 (DuckDB): no lookarounds, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) match counts — codegen'd regex over
    the scan, no shuffle."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).cast("long"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).cast("long"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).cast("long"),
    )


def redact_pii(text: Column) -> Column:
    """Replace every email/phone/IPv4 match with a typed placeholder.
    Email first: its character class covers digits and dots, so a
    consumed address can't partially re-match as an IP."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")


@register(
    "qt15_pii_redaction",
    tags=("text", "pii"),
    oracle=f"""
WITH contact AS (
  SELECT c_custkey,
         'Reach ' || c_name || ' at ' || lower(replace(c_name, '#', '')) ||
         '@example.com or 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
         '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
         ' from 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.0.' ||
         CAST(c_custkey % 100 AS VARCHAR) AS txt
  FROM customer)
SELECT c_custkey AS cust_id,
       CAST(len(regexp_extract_all(txt, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(txt, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(txt, '{PII_IPV4}')) AS BIGINT) AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(txt, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IPV4}', '<IP>', 'g') AS redacted
FROM contact
""",
)
def qt15_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (L4): email / phone / IPv4 detection counts and typed
    redaction. The synthetic corpus carries no organic PII, so the
    fixture text is constructed deterministically from customer columns
    — the regex machinery under test is exactly what a web corpus
    scrub runs; real-PII-shaped inputs are unit-tested in
    tests/test_text.py::test_redact_pii_on_real_shapes.

    Scale shape: pure per-row regex over the scan — zero shuffle, whole
    -stage codegen; the three patterns are literal-prefix-free so the
    cost is one linear pass each over the row's bytes."""
    c = load_table(spark, sf_dir, "customer")
    txt = F.concat(
        F.lit("Reach "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit(".0."),
        (F.col("c_custkey") % 100).cast("string"),
    )
    base = c.select(F.col("c_custkey").alias("cust_id"), txt.alias("txt"))
    n_emails, n_phones, n_ips = pii_counts(F.col("txt"))
    return base.select(
        "cust_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        redact_pii(F.col("txt")).alias("redacted"),
    )


@register(
    "qt16_data_card",
    tags=("text", "report"),
    oracle="""
WITH sl AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_l,
         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS tok_l
  FROM documents GROUP BY source, lang),
per_source AS (
  SELECT source,
         CAST(SUM(n_l) AS BIGINT) AS n_docs,
         CAST(SUM(tok_l) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         ROUND(ln(CAST(SUM(n_l) AS DOUBLE))
               - SUM(n_l * ln(n_l)) / SUM(n_l), 6) AS lang_entropy
  FROM sl GROUP BY source),
top AS (
  SELECT source, lang AS top_lang,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_l DESC, lang) AS rn
  FROM sl),
tot AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS corpus_tokens FROM per_source)
SELECT p.source, p.n_docs, p.total_tokens,
       ROUND(CAST(p.total_tokens AS DOUBLE) / t.corpus_tokens, 6) AS token_share,
       p.n_langs, tp.top_lang, p.lang_entropy
FROM per_source p
JOIN top tp ON p.source = tp.source AND tp.rn = 1
CROSS JOIN tot t
""",
)
def qt16_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card (L4 reporting): the mixture table a
    training run is configured from — document and token counts, each
    source's share of corpus tokens, language diversity (distinct
    langs + Shannon entropy of the language mix), and the dominant
    language. This is the "datasheet" aggregation every curation
    pipeline publishes alongside the corpus.

    Scale shape (100 TB): one shuffle to (source, lang) grain —
    partial-aggregated map-side, output rows = |sources| x |langs|,
    KB-scale — and everything downstream (per-source rollup, top-lang
    window, corpus-total broadcast) operates on that tiny relation.
    The corpus total rides the 1-row broadcast crossJoin (the
    scalar-threshold pattern). Entropy follows qt11's recipe: ln over
    exact integer counts, rounded to 6."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.sum(token_count(F.col("text"))).alias("tok_l"),
    )
    per_source = sl.groupBy("source").agg(
        F.sum("n_l").alias("n_docs"),
        F.sum("tok_l").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
        F.round(
            F.log(F.sum("n_l").cast("double"))
            - F.sum(F.col("n_l") * F.log("n_l")) / F.sum("n_l"),
            6,
        ).alias("lang_entropy"),
    )
    wt = W.partitionBy("source").orderBy(F.col("n_l").desc(), F.col("lang"))
    top = (
        sl.select("source", "lang", F.row_number().over(wt).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    tot = per_source.agg(F.sum("total_tokens").alias("corpus_tokens"))
    return (
        per_source.join(top, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("corpus_tokens"), 6
            ).alias("token_share"),
            "n_langs",
            "top_lang",
            "lang_entropy",
        )
    )


# ---------------------------------------------------------------------------
# qt17: BM25 relevance scoring (the retrieval-side ranking function)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "vector", "stream")
#: single SQL-side definition of the query-term set, interpolated into
#: every oracle that filters on it — the Spark side reads BM25_TERMS
#: directly, so an edit to the tuple can never desync the two engines
#: (round-7 ADVICE: qr03 previously hardcoded the terms in its oracle).
BM25_TERMS_SQL = ", ".join("'%s'" % t for t in BM25_TERMS)


@register(
    "qt17_bm25_scores",
    bench=True,
    tags=("text", "retrieval"),
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS dl,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl
  FROM docs),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, dl, unnest(toks) AS term FROM docs) u
  WHERE term IN ({BM25_TERMS_SQL})
  GROUP BY doc_id, dl, term),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
           * (tf.tf * CAST({BM25_K1} + 1 AS DOUBLE))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl
              / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
           * 1000000) AS BIGINT) AS score_us
  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(score_us) AS DOUBLE) / 1000000 AS bm25
FROM scored GROUP BY doc_id
""",
)
def qt17_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring (L4, the retrieval ranking function):
    Lucene-style BM25 (k1=1.2, b=0.75, idf = ln((N-df+.5)/(df+.5)+1))
    of every document against a fixed query-term set — the scoring
    half of a sparse retrieval stack (qe0x cover the dense half).

    Scale dataflow: document length comes from ``size()`` on the token
    array — no explode, no shuffle. The token stream is filtered to
    QUERY TERMS BEFORE the tf shuffle, so the wide exchange carries
    only |docs|·|query| rows, not the corpus token stream; corpus
    stats (N, Σdl) and per-term df are KB-scale broadcasts back onto
    it. Per-term scores convert to integer micro-units BEFORE the
    per-doc sum (qe06's recipe) so the 3-term accumulation is
    order-free; ln() is the one transcendental (qt09's precedent).
    The tokenized corpus itself comes from the memoized shared stage
    (tokenized_corpus) — one scan per session/corpus across the whole
    qt17/qr01/qr02 retrieval path."""
    docs = tokenized_corpus(spark, sf_dir)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # measured decision: an arrays_overlap doc prefilter before the
    # explode was tried and REVERTED — 96% of docs contain a query
    # term at this corpus, so it pruned ~nothing and paid a second
    # full array scan (warm qt17 0.55s -> 1.0s). Worth re-adding only
    # for rare query terms.
    tf = (
        docs.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score_us = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        * (F.col("tf") * (BM25_K1 + 1))
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl))
        * 1000000
    ).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score_us.alias("score_us"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.sum("score_us").cast("double") / 1000000).alias("bm25"),
    )


# ---------------------------------------------------------------------------
# qt18: BPE merge-step pair counting (tokenizer-training's inner loop)
# ---------------------------------------------------------------------------

BPE_TOP_MERGES = 20


@register(
    "qt18_bpe_pair_counts",
    tags=("text", "tokenizer"),
    oracle=f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS tok
  FROM documents),
tok_counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
pairs AS (
  SELECT substr(tok, CAST(i AS INTEGER), 2) AS pair, n
  FROM tok_counts,
       LATERAL (SELECT unnest(range(1, CAST(length(tok) AS BIGINT))) AS i) g
  WHERE length(tok) >= 2),
counted AS (
  SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY pair)
SELECT pair, n_occurrences,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair) AS BIGINT)
         AS rank
FROM counted
ORDER BY rank LIMIT {BPE_TOP_MERGES}
""",
)
def qt18_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first merge step (L4): corpus-wide
    counts of adjacent character pairs within words — the argmax pair
    is the first merge a byte-pair-encoding tokenizer learns. Top-20
    merge candidates reported.

    Scale dataflow, rule 7 (distinct-before-expensive) + rule 19
    (bind expensive exprs outside lambdas): the token stream first
    reduces to the DISTINCT word list with counts — vocabulary-sized,
    orders of magnitude smaller than the corpus — and pair extraction
    runs per distinct word, weighted by its count. Real BPE iterates
    this loop re-segmenting with each learned merge; each round is
    this same dataflow, so the one-round dataflow is what's pinned.
    Exact integer counts end-to-end; the top-k cut is an
    orderBy+limit — TakeOrderedAndProject (per-partition heap + one
    driver merge), never a full sort — with the rank column added on
    the k-row result afterwards."""
    d = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(d, top_k=BPE_TOP_MERGES)


def bpe_pair_counts(docs: DataFrame, top_k: int = BPE_TOP_MERGES) -> DataFrame:
    """qt18's dataflow over any documents DataFrame (see its docstring).
    Separated so tests can drive the REGISTERED dataflow on a
    hand-checked corpus rather than re-implementing it."""
    from pyspark.sql import Window as W

    toks = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    tok_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        tok_counts.filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(tok) - 1),"
                       " i -> substr(tok, i, 2))")
            ).alias("pair"),
            "n",
        )
    )
    counted = pairs.groupBy("pair").agg(F.sum("n").alias("n_occurrences"))
    top = counted.orderBy(F.desc("n_occurrences"), "pair").limit(top_k)
    # rank over the k-row result only — a trivial single-partition
    # window on k rows, after TakeOrderedAndProject did the global cut
    w = W.orderBy(F.desc("n_occurrences"), "pair")
    return top.select(
        "pair",
        "n_occurrences",
        F.row_number().over(w).cast("long").alias("rank"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# qt19: inverted-index construction (the retrieval index build)
# ---------------------------------------------------------------------------

INDEX_MIN_DF = 5


@register(
    "qt19_inverted_index",
    bench=True,
    tags=("text", "retrieval"),
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
             AS term
    FROM documents) u)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list(doc_id ORDER BY doc_id), ' ') AS postings
FROM pairs GROUP BY term
HAVING COUNT(*) >= {INDEX_MIN_DF}
""",
)
def qt19_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (L4, the index-build half of the
    sparse retrieval stack — qt17 BM25 is the scoring half): per term,
    document frequency and the sorted posting list of documents
    containing it, for terms above a df floor.

    Scale dataflow: (doc_id, term) pairs dedup FIRST (shuffle carries
    distinct pairs, not the raw token stream — rule 7), then one
    aggregation to term grain builds postings via collect_list →
    array_sort (emitted space-joined as a string column: the driver's
    cross-engine hash canonicalizer requires flat scalar columns, and
    a serialized posting list is the on-disk index format anyway);
    per-term state is bounded by df. At 100 TB posting
    lists for stop-like terms are the skew keys — the df floor plus
    AQE skew-split handle them; a production build would also shard
    postings by doc-range per term (the standard segmented index),
    which is this same dataflow keyed by (term, doc_id >> k)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    ).distinct()
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), " ").alias(
                "postings"
            ),
        )
        .filter(F.col("df") >= INDEX_MIN_DF)
    )


# ---------------------------------------------------------------------------
# qt20: topic tagging via broadcast keyword dictionary (multi-label)
# ---------------------------------------------------------------------------

#: Literal topic → keyword dictionary (alphabetical topic order is the
#: tie-break everywhere). Real pipelines swap in a curated taxonomy;
#: the dictionary rides the plan as literals (rule 20), so tagging is
#: a zero-shuffle scan at any corpus size.
TOPIC_KEYWORDS: dict[str, tuple[str, ...]] = {
    "exec": ("join", "hash", "merge", "sort", "agg", "group"),
    "perf": ("fast", "slow", "big", "small"),
    "storage": ("scan", "table", "column", "row", "part", "key"),
    "streaming": ("stream", "batch", "window"),
}
TOPIC_MIN_HITS = 3


def _qt20_oracle() -> str:
    cnt = {
        t: "len(list_filter(ts, x -> x IN ({})))".format(
            ", ".join(f"'{w}'" for w in ws)
        )
        for t, ws in TOPIC_KEYWORDS.items()
    }
    mx = "GREATEST({})".format(", ".join(cnt.values()))
    first_max = "CASE " + " ".join(
        f"WHEN {cnt[t]} = mx THEN '{t}'" for t in sorted(cnt)
    ) + " END"
    tags = ", ".join(
        f"CASE WHEN {cnt[t]} >= {TOPIC_MIN_HITS} THEN '{t}' END"
        for t in sorted(cnt)
    )
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts
  FROM documents),
scored AS (
  SELECT doc_id, ts, {mx} AS mx FROM base)
SELECT doc_id,
       concat_ws(',', {tags}) AS topics,
       CASE WHEN mx = 0 THEN 'none' ELSE {first_max} END AS top_topic,
       CAST(mx AS BIGINT) AS top_hits
FROM scored
"""


@register(
    "qt20_topic_tagging",
    tags=("text", "classify"),
    oracle=_qt20_oracle(),
)
def qt20_topic_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-label topic tagging from a broadcast keyword dictionary
    (L4 — the cheap taxonomy labeling pass run before mixture
    balancing; swap the literal dictionary for a curated taxonomy or a
    model-scored variant via the same dataflow). Per document: every
    topic whose keyword-hit count clears a floor (comma-joined,
    alphabetical), the dominant topic (max hits, ties → alphabetical),
    and its hit count.

    Scale dataflow (rule 20): the dictionary is plan literals, so the
    whole query is conditional size(filter(...)) folds over the token
    array — one codegen'd scan projection, ZERO shuffles, no join
    against a keyword table (broadcast-dictionary degenerate case).
    At a real taxonomy's size the same shape holds via a broadcast
    map; only if keywords stop fitting in a task binary does this
    become qt07's broadcast-join shape."""
    d = load_table(spark, sf_dir, "documents")
    ts = tokens(F.lower(F.col("text")))

    def hit_count(ws: tuple[str, ...]) -> Column:
        # closure factory: pyspark materializes one lambda ARG per
        # python parameter, so a `ws=ws` default would be bound to a
        # Column — capture the keyword list via closure instead
        wl = list(ws)
        return F.size(F.filter(ts, lambda x: x.isin(wl)))

    cnt = {t: hit_count(ws) for t, ws in TOPIC_KEYWORDS.items()}
    mx = F.greatest(*cnt.values())
    first_max = F.lit(None).cast("string")
    # build the CASE in reverse so the ALPHABETICALLY FIRST max wins
    for t in sorted(cnt, reverse=True):
        first_max = F.when(cnt[t] == mx, F.lit(t)).otherwise(first_max)
    tags = [
        F.when(cnt[t] >= TOPIC_MIN_HITS, F.lit(t)) for t in sorted(cnt)
    ]
    return d.select(
        "doc_id",
        F.concat_ws(",", F.array(*tags)).alias("topics"),
        F.when(mx == 0, F.lit("none")).otherwise(first_max).alias("top_topic"),
        mx.cast("long").alias("top_hits"),
    )


# ---------------------------------------------------------------------------
# qt21: Zipf fit — corpus rank/frequency power-law slope per language
# ---------------------------------------------------------------------------

ZIPF_TOP_RANKS = 50


@register(
    "qt21_zipf_fit",
    tags=("text", "stats"),
    oracle=f"""
WITH tc AS (
  SELECT lang, tok, COUNT(*) AS n FROM (
    SELECT lang, unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
             AS tok
    FROM documents) u
  GROUP BY lang, tok),
ranked AS (
  SELECT lang, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rnk
  FROM tc),
pts AS (
  SELECT lang,
         CAST(ROUND(LN(rnk), 6) AS DECIMAL(18,6)) AS x,
         CAST(ROUND(LN(n), 6) AS DECIMAL(18,6)) AS y
  FROM ranked WHERE rnk <= {ZIPF_TOP_RANKS}),
s AS (
  SELECT lang, COUNT(*) AS cnt,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(ROUND(x * y, 6) AS DECIMAL(18,6))) AS sxy,
         SUM(CAST(ROUND(x * x, 6) AS DECIMAL(18,6))) AS sxx
  FROM pts GROUP BY lang)
SELECT lang, CAST(cnt AS BIGINT) AS n_points,
       ROUND((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx), 4) AS zipf_slope,
       ROUND((sy - ((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)) * sx) / cnt, 4)
         AS zipf_intercept
FROM s
""",
)
def qt21_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit per language (L4 corpus statistics): the
    least-squares slope of ln(frequency) against ln(rank) over the top
    ranks — natural text sits near −1; a slope far off flags synthetic,
    templated, or boilerplate-heavy corpora (a standard data-quality
    audit signal alongside qt11's entropy).

    Determinism: ln() terms round to 6dp and accumulate as exact
    DECIMAL sums (the registry's order-free recipe), so the closed-form
    slope/intercept divide identical integers in both engines; final
    rounding 4dp.

    Scale dataflow: token counts reduce corpus→vocabulary grain first
    (the qt18 move); the rank window runs per language over vocab-sized
    input, and the fit is a 5-sum aggregate — nothing downstream of
    the first groupBy touches corpus-scale data."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select("lang", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), "tok")
    pts = (
        tc.select("lang", "n", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= ZIPF_TOP_RANKS)
        .select(
            "lang",
            F.round(F.log(F.col("rnk")), 6).cast("decimal(18,6)").alias("x"),
            F.round(F.log(F.col("n")), 6).cast("decimal(18,6)").alias("y"),
        )
    )
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(18,6)")).alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(18,6)")).alias("sxx"),
    )
    slope = (F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "lang",
        F.col("cnt").cast("long").alias("n_points"),
        F.round(slope.cast("double"), 4).alias("zipf_slope"),
        F.round(
            ((F.col("sy") - slope * F.col("sx")) / F.col("cnt")).cast("double"), 4
        ).alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# qt22: importance weighting for targeted data selection (DSIR-shaped)
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"  # the "target distribution" slice
DSIR_TOP_K = 20


@register(
    "qt22_dsir_importance",
    bench=True,
    tags=("text", "sampling", "training-data"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents),
cr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
       WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY tok),
tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cr) AS v,
               (SELECT CAST(SUM(c) AS BIGINT) FROM cr) AS nr,
               (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM ct) AS nt),
lr AS (
  SELECT cr.tok,
         CAST(ROUND(ln((COALESCE(ct.c, 0) + 1.0) / (nt + v))
                    - ln((cr.c + 1.0) / (nr + v)), 6) AS DECIMAL(18,6)) AS lr6
  FROM cr LEFT JOIN ct USING (tok) CROSS JOIN tot),
perdoc AS (
  SELECT t.doc_id, t.lang,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         SUM(lr.lr6) AS wdec
  FROM toks t JOIN lr ON t.tok = lr.tok
  GROUP BY t.doc_id, t.lang)
SELECT doc_id, lang, n_tokens, CAST(wdec AS DOUBLE) AS weight
FROM perdoc WHERE lang <> '{DSIR_TARGET_LANG}'
ORDER BY weight DESC, doc_id LIMIT {DSIR_TOP_K}
""",
)
def qt22_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance weighting for targeted data selection — the DSIR
    recipe (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every out-of-target document by the
    log-likelihood ratio of its tokens under the target distribution
    (here: the 'en'-slice unigram LM, add-1 smoothed over the joint
    vocabulary) vs the raw-corpus unigram LM; the highest-ratio
    documents are the ones importance resampling would pull into the
    training mix. Top-20 candidates reported.

    Scale shape: the same two-pass broadcast-calibration dataflow as
    qt12 — pass 1 reduces the token stream to the (vocab-sized)
    count tables whose smoothed per-token log-ratios are rounded to
    6 dp and fixed as DECIMAL(18,6); pass 2 joins them back onto the
    token stream map-side (broadcast) and reduces per-doc with an
    EXACT decimal sum, so the accumulated weight is independent of
    accumulation order — bit-identical across engines and across
    cluster repartitions (registry float rule). Final top-k is
    TakeOrdered, no global sort. DSIR's hashed-n-gram variant drops in
    by swapping the token key for a hash bucket; the dataflow is
    identical so the unhashed form is what this query pins.
    """
    d = load_table(spark, sf_dir, "documents")
    perdoc = dsir_doc_weights(d)
    return (
        perdoc.where(F.col("lang") != DSIR_TARGET_LANG)
        .select("doc_id", "lang", "n_tokens", F.col("wdec").cast("double").alias("weight"))
        .orderBy(F.desc("weight"), "doc_id")
        .limit(DSIR_TOP_K)
    )


def dsir_doc_weights(d: DataFrame) -> DataFrame:
    """qt22's per-document DSIR log-likelihood-ratio weight dataflow
    over any documents DataFrame (all docs, no slice filter / top-k):
    returns (doc_id, lang, n_tokens, wdec DECIMAL(18,6)). Shared by
    qt22 (the weight report) and qs14 (the resampling draw) so the
    score a selection acts on is the score the report shows."""
    toks = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
    cr = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cr"))
    ct = (
        toks.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = cr.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cr").alias("nr"),
    ).crossJoin(ct.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")))
    lr = (
        cr.join(ct, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.round(
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + F.col("v")))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + F.col("v"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr6"),
        )
    )
    return (
        toks.join(F.broadcast(lr), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr6").alias("wdec"),
        )
    )


DSIR_WEIGHT_CTES = f"""toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents),
cr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
ct AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
       WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY tok),
tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cr) AS v,
               (SELECT CAST(SUM(c) AS BIGINT) FROM cr) AS nr,
               (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM ct) AS nt),
lr AS (
  SELECT cr.tok,
         CAST(ROUND(ln((COALESCE(ct.c, 0) + 1.0) / (nt + v))
                    - ln((cr.c + 1.0) / (nr + v)), 6) AS DECIMAL(18,6)) AS lr6
  FROM cr LEFT JOIN ct USING (tok) CROSS JOIN tot),
perdoc AS (
  SELECT t.doc_id, t.lang,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         SUM(lr.lr6) AS wdec
  FROM toks t JOIN lr ON t.tok = lr.tok
  GROUP BY t.doc_id, t.lang)"""


# ---------------------------------------------------------------------------
# qt23: n-gram novelty audit (memorization / boilerplate risk score)
# ---------------------------------------------------------------------------

NOVELTY_NGRAM = 8


@register(
    "qt23_ngram_novelty",
    tags=("text", "dedup", "quality"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {NOVELTY_NGRAM - 1}),
                i -> md5(array_to_string(t[i:i + {NOVELTY_NGRAM - 1}], ' ')))) AS g
  FROM toks),
df AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       ROUND(1.0 - CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*), 6) AS novelty
FROM grams JOIN df USING (g)
GROUP BY grams.doc_id
""",
)
def qt23_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    8-gram shingles that appear in NO other document. The curation
    audit behind both memorization risk (a training doc whose grams
    are widely shared is likely boilerplate the model will memorize
    as a template) and near-dup triage — qd12/qd14 REMOVE shared
    spans, this query SCORES how much of each doc would survive.
    Documents shorter than 8 tokens have no grams and no row.

    Scale shape: grams hash to md5 before ever shuffling (fixed-width
    keys, the qd10 expression — split bound once, no O(n²) re-split);
    ONE distinct over (doc, gram), document frequency as a gram-keyed
    count, then the same relation joins df back and folds to doc
    grain. Gram-keyed shuffles only; the hot-gram skew mode (classic
    boilerplate) is an equi-join AQE splits.
    """
    from event_stream_aggr_spark.operators.dedup import ngram_hashes

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(ngram_hashes(F.col("text"), NOVELTY_NGRAM)).alias("g")
    ).distinct()
    df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    shared = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        grams.join(df, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            shared.alias("n_shared"),
            F.round(1.0 - shared.cast("double") / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# qt24: vocabulary coverage curve (tokenizer vocab sizing)
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_TARGETS = (50, 90, 95, 99)  # percent


@register(
    "qt24_vocab_coverage",
    tags=("text", "tokenizer"),
    oracle=f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
ranked AS (
  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS BIGINT) AS r,
         CAST(SUM(c) OVER (ORDER BY c DESC, tok
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM cnt),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
targets(pct) AS (VALUES {", ".join(f"({p})" for p in VOCAB_COVERAGE_TARGETS)})
SELECT CAST(g.pct AS BIGINT) AS target_pct,
       CAST(MIN(rk.r) AS BIGINT) AS vocab_size,
       ROUND(CAST(MIN_BY(rk.cum, rk.r) AS DOUBLE) / MIN(t.t), 6) AS coverage
FROM targets g
JOIN tot t ON TRUE
JOIN ranked rk ON rk.cum * 100 >= g.pct * t.t
GROUP BY g.pct
""",
)
def qt24_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design question "how
    big must the vocab be to cover X% of the token stream": rank the
    corpus vocabulary by frequency and report, for each coverage
    target, the smallest prefix reaching it and the exact coverage at
    that cut. The Zipf companion of qt21 (slope says HOW coverage will
    grow; this query reads the curve itself).

    Scale shape: the heavy pass is the corpus token count (one
    map-side-combined aggregation); ranking and the running total run
    on the VOCAB-sized relation — the one legitimately tiny
    single-partition window in the engine (same post-aggregation
    dispensation as qt09's doc). The coverage test is exact integer
    cross-multiplication (cum·100 >= pct·total) — no float thresholds.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    wrank = W.orderBy(F.desc("c"), "tok")
    ranked = cnt.select(
        "c",
        F.row_number().over(wrank).cast("long").alias("r"),
        F.sum("c")
        .over(wrank.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("cum"),
    )
    tot = cnt.agg(F.sum("c").cast("long").alias("t"))
    # pandas-built so the targets plan as a LocalRelation (provably
    # literal to the r9 nested-loop lint and foldable by Catalyst)
    # instead of an opaque driver RDD scan
    import pandas as pd

    targets = spark.createDataFrame(
        pd.DataFrame({"target_pct": list(VOCAB_COVERAGE_TARGETS)}),
        "target_pct long",
    )
    hit = (
        targets.crossJoin(F.broadcast(tot))
        .join(
            ranked,
            F.col("cum") * 100 >= F.col("target_pct") * F.col("t"),
        )
        .groupBy("target_pct")
        .agg(
            F.min("r").alias("vocab_size"),
            (F.min_by("cum", "r").cast("double") / F.min("t")).alias("_cov"),
        )
    )
    return hit.select(
        "target_pct", "vocab_size", F.round("_cov", 6).alias("coverage")
    )


# ---------------------------------------------------------------------------
# qt25: source-overlap matrix (corpus forensics)
# ---------------------------------------------------------------------------

OVERLAP_NGRAM = 8


@register(
    "qt25_source_overlap",
    tags=("text", "dedup", "audit"),
    oracle=f"""
WITH toks AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT DISTINCT source,
         unnest(list_transform(generate_series(1, len(t) - {OVERLAP_NGRAM - 1}),
                i -> md5(array_to_string(t[i:i + {OVERLAP_NGRAM - 1}], ' '))))
           AS g
  FROM toks),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT i.source_a, i.source_b, sa.n AS n_grams_a, sb.n AS n_grams_b,
       i.n_shared,
       ROUND(CAST(i.n_shared AS DOUBLE) / (sa.n + sb.n - i.n_shared), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
""",
)
def qt25_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-overlap matrix — corpus forensics: pairwise 8-gram
    Jaccard between SOURCES (not documents), the audit that catches
    one feed republishing another's content before per-document dedup
    even runs (a high-overlap source pair means qd04/qd12 will be
    doing bulk work that source-level routing could skip). Only
    overlapping pairs emit rows; per-source gram set sizes ride along
    so absolute containment is readable too.

    Scale shape: the token stream reduces ONCE to distinct (source,
    gram) — the |sources|·|vocab8|-bounded relation — and the pair
    counts come from the gram-keyed self-join of that reduction, so
    the join input is corpus-dedup'd before any pairing; hot boiler-
    plate grams are the skew mode and split by AQE. At 100 TB the
    same matrix runs on MinHash signatures per source (qd03) instead
    of raw gram sets — identical dataflow, sketch-sized state.
    """
    from event_stream_aggr_spark.operators.dedup import ngram_hashes

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "source", F.explode(ngram_hashes(F.col("text"), OVERLAP_NGRAM)).alias("g")
    ).distinct()
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("source").alias("source_a"), "g")
    b = grams.select(F.col("source").alias("source_b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_grams_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_grams_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_grams_a",
            "n_grams_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# qt26: PMI collocation mining (statistically-bound word pairs)
# ---------------------------------------------------------------------------

PMI_MIN_PAIR = 5
PMI_TOP_K = 40


@register(
    "qt26_pmi_collocations",
    tags=("text", "lm"),
    oracle=f"""
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
uni AS (
  SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks, LATERAL (SELECT unnest(t) AS tok) u GROUP BY u.tok),
total AS (SELECT SUM(c) AS n FROM uni),
pairs AS (
  SELECT p.x, p.y, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM toks, LATERAL (
    SELECT unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS x,
           unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i + 1])) AS y) p
  GROUP BY p.x, p.y
  HAVING COUNT(*) >= {PMI_MIN_PAIR}),
scored AS (
  SELECT x, y, c_xy, ux.c AS c_x, uy.c AS c_y,
         (CAST(c_xy AS HUGEINT) * n * 1000000)
           // (CAST(ux.c AS HUGEINT) * uy.c) AS ratio_ppm
  FROM pairs JOIN uni ux ON ux.tok = x JOIN uni uy ON uy.tok = y, total),
topk AS (
  SELECT x, y, c_xy, c_x, c_y, ratio_ppm
  FROM scored ORDER BY ratio_ppm DESC, x, y LIMIT {PMI_TOP_K})
SELECT x, y, c_xy, c_x, c_y, CAST(ratio_ppm AS BIGINT) AS ratio_ppm,
       ROUND(LN(ratio_ppm / 1000000.0), 6) AS pmi
FROM topk
""",
)
def qt26_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (L4): the
    top-40 adjacent word pairs whose co-occurrence most exceeds
    chance — PMI = ln(P(xy)/(P(x)P(y))) — with a min-count floor so
    rare accidental pairs can't dominate. The phrase detector feeding
    tokenizer vocabularies ("new york"-style merges), stop-phrase
    lists, and qt18's merge candidates with a statistical (not raw
    count) criterion.

    Determinism: the rank key is the exact integer cross-multiplied
    ratio (c_xy·N·10⁶) div (c_x·c_y) — both engines rank identical
    integers, with (x, y) tiebreaks; ln() only touches the derived
    output, rounded to 6dp from the SAME integer argument (qt21's
    established ln-rounding pattern). The cross-multiplication is
    promoted out of BIGINT on both sides (Spark DECIMAL(38,0),
    DuckDB HUGEINT) so it stays exact at web-corpus N ~ 1e13 tokens,
    where a 64-bit c_xy·N·10⁶ would wrap silently; the final
    ratio_ppm itself is BIGINT-bounded (≤ N·10⁶ / PMI_MIN_PAIR —
    an explicit precondition, fine through N ~ 1e12·PMI_MIN_PAIR).

    Scale shape (100 TB): unigram and bigram counts are the SAME
    token-stream shuffles qt08/qt09 bound by vocab/vocab² — corpus
    size only raises the counts. Unigrams join the pair relation
    twice; the unigram relation is vocab-sized and broadcast here
    (at open-web vocab it's a shuffle join on x then y, each
    AQE-skew-splittable on stopword-like heads, which the min-count
    floor + ratio denominator already demote). The global N is a
    1-row broadcast cross-join. Top-k is TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tokens(F.lower(F.col("text"))).alias("t"))
    uni = toks.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    total = uni.agg(F.sum("c").alias("n"))
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) as x,"
                    "             element_at(t, i + 1) as y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= PMI_MIN_PAIR)
    )
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    scored = (
        pairs.join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(total))
        .select(
            "x",
            "y",
            "c_xy",
            "c_x",
            "c_y",
            F.expr(
                "cast((cast(c_xy as decimal(38,0)) * n * 1000000)"
                " div (cast(c_x as decimal(38,0)) * c_y) as bigint)"
            ).alias("ratio_ppm"),
        )
    )
    topk = scored.orderBy(F.desc("ratio_ppm"), "x", "y").limit(PMI_TOP_K)
    return topk.select(
        "x",
        "y",
        "c_xy",
        "c_x",
        "c_y",
        "ratio_ppm",
        F.round(F.log(F.col("ratio_ppm") / 1000000.0), 6).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# qt27: RAKE keyphrase extraction (stopword-delimited phrase scoring)
# ---------------------------------------------------------------------------

RAKE_MAX_WORDS = 4
RAKE_MIN_WORDS = 2
RAKE_TOP_K = 20


@register(
    "qt27_rake_keyphrases",
    bench=True,
    tags=("text", "keywords"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
       LATERAL (SELECT unnest(t) AS tok,
                       generate_subscripts(t, 1) AS pos) u),
grouped AS (
  SELECT doc_id, tok, pos,
         SUM(CASE WHEN tok IN {STOPWORDS_EN!r} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM toks),
members AS (
  SELECT doc_id, grp, pos, tok,
         COUNT(*) OVER (PARTITION BY doc_id, grp) AS n_words
  FROM grouped WHERE tok NOT IN {STOPWORDS_EN!r}),
cand AS (SELECT * FROM members WHERE n_words <= {RAKE_MAX_WORDS}),
wstats AS (
  SELECT tok,
         (SUM(n_words) * 1000000) // COUNT(*) AS wscore_ppm
  FROM cand GROUP BY tok),
occ AS (
  SELECT c.doc_id, c.grp,
         string_agg(c.tok, ' ' ORDER BY c.pos) AS phrase,
         CAST(MAX(c.n_words) AS BIGINT) AS n_words,
         CAST(SUM(w.wscore_ppm) AS BIGINT) AS occ_score
  FROM cand c JOIN wstats w ON w.tok = c.tok
  GROUP BY c.doc_id, c.grp
  HAVING MAX(c.n_words) >= {RAKE_MIN_WORDS}),
ptype AS (
  SELECT phrase, MAX(n_words) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         SUM(occ_score) // COUNT(*) AS score_ppm
  FROM occ GROUP BY phrase)
SELECT phrase, n_words, n_occurrences, CAST(score_ppm AS BIGINT) AS score_ppm
FROM ptype ORDER BY score_ppm DESC, phrase LIMIT {RAKE_TOP_K}
""",
)
def qt27_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (L4): candidate phrases are maximal
    stopword-free token runs; each word scores degree/frequency over
    all candidates (degree = Σ length of phrases containing it) and a
    phrase scores the sum of its member word scores — the classic
    unsupervised keyword extractor (Rose et al.), used for corpus
    topic summaries, data cards (qt16), and retrieval query
    expansion. Top-20 multiword phrases reported.

    Determinism: word scores are integer (degree·10⁶) div freq;
    phrase scores are integer sums; per-phrase-type score is the
    occurrence sum div occurrence count — exact because every
    occurrence of the same phrase string has the same member multiset.
    (phrase, score) ordering ties break on the phrase string.

    Scale shape (100 TB): segmentation is ONE doc-partitioned
    running-count window (pos already orders within doc); phrase
    assembly and occurrence scoring share the (doc, grp) grain;
    word stats are a vocab-bounded relation broadcast back onto
    members. No self-joins, no n-gram blowup — the phrase cap bounds
    member fanout at {RAKE_MAX_WORDS}."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "tok")
    )
    is_stop = F.col("tok").isin(*STOPWORDS_EN)
    grouped = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.sum(is_stop.cast("int"))
        .over(W.partitionBy("doc_id").orderBy("pos"))
        .alias("grp"),
    )
    members = grouped.filter(~is_stop).select(
        "doc_id",
        "grp",
        "pos",
        "tok",
        F.count(F.lit(1)).over(W.partitionBy("doc_id", "grp")).alias("n_words"),
    )
    cand = members.filter(F.col("n_words") <= RAKE_MAX_WORDS)
    wstats = cand.groupBy("tok").agg(
        F.expr("(sum(n_words) * 1000000) div count(1)").alias("wscore_ppm")
    )
    occ = (
        cand.join(F.broadcast(wstats), "tok")
        .groupBy("doc_id", "grp")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
                " s -> s.tok), ' ')"
            ).alias("phrase"),
            F.max("n_words").cast("long").alias("n_words"),
            F.sum("wscore_ppm").cast("long").alias("occ_score"),
        )
        .filter(F.col("n_words") >= RAKE_MIN_WORDS)
    )
    ptype = occ.groupBy("phrase").agg(
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_occurrences"),
        F.expr("sum(occ_score) div count(1)").alias("score_ppm"),
    )
    return ptype.orderBy(F.desc("score_ppm"), "phrase").limit(RAKE_TOP_K)


# ---------------------------------------------------------------------------
# qt28: keyword-in-context concordance (corpus exploration)
# ---------------------------------------------------------------------------

KWIC_TERM = "vector"
KWIC_CTX = 3


@register(
    "qt28_kwic_concordance",
    tags=("text", "retrieval"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
hits AS (
  SELECT doc_id, t, u.pos
  FROM toks, LATERAL (SELECT unnest(t) AS tok,
                             generate_subscripts(t, 1) AS pos) u
  WHERE u.tok = '{KWIC_TERM}')
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       COALESCE(array_to_string(t[GREATEST(1, pos - {KWIC_CTX}):pos - 1], ' '),
                '') AS left_ctx,
       COALESCE(array_to_string(t[pos + 1:pos + {KWIC_CTX}], ' '), '')
         AS right_ctx
FROM hits
""",
)
def qt28_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance (the corpus-exploration view
    behind lexicography and quality triage — "show me every use of
    this term with ±{KWIC_CTX} tokens of context"): one row per
    occurrence of the query term with its left/right context windows.
    The qualitative companion to qt17's quantitative relevance: BM25
    says WHICH documents matter, KWIC shows HOW the term is used.

    Scale dataflow: occurrence positions are mined INSIDE the token
    array (transform-with-index → filter — codegen'd, zero-shuffle)
    and only hit positions explode, so the fan-out is |occurrences|,
    not |tokens|; context extraction is array slicing on the retained
    token array. A corpus-wide KWIC for all terms is qt19's inverted
    index with positions — this is the single-term serving path that
    needs no index."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.lower(F.col("text"))).alias("t"))
    # 1-based hit positions, mined without exploding the token stream
    hits = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.expr(
                f"filter(transform(t, (x, i) -> IF(x = '{KWIC_TERM}',"
                " i + 1, -1)), p -> p > 0)"
            )
        ).alias("pos"),
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.expr(
            f"array_join(slice(t, greatest(1, pos - {KWIC_CTX}),"
            f" least({KWIC_CTX}, pos - 1)), ' ')"
        ).alias("left_ctx"),
        F.expr(f"array_join(slice(t, pos + 1, {KWIC_CTX}), ' ')").alias(
            "right_ctx"
        ),
    )


# ---------------------------------------------------------------------------
# qt30: language-ID confusion matrix (the eval closure of qt13)
# ---------------------------------------------------------------------------


@register(
    "qt30_langid_confusion",
    tags=("text", "langid", "eval"),
    oracle=f"""
WITH lt AS (
  SELECT doc_id, lang AS true_lang, lower(text) AS t FROM documents),
scored AS (
  SELECT doc_id, true_lang,
         {" , ".join(
            "(" + " + ".join(
                f"(length(t) - length(replace(t, '{b}', ''))) // 2 * {w}"
                for l2, b, w in LANGID_PROFILES if l2 == lg
            ) + f") AS s_{lg}"
            for lg in sorted({l for l, _b, _w in LANGID_PROFILES})
         )}
  FROM lt),
pred AS (
  SELECT doc_id, true_lang,
         CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
              WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
              WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
              WHEN s_es >= s_fr THEN 'es'
              ELSE 'fr' END AS pred_lang
  FROM scored)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN true_lang = pred_lang THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS cell_acc_ppm
FROM pred GROUP BY true_lang, pred_lang
""",
)
def qt30_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation (the eval closure qt13 lacked, the
    qe18 pattern applied to the text stack): confusion matrix of
    qt13's predicted language against the labeled lang column — per
    (true, predicted) cell, the count and a trivially-derivable
    accuracy indicator. WHICH languages the bigram heuristic confuses
    (and how often it abstains to 'und') is what decides whether to
    ship it or train real profiles.

    Determinism: scores are qt13's integer replace-counts; the argmax
    uses the same alphabetical tie preference (the oracle's CASE
    chain tests de→en→es→fr with >=, exactly min-struct's order).

    Scale shape (100 TB): qt13's zero-shuffle single-pass scorer plus
    ONE |langs|²-bounded aggregation — the whole evaluation costs one
    scan. No join against the prediction (the scorer is inline)."""
    d = load_table(spark, sf_dir, "documents")
    pred = qt13_language_id(spark, sf_dir).select(
        "doc_id", "pred_lang"
    )
    truth = d.select("doc_id", F.col("lang").alias("true_lang"))
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cells.select(
        "true_lang",
        "pred_lang",
        "n",
        F.when(F.col("true_lang") == F.col("pred_lang"), F.lit(1_000_000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cell_acc_ppm"),
    )


# ---------------------------------------------------------------------------
# qt29: term burstiness — dispersion of per-doc term counts
# ---------------------------------------------------------------------------

BURST_MIN_TOTAL = 50
BURST_TOP_K = 30


@register(
    "qt29_term_burstiness",
    tags=("text", "lm", "stats"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                    x -> x <> '')) AS tok
  FROM documents),
n_docs AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM toks),
tf AS (
  SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY tok, doc_id),
moments AS (
  SELECT tok,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c * c) AS BIGINT) AS total_sq,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM tf GROUP BY tok),
scored AS (
  SELECT tok, total, df,
         ((total_sq * nd - total * total) * 1000000)
           // (total * (nd - 1)) AS vmr_ppm
  FROM moments, n_docs
  WHERE total >= {BURST_MIN_TOTAL})
SELECT tok, total, df, CAST(vmr_ppm AS BIGINT) AS vmr_ppm
FROM scored ORDER BY vmr_ppm DESC, tok LIMIT {BURST_TOP_K}
""",
)
def qt29_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale): the variance-to-mean ratio of
    a term's per-document counts, treating absent docs as zeros —
    VMR ≈ 1 is Poisson scatter (function-word behavior), VMR ≫ 1 is
    bursty (a content word concentrating in few docs). The corpus
    statistic that separates topical vocabulary from glue without
    any labels, feeding stopword induction (qt02's list, learned) and
    keyword weighting (qt09/qt17's idf, refined). Top-30 burstiest
    frequent terms.

    Determinism: with zeros included, mean = total/N and
    variance·N·(N−1) = (Σc²·N − total²) — the VMR is ONE integer
    cross-multiplied ratio (·10⁶ div), exact in both engines; no
    float moment ever crosses the boundary.

    Scale shape (100 TB): the token stream reduces to (term, doc)
    counts (the same shuffle qt09 bounds by vocab·df), then to
    vocab-sized integer moments — absent-doc zeros are IMPLIED by
    algebra (Σ over zeros adds nothing), so the sparse representation
    never materializes the |vocab|×|docs| grid. Top-k is
    TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    nd = toks.agg(F.countDistinct("doc_id").alias("nd"))
    tf = toks.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    moments = tf.groupBy("tok").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("total_sq"),
        F.count(F.lit(1)).alias("df"),
    )
    scored = (
        moments.filter(F.col("total") >= BURST_MIN_TOTAL)
        .crossJoin(F.broadcast(nd))
        .select(
            "tok",
            "total",
            "df",
            F.expr(
                "((total_sq * nd - total * total) * 1000000)"
                " div (total * (nd - 1))"
            )
            .cast("long")
            .alias("vmr_ppm"),
        )
    )
    return scored.orderBy(F.desc("vmr_ppm"), "tok").limit(BURST_TOP_K)


# ---------------------------------------------------------------------------
# qr03: query-likelihood retrieval with Dirichlet smoothing
# ---------------------------------------------------------------------------

MU_DIRICHLET = 2000  # Dirichlet prior mass (Zhai & Lafferty 2001's default range)
QL_TOP_K = 10


@register(
    "qr03_lm_dirichlet_topk",
    tags=("text", "retrieval", "scale"),
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
              AS BIGINT) AS dl,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents),
totals AS (SELECT CAST(SUM(dl) AS BIGINT) AS t FROM docs),
q AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(toks) AS term FROM docs) u
  WHERE term IN ({BM25_TERMS_SQL})),
cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM q GROUP BY term),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM q GROUP BY doc_id, term),
scored AS (
  SELECT f.doc_id,
         CAST(ROUND(ln(
           CAST(COALESCE(t.tf, 0) * tot.t + {MU_DIRICHLET} * f.cf AS DOUBLE)
           / CAST(tot.t * (f.dl + {MU_DIRICHLET}) AS DOUBLE)) * 1000000)
           AS BIGINT) AS s_us
  FROM (SELECT d.doc_id, d.dl, c.term, c.cf FROM docs d CROSS JOIN cf c) f
  LEFT JOIN tf t ON f.doc_id = t.doc_id AND f.term = t.term
  CROSS JOIN totals tot),
ql AS (SELECT doc_id, CAST(SUM(s_us) AS BIGINT) AS ql_us
       FROM scored GROUP BY doc_id),
ranked AS (
  SELECT doc_id, ql_us,
         CAST(ROW_NUMBER() OVER (ORDER BY ql_us DESC, doc_id) AS BIGINT) AS rank
  FROM ql)
SELECT doc_id, CAST(ql_us AS DOUBLE) / 1000000 AS ql, rank
FROM ranked WHERE rank <= {QL_TOP_K}
""",
)
def qr03_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001 — the language-modeling ranker that sits beside
    qt17's BM25 as the second classic sparse scorer): score(q, d) =
    Σ_t ln((tf + μ·cf_t/T) / (dl + μ)), i.e. each document is a
    Dirichlet-smoothed unigram LM and documents rank by the query's
    log-likelihood under it. Smoothing gives unmatched terms the
    collection probability, so short documents aren't spuriously
    favored the way unsmoothed MLE does.

    Determinism: the smoothed probability is the ratio of two exact
    BIGINT products — (tf·T + μ·cf) / (T·(dl+μ)) — so ln() sees the
    identical double in both engines (qt17's one-transcendental
    recipe); per-term scores round to integer µ-units BEFORE the
    per-doc sum; ranks tiebreak on doc_id.

    Scale shape (100 TB): the corpus reads from the memoized
    tokenized stage; the token stream filters to QUERY TERMS before
    any shuffle (qt17's recipe), so cf/tf aggregate |docs|·|q| rows;
    the doc×term fan is a broadcast of the |q|-row cf relation onto
    the docs scan (no shuffle), and the final top-k is distributed
    TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import Window as W

    docs = tokenized_corpus(spark, sf_dir)
    totals = docs.agg(F.sum("dl").alias("t"))
    q = docs.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term").isin(*BM25_TERMS)
    )
    cf = q.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tf = q.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    fan = docs.select("doc_id", "dl").crossJoin(F.broadcast(cf))
    scored = (
        fan.join(tf, ["doc_id", "term"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (
                        F.coalesce(F.col("tf"), F.lit(0)) * F.col("t")
                        + MU_DIRICHLET * F.col("cf")
                    ).cast("double")
                    / (F.col("t") * (F.col("dl") + MU_DIRICHLET)).cast("double")
                )
                * 1000000
            )
            .cast("long")
            .alias("s_us"),
        )
    )
    ql = scored.groupBy("doc_id").agg(F.sum("s_us").cast("long").alias("ql_us"))
    top = ql.orderBy(F.desc("ql_us"), "doc_id").limit(QL_TOP_K)
    return top.select(
        "doc_id",
        (F.col("ql_us").cast("double") / 1000000).alias("ql"),
        F.row_number()
        .over(W.orderBy(F.desc("ql_us"), "doc_id"))
        .cast("long")
        .alias("rank"),
    )


# ---------------------------------------------------------------------------
# Inverted-index incremental maintenance (qt19's streaming story)
# ---------------------------------------------------------------------------


def inverted_index_build(docs: DataFrame) -> DataFrame:
    """qt19's term-grain index WITHOUT the df floor: (term, df,
    postings). The stored index must stay unfloored — a term below the
    floor today can cross it when later batches arrive, so the floor
    is a READ-time view (`inverted_index_view`), not a build-time drop.
    Documents are assumed unique across calls (each doc indexed once),
    which is what makes the index mergeable."""
    pairs = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    ).distinct()
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(F.array_sort(F.collect_list("doc_id")), " ").alias("postings"),
    )


def inverted_index_merge(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Term-grain monoid merge of two indexes over DISJOINT document
    sets: df adds, postings are the sorted union (exact, because no
    doc appears on both sides — the same disjointness contract as
    qi01's rollup deltas and cms_merge's micro-batches). Postings
    resort NUMERICALLY (split yields strings; a lexical sort would
    order '10' before '9')."""
    return (
        prev.unionByName(delta)
        .select(
            "term",
            "df",
            F.expr("transform(split(postings, ' '), x -> cast(x AS bigint))").alias(
                "p"
            ),
        )
        .groupBy("term")
        .agg(
            F.sum("df").alias("df"),
            F.array_join(F.array_sort(F.flatten(F.collect_list("p"))), " ").alias(
                "postings"
            ),
        )
    )


def inverted_index_view(index: DataFrame) -> DataFrame:
    """The queryable (floored) view over the stored unfloored index —
    exactly qt19's output contract."""
    return index.filter(F.col("df") >= INDEX_MIN_DF)


# ---------------------------------------------------------------------------
# qt31: winnowing fingerprints (rolling polynomial hash + window minima)
# ---------------------------------------------------------------------------

WINNOW_K = 5          # k-gram length for the rolling hash
WINNOW_W = 4          # winnowing window: one fingerprint per w hashes
WINNOW_B = 31         # polynomial base
WINNOW_M = 1048573    # modulus (prime < 2^20; 5 terms stay well in BIGINT)


def _rolling_hash_terms(pos_fn, char_fn) -> str:
    """The k-term polynomial hash of the k-gram at position i, written
    out literally (c0·B^{k-1} + … + c_{k-1}) mod M so BOTH engines run
    the identical integer expression — no fold builtin needed. In a
    sequential scan this is the classic Rabin-Karp ROLLING recurrence
    h_{i+1} = (h_i − c_i·B^{k-1})·B + c_{i+k}; relationally every
    position's hash is independent, which is exactly what makes it
    embarrassingly parallel."""
    terms = []
    for j in range(WINNOW_K):
        coeff = WINNOW_B ** (WINNOW_K - 1 - j)
        terms.append(f"{char_fn(pos_fn(j))} * {coeff}")
    return "(" + " + ".join(terms) + f") % {WINNOW_M}"


def _winnow_spark_exprs() -> tuple[str, str]:
    h = _rolling_hash_terms(
        lambda j: f"i + {j}" if j else "i",
        lambda p: f"ascii(substring(text, {p}, 1))",
    )
    hashes = f"transform(sequence(1, length(text) - {WINNOW_K - 1}), i -> {h})"
    fps = (
        f"array_distinct(transform(sequence(1, size(_h) - {WINNOW_W - 1}),"
        f" i -> array_min(slice(_h, i, {WINNOW_W}))))"
    )
    return hashes, fps


def _winnow_oracle() -> str:
    h = _rolling_hash_terms(
        lambda j: f"i + {j}" if j else "i",
        lambda p: f"ord(substring(text, {p}, 1))",
    )
    return f"""
WITH hashes AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(text) - {WINNOW_K - 1}),
                        i -> {h}) AS h
  FROM documents
  WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}),
fps AS (
  SELECT doc_id, CAST(len(h) AS BIGINT) AS n_kgrams,
         list_distinct(list_transform(
           generate_series(1, len(h) - {WINNOW_W - 1}),
           i -> list_aggregate(h[i:i + {WINNOW_W - 1}], 'min'))) AS sel
  FROM hashes)
SELECT doc_id, n_kgrams,
       CAST(len(sel) AS BIGINT) AS n_selected,
       CAST(list_aggregate(sel, 'min') AS BIGINT) AS fp_min,
       CAST(list_aggregate(sel, 'max') AS BIGINT) AS fp_max,
       CAST(len(sel) * 1000000 // n_kgrams AS BIGINT) AS density_ppm
FROM fps
"""


@register("qt31_winnowing_fingerprints", tags=("text", "dedup"), oracle=_winnow_oracle())
def qt31_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer–Wilkerson–Aiken
    2003, the MOSS algorithm — the rolling-hash fingerprinting the
    L4 brief names, where qt03's bag-of-words md5 is a whole-document
    identity): hash every character {WINNOW_K}-gram with a Rabin-Karp
    polynomial hash, then keep the MINIMUM hash of each
    {WINNOW_W}-position window. The selection guarantee is what makes
    it a fingerprint scheme rather than plain shingling: any shared
    substring of length >= k + w - 1 between two documents is
    certain to contribute at least one COMMON selected fingerprint,
    while the expected density is only 2/(w+1) of all k-grams — local,
    position-robust evidence at a fraction of the shingle volume.
    Output is the per-doc audit (k-gram count, selected count, value
    range, achieved density in ppm); the selected sets are what a
    plagiarism/near-dup index would invert (qt19's shape).

    Determinism: pure integer polynomial arithmetic mod a prime —
    both engines evaluate the identical expanded expression (no float,
    no library hash). Scale shape: a single zero-shuffle scan pass —
    hashes, window minima, dedup and stats are all array expressions
    inside one projection; no explode, so the token stream never hits
    an exchange. At 100 TB the per-doc fingerprint arrays would feed
    the qt19 inverted-index build (term = fingerprint), which is one
    distinct + one group-by — the standard two-shuffle index path."""
    hashes, fps = _winnow_spark_exprs()
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= WINNOW_K + WINNOW_W - 1)
    )
    return (
        d.select("doc_id", F.expr(hashes).alias("_h"))
        .select(
            "doc_id",
            F.size("_h").cast("long").alias("n_kgrams"),
            F.expr(fps).alias("_sel"),
        )
        .select(
            "doc_id",
            "n_kgrams",
            F.size("_sel").cast("long").alias("n_selected"),
            F.array_min("_sel").cast("long").alias("fp_min"),
            F.array_max("_sel").cast("long").alias("fp_max"),
            F.expr("size(_sel) * 1000000 div n_kgrams")
            .cast("long")
            .alias("density_ppm"),
        )
    )
