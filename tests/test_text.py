"""Text-analysis operators: counts, quality, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_stream_aggr_spark.operators.text import (
    fingerprint,
    quality_score,
    stopword_hits,
    token_count,
)


def _one(spark, col, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).collect()[0].out


def test_token_count_ignores_extra_spaces(spark):
    assert _one(spark, token_count(F.col("text")), "a  b   c") == 3
    assert _one(spark, token_count(F.col("text")), "single") == 1


def test_stopword_hits_counts_repeats(spark):
    assert _one(spark, stopword_hits(F.col("text")), "the cat the dog") == 2


def test_quality_score_components(spark):
    # stopwords present + mean token length in range → 1.0
    assert _one(spark, quality_score(F.col("text")), "the quick brown fox runs") == 1.0
    # no stopwords, short tokens → 0.0
    assert _one(spark, quality_score(F.col("text")), "x y z w") == 0.0


def test_fingerprint_order_and_case_invariant(spark):
    f1 = _one(spark, fingerprint(F.col("text")), "alpha beta gamma")
    f2 = _one(spark, fingerprint(F.col("text")), "Gamma ALPHA beta alpha")
    f3 = _one(spark, fingerprint(F.col("text")), "alpha beta delta")
    assert f1 == f2
    assert f1 != f3


def test_bigrams_single_token_doc_is_safe(spark):
    from event_stream_aggr_spark.plans.registry import load_all  # noqa: F401
    from pyspark.sql import functions as F
    from event_stream_aggr_spark.operators.text import tokens

    d = spark.createDataFrame([("one",), ("",), ("a b a",)], "text string")
    bigrams = (
        d.select(tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        )).alias("bigram"))
    )
    got = sorted(r.bigram for r in bigrams.collect())
    assert got == ["a b", "b a"]  # 1-token and empty docs contribute nothing


def test_language_id_und_fallback_and_determinism(spark):
    from event_stream_aggr_spark.operators.text import LANGID_PROFILES
    from pyspark.sql import functions as F

    profiles = spark.createDataFrame(
        list(LANGID_PROFILES), "lang string, bigram string, w long"
    )
    docs = spark.createDataFrame(
        [(1, "the then there"), (2, "x"), (3, ""), (4, "zzzz qqqq")],
        "doc_id long, text string",
    )
    grams_arr = F.when(
        F.length(F.lower("text")) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            "transform(sequence(1, length(lower(text)) - 1),"
            " i -> substr(lower(text), i, 2))"
        )
    )
    grams = docs.select("doc_id", F.explode(grams_arr).alias("bigram"))
    scored = (
        grams.join(F.broadcast(profiles), "bigram")
        .groupBy("doc_id", "lang")
        .agg(F.sum("w").alias("score"))
    )
    best = {r.doc_id: (r.lang, r.score) for r in scored.collect() if True}
    # doc 1 is th/he-heavy → english must win its per-doc argmax
    en = [r for r in scored.filter("doc_id = 1").collect()]
    top = max(en, key=lambda r: (r.score, -ord(r.lang[0])))
    assert top.lang == "en"
    # docs 2 (single char), 3 (empty), 4 (no profiled bigram) produce
    # no scored rows → the registered query's left join yields 'und'
    assert not scored.filter("doc_id in (2, 3, 4)").collect()


def test_quality_filter_rules_fire_individually(spark):
    """Each rule must be violable in isolation on crafted documents."""
    from pyspark.sql import functions as F

    from event_stream_aggr_spark.operators.text import STOPWORDS_EN, tokens

    docs = spark.createDataFrame(
        [
            # 60 varied tokens incl. stopwords → keep
            (1, " ".join(["the"] * 4 + [f"word{i}" for i in range(56)])),
            # too short
            (2, "the small doc"),
            # mean token length too long (every token 12 chars)
            (3, " ".join(["the"] * 4 + ["exceedinglyy"] * 56)),
            # no stopwords at all
            (4, " ".join(f"word{i}" for i in range(60))),
            # one token is 40% of the doc → repetition cap
            (5, " ".join(["the"] * 4 + ["spam"] * 24 + [f"w{i}" for i in range(32)])),
        ],
        "doc_id long, text string",
    )
    ts = tokens(F.col("text"))
    stats = docs.select(
        "doc_id",
        F.size(ts).cast("long").alias("n_tokens"),
        F.size(F.filter(ts, lambda x: x.isin(list(STOPWORDS_EN)))).cast("long").alias("n_stop"),
        F.length(F.concat_ws("", ts)).cast("long").alias("sum_len"),
        F.explode(ts).alias("tok"),
    )
    per = (
        stats.groupBy("doc_id", "n_tokens", "n_stop", "sum_len", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_tokens", "n_stop", "sum_len")
        .agg(F.max("c").alias("max_tok"))
    )
    verdicts = {
        r.doc_id: dict(
            ok_length=50 <= r.n_tokens <= 100000,
            ok_mean=3 * r.n_tokens <= r.sum_len <= 10 * r.n_tokens,
            ok_stop=r.n_stop * 50 >= 3 * r.n_tokens,
            ok_rep=r.max_tok * 5 <= r.n_tokens,
        )
        for r in per.collect()
    }
    assert all(verdicts[1].values())
    assert not verdicts[2]["ok_length"] and verdicts[2]["ok_mean"]
    assert not verdicts[3]["ok_mean"]
    assert not verdicts[4]["ok_stop"]
    assert not verdicts[5]["ok_rep"] and verdicts[5]["ok_stop"]


def test_redact_pii_on_real_shapes(spark):
    from event_stream_aggr_spark.operators.text import pii_counts, redact_pii

    rows = [
        (1, "mail me at jane.doe+spam@mail.example.co.uk today"),
        (2, "call 555-867-5309 or visit 192.168.10.1 now"),
        (3, "no pii here, just 1.5 degrees and v2.0.1 notes"),
        (4, "two mails: a@b.io c.d@e-f.org and 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    n_e, n_p, n_i = pii_counts(F.col("txt"))
    got = {
        r.id: (r.ne, r.np, r.ni, r.red)
        for r in df.select(
            "id",
            n_e.alias("ne"),
            n_p.alias("np"),
            n_i.alias("ni"),
            redact_pii(F.col("txt")).alias("red"),
        ).collect()
    }
    assert got[1] == (1, 0, 0, "mail me at <EMAIL> today")
    assert got[2] == (0, 1, 1, "call <PHONE> or visit <IP> now")
    # version strings / decimals must NOT be flagged as IPs or phones
    assert got[3] == (0, 0, 0, rows[2][1])
    assert got[4] == (2, 0, 1, "two mails: <EMAIL> <EMAIL> and <IP>")


def test_shard_shuffle_deterministic_uniform_and_layout_independent(spark):
    from event_stream_aggr_spark.operators.sampling import N_SHARDS, shard_shuffle

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {(r.doc_id, r.shard, r.pos) for r in shard_shuffle(df, "doc_id").collect()}
    # layout independence: a different partitioning yields identical output
    b = {
        (r.doc_id, r.shard, r.pos)
        for r in shard_shuffle(df.repartition(17), "doc_id").collect()
    }
    assert a == b
    # positions are 1..n contiguous within each shard
    by_shard: dict[int, list[int]] = {}
    for _, s, p in a:
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == set(range(N_SHARDS))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # hash sharding is roughly uniform (binomial: 2000/8 = 250 +- ~40)
    assert all(180 <= len(ps) <= 320 for ps in by_shard.values())
    # the shuffle actually permutes: within a shard, position order must
    # not equal doc_id order
    s0 = [d for d, s, _ in sorted(a, key=lambda t: (t[1], t[2])) if s == 0]
    assert s0 != sorted(s0)


def test_bpe_pair_counts_known_corpus(spark):
    """Drives qt18's REGISTERED dataflow (bpe_pair_counts) on a
    hand-checked corpus: 'aba ab' + 'ab' → pairs ab:3 (aba yields
    ab+ba, ab appears twice across docs), ba:1 — and the rank order
    puts ab first."""
    from event_stream_aggr_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame([("aba ab",), ("ab",)], "text string")
    rows = bpe_pair_counts(df, top_k=10).collect()
    got = {r.pair: (r.n_occurrences, r.rank) for r in rows}
    assert got == {"ab": (3, 1), "ba": (1, 2)}


def test_inverted_index_postings_sorted_and_df_consistent(spark, sf_dir):
    from event_stream_aggr_spark.operators.text import INDEX_MIN_DF
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qt19_inverted_index"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.df >= INDEX_MIN_DF
        # postings serialize space-joined (driver-hashable contract)
        ids = [int(x) for x in r.postings.split(" ")]
        assert len(ids) == r.df
        assert ids == sorted(set(ids))


def test_shard_shuffle_carries_payload_columns(spark):
    """shard_shuffle's (row, shard, pos) contract: every input column
    survives — sharding (doc_id, text) keeps the text."""
    from event_stream_aggr_spark.operators.sampling import shard_shuffle

    df = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(40)], "doc_id long, text string"
    )
    rows = shard_shuffle(df, "doc_id", n_shards=4).collect()
    assert len(rows) == 40
    assert {r.text for r in rows} == {f"payload {i}" for i in range(40)}
    assert {r.shard for r in rows} <= set(range(4))
    for r in rows:
        assert r.pos >= 1


def test_topic_tagging_handchecked(spark):
    from event_stream_aggr_spark.operators.text import (
        TOPIC_MIN_HITS,
        qt20_topic_tagging,
    )
    from event_stream_aggr_spark.plans.registry import load_all

    load_all()
    # drive the registered dataflow over a hand-built frame via a temp
    # parquet dir shaped like the documents table
    assert TOPIC_MIN_HITS == 3
    rows = {
        # 3 exec hits + 3 storage hits, equal max -> tie breaks to 'exec'
        0: "join hash merge scan table row",
        # 4 perf hits only
        1: "fast slow big small other words here",
        # nothing topical
        2: "lorem ipsum dolor",
        # 3 streaming hits, 2 perf hits (below floor)
        3: "stream batch window fast slow",
    }
    import tempfile

    d = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        d.write.parquet(f"{tmp}/documents.parquet")
        got = {
            r.doc_id: (r.topics, r.top_topic, r.top_hits)
            for r in qt20_topic_tagging(spark, tmp).collect()
        }
    assert got[0] == ("exec,storage", "exec", 3)
    assert got[1] == ("perf", "perf", 4)
    assert got[2] == ("", "none", 0)
    assert got[3] == ("streaming", "streaming", 3)


def test_zipf_fit_is_negative_power_law(spark, sf_dir):
    from event_stream_aggr_spark.operators.text import ZIPF_TOP_RANKS
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qt21_zipf_fit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_points <= ZIPF_TOP_RANKS
        # frequencies are non-increasing in rank -> slope can't be > 0
        assert r.zipf_slope <= 0


def test_qt22_dsir_selects_non_target_by_descending_weight(spark, sf_dir):
    from event_stream_aggr_spark.operators.text import DSIR_TARGET_LANG, DSIR_TOP_K
    from event_stream_aggr_spark.plans.registry import load_all

    rows = load_all()["qt22_dsir_importance"].fn(spark, sf_dir).collect()
    assert len(rows) == DSIR_TOP_K
    assert all(r.lang != DSIR_TARGET_LANG for r in rows)
    weights = [r.weight for r in rows]
    assert weights == sorted(weights, reverse=True)
    # decimal-sum determinism: a rerun reproduces identical bits
    again = load_all()["qt22_dsir_importance"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
