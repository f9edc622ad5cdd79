"""Literal-fixture unit tests for the text-analysis operators
(SURVEY north-star surface: tokenise, shingle, language ID, quality,
token counting, fingerprinting). Mirrors the reference's tier-1 style
(`/root/reference/tests/test_extract.py:42-193`): tiny inputs, exact
expected outputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orderly_spark.operators import text as X


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_tokens_lowercase_and_strip(spark):
    assert _one(spark, X.tokens(F.lit("  Hello   WORLD\tfoo\n"))) == ["hello", "world", "foo"]
    assert _one(spark, X.tokens(F.lit(""))) == []


def test_shingles_literal(spark):
    toks = F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("b"), F.lit("c"))
    # bigrams of [a b c b c]: "a b","b c","c b","b c" -> distinct sorted
    assert _one(spark, X.shingles(toks, 2)) == ["a b", "b c", "c b"]
    # doc shorter than n -> empty, not a descending-sequence error
    assert _one(spark, X.shingles(F.array(F.lit("a")), 3)) == []


def test_token_counts(spark):
    assert _one(spark, X.token_count(F.lit("one two  three"))) == 3
    # bpe-ish: "abc123 def!" -> abc | 123 | def | !
    assert _one(spark, X.bpe_ish_token_count(F.lit("abc123 def!"))) == 4


def test_quality_features_literal(spark):
    df = spark.createDataFrame([("the cat!",)], ["text"])
    row = X.quality_features(df).collect()[0]
    assert row["n_tokens"] == 2
    # tokens: "the"(3) + "cat!"(4) -> mean 3.5
    assert row["mean_token_len"] == pytest.approx(3.5)
    assert row["stopword_ratio"] == pytest.approx(0.5)  # "the" of 2 tokens
    assert row["punct_ratio"] == pytest.approx(1 / 8)  # one "!" of 8 chars
    expected_score = min(2 / 100, 1.0) * 0.4 + min(0.5 * 5, 1.0) * 0.4 + (1 - min(10 / 8, 1.0)) * 0.2
    assert row["quality_score"] == pytest.approx(expected_score)


def test_punct_ratio_unicode_letters_are_not_punctuation(spark):
    """r9 fix for the r8 ledgered ceiling: the old ASCII-\\w class made
    every CJK / accented / Cyrillic letter count as punctuation, so
    non-English documents scored punct_ratio ≈ 1 and failed the
    quality gate. \\p{L}\\p{N} pins the corrected scores."""
    rows = [
        # 7 chars, one '。' ideographic full stop -> 1/7
        (1, "中文文档测试。"),
        # all accented-Latin letters + ASCII space -> 0 punct
        (2, "héllo café"),
        # Cyrillic letters + one '!' of 14 chars
        (3, "русский текст!"),
        # Devanagari digits and letters + 2 ASCII spaces -> 0 punct
        (4, "१२३ देवनागरी अ"),
        # underscore and digits stay non-punct (old-\w parity)
        (5, "foo_bar_1 2_3"),
        # emoji is SYMBOL (So), not a letter -> 1 punct of 12 chars
        (6, "emoji \U0001F600 test"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["punct_ratio"]
        for r in X.quality_features(df).select("doc_id", "punct_ratio").collect()
    }
    assert got[1] == pytest.approx(1 / 7)
    assert got[2] == 0.0
    assert got[3] == pytest.approx(1 / 14)
    assert got[4] == 0.0
    assert got[5] == 0.0
    assert got[6] == pytest.approx(1 / 12)
    # and the composite gate no longer zeroes out a CJK doc's
    # punctuation term: score's punct component is (1 - min(10·p, 1))·0.2
    zh = [r for r in X.quality_features(df).collect() if r["doc_id"] == 1][0]
    assert zh["punct_ratio"] < 0.2  # was ≈ 1.0 under ASCII \w


def test_language_id_literal(spark):
    df = spark.createDataFrame(
        [
            (1, "the house of the king and queen"),
            (2, "el rey que la reina y"),
            (3, "der hund und die katze zu"),
            (4, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in X.language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_language_id_tie_breaks_by_code_order(spark):
    # "de la" scores es=1 (la), fr=2 (de? no: fr markers le,la,de,et,que -> de,la = 2; es: el,la,de,y,que -> la,de = 2)
    # es and fr tie at 2; first language in code order with a strictly
    # greater score wins, so the earlier code ('es') keeps the tie.
    df = spark.createDataFrame([(1, "de la")], ["doc_id", "text"])
    assert X.language_id(df).collect()[0]["pred_lang"] == "es"


def test_min_k_fingerprint_deterministic_and_discriminative(spark):
    text = "one two three four five six seven eight nine ten"
    a = _one(spark, X.min_k_fingerprint(F.lit(text)))
    b = _one(spark, X.min_k_fingerprint(F.lit(text)))
    other = _one(spark, X.min_k_fingerprint(F.lit("completely different words here now ok yes no maybe")))
    assert a == b
    assert a != other
    # k=4 32-hex hashes joined by '|'
    assert len(a.split("|")) == 4
    assert all(len(h) == 32 for h in a.split("|"))


def test_unigram_logprob_score_hand_values(spark):
    import math

    # corpus: 4 tokens total; "the" appears 3 times (p=3/4), "zyx" once (p=1/4)
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "zyx")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in X.unigram_logprob_score(df).collect()}
    assert got[1]["n_tokens"] == 3
    assert got[2]["n_tokens"] == 1
    assert got[1]["mean_neg_logprob"] == pytest.approx(-math.log(3 / 4), rel=1e-12)
    assert got[2]["mean_neg_logprob"] == pytest.approx(-math.log(1 / 4), rel=1e-12)
    # the rarer-token doc scores strictly higher (more surprising)
    assert got[2]["mean_neg_logprob"] > got[1]["mean_neg_logprob"]


def test_zero_token_docs_survive_rare_filtering(spark, tmp_path):
    """A document with NO tokens contains no rare token, so it must
    survive rare-row removal and every threshold of the sweep (review
    finding: the join-based doc_min path silently dropped such docs;
    same boundary class as the r4 zero-member rare-mapping fix). Built
    on a scratch documents table exercising the boundary the testdata
    never does (no empty-text docs at any SF)."""
    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY

    docs = spark.createDataFrame(
        [
            (0, "", "en", "s", 0),           # zero tokens
            (1, "   ", "en", "s", 3),        # whitespace only -> zero tokens
            (2, "common common", "de", "s", 13),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sfX")
    import os

    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    surv = {
        r["lang"]: r["n_docs"]
        for r in REGISTRY["t_docs_without_rare_tokens"].fn(spark, sf).collect()
    }
    # 'common' appears twice < RARE_K=200 -> doc 2 is dropped;
    # the two zero-token docs survive
    assert surv == {"en": 2}

    sweep = {
        r["k"]: r["surviving_docs"]
        for r in REGISTRY["t_rare_threshold_sweep"].fn(spark, sf).collect()
    }
    # thresholds 0..100 step 10: zero-token docs survive all; doc 2
    # (min_count=2) survives only k in {0}... k<=2 -> k=0 only
    assert sweep[0] == 3
    assert all(sweep[k] == 2 for k in range(10, 101, 10))


def test_token_runs_udtf_literal(spark):
    from orderly_spark.operators.text import token_runs_udtf

    spark.udtf.register("t_runs_lit", token_runs_udtf())
    spark.createDataFrame([(1, "A a b  b B c")], ["id", "text"]).createOrReplaceTempView("t_runs_docs")
    got = [
        (r.run_idx, r.token, r.run_len, r.start_idx)
        for r in spark.sql(
            "SELECT r.* FROM t_runs_docs d, LATERAL t_runs_lit(d.text) r ORDER BY r.run_idx"
        ).collect()
    ]
    # lower-cased, whitespace-collapsed, runs with 1-based start
    assert got == [(0, "a", 2, 1), (1, "b", 3, 3), (2, "c", 1, 6)]


def test_token_runs_udtf_ascii_whitespace_only(spark):
    """The UDTF's split class must match tokens()/TOKENS_SQL (Java
    ASCII \\s), NOT Python str.split(): a \\xa0 non-breaking space is
    part of a token on both engines, so the UDTF must keep it too
    (review r6 — str.split() would have silently diverged from the
    oracle on the first non-ASCII-space document)."""
    from orderly_spark.operators import text as T
    from orderly_spark.operators.text import token_runs_udtf

    spark.udtf.register("t_runs_nbsp", token_runs_udtf())
    doc = "foo\xa0foo bar"
    spark.createDataFrame([(doc,)], ["text"]).createOrReplaceTempView("t_nbsp_docs")
    got = [
        (r.token, r.run_len)
        for r in spark.sql(
            "SELECT r.* FROM t_nbsp_docs d, LATERAL t_runs_nbsp(d.text) r ORDER BY r.run_idx"
        ).collect()
    ]
    assert got == [("foo\xa0foo", 1), ("bar", 1)]
    # and the canonical Spark tokenizer agrees
    from pyspark.sql.functions import lit

    toks = spark.range(1).select(T.tokens(lit(doc)).alias("t")).head()["t"]
    assert toks == ["foo\xa0foo", "bar"]
