"""Unit + twin + plan coverage for the repetition quality gate
(t_repetition_gate): literal hand-computed fixtures, (Spark, SQL) twin
parity for the two new expression generators on adversarial inputs,
the zero-exchange plan pin, and per-gate non-vacuity on the graded
corpus.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from orderly_spark.operators import text as T
from orderly_spark.plans.audit import audit
from orderly_spark.queries import REGISTRY
from orderly_spark.queries.text_battery import (
    _REP_DUP_BI_PCT,
    _REP_DUP_TRI_PCT,
    _REP_TOP_BI_PCT,
    t_repetition_gate,
)

# Edge shapes the generators must agree on: empty doc, doc shorter
# than the gram width (sequence(1, 0) would DESCEND on the Spark side
# without the guard), exact-width doc, heavy repetition, a tie between
# two maximal runs, and case folding feeding the gram join.
TWIN_TEXTS = [
    (0, ""),
    (1, "one"),
    (2, "two words"),
    (3, "a b a b a b a"),
    (4, "x x x y y y"),
    (5, "The the THE the"),
    (6, "alpha beta gamma delta"),
    (7, "  leading   and trailing   "),
]


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return con


def test_ngrams_raw_twins_on_adversarial_texts(spark):
    sdf = spark.createDataFrame(TWIN_TEXTS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["b"], r["t"])
        for r in sdf.select(
            "doc_id",
            T.ngrams_raw(T.tokens("text"), 2).alias("b"),
            T.ngrams_raw(T.tokens("text"), 3).alias("t"),
        ).collect()
    }
    con = _duck(TWIN_TEXTS)
    toks = T.TOKENS_SQL("text")
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, {T.NGRAMS_RAW_SQL(toks, 2)}, {T.NGRAMS_RAW_SQL(toks, 3)} FROM t"
        ).fetchall()
    }
    assert got == want
    # the raw grams are in document order and keep duplicates — the
    # property shingles() erases and this generator exists to preserve
    assert got[3][0] == ["a b", "b a", "a b", "b a", "a b", "b a"]
    assert got[0] == ([], []) and got[1] == ([], [])


def test_max_multiplicity_twins(spark):
    arrays = [
        (0, []),
        (1, ["a"]),
        (2, ["a", "b", "a", "b", "a"]),
        (3, ["x", "x", "y", "y"]),  # tie between two runs
        (4, ["z"] * 7),
    ]
    sdf = spark.createDataFrame(arrays, "i long, arr array<string>")
    got = {
        r["i"]: r["m"]
        for r in sdf.select("i", T.max_multiplicity(F.col("arr")).alias("m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, arr VARCHAR[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", arrays)
    want = dict(
        con.execute(f"SELECT i, {T.MAX_MULTIPLICITY_SQL('arr')} FROM t").fetchall()
    )
    assert got == want == {0: 0, 1: 1, 2: 3, 3: 2, 4: 7}


def test_repetition_gate_literal(spark, sf_smoke, tmp_path):
    """Hand-computed: 'a b a b a' → bigrams [ab, ba, ab, ba] + 'a b'
    appended = 5 tokens... verified per-column below."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a", "en", "s", 9),
            (2, "alpha beta gamma delta", "en", "s", 22),
            (3, "", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "d")
    docs.coalesce(1).write.parquet(out + "/documents.parquet")
    rows = {r["doc_id"]: r.asDict() for r in t_repetition_gate(spark, out).collect()}
    # doc 1: toks [a,b,a,b,a]; bigrams [a b, b a, a b, b a] → n_bi 4,
    # distinct 2, dup 2, top run 2; trigrams [a b a, b a b, a b a] →
    # n_tri 3, distinct 2, dup 1. dup_bi*100=200 > 5*4 → flagged.
    assert rows[1] == dict(
        doc_id=1, n_tok=5, n_bi=4, dup_bi=2, top_bi=2, n_tri=3, dup_tri=1, keep=0
    )
    # doc 2: all distinct → every gate 0 > 0 false except top_bi:
    # 1*100 > 4*3 → 100 > 12 → FLAGGED: a 4-token doc's unique bigrams
    # are each 1/3 of the doc — the share gate is scale-aware by design.
    assert rows[2] == dict(
        doc_id=2, n_tok=4, n_bi=3, dup_bi=0, top_bi=1, n_tri=2, dup_tri=0, keep=0
    )
    # doc 3: empty — all counts 0, nothing trips (0 > 0 is false).
    assert rows[3] == dict(
        doc_id=3, n_tok=0, n_bi=0, dup_bi=0, top_bi=0, n_tri=0, dup_tri=0, keep=1
    )


def test_repetition_gate_plan_is_map_side(spark, sf_smoke):
    """The whole statistic is Catalyst HOFs in one codegen stage:
    ZERO exchanges, no Python boundary — scan-bandwidth-bound at any
    scale."""
    a = audit(REGISTRY["t_repetition_gate"].fn(spark, sf_smoke))
    assert a.n_exchanges == 0, a.text
    assert not a.has_python_udf, a.text


def test_repetition_gate_nonvacuous_on_graded_corpus(spark, sf_smoke):
    """Every one of the three gates trips at least once on the graded
    corpus, and both keep values occur — no threshold is decorative
    (the vacuity class the semantic-dedup tau review caught)."""
    pdf = t_repetition_gate(spark, sf_smoke).toPandas()
    assert (pdf.dup_bi * 100 > _REP_DUP_BI_PCT * pdf.n_bi).sum() > 0
    assert (pdf.dup_tri * 100 > _REP_DUP_TRI_PCT * pdf.n_tri).sum() > 0
    assert (pdf.top_bi * 100 > _REP_TOP_BI_PCT * pdf.n_bi).sum() > 0
    assert set(pdf.keep.unique()) == {0, 1}


def test_max_multiplicity_null_array_matches_sql_twin(spark):
    """NULL input array → 0 on BOTH twins (review finding, r8: Spark's
    F.aggregate propagated NULL while the SQL twin coalesced to 0 —
    the one asymmetry in this pair)."""
    import duckdb

    from orderly_spark.operators import text as T
    from pyspark.sql import functions as F

    rows = [(0, ["a", "a", "b"]), (1, []), (2, None)]
    sdf = spark.createDataFrame(rows, "i long, arr array<string>")
    got = {
        r["i"]: r["m"]
        for r in sdf.select("i", T.max_multiplicity(F.col("arr")).alias("m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, arr VARCHAR[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(f"SELECT i, {T.MAX_MULTIPLICITY_SQL('arr')} FROM t").fetchall()
    )
    assert got == want == {0: 2, 1: 0, 2: 0}


def test_max_multiplicity_null_members_match_sql_twin(spark):
    """NULL MEMBERS are ignored on both twins (r9 advice fix): DuckDB's
    list_distinct drops NULLs, so the SQL twin never counts a NULL run;
    the Spark fold previously did (eqNullSafe scored [NULL,NULL,'a']
    as 2). Both sides now score only non-NULL elements."""
    import duckdb

    from orderly_spark.operators import text as T
    from pyspark.sql import functions as F

    rows = [
        (0, [None, None, "a"]),
        (1, [None, None]),
        (2, ["a", None, "a", None, "a"]),
        (3, [None]),
    ]
    sdf = spark.createDataFrame(rows, "i long, arr array<string>")
    got = {
        r["i"]: r["m"]
        for r in sdf.select("i", T.max_multiplicity(F.col("arr")).alias("m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, arr VARCHAR[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(f"SELECT i, {T.MAX_MULTIPLICITY_SQL('arr')} FROM t").fetchall()
    )
    assert got == want == {0: 1, 1: 0, 2: 3, 3: 0}
