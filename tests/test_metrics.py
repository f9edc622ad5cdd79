"""Unit tests for the evaluation operators (SURVEY A8-A10/F17-F18)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orderly_spark.operators import metrics as M


def test_frequency_guess_and_accuracy(spark):
    train = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 3 + [("c", "z")] * 1,
        "c1 string, c2 string",
    )
    guesses = M.frequency_informed_guess(train, ["c1", "c2"], 2)
    got = [tuple(r.combo) for r in guesses.collect()]
    assert got == [("a", "x"), ("b", "y")]

    test = spark.createDataFrame(
        [("x", "a"), ("b", "y"), ("c", "z"), (None, "a")], "c1 string, c2 string"
    )
    acc = M.topk_combo_accuracy(test, guesses, ["c1", "c2"]).collect()[0]
    # ('x','a') sorted == ('a','x') → hit; ('b','y') hit; others miss
    assert acc.n_test == 4 and acc.n_hit == 2 and abs(acc.accuracy - 0.5) < 1e-12


def test_set_equality_match_null_fill(spark):
    df = spark.createDataFrame(
        [("a", None, None, "a"), ("a", "b", "a", "c")],
        "p1 string, p2 string, t1 string, t2 string",
    )
    got = [r.m for r in df.select(M.set_equality_match(["p1", "p2"], ["t1", "t2"]).alias("m")).collect()]
    assert got == [True, False]


def test_ohe_vocab_unseen_to_other(spark):
    train = spark.createDataFrame([("a",), ("b",), (None,)], "v string")
    df = spark.createDataFrame([("a",), ("c",), (None,)], "v string")
    out = M.encode_with_vocab(df, M.ohe_vocab(train, "v"), "v")
    got = sorted((r.v or "<null>") for r in out.collect())
    # 'c' unseen → other; null stays non-vocab → other (reference keeps
    # the NULL→'NULL' fill upstream of encoding)
    assert got == ["a", "other", "other"]


def test_role_popularity(spark):
    df = spark.createDataFrame(
        [(["x", "y"],), (["x"],), (["z"],)], "agents array<string>"
    )
    got = [(r.molecule, r.n) for r in M.role_popularity(df, "agents", 2).collect()]
    assert got == [("x", 2), ("y", 1)]  # tie y/z broken lexicographically


def test_rare_threshold_sweep_monotone(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b"],), (["c"],), ([],)],
        "agents array<string>",
    )
    # counts: a=4, b=1, c=1 ; rowmins: 4, 1, 1, +inf
    out = {
        r.threshold: r.rows_surviving
        for r in M.rare_threshold_sweep(df, ["agents"], [0, 2, 5]).collect()
    }
    assert out == {0: 4, 2: 2, 5: 1}


def test_topn_combination_match_literal(spark):
    """F19 (utils.py:106-208): hand-computed combination ranking.
    a = [(x,.6),(y,.4)], b = [(u,.9),(v,.1)] ->
    products: xu .54, yu .36, xv .06, yv .04 (desc)."""
    from pyspark.sql import functions as F
    from orderly_spark.operators.metrics import topn_combination_match

    def cand(*pairs):
        return F.array(*[
            F.struct(F.lit(v).alias("v"), F.lit(p).alias("p")) for v, p in pairs
        ])

    a = cand(("x", 0.6), ("y", 0.4))
    b = cand(("u", 0.9), ("v", 0.1))

    def match(true_vals, n):
        t = F.array_sort(F.array(*[F.lit(v) for v in true_vals]))
        return spark.range(1).select(
            topn_combination_match(a, b, t, n).alias("m")
        ).collect()[0]["m"]

    assert match(["x", "u"], 1) is True     # top combo
    assert match(["y", "u"], 1) is False    # rank 2
    assert match(["y", "u"], 2) is True
    assert match(["x", "v"], 3) is True     # rank 3
    assert match(["y", "v"], 3) is False    # rank 4
    assert match(["y", "v"], 4) is True
    assert match(["z", "u"], 4) is False    # never a candidate


def test_condition_benchmark_table_hand_values(spark):
    """Literal-fixture check of the composed benchmark table,
    independent of the DuckDB oracle (which shares the pipeline's
    decomposition): 10 rows, 90/10 split on rid%10, hand-computed
    top-1/top-3 hits per the reference's frequency_informed_accuracy
    (utils.py:211-237) with the documented tuple tie-break."""
    from pyspark.sql import functions as F

    from orderly_spark.queries.metrics_battery import condition_benchmark_table

    # rids 0-8 train, 9 test. Solvents: train has ['s1'] x5, ['s2'] x3,
    # ['s3'] x1; test row has ['s2'] -> top-1 (s1) misses, top-3 hits.
    # Agents: all rows [] -> combo (NULL,NULL,NULL) everywhere: top-1 hits.
    rows = []
    for rid in range(10):
        if rid < 5:
            solv = ["s1"]
        elif rid < 8:
            solv = ["s2"]
        elif rid == 8:
            solv = ["s3"]
        else:
            solv = ["s2"]  # the test row
        rows.append((rid, solv, []))
    rx = spark.createDataFrame(
        rows, "rid long, solvents array<string>, agents array<string>"
    )
    got = {
        (r["component_group"], r["top_k"]): (r["n_test"], r["n_hit"])
        for r in condition_benchmark_table(rx).collect()
    }
    assert got[("solvent", 1)] == (1, 0)   # top-1 = (NULL, s1), test is (NULL, s2)
    assert got[("solvent", 3)] == (1, 1)   # (NULL, s2) is the 2nd most common
    assert got[("agent", 1)] == (1, 1)     # single all-NULL combo
    assert got[("agent", 3)] == (1, 1)
    assert got[("overall", 1)] == (1, 0)
    assert got[("overall", 3)] == (1, 1)


def test_topn_tiebreak_is_injective_on_comma_values(spark):
    """The equal-probability tie-break compares tuple ARRAYS, not a
    comma-joined serialization (review finding, r8): ['a,b','c'] and
    ['a','b,c'] both serialize to 'a,b,c', so the old comparator saw
    them as equal and their top-n membership was unspecified. With
    array comparison ['a','b,c'] sorts first, deterministically."""
    from pyspark.sql import functions as F

    from orderly_spark.operators.metrics import topn_combination_match

    a = F.array(
        F.struct(F.lit("a,b").alias("v"), F.lit(0.5).alias("p")),
        F.struct(F.lit("a").alias("v"), F.lit(0.5).alias("p")),
    )
    b = F.array(
        F.struct(F.lit("c").alias("v"), F.lit(0.5).alias("p")),
        F.struct(F.lit("b,c").alias("v"), F.lit(0.5).alias("p")),
    )
    df = spark.range(1)
    # all four combos tie at p=0.25; array order puts ['a','b,c'] first
    hit_first = df.select(
        topn_combination_match(a, b, F.array(F.lit("a"), F.lit("b,c")), 1).alias("m")
    ).collect()[0]["m"]
    miss_first = df.select(
        topn_combination_match(a, b, F.array(F.lit("a,b"), F.lit("c")), 1).alias("m")
    ).collect()[0]["m"]
    assert hit_first is True
    assert miss_first is False  # deterministic loser at n=1
