"""Semantic invariants of the round-4 curation operators, asserted on
real testdata output (the DuckDB oracle proves engine parity; these
pin the SEMANTICS — an oracle mirroring the same mistake would pass
the gate, these wouldn't)."""

from __future__ import annotations

import pytest

import orderly_spark.queries  # noqa: F401
from orderly_spark.registry import REGISTRY


def rows(spark, sf, name):
    return REGISTRY[name].fn(spark, sf).collect()


def test_chunking_tiles_every_document(spark, sf_smoke):
    """Chunks start every STRIDE tokens from 1, first chunk covers
    token 1, last chunk reaches exactly token n, sizes are CHUNK except
    a shorter tail, and chunk_idx is dense from 0."""
    from orderly_spark.queries.curation_battery import _CHUNK, _STRIDE

    by_doc: dict[int, list] = {}
    for r in rows(spark, sf_smoke, "t_doc_chunking"):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = chunks[-1].chunk_start + chunks[-1].chunk_tokens - 1  # last reaches n
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.chunk_start == 1 + i * _STRIDE
            assert c.chunk_tokens == min(_CHUNK, n - c.chunk_start + 1)
            assert 1 <= c.chunk_tokens <= _CHUNK
        # every start <= n (no empty chunks past the end)
        assert chunks[-1].chunk_start <= n


def test_repetition_ratios_bounded_and_consistent(spark, sf_smoke):
    got = rows(spark, sf_smoke, "t_repetition_signals")
    assert got
    for r in got:
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 <= r.top_bigram_ratio <= 1.0
        if r.n_tokens >= 2:
            # a most-frequent bigram exists, so the ratio is positive
            assert r.top_bigram_ratio > 0.0
        if r.n_tokens <= 1:
            assert r.top_bigram_ratio == 0.0


def test_latest_state_is_argmax_by_time(spark, sf_smoke):
    from orderly_spark.tables import load
    import pyspark.sql.functions as F

    got = {r.user_id: r for r in rows(spark, sf_smoke, "e_latest_state_per_key")}
    truth = (
        load(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(truth) == len(got)
    for t in truth:
        r = got[t.user_id]
        assert r.last_ts == t.max_ts
        assert r.n_events == t.n


def test_decontamination_flags_only_train_docs_with_real_overlap(spark, sf_smoke):
    from orderly_spark.queries.curation_battery import _EVAL_MOD, _EVAL_RES

    got = rows(spark, sf_smoke, "t_benchmark_decontamination")
    assert got
    for r in got:
        # flagged docs are TRAIN members (eval = the scale-free modulus)
        assert r.doc_id % _EVAL_MOD != _EVAL_RES
        assert r.n_shared_shingles >= 1
        assert r.n_eval_docs_hit >= 1


def test_snapshot_diff_statuses_follow_scaffold(spark, sf_smoke):
    """added ⟺ in new only; removed ⟺ in old only; changed ⟺ in both
    with a revision — derivable from the deterministic scaffold."""
    got = rows(spark, sf_smoke, "d_corpus_snapshot_diff")
    assert got
    seen = set()
    for r in got:
        d = r.doc_id
        in_old, in_new = d % 7 != 0, d % 3 != 0
        expect = (
            "added" if (not in_old and in_new)
            else "removed" if (in_old and not in_new)
            else "changed"
        )
        assert r.status == expect, (d, r.status)
        if r.status == "changed":
            assert in_old and in_new and d % 5 == 0
        seen.add((d, r.status))
    # unchanged docs (in both, no revision) must NOT appear
    assert all(not (d % 7 and d % 3 and d % 5) for d, s in seen if s == "changed")


def test_quantized_topk_error_is_small_and_ranked(spark, sf_smoke):
    got = rows(spark, sf_smoke, "s_quantized_cosine_topk")
    assert got
    per_q: dict[int, list] = {}
    for r in got:
        assert -1.0000001 <= r.cosine_q <= 1.0000001
        assert abs(r.cosine_exact - r.cosine_q) == pytest.approx(r.abs_err)
        # int8 absmax quantization of 64-dim vectors: cosine error
        # stays well inside this envelope
        assert r.abs_err < 0.05
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        rs.sort(key=lambda x: x.rank)
        for a, b in zip(rs, rs[1:]):
            assert a.cosine_q >= b.cosine_q


def test_salient_terms_rank_by_score_with_full_corpus_df(spark, sf_smoke):
    got = rows(spark, sf_smoke, "t_salient_terms")
    assert got
    per_doc: dict[int, list] = {}
    for r in got:
        assert r.doc_id < 100
        assert r.score == pytest.approx(r.tf / (r.df + 1.0))
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda x: x.rank)
        assert [x.rank for x in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.score, ) >= (b.score, )


def test_stream_attribution_matches_batch_asof_superset(spark, sf_smoke):
    """Every attributed pair respects the 30-minute window and keys."""
    got = rows(spark, sf_smoke, "s_stream_click_attribution")
    assert got
    for r in got:
        delta = (r.purchase_ts - r.click_ts).total_seconds()
        assert 0 <= delta <= 1800


def test_span_dedup_semantics(spark, sf_smoke):
    """The C4-span-dedup invariants the oracle could mirror wrongly:
    (1) every distinct span string survives EXACTLY once corpus-wide;
    (2) the survivor is the first occurrence in (doc_id, span_idx)
    order; (3) a document's rebuilt text is the in-order concat of its
    kept spans; (4) n_kept <= n_spans with equality iff no span of the
    doc ever appeared earlier."""
    from orderly_spark.queries.curation_battery import _SPAN

    got = {r.doc_id: r for r in rows(spark, sf_smoke, "t_span_dedup_rebuild")}
    assert got
    # recompute spans driver-side from the raw table (the same fixture
    # path the query read). str.split() mirrors the engine's \s+
    # tokenizer on this ASCII corpus; unicode whitespace would differ.
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, lower(text) AS text FROM "
        f"'{sf_smoke}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    first_owner: dict[str, tuple] = {}
    all_spans: dict[int, list[str]] = {}
    for doc_id, text in docs:
        toks = text.split()
        spans = [
            " ".join(toks[i : i + _SPAN]) for i in range(0, len(toks), _SPAN)
        ]
        all_spans[doc_id] = spans
        for idx, sp in enumerate(spans):
            first_owner.setdefault(sp, (doc_id, idx))
    kept_spans: list[str] = []
    for doc_id, spans in all_spans.items():
        if not spans:
            continue
        r = got[doc_id]
        expect_kept = [
            sp for idx, sp in enumerate(spans) if first_owner[sp] == (doc_id, idx)
        ]
        assert r.n_spans == len(spans)
        assert r.n_kept == len(expect_kept)
        assert r.text_kept == " ".join(expect_kept)
        kept_spans.extend(expect_kept)
    # (1): exactly-once survival
    assert len(kept_spans) == len(set(kept_spans)) == len(first_owner)


def test_checksum_is_partitioning_invariant(spark, sf_smoke):
    """The reconciliation checksum must not depend on partition count
    or row order — same values after an adversarial repartition."""
    base = {r.source: (r.n_rows, r.checksum) for r in rows(spark, sf_smoke, "a_table_checksum_rollup")}
    assert "<ALL>" in base and len(base) > 1
    # shuffle the input hard: the query reads via load(); emulate by
    # comparing against a checksum over a repartitioned duplicate
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{sf_smoke}/documents.parquet").repartition(17, "n_chars")
    row_str = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").cast("string"),
    )
    h48 = F.conv(F.substring(F.md5(row_str), 1, 12), 16, 10).cast("decimal(38,0)")
    redo = {
        r.source: (r.n_rows, r.checksum)
        for r in df.select("source", h48.alias("__h"))
        .rollup("source")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("__h").cast("string").alias("checksum"))
        .select(
            F.coalesce(F.col("source"), F.lit("<ALL>")).alias("source"),
            "n_rows",
            "checksum",
        )
        .collect()
    }
    assert redo == base


def test_interval_overlap_matches_direct_theta_join(spark, sf_smoke):
    """The bucketed equi-join must reproduce the direct inequality
    join exactly (Spark-side cross check, independent of the DuckDB
    oracle)."""
    import pyspark.sql.functions as F

    from orderly_spark.operators.relational import epoch_us, sessionize
    from orderly_spark.queries.relational import _INC_HALF_US

    e = spark.read.parquet(f"{sf_smoke}/events.parquet")
    sess = sessionize(e, "user_id", "ts", 30.0, "event_id")
    ints = sess.groupBy("user_id", "session_id").agg(
        F.min(epoch_us(F.col("ts"))).alias("s_start"),
        F.max(epoch_us(F.col("ts"))).alias("s_end"),
    )
    inc = e.filter(F.col("value") > 250).select(
        "event_id",
        (epoch_us(F.col("ts")) - _INC_HALF_US).alias("i_start"),
        (epoch_us(F.col("ts")) + _INC_HALF_US).alias("i_end"),
    )
    direct = (
        ints.join(
            inc,
            (F.col("s_start") <= F.col("i_end")) & (F.col("i_start") <= F.col("s_end")),
        )
        .groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(F.count(F.lit(1)).alias("n_incidents"), F.min("event_id").alias("first_incident"))
    )
    got = sorted(map(tuple, rows(spark, sf_smoke, "j_interval_overlap_join")))
    want = sorted(map(tuple, direct.collect()))
    assert got == want and got


def test_countmin_never_underestimates(spark, sf_smoke):
    """CMS hard guarantee: estimate >= true count for EVERY key, and
    at least one collision-driven overestimate exists at the test
    grid size (else the min-over-rows logic is untested)."""
    got = rows(spark, sf_smoke, "a_countmin_estimates")
    assert got
    assert all(r.cms_estimate >= r.true_count for r in got)
    assert all(r.overestimate == r.cms_estimate - r.true_count for r in got)
    assert any(r.overestimate > 0 for r in got)


def test_countmin_counters_merge_by_sum(spark, sf_smoke):
    """The 100 TB claim behind the CMS op: the counter grid is
    ADDITIVE — sketch(all docs) equals the element-wise sum of the
    sketches of any partition of the corpus."""
    import pyspark.sql.functions as F

    from orderly_spark.operators import text as T
    from orderly_spark.queries.curation_battery import _CMS_D, _CMS_W

    def counters(df):
        tok = df.select(F.explode(T.tokens("text")).alias("term"))
        h = tok.select(
            "term",
            F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j"),
        ).withColumn(
            "bucket",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("term"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % _CMS_W,
        )
        return {
            (r.j, r.bucket): r.c
            for r in h.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c")).collect()
        }

    d = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    whole = counters(d)
    a = counters(d.filter(F.col("doc_id") % 2 == 0))
    b = counters(d.filter(F.col("doc_id") % 2 == 1))
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == whole


def test_hll_registers_merge_by_max(spark, sf_smoke):
    """The HLL mergeability claim: registers(all) == element-wise MAX
    of partition registers."""
    import pyspark.sql.functions as F

    from orderly_spark.queries.relational import _HLL_CAP, _HLL_M

    def registers(df):
        h = df.select(F.md5(F.col("user_id").cast("string")).alias("hx")).distinct()
        v = F.conv(F.substring("hx", 3, 12), 16, 10).cast("long")
        rr = h.select(
            (F.conv(F.substring("hx", 1, 2), 16, 10).cast("long") % _HLL_M).alias("bucket"),
            F.when(v > 0, F.least(F.lit(48) - F.length(F.bin(v)) + 1, F.lit(_HLL_CAP)))
            .otherwise(F.lit(_HLL_CAP))
            .alias("rho"),
        )
        return {
            r.bucket: r.reg
            for r in rr.groupBy("bucket").agg(F.max("rho").alias("reg")).collect()
        }

    e = spark.read.parquet(f"{sf_smoke}/events.parquet")
    whole = registers(e)
    a = registers(e.filter(F.col("event_id") % 2 == 0))
    b = registers(e.filter(F.col("event_id") % 2 == 1))
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == whole


def test_sessionize_boundary_gap_is_same_session(spark):
    """Pins the gap comparison the oracles must mirror: sessionize()
    splits on gap STRICTLY GREATER than the threshold, so two events
    exactly 30:00.000000 apart share a session (the review caught two
    new oracles using >=, which diverges only on this boundary —
    measure-zero in random microsecond data, so only this test
    guards it)."""
    import datetime as dt

    from orderly_spark.operators.relational import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10),
        (1, t0 + dt.timedelta(minutes=30), 11),          # exactly the gap
        (1, t0 + dt.timedelta(minutes=60, seconds=1), 12),  # 30:01 after
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {r.event_id: r.session_id for r in sessionize(df, "user_id", "ts", 30.0, "event_id").collect()}
    assert got[10] == got[11]  # boundary gap does NOT split
    assert got[12] == got[11] + 1  # one microsecond past the gap does


def test_histogram_quantiles_constant_column(spark, tmp_path):
    """r10 single-row sweep finding: a constant value column (hi ==
    lo — reachable at ANY scale, not just one row) must put every row
    in bin 0 and report the constant as every quantile's lower bound,
    not raise ANSI DIVIDE_BY_ZERO."""
    import duckdb

    d = tmp_path / "const_sf"
    d.mkdir()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders events documents embeddings".split():
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT 1) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    # lineitem with a CONSTANT extendedprice over several rows
    con.execute(
        "COPY (SELECT * REPLACE (CAST(42.5 AS DOUBLE) AS l_extendedprice) "
        f"FROM '/root/testdata/sf0.001/lineitem.parquet' LIMIT 20) "
        f"TO '{d}/lineitem.parquet' (FORMAT PARQUET)"
    )
    from orderly_spark.registry import REGISTRY

    rows = REGISTRY["a_histogram_quantiles"].fn(spark, str(d)).collect()
    assert sorted((r.q, r.quantile_lower_bound) for r in rows) == [
        (50, 42.5), (90, 42.5), (99, 42.5),
    ]
