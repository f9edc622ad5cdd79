"""Round-11 scale probes (measured, not asserted — the round6-10
probe tradition):

P1. A4/P11 join paths at REFERENCE-REALISTIC vocabulary (r10 verdict
    item 6): the r10 probe measured the py4j literal cliff at 13 k
    entries; the reference's USPTO molecules-to-remove list is
    10⁴–10⁵ (orderly/extract/main.py:123-169). This probe times the
    join-routed twins at |names| = 10⁵ at sf0.1 and confirms (a) the
    256-entry threshold still routes to the join path (no InSet of
    the vocabulary in the optimized plan) and (b) the join path stays
    FLAT from 13 k → 10⁵ (the literal path is timed only at 256 — the
    r10 probe already measured its 51× cliff; re-running it at 10⁵
    would be minutes of pure py4j).

P2. s_ivf_cosine_topk standalone re-time (r10 verdict item 3: the
    bench slot moved 1.30→1.82 s with bit-unchanged code — host noise
    or real?). min-of-3 in a quiet process, recorded here and in
    SURVEY §17.

P3. parsed-Morgan fingerprint throughput (the r11 SMILES-parser op):
    (a) single-process kernel molecules/sec on DISTINCT synthetic
    molecules (the number that sizes a 100 TB chem extract: USPTO-full
    is ~10⁷ distinct molecule strings), and (b) the same corpus
    end-to-end through parsed_morgan_fp_udf on local[32] — the
    Arrow-batch + memoisation overhead/speedup over (a).

P4. label-propagation communities at 1× and 4× document scale
    (distinct-vocabulary copies, the scale_probe.py tradition so LSH
    pairs don't cross copies and per-copy graph structure is
    preserved): wall-clock ratio should be ~linear in edges — the
    per-round shuffles carry (id,label,count) triples only.

Usage: python tools/round11_scale_probe.py [sf_dir]   # default sf0.1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orderly_spark.session import get_spark


def timed(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def probe_vocab_routing(spark, sf_dir: str) -> None:
    from orderly_spark.operators import cleaning as C
    from orderly_spark.queries.clean_battery import _reactions

    rx = _reactions(spark, sf_dir, max_rid=None).localCheckpoint()
    n_rx = rx.count()
    print(f"[P1] reactions scaffold: {n_rx} rows at {sf_dir}")

    # 10^5-name dimension: mostly-absent synthetic names (the USPTO
    # list shape: most entries never occur in a given batch) plus a
    # real slice so the null-out actually touches rows
    real = rx.select(F.explode("reactants").alias("name")).distinct().limit(2000)
    synth = spark.range(100_000).select(F.concat(F.lit("nm"), F.col("id")).alias("name"))
    names = synth.unionByName(real).localCheckpoint()
    n_names = names.count()

    # --- P11 modes (a)/(c) at 10^5 names: join-routed null-out
    cfg = C.CleanConfig(
        set_unresolved_names_to_none=True,
        set_unresolved_names_to_none_if_mapped_rxn_str_exists_else_del_rxn=False,
    )
    tb, out = timed(lambda: C.handle_unresolved_names(rx, names, cfg), reps=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    inset_hits = plan.count("INSET")
    te, cnt = timed(lambda: out.count(), reps=3)
    print(
        f"[P1] P11 null-out @ {n_names} names: build {tb:.2f}s exec {te:.2f}s "
        f"rows {cnt} | INSET-of-vocab in plan: {inset_hits} (0 = join-routed)"
    )

    # --- P11 at exactly 256 names (the literal path, for the flatness
    # comparison point the threshold is defended by)
    small = names.limit(256).localCheckpoint()
    small.count()
    tb2, out2 = timed(lambda: C.handle_unresolved_names(rx, small, cfg), reps=1)
    te2, _ = timed(lambda: out2.count(), reps=3)
    print(f"[P1] P11 null-out @ 256 names (literal path): build {tb2:.2f}s exec {te2:.2f}s")

    # --- A4 join twin at 10^5 frequent molecules
    counts = names.select(
        F.col("name").alias("molecule"), F.lit(10).cast("long").alias("count")
    ).localCheckpoint()
    counts.count()
    tb3, out3 = timed(
        lambda: C.map_rare_molecules_to_other_join(rx, counts, min_freq=2), reps=3
    )
    te3, cnt3 = timed(lambda: out3.count(), reps=3)
    print(
        f"[P1] A4 join twin @ {n_names} frequent: build {tb3:.2f}s exec {te3:.2f}s rows {cnt3}"
    )
    # literal twin at 256 as the routing's other side
    counts256 = counts.limit(256).localCheckpoint()
    counts256.count()
    tb4, out4 = timed(lambda: C.map_rare_molecules_to_other(rx, counts256, min_freq=2), reps=1)
    te4, _ = timed(lambda: out4.count(), reps=3)
    print(f"[P1] A4 literal twin @ 256 frequent: build {tb4:.2f}s exec {te4:.2f}s")


def _synthetic_smiles(n: int) -> list[str]:
    """n DISTINCT parseable molecules with realistic size spread
    (chains, a branch, a charge site, a ring) — distinct strings so
    the memoised UDF cache cannot shortcut the parse.

    r12 advice fix: the r11 form derived everything from i%53 / i//53%41
    / i%3 (period 6519 → only 4346 distinct strings in 20k, ~78% cache
    hits inflating the UDF-path mol/s). Now a C/N chain segment encodes
    the FULL index i in binary, making the generator injective, and the
    caller asserts global distinctness, not just parseability."""
    out = []
    for i in range(n):
        a, b = i % 53, (i // 53) % 41
        ring = "1" if i % 3 == 0 else ""
        # i in binary as a C/N heavy-atom chain (LSB first; 'C'=1) —
        # unique per i, ~15 atoms at 20k molecules
        tail = "".join("C" if (i >> k) & 1 else "N" for k in range(max(i.bit_length(), 1)))
        out.append(
            f"C{ring}C{'C' * a}N(CC{'O' * (b % 4)})C{'C' * b}{tail}"
            f"C(=O)[O-].[Na+]{'C' + ring if ring else ''}"
        )
    return out


def probe_morgan_throughput(spark) -> None:
    import time as _t

    from orderly_spark.functions.chem import parsed_morgan_fp_udf
    from orderly_spark.functions.smiles import morgan_fingerprint

    mols = _synthetic_smiles(20_000)
    # guards: the corpus must PARSE (a generator typo would silently
    # time the parse-failure fast path) AND be globally DISTINCT (a
    # periodic generator lets the memoised UDF cache shortcut ~78% of
    # the work — the r11 inflation this fix closes)
    assert len(set(mols)) == len(mols), "generator must be injective"
    assert all(morgan_fingerprint(m, radius=2, n_bits=64) is not None for m in mols[:50])
    # (a) single-process kernel
    t0 = _t.perf_counter()
    for m in mols:
        morgan_fingerprint(m, radius=2, n_bits=1024)
    kernel_rate = len(mols) / (_t.perf_counter() - t0)
    print(f"[P3] kernel single-process: {kernel_rate:,.0f} mol/s "
          f"({len(mols)} distinct molecules, radius 2, 1024 bits)")
    # (b) end-to-end through the pandas UDF on local[32]
    df = spark.createDataFrame([(m,) for m in mols], "smiles string").repartition(32)
    df = df.localCheckpoint()  # exclude driver→executor ship time
    fp = parsed_morgan_fp_udf(n_bits=1024, radius=2)
    t, _cnt = timed(
        lambda: df.select(F.sum(F.aggregate(fp(F.col("smiles")), F.lit(0), lambda x, y: x + y))).collect(),
        reps=3,
    )
    print(f"[P3] UDF end-to-end local[32]: {len(mols)/t:,.0f} mol/s "
          f"(min-of-3; {len(mols)/t/kernel_rate:.1f}x the single-process kernel)")


def probe_lpa_scaling(spark, sf_dir: str) -> None:
    from orderly_spark.operators import dedup as D
    from orderly_spark.operators import graph as G
    from orderly_spark.tables import load

    base = load(spark, sf_dir, "documents", fan_out=True)
    # per-copy BIJECTIVE character rotation: within-copy shingle sets
    # map 1:1, so within-copy Jaccard — and thus the expected dup-graph
    # structure — is preserved EXACTLY, while copies share (almost) no
    # shingles. (A first draft prefixed "cpK " to every doc instead —
    # that handed every doc in a copy a COMMON shingle, densifying the
    # LSH graph 42× rather than scaling it; kept here as a warning.)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    for copies in (1, 4):
        d = base
        if copies > 1:
            parts = [
                base.select(
                    (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                    F.translate(F.col("text"), alpha, alpha[k:] + alpha[:k]).alias("text"),
                )
                for k in range(copies)
            ]
            d = parts[0]
            for p in parts[1:]:
                d = d.unionByName(p)
            d = d.repartition(32).localCheckpoint()
        pairs = D.lsh_candidate_pairs(
            d, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4
        ).localCheckpoint()
        n_pairs = pairs.count()
        t, cnt = timed(
            lambda: G.label_propagation_communities(pairs, iterations=3).count(), reps=3
        )
        print(f"[P4] LPA 3 rounds @ {copies}x docs: {t:.2f}s "
              f"({n_pairs} candidate pairs, {cnt} labelled nodes)")


def probe_ivf_retime(spark, sf_dir: str) -> None:
    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY

    fn = REGISTRY["s_ivf_cosine_topk"].fn
    t, cnt = timed(lambda: fn(spark, sf_dir).count(), reps=3)
    print(f"[P2] s_ivf_cosine_topk standalone min-of-3: {t:.2f}s ({cnt} rows)")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("round11-probe")
    probe_vocab_routing(spark, sf)
    probe_ivf_retime(spark, sf)
    probe_morgan_throughput(spark)
    probe_lpa_scaling(spark, sf)
