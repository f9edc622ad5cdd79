"""Round-10 scale probes (measured, not asserted — the round6-9
probe tradition, honest negatives recorded):

P1. OPQ-lite vs plain PQ at sf0.1: (a) the subspace variance-balance
    ratio the permutation exists to fix (max/min subspace variance
    share before vs after), and (b) candidate recall@10 of the ADC
    stage against brute-force cosine top-10 — does the balanced
    space actually buy recall on THIS corpus, or only balance? The
    synthetic embeddings are near-isotropic, so the honest
    expectation is a large balance gain with a small recall delta;
    the operator's value case is anisotropic real embeddings.

P2. ORD wire-codec decode throughput: N .pb.gz dataset files of R
    wire-format reactions each, decoded through the mapInPandas task
    fan-out (reactions/sec end to end, scan included) — the number a
    100 TB extract sizes its cluster with. The JSON-lines format is
    timed on EQUIVALENT content as the comparison point.

Usage: python tools/round10_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orderly_spark.session import get_spark


def timed(fn, reps=2):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def probe_opq(spark, sf_dir: str) -> None:
    from orderly_spark.operators.clustering import (
        opq_balanced_permutation,
        opq_pq_adc_topk,
        pq_adc_topk,
    )
    from orderly_spark.operators.similarity import cosine_topk
    from orderly_spark.tables import load

    e = load(spark, sf_dir, "embeddings", fan_out=True)
    n_vec, dim = e.select(F.count(F.lit(1)), F.first(F.size("embedding"))).first()
    q = e.filter(F.col("vec_id") < 50)
    m = 2
    e.count()  # warm footers

    # (a) variance balance: exact integer per-dim variance, summed per
    # subspace under the identity layout vs the learned permutation
    perm = opq_balanced_permutation(e, m_subs=m, dim=dim)
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.floor(F.element_at("embedding", i + 1).cast("double") * 1024).cast("long")).alias(f"s{i}")
            for i in range(dim)
        ],
        *[
            F.sum(
                F.pow(F.floor(F.element_at("embedding", i + 1).cast("double") * 1024), 2).cast("long")
            ).alias(f"ss{i}")
            for i in range(dim)
        ],
    ).first()
    var = [row["n"] * row[f"ss{i}"] - row[f"s{i}"] ** 2 for i in range(dim)]
    sub_w = dim // m

    def ratio(layout):
        shares = [sum(var[d] for d in layout[s * sub_w : (s + 1) * sub_w]) for s in range(m)]
        return max(shares) / max(1, min(shares))

    r_id = ratio(list(range(dim)))
    r_opq = ratio(perm)
    print(f"P1a variance balance (max/min subspace share): identity {r_id:.4f} -> OPQ {r_opq:.4f}")

    # (b) ADC candidate recall@10 vs brute-force top-10 (50 queries)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, k=10).collect()
    }

    def recall(fn, label):
        t, out = timed(lambda: fn().collect())
        got = {(r["query_id"], r["neighbor_id"]) for r in out}
        rec = len(got & brute) / len(brute)
        print(f"P1b {label}: recall@10 vs brute {rec:.3f} ({t:.2f}s end-to-end incl. training)")

    recall(lambda: pq_adc_topk(e, q, m_subs=m, codebook_k=4, n_candidates=10, topk=10), "plain PQ (k=4, cand=10)")
    recall(lambda: opq_pq_adc_topk(e, q, m_subs=m, codebook_k=4, n_candidates=10, topk=10), "OPQ-lite PQ (k=4, cand=10)")
    # the knobs that actually buy recall: codebook size + candidate pool
    recall(lambda: pq_adc_topk(e, q, m_subs=m, codebook_k=16, iterations=3, n_candidates=100, topk=10), "plain PQ (k=16, cand=100)")
    recall(lambda: opq_pq_adc_topk(e, q, m_subs=m, codebook_k=16, iterations=3, n_candidates=100, topk=10), "OPQ-lite PQ (k=16, cand=100)")


def probe_wire_decode(spark) -> None:
    import tempfile

    from orderly_spark.sources import ord_wire as W
    from orderly_spark.sources.ord import (
        decode_reactions,
        fake_dataset_bytes,
        json_decoder,
        scan_ord_files,
    )

    n_files, n_rxn = 50, 200
    root_pb = tempfile.mkdtemp(prefix="probe_pb_")
    root_js = tempfile.mkdtemp(prefix="probe_js_")
    for f in range(n_files):
        rxns = [
            W.encode_reaction(
                cxsmiles=f"CC{f}>O>CCO{i} |f:1|",
                inputs=[("m1", [W.encode_compound([(2, f"CC.N{i}")], 1),
                                W.encode_compound([(2, "O")], 3)])],
                products=[(f"[Na+].[OO{i}-]", float(i % 100)), ("OCC", None)],
                time_value=float(i % 50), time_units=2,
                temp_value=float(i % 80), temp_units=1,
                procedure_details=f"proc {f}:{i}",
                experiment_start="06/15/2023",
            )
            for i in range(n_rxn)
        ]
        with open(os.path.join(root_pb, f"d{f}.pb.gz"), "wb") as fh:
            fh.write(W.dataset_pb_gz(rxns, name=f"d{f}"))
        rows = [
            {
                "rxn_str": f"CC{f}>O>CCO{i}",
                "reactants": ["CC", f"N{i}"],
                "solvents": ["O"],
                "products": [f"[OO{i}-]", "[Na+]", "OCC"],
                "yields": [float(i % 100), None, None],
                "rxn_time": round((i % 50) / 60, 2),
                "temperature": float(i % 80),
                "procedure_details": f"proc {f}:{i}",
                "is_mapped": False,
            }
            for i in range(n_rxn)
        ]
        with open(os.path.join(root_js, f"d{f}.pb.gz"), "wb") as fh:
            fh.write(fake_dataset_bytes(rows))

    total = n_files * n_rxn
    for label, root, dec in (("wire protobuf", root_pb, None), ("json-lines", root_js, json_decoder)):
        def run():
            files = scan_ord_files(spark, root)
            return decode_reactions(files, decoder=dec).count()

        t, n = timed(run)
        assert n == total, (label, n)
        print(f"P2 {label}: {total} reactions in {t:.2f}s = {total / t:,.0f} rxn/s ({n_files} files, task fan-out)")

    import shutil

    shutil.rmtree(root_pb, ignore_errors=True)
    shutil.rmtree(root_js, ignore_errors=True)


def probe_rare_paths(spark, sf_dir: str) -> None:
    """P3: the two A4 physical strategies on the same full-scale
    input, across frequent-set sizes. FINDING (reversed the prior
    docstring guidance): execution and Catalyst are cheap on both
    paths — the literal variant's real cost is PY4J EXPRESSION
    CONSTRUCTION, ~2 ms per frequent entry per role column (measured
    split at 13 k entries: collect+expression build 29.0 s, Catalyst
    0.42 s, execution 0.29 s; InSet conversion verified to fire even
    inside the transform lambda). The join path is flat. Crossover
    ~O(100) entries; the clean pipeline routes on _RARE_LITERAL_MAX."""
    from orderly_spark.operators import cleaning as C
    from orderly_spark.queries.clean_battery import _reactions

    rx = _reactions(spark, sf_dir, max_rid=None).cache()
    n = rx.count()
    counts = C.condition_value_counts(rx).cache()
    counts.count()
    for mf in (4, 50, 200):
        n_freq = counts.filter(F.col("count") >= mf).count()
        t_lit, _ = timed(lambda: C.map_rare_molecules_to_other(rx, counts, mf).count())
        t_join, _ = timed(
            lambda: C.map_rare_molecules_to_other_join(rx, counts, mf, id_col="rid").count()
        )
        print(
            f"P3 rare->other ({n} rows, min_freq={mf}, |frequent|={n_freq}): "
            f"literal {t_lit:.2f}s vs join {t_join:.2f}s ({t_lit / max(t_join, 1e-9):.1f}x)"
        )
    counts.unpersist()
    rx.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("round10_probe")
    probe_opq(spark, sf_dir)
    probe_wire_decode(spark)
    probe_rare_paths(spark, sf_dir)


if __name__ == "__main__":
    main()
