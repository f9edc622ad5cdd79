"""Round-14 scale probes.

P1 — BLOOM-SIDECAR AMORTIZATION (VERDICT r13 item 5): the r13 probe
recorded the honest negative that the bloom pre-filter's warm wall
time was ~1.6x the unfiltered probe at sf0.01 because the bloom BUILD
rescans the whole index per batch. The negative names its own fix —
persist the m-bit sidecar and bit-OR-append it per accepted batch,
exactly like the index itself. This probe runs a >=3-batch
incremental ingest three ways and reports the measured crossover:

  A  unfiltered exact probe (d_incremental_index_dedup shape);
  B  bloom REBUILT from the full index every batch (the r13 shape);
  C  bloom PERSISTED: positions built once from the initial index,
     then appended with each accepted batch's key positions (a
     distinct-union over <= m integers — metadata-scale), probed
     broadcast exactly like B.

Per-batch and cumulative wall times printed; the crossover batch is
the first batch where cumulative C undercuts cumulative A (an honest
"never at this scale" is a valid outcome — the verdict asked for the
measurement, not a victory).

P2 — STEREO KERNEL COST: r13 measured Hückel perception effectively
free on tagless corpora; r14 adds tetrahedral stereo, whose resolver
only runs when tags exist. This probe measures canonical-SMILES
throughput on a 10k corpus where EVERY molecule carries a kept
stereocentre (the worst case: one refinement per molecule component)
next to the tagless twin corpus, plus collapse correctness per pair
(enantiomer families distinct, respellings equal).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_bloom_amortization(
    sf_dir: str = "/root/testdata/sf0.01", n_batches: int = 4
) -> None:
    from pyspark.sql import functions as F

    from orderly_spark.operators import dedup as D
    from orderly_spark.operators.dedup import _bloom_positions
    from orderly_spark.session import get_spark
    from orderly_spark.tables import load

    M_BITS, K = 65536, 2
    spark = get_spark("round14_probe")
    d = load(spark, sf_dir, "documents", fan_out=True)
    # batches by doc_id % (n_batches + 1); residue n_batches is the
    # initial index
    all_keys = D.lsh_band_keys(d, "doc_id", "text").withColumn(
        "b", F.col("__id") % (n_batches + 1)
    ).persist()
    all_keys.count()
    key_expr = F.concat(
        F.col("band_idx").cast("string"), F.lit(":"), F.col("band_hash")
    )

    def positions(df):
        return df.select(
            F.explode(F.array(*_bloom_positions(key_expr, M_BITS, K))).alias("p")
        ).distinct()

    def exact_probe(new_keys, old_keys, join_keys=None):
        # join_keys: the (possibly bloom-pruned) probe side; the
        # verdict left-joins against ALL new docs either way, so the
        # three variants return comparable row sets
        if join_keys is None:
            join_keys = new_keys
        hits = (
            join_keys.join(
                old_keys.withColumnRenamed("__id", "__old"),
                ["band_idx", "band_hash"],
            )
            .select("__id", "__old")
            .distinct()
        )
        agg = hits.groupBy("__id").agg(F.count(F.lit(1)).alias("n"))
        return (
            new_keys.select("__id").distinct()
            .join(agg, "__id", "left")
            .select("__id", F.coalesce("n", F.lit(0)).alias("n"))
        )

    def bloom_probe(new_keys, old_keys, bits):
        probed = (
            new_keys.join(F.broadcast(bits.agg(
                F.sort_array(F.collect_list("p")).alias("bf"))))
            .withColumn(
                "hit",
                F.forall(
                    F.array(*_bloom_positions(key_expr, M_BITS, K)),
                    lambda p: F.array_contains(F.col("bf"), p),
                ),
            )
            .drop("bf")
        )
        return exact_probe(new_keys, old_keys, probed.filter(F.col("hit")))

    # warm up codegen / scan caches once
    exact_probe(all_keys.filter(F.col("b") == 0),
                all_keys.filter(F.col("b") == n_batches)).count()

    results: dict[str, list[float]] = {"A": [], "B": [], "C": []}
    checks: list[bool] = []
    # C's persisted sidecar: positions of the initial index, built once
    t0 = time.perf_counter()
    sidecar = positions(all_keys.filter(F.col("b") == n_batches)).localCheckpoint()
    sidecar.count()
    c_init = time.perf_counter() - t0
    print(f"[P1] persisted-sidecar initial build: {c_init:6.2f} s "
          f"({sidecar.count()} set bits of {M_BITS})")
    index_pred = F.col("b") == n_batches
    for b in range(n_batches):
        new_keys = all_keys.filter(F.col("b") == b)
        old_keys = all_keys.filter(index_pred).localCheckpoint()
        old_keys.count()

        t0 = time.perf_counter()
        ra = exact_probe(new_keys, old_keys).collect()
        results["A"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        bits_rebuilt = positions(old_keys)
        rb = bloom_probe(new_keys, old_keys, bits_rebuilt).collect()
        results["B"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        rc = bloom_probe(new_keys, old_keys, sidecar).collect()
        results["C"].append(time.perf_counter() - t0)

        # zero-false-negative check: all three verdicts identical
        ka = sorted((r["__id"], r["n"]) for r in ra)
        checks.append(
            ka == sorted((r["__id"], r["n"]) for r in rb)
            == sorted((r["__id"], r["n"]) for r in rc)
        )
        # accept the batch: index grows, sidecar bit-OR-appends
        index_pred = index_pred | (F.col("b") <= b)
        t0 = time.perf_counter()
        sidecar = sidecar.union(positions(new_keys)).distinct().localCheckpoint()
        sidecar.count()
        append_cost = time.perf_counter() - t0
        print(
            f"[P1] batch {b}: A {results['A'][-1]:5.2f}s | "
            f"B(rebuild) {results['B'][-1]:5.2f}s | "
            f"C(persist) {results['C'][-1]:5.2f}s | "
            f"sidecar append {append_cost:4.2f}s | verdicts equal: {checks[-1]}"
        )
    assert all(checks), "verdict mismatch between probe variants"
    ca = cb = cc = 0.0
    crossover = None
    for b in range(n_batches):
        ca += results["A"][b]
        cb += results["B"][b]
        cc += results["C"][b]
        if crossover is None and cc + c_init < ca:
            crossover = b
    print(
        f"[P1] cumulative over {n_batches} batches: A {ca:5.2f}s | "
        f"B {cb:5.2f}s | C {cc:5.2f}s (+{c_init:4.2f}s one-time build)"
    )
    print(
        f"[P1] crossover (cumulative C+build < cumulative A): "
        f"{'batch ' + str(crossover) if crossover is not None else 'not reached at this scale'}"
    )
    all_keys.unpersist()


def probe_stereo_throughput(n: int = 10_000) -> None:
    import time as _t

    from orderly_spark.functions.smiles import canonical_smiles

    # every molecule a genuine stereocentre: R/S alternating with a
    # varying chain so the corpus is injective
    tagged, tagless = [], []
    for i in range(n):
        tail = "C" * (1 + i % 7) + ("O" if i % 2 else "N")
        tag = "@" if i % 3 == 0 else "@@"
        tagged.append(f"F[C{tag}H](Cl){tail}{'C' * (i % 5)}Br")
        tagless.append(f"FC(Cl){tail}{'C' * (i % 5)}Br")
    t0 = _t.perf_counter()
    outs = [canonical_smiles(s) for s in tagged]
    dt_tag = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    outs0 = [canonical_smiles(s) for s in tagless]
    dt_flat = _t.perf_counter() - t0
    assert all(o is not None for o in outs + outs0)
    kept = sum("@" in o for o in outs)
    print(
        f"[P2] canon ALL-stereo: {n / dt_tag:8,.0f} mol/s ({kept}/{n} tags kept) | "
        f"tagless twin: {n / dt_flat:8,.0f} mol/s | overhead {dt_tag / dt_flat:.2f}x"
    )
    # pairwise enantiomer distinctness on a sample
    for i in range(0, 200, 7):
        a = tagged[i]
        b = a.replace("[C@@H]", "[X]").replace("[C@H]", "[C@@H]").replace("[X]", "[C@H]")
        assert canonical_smiles(a) != canonical_smiles(b), a


if __name__ == "__main__":
    probe_stereo_throughput()
    probe_bloom_amortization()
