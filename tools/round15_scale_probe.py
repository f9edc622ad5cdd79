"""Round-15 scale probes.

P1 — BLOOM BITMAP REPRESENTATION (VERDICT r14 item 5): r14 carried
the watch item that the sidecar's bit state was a sorted position
array probed with array_contains — a linear scan per probe key that
stops being the right representation once m outgrows ~64 Ki. r15
replaces it with a packed long-array bitmap (m/64 words, element_at +
bitwise AND — O(1) per key). This probe runs the incremental probe at
m = 64 Ki / 1 Mi / 16 Mi on the sf0.01 documents corpus and asserts:
verdicts identical to the UNFILTERED exact probe at every m (zero
false negatives), pruning monotone in m, wall time flat-ish in m (the
probe cost no longer scales with the number of set bits).

P2 — E/Z + FIXPOINT KERNEL COST: r14 measured tetrahedral stereo at
1.87x on an all-stereo worst case and zero on tagless corpora. r15
adds the bond-stereo resolver, the descriptor fixpoint, and the para
rule — all gated behind the same "any stereo in the input" early
exit. This probe measures canonical-SMILES throughput on (a) a 10k
ALL-E/Z corpus (every molecule carries a kept double bond — resolver
+ constraint solve + general-path routing per molecule, the worst
case), (b) the tagless twin corpus, (c) a 10k all-tetrahedral corpus
(r14's P2 shape, regression guard), plus collapse correctness per
pair (slash respellings equal, E vs Z distinct).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_bloom_bitmap(sf_dir: str = "/root/testdata/sf0.01") -> None:
    from pyspark.sql import functions as F

    from orderly_spark.operators import dedup as D
    from orderly_spark.session import get_spark

    spark = get_spark("round15_probe")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_keys = D.lsh_band_keys(d.filter(F.col("doc_id") % 5 == 0), "doc_id", "text")
    old_keys = D.lsh_band_keys(d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text")
    new_keys.localCheckpoint()
    old_keys.localCheckpoint()

    def run(m):
        t0 = time.time()
        rows = D.bloom_filtered_index_probe(
            new_keys, old_keys, m_bits=m
        ).collect()
        return time.time() - t0, {
            r.new_doc_id: (r.n_keys, r.is_near_dup, r.n_index_matches) for r in rows
        }, sum(r.n_keys_bloom_pos for r in rows)

    # warm-up once so JIT/shuffle service costs don't land on m=64Ki
    run(1 << 16)
    results = {}
    for m in (1 << 16, 1 << 20, 1 << 24):
        wall, verd, pos = run(m)
        results[m] = (wall, verd, pos)
        print(f"P1 m={m:>9d}: wall={wall:6.2f}s  bloom_pos_keys={pos}")
    base = None
    for m, (wall, verd, pos) in results.items():
        if base is None:
            base = verd
        assert verd == base, f"verdict drift at m={m}"
    ms = sorted(results)
    assert results[ms[0]][2] >= results[ms[1]][2] >= results[ms[2]][2], (
        "pruning must be monotone in m"
    )
    print("P1 OK: verdicts identical at all m, pruning monotone")


def _ez_corpus(n: int = 10000):
    """n molecules, every one carrying a kept E/Z double bond (and a
    conjugated shared-slash pair every 4th), as (ez_spelling,
    respelling, mirror_spelling, tagless) tuples."""
    out = []
    subs = ["F", "Cl", "Br", "O", "N", "CC", "CCC", "OC", "CO"]
    for i in range(n):
        a = subs[i % len(subs)]
        b = subs[(i // len(subs)) % len(subs)]
        if a == b:
            b = "I"
        if i % 4 == 0:
            ez = f"{a}/C=C/C=C\\{b}"
            re_ = f"{a}\\C=C\\C=C/{b}"
            mi = f"{a}/C=C/C=C/{b}"
            tag = f"{a}C=CC=C{b}"
        else:
            ez = f"{a}/C=C/{b}"
            re_ = f"{a}\\C=C\\{b}"
            mi = f"{a}/C=C\\{b}"
            tag = f"{a}C=C{b}"
        out.append((ez, re_, mi, tag))
    return out


def probe_stereo_cost(n: int = 10000) -> None:
    from orderly_spark.functions.smiles import canonical_smiles

    corpus = _ez_corpus(n)
    t0 = time.time()
    outs = [canonical_smiles(ez) for ez, _r, _m, _t in corpus]
    t_ez = time.time() - t0
    t0 = time.time()
    flat = [canonical_smiles(t) for _e, _r, _m, t in corpus]
    t_flat = time.time() - t0
    bad = 0
    for (ez, re_, mi, _t), o in zip(corpus, outs):
        if canonical_smiles(re_) != o or canonical_smiles(mi) == o:
            bad += 1
    # r14 regression guard: all-tetrahedral corpus
    tet = [f"N[C@@H](C{'C' * (i % 5)})C(=O)O" for i in range(n)]
    t0 = time.time()
    for s in tet:
        canonical_smiles(s)
    t_tet = time.time() - t0
    print(
        f"P2 n={n}: EZ {t_ez:.2f}s ({n / t_ez:.0f}/s)  tagless {t_flat:.2f}s "
        f"({n / t_flat:.0f}/s)  tetra {t_tet:.2f}s ({n / t_tet:.0f}/s)  "
        f"EZ overhead x{t_ez / t_flat:.2f}  collapse_failures={bad}"
    )
    assert bad == 0
    assert None not in outs and None not in flat


if __name__ == "__main__":
    probe_stereo_cost()
    probe_bloom_bitmap()
