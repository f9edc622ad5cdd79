"""Round-13 scale probes.

P1 — macrocycle family CLOSED (r12 verdict item 4): plain C36–C154
rings were the writer's only fallback family (152/200 budget
exhaustions in round12_scale_probe). The r13 rotation-orbit path
(_canon_cycle: lex-min over all 2n start×direction walks) makes them
exact — this probe asserts 0/200 fallbacks across plain, hetero and
aromatic simple cycles, plus idempotence and rotation invariance, and
pins the NEW deterministic ceiling (orbit budget ⇒ plain rings
complete through ~C380, fall back at C400).

P2 — aromaticity perception at adversarial scale (r12 verdict item
2): Kekulé↔aromatic collapse verified molecule-by-molecule on
generated substituted benzenoids/heteroaromatics (200/family), with
throughput, plus the _PERCEIVE_EDGE_CAP fuzzer-lattice guard: a ring
lattice past the cap must skip perception DETERMINISTICALLY and fast
(no stage-stall class).

P3 — bloom-filtered incremental LSH probe (the r13 sanctioned new
op): at sf0.01 fan-out scale, assert the ZERO-FALSE-NEGATIVE
invariant against the unfiltered probe (verdicts identical row for
row) and record the map-side pruning fraction + wall time of both.

Run on a QUIET host (concurrent Spark sessions inflate numbers; see
the repo verify notes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orderly_spark.functions.smiles import (  # noqa: E402
    canonical_smiles,
    morgan_fingerprint,
    parse_smiles,
    perceive_aromaticity,
)


# ---------------------------------------------------------------------------
# P1 — macrocycles
# ---------------------------------------------------------------------------

def _plain_ring(i: int) -> str:
    n = 36 + (i % 60) * 2  # 36..154 — the exact r12 fallback family
    return "C1" + "C" * (n - 2) + "1"


def _hetero_ring(i: int) -> str:
    n = 36 + (i % 60) * 2
    body = "".join("NOS"[k % 3] if k % 9 == 0 else "C" for k in range(n - 2))
    return "C1" + body + "1"


def _aromatic_annulene(i: int) -> str:
    """4n+2 annulene written Kekulé (C1=CC=C...C1, n ∈ {14,18,...,90}):
    perception aromatizes it, then the cycle path canonicalises the
    aromatic ring — both r13 features on one molecule."""
    n = 14 + (i % 20) * 4  # all ≡ 2 (mod 4)
    out = ["C1"]
    for k in range(1, n):
        out.append("=C" if k % 2 == 1 else "C")
    return "".join(out) + "1"


def probe_macrocycles(per_family: int = 200) -> None:
    fams = {
        "plain_ring": _plain_ring,
        "hetero_ring": _hetero_ring,
        "annulene_4n2": _aromatic_annulene,
    }
    print(f"[P1] macrocycle families, {per_family}/family")
    for name, gen in fams.items():
        mols = [gen(i) for i in range(per_family)]
        t0 = time.perf_counter()
        fallbacks = idem_bad = rot_bad = 0
        for i, m in enumerate(mols):
            c = canonical_smiles(m)
            if c is None:
                fallbacks += 1
                continue
            if canonical_smiles(c) != c:
                idem_bad += 1
            if i % 17 == 0 and name == "plain_ring":
                # rotation respell: same ring opened elsewhere
                n = len(m) - 3
                rot = "C1" + "C" * (n // 2) + "C" * (n - n // 2) + "1"
                if canonical_smiles(rot) != c:
                    rot_bad += 1
        rate = per_family / (time.perf_counter() - t0)
        print(
            f"[P1] {name:>13}: canon {rate:8,.0f} mol/s | "
            f"fallback {fallbacks}/{per_family} | idem_bad {idem_bad} | rot_bad {rot_bad}"
        )
        assert fallbacks == 0, (name, fallbacks)  # the r12 family is CLOSED
        assert idem_bad == 0 and rot_bad == 0, name
    # the new deterministic ceiling, pinned exactly
    assert canonical_smiles("C1" + "C" * 378 + "1") is not None  # C380 completes
    assert canonical_smiles("C1" + "C" * 398 + "1") is None      # C400 falls back
    print("[P1] orbit-budget ceiling: C380 completes, C400 falls back (pinned)")


# ---------------------------------------------------------------------------
# P2 — perception at scale
# ---------------------------------------------------------------------------

def _kekule_benzenoid(i: int) -> tuple[str, str]:
    """(kekulé, aromatic) spellings of the same substituted benzene."""
    subs = ["C", "CC", "O", "N", "Cl", "F", "C(C)C", "OC"]
    s = subs[i % len(subs)]
    pos = i % 3  # which ring atom carries the substituent spelling slot
    kek_atoms = []
    for k in range(6):
        a = "C" + (f"({s})" if k == pos else "")
        kek_atoms.append(a)
    kek = (
        kek_atoms[0].replace("C", "C1", 1)
        + "=" + kek_atoms[1] + kek_atoms[2] + "=" + kek_atoms[3]
        + kek_atoms[4] + "=" + kek_atoms[5] + "1"
    )
    arom_atoms = ["c" + (f"({s})" if k == pos else "") for k in range(6)]
    arom = arom_atoms[0].replace("c", "c1", 1) + "".join(arom_atoms[1:]) + "1"
    return kek, arom


def _kekule_heteroaromatic(i: int) -> tuple[str, str]:
    pairs = [
        ("C1=CC=NC=C1", "c1ccncc1"),
        ("C1=CC=CN1", "c1cc[nH]c1"),
        ("C1=CC=CO1", "c1ccoc1"),
        ("C1=CC=CS1", "c1cccs1"),
        ("C1=CN=CN1", "c1c[nH]cn1"),
        ("C1=CC=C2C=CC=CC2=C1", "c1ccc2ccccc2c1"),
        ("O=C1C=CC=CN1", "O=c1cccc[nH]1"),
        ("C1=CC2=CC=CC=CC2=C1", "c1cc2cccccc2c1"),
    ]
    return pairs[i % len(pairs)]


def probe_perception(per_family: int = 200) -> None:
    fams = {
        "benzenoid": _kekule_benzenoid,
        "heteroaromatic": _kekule_heteroaromatic,
    }
    print(f"[P2] Kekulé↔aromatic collapse, {per_family}/family")
    for name, gen in fams.items():
        pairs = [gen(i) for i in range(per_family)]
        t0 = time.perf_counter()
        bad = []
        for kek, arom in pairs:
            ck, ca = canonical_smiles(kek), canonical_smiles(arom)
            if ck is None or ck != ca:
                bad.append((kek, arom, ck, ca))
            if morgan_fingerprint(kek, 2, 256) != morgan_fingerprint(arom, 2, 256):
                bad.append(("fp", kek, arom))
        rate = 2 * per_family / (time.perf_counter() - t0)
        print(f"[P2] {name:>14}: {rate:8,.0f} mol/s | collapse failures {len(bad)}")
        assert not bad, (name, bad[:2])
    # fuzzer-lattice guard: a giant fused grid past _PERCEIVE_EDGE_CAP
    # must SKIP perception deterministically, in bounded time
    w = 80
    opens = "C" + "".join(f"%{10 + k}" for k in range(w))
    spine = "C" * 4000
    closes = "C" + "".join(f"%{10 + k}" for k in reversed(range(w)))
    big = opens + spine + closes
    t0 = time.perf_counter()
    m = parse_smiles(big)
    p = perceive_aromaticity(m)
    dt = time.perf_counter() - t0
    assert p is m or sum(a.aromatic for a in p.atoms) == sum(
        a.aromatic for a in m.atoms
    )
    print(f"[P2] lattice guard: {len(m.atoms)} atoms perceived-or-skipped in {dt:.2f}s")
    assert dt < 30, dt


# ---------------------------------------------------------------------------
# P3 — bloom-filtered incremental probe, zero-false-negative at scale
# ---------------------------------------------------------------------------

def probe_bloom_incremental(sf_dir: str = "/root/testdata/sf0.01") -> None:
    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY
    from orderly_spark.session import get_spark

    spark = get_spark("r13_probe")

    def run(name):
        best, rows = None, None
        for _ in range(2):  # min-of-2: first rep pays session warmup
            t0 = time.perf_counter()
            rows = REGISTRY[name].fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, rows

    t_bloom, brows = run("d_bloom_lsh_incremental")
    bloom = {
        r["new_doc_id"]: (r["n_index_matches"], r["is_near_dup"], r["n_keys"], r["n_keys_bloom_pos"])
        for r in brows
    }
    t_plain, prows = run("d_incremental_index_dedup")
    plain = {r["new_doc_id"]: (r["n_index_matches"], r["is_near_dup"]) for r in prows}
    assert set(bloom) == set(plain)
    diverged = [k for k in plain if bloom[k][:2] != plain[k]]
    assert not diverged, diverged[:5]  # ZERO false negatives, row for row
    n_keys = sum(v[2] for v in bloom.values())
    n_pos = sum(v[3] for v in bloom.values())
    print(
        f"[P3] bloom vs plain probe @ {sf_dir}: verdicts identical "
        f"({len(plain)} docs); keys pruned map-side: "
        f"{n_keys - n_pos}/{n_keys} ({(n_keys - n_pos) / max(n_keys, 1):.1%}); "
        f"bloom {t_bloom:.2f}s vs plain {t_plain:.2f}s"
    )


if __name__ == "__main__":
    probe_macrocycles()
    probe_perception()
    probe_bloom_incremental()
