"""One-off large-scale hunt: canonicaliser vs the brute-force
stereo-isomorphism oracle (tests/test_stereo_brute_oracle.py) on tens
of thousands of randomized tag/slash flip pairs, including molecules
larger than the in-suite sweeps use. Prints a summary; exits non-zero
on any completeness violation or dishonest collapse.

Usage: python tools/stereo_brute_hunt.py [trials_per_sweep]
"""
from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from orderly_spark.functions.smiles import parse_smiles  # noqa: E402

from test_smiles import _serialize  # noqa: E402
from test_stereo_brute_oracle import (  # noqa: E402
    _canon_mol,
    _flip_bdir,
    _flip_tet,
    _spec_counts,
    brute_stereo_equal,
)
from orderly_spark.functions.smiles import perceive_aromaticity  # noqa: E402

_ORGANIC = {6: "C", 7: "N", 8: "O", 16: "S", 9: "F", 17: "Cl", 35: "Br"}


def _random_molecule_big(rng: random.Random):
    """Like tests/test_smiles._random_molecule but up to 13 atoms and
    a higher ring-edge count — sizes the in-suite sweep avoids."""
    n = rng.randint(6, 13)
    tokens, zs = [], []
    for _ in range(n):
        if rng.random() < 0.25:
            z = rng.choice([6, 7, 8, 16])
            iso = rng.choice(["", "13"])
            hc = rng.choice(["", "H"])
            tokens.append(f"[{iso}{_ORGANIC[z]}{hc}]")
        else:
            z = rng.choice(list(_ORGANIC))
            tokens.append(_ORGANIC[z])
        zs.append(z)
    edges, present = [], set()
    for b in range(1, n):
        a = rng.randrange(b)
        edges.append((a, b, rng.choice([None, None, None, "="])))
        present.add((a, b))
    for _ in range(rng.randint(0, 4)):
        if n < 3:
            break
        a, b = sorted(rng.sample(range(n), 2))
        if (a, b) in present:
            continue
        present.add((a, b))
        edges.append((a, b, rng.choice([None, None, "="])))
    return tokens, edges, zs


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1508160
    rng = random.Random(seed)
    stats = {
        "parsed": 0, "tet_flips": 0, "ez_flips": 0, "mirrors": 0,
        "brute_equal": 0, "honest_drops": 0, "ceiling_none": 0,
        "fidelity": 0, "violations": 0,
    }
    bad: list[tuple] = []

    def judge(m, m2, ctx):
        c1, c2 = _canon_mol(m), _canon_mol(m2)
        if c1 is None or c2 is None:
            stats["ceiling_none"] += 1
            return
        be = brute_stereo_equal(m, m2)
        ce = c1 == c2
        # round-trip configuration fidelity: nothing dropped ⟹ the
        # canonical string must denote the same stereoisomer
        p1 = perceive_aromaticity(m)
        cm1 = parse_smiles(c1)
        if _spec_counts(p1) == _spec_counts(cm1):
            stats["fidelity"] += 1
            if not brute_stereo_equal(p1, cm1):
                stats["violations"] += 1
                bad.append(("BAD_ROUNDTRIP", *ctx, c1))
        if be:
            stats["brute_equal"] += 1
            if not ce:
                stats["violations"] += 1
                bad.append(("SPLIT", *ctx, c1, c2))
        elif ce:
            cm = parse_smiles(c1)
            nt_c, nb_c = _spec_counts(cm)
            hi = max(sum(_spec_counts(m)), sum(_spec_counts(m2)))
            if nt_c + nb_c < hi:
                stats["honest_drops"] += 1
            else:
                stats["violations"] += 1
                bad.append(("DISHONEST_COLLAPSE", *ctx, c1))

    for trial in range(trials):
        tokens, edges, _zs = _random_molecule_big(rng)
        out_tokens, tagged = [], False
        for t in tokens:
            if t.startswith("[") and rng.random() < 0.45:
                k = 1
                while k < len(t) and t[k].isdigit():
                    k += 1
                k += 2 if t[k:k + 2] in ("Cl", "Br") else 1
                out_tokens.append(t[:k] + rng.choice(["@", "@@"]) + t[k:])
                tagged = True
            else:
                out_tokens.append(t)
        s = _serialize(out_tokens, edges, 0, random.Random(trial))
        try:
            m = parse_smiles(s)
        except Exception:  # noqa: BLE001 — generator can overreach
            continue
        stats["parsed"] += 1
        # sprinkle directional marks next to double bonds
        dbl_ends = {v for a, b, c in m.bonds if c == 2 for v in (a, b)}
        for eid, (a, b, c) in enumerate(m.bonds):
            if c == 1 and (a in dbl_ends or b in dbl_ends):
                if rng.random() < 0.55:
                    m.bdirs[eid] = rng.choice([1, -1])
        try:
            for g in list(m.stereo):
                if m.atoms[g].chiral in (1, 2):
                    judge(m, _flip_tet(m, g), (trial, s, "tet", g))
                    stats["tet_flips"] += 1
            for eid in list(m.bdirs):
                judge(m, _flip_bdir(m, eid), (trial, s, "ez", eid))
                stats["ez_flips"] += 1
            if tagged:
                m2 = m
                for g in list(m.stereo):
                    if m.atoms[g].chiral in (1, 2):
                        m2 = _flip_tet(m2, g)
                judge(m, m2, (trial, s, "mirror"))
                stats["mirrors"] += 1
        except AssertionError as exc:
            if "budget" in str(exc):
                stats["ceiling_none"] += 1
                continue
            raise
    print(stats)
    for row in bad[:20]:
        print("VIOLATION:", row)
    return 1 if stats["violations"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
