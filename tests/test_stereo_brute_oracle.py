"""Brute-force stereo-isomorphism oracle for the canonical-SMILES kernel.

An INDEPENDENT judge of molecular identity: two parsed molecules are
the same stereoisomer iff some skeleton isomorphism (enumerated by
backtracking — no reuse of the writer's refinement/tie-break machinery)
preserves every tetrahedral parity and every double-bond side relation.
Against that judge the canonicaliser must satisfy, on every probed
pair:

* **completeness** — brute-isomorphic inputs collapse to one canonical
  string (the engine may never SPLIT a true class, whatever its
  keep/drop rule does); equivalently, canon-distinct implies
  brute-distinct. This directly audits the r15 soundness argument for
  provisional (para) keeps: a kept tag whose flip is automorphic to
  the original would split a class and fail here.
* **honest drops only** — a collapse of brute-DISTINCT inputs is legal
  only when the canonical string specifies strictly fewer stereo
  elements than the input did (the element that differed was dropped,
  never re-emitted wrongly).

The oracle trusts the parser's recorded representation (slot orders,
``bdirs`` signs) — those conventions are proven self-consistent by the
random-ranking respelling sweeps — and is itself calibrated first on
hand-known chemistry facts (cis/trans, enantiomers, meso) before it
judges anything.

Reference parity context: the reference canonicalises via RDKit
``MolToSmiles`` (orderly/extract/canonicalise.py:25-47); this oracle
plays the role of RDKit's assignStereochemistry ground truth in an
environment without RDKit.
"""
from __future__ import annotations

import itertools
import random

import pytest

from orderly_spark.functions.smiles import (
    Mol,
    canonical_smiles,
    parse_smiles,
    write_canonical,
)

from test_smiles import _random_molecule, _serialize

# ---------------------------------------------------------------------------
# the oracle
# ---------------------------------------------------------------------------

_ISO_CAP = 500_000  # backtracking-step budget per pair (assert, not skip)


def _perm_parity(src: list[int], dst: list[int]) -> int:
    """0 = even, 1 = odd permutation taking src order to dst order."""
    pos = {v: i for i, v in enumerate(dst)}
    perm = [pos[v] for v in src]
    seen = [False] * len(perm)
    par = 0
    for i in range(len(perm)):
        if seen[i]:
            continue
        j, clen = i, 0
        while not seen[j]:
            seen[j] = True
            j = perm[j]
            clen += 1
        par ^= (clen - 1) & 1
    return par


def _atom_key(m: Mol, i: int) -> tuple:
    a = m.atoms[i]
    return (a.z, a.aromatic, a.isotope, a.charge, m.total_h(i), a.atom_map)


def _adj(m: Mol) -> list[dict[int, int]]:
    out: list[dict[int, int]] = [dict() for _ in m.atoms]
    for a, b, code in m.bonds:
        out[a][b] = code
        out[b][a] = code
    return out


def _valid_tet(m: Mol, g: int) -> bool:
    if m.atoms[g].chiral not in (1, 2) or g not in m.stereo:
        return False
    slots = m.stereo[g]
    if len(slots) != 4 or len(set(slots)) != 4:
        return False
    heavies = {v for v in slots if v != -1}
    nbrs = {b if a == g else a for a, b, _c in m.bonds if g in (a, b)}
    if heavies != nbrs:
        return False
    return (-1 in slots) == (m.total_h(g) == 1)


def _bond_sides(m: Mol) -> dict[int, dict[int, int]]:
    """eid(double bond) → {substituent atom → side 0/1} for double
    bonds whose BOTH ends have a consistent known side partition
    (complementing an undirected sibling exactly like the resolver's
    reading of OpenSMILES §3.9.4); bonds with any same-side
    contradiction or a direction-free end are omitted (geometry
    unspecified — matching the parser/resolver drop semantics)."""
    adj: list[list[tuple[int, int, int]]] = [[] for _ in m.atoms]
    for eid, (a, b, code) in enumerate(m.bonds):
        adj[a].append((b, code, eid))
        adj[b].append((a, code, eid))
    out: dict[int, dict[int, int]] = {}
    for eid, (a, b, code) in enumerate(m.bonds):
        if code != 2:
            continue
        sides: dict[int, int] = {}
        ok = True
        for end in (a, b):
            ss = [(v, c, e) for v, c, e in adj[end] if e != eid]
            if not 1 <= len(ss) <= 2:
                ok = False
                break
            end_sides: dict[int, int] = {}
            for v, c, e in ss:
                if c != 1 or e not in m.bdirs:
                    continue
                ea, _eb, _ec = m.bonds[e]
                s = m.bdirs[e] if ea == v else -m.bdirs[e]
                end_sides[v] = 0 if s == 1 else 1
            if not end_sides:
                ok = False
                break
            if len(end_sides) == 2 and len(set(end_sides.values())) != 2:
                ok = False  # both substituents claimed on one side
                break
            if len(end_sides) == 1 and len(ss) == 2:
                other_v, other_c = next(
                    (v, c) for v, c, _e in ss if v not in end_sides
                )
                if other_c == 1:
                    end_sides[other_v] = 1 - next(iter(end_sides.values()))
            sides.update(end_sides)
        if ok:
            out[eid] = sides
    return out


def _stereo_ok(m1: Mol, m2: Mol, phi: dict[int, int],
               sides1: dict[int, dict[int, int]],
               sides2: dict[int, dict[int, int]],
               bond_of2: dict[frozenset[int], int]) -> bool:
    # tetrahedral parities. Tags that are not a VALID tetrahedral spec
    # (wrong slot count, duplicate slots, H mismatch) are semantic
    # noise the engine — like RDKit — ignores entirely, so the oracle
    # must not constrain where they map (found by the 50k hunt: a
    # symmetric-substituent automorphism was wrongly rejected because
    # it sent an invalid 3-slot tag onto an untagged twin).
    tagged1 = [
        g for g in m1.stereo
        if m1.atoms[g].chiral in (1, 2) and _valid_tet(m1, g)
    ]
    tagged2 = {
        g for g in m2.stereo
        if m2.atoms[g].chiral in (1, 2) and _valid_tet(m2, g)
    }
    if len(tagged1) != len(tagged2):
        return False
    for g in tagged1:
        g2 = phi[g]
        if g2 not in tagged2:
            return False
        img = [-1 if v == -1 else phi[v] for v in m1.stereo[g]]
        slots2 = m2.stereo[g2]
        if set(img) != set(slots2):
            return False
        same_tag = m1.atoms[g].chiral == m2.atoms[g2].chiral
        if (_perm_parity(img, slots2) == 0) != same_tag:
            return False
    # double-bond side relations
    if len(sides1) != len(sides2):
        return False
    for eid, s1 in sides1.items():
        a, b, _c = m1.bonds[eid]
        key = frozenset((phi[a], phi[b]))
        eid2 = bond_of2.get(key)
        if eid2 is None or eid2 not in sides2:
            return False
        s2 = sides2[eid2]
        if {phi[v] for v in s1} != set(s2):
            return False
        a2, b2, _c2 = m2.bonds[eid2]
        subs_a = [v for v in s1 if phi[v] in _nbr_set(m2, a2)]
        subs_b = [v for v in s1 if phi[v] in _nbr_set(m2, b2)]
        for u, w in itertools.product(subs_a, subs_b):
            if u == w:
                continue
            if (s1[u] == s1[w]) != (s2[phi[u]] == s2[phi[w]]):
                return False
    return True


def _nbr_set(m: Mol, i: int) -> set[int]:
    return {b if a == i else a for a, b, _c in m.bonds if i in (a, b)}


def brute_stereo_equal(m1: Mol, m2: Mol) -> bool:
    """True iff SOME skeleton isomorphism preserves all specified
    stereo. Pure backtracking over atom bijections with adjacency and
    bond-code consistency; step-budgeted (assert) so a pathological
    input fails loudly instead of hanging."""
    n = len(m1.atoms)
    if n != len(m2.atoms) or len(m1.bonds) != len(m2.bonds):
        return False
    k1 = sorted(_atom_key(m1, i) for i in range(n))
    k2 = sorted(_atom_key(m2, i) for i in range(n))
    if k1 != k2:
        return False
    adj1, adj2 = _adj(m1), _adj(m2)
    sides1, sides2 = _bond_sides(m1), _bond_sides(m2)
    bond_of2 = {
        frozenset((a, b)): eid for eid, (a, b, _c) in enumerate(m2.bonds)
    }
    # order m1 atoms so each (after the first per component) touches an
    # already-placed atom — keeps the candidate sets tight
    order: list[int] = []
    placed: set[int] = set()
    for root in range(n):
        if root in placed:
            continue
        stack = [root]
        placed.add(root)
        while stack:
            u = stack.pop()
            order.append(u)
            for v in adj1[u]:
                if v not in placed:
                    placed.add(v)
                    stack.append(v)
    phi: dict[int, int] = {}
    used = [False] * n
    steps = [0]

    def bt(idx: int) -> bool:
        steps[0] += 1
        assert steps[0] < _ISO_CAP, "brute-force isomorphism budget blown"
        if idx == n:
            return _stereo_ok(m1, m2, phi, sides1, sides2, bond_of2)
        u = order[idx]
        ku = _atom_key(m1, u)
        for cand in range(n):
            if used[cand] or _atom_key(m2, cand) != ku:
                continue
            okc = True
            for v, code in adj1[u].items():
                if v in phi and adj2[cand].get(phi[v]) != code:
                    okc = False
                    break
            if not okc:
                continue
            # degree must match exactly (bijection on edges)
            if len(adj1[u]) != len(adj2[cand]):
                continue
            phi[u] = cand
            used[cand] = True
            if bt(idx + 1):
                return True
            del phi[u]
            used[cand] = False
        return False

    return bt(0)


# ---------------------------------------------------------------------------
# specified-element counting (the honest-drop certificate)
# ---------------------------------------------------------------------------

def _spec_counts(m: Mol) -> tuple[int, int]:
    """(valid tetra specs, fully specified double bonds)."""
    nt = sum(1 for g in m.stereo if _valid_tet(m, g))
    return nt, len(_bond_sides(m))


def _assert_collapse_is_honest(m1: Mol, m2: Mol, canon: str) -> None:
    """canon collapsed a brute-distinct pair: require that the output
    specifies strictly fewer stereo elements than the richer input —
    i.e. SOMETHING was dropped; a collapse with every element re-emitted
    would be an unsound keep."""
    cm = parse_smiles(canon)
    nt_c, nb_c = _spec_counts(cm)
    nt_1, nb_1 = _spec_counts(m1)
    nt_2, nb_2 = _spec_counts(m2)
    assert nt_c + nb_c < max(nt_1 + nb_1, nt_2 + nb_2), (
        "brute-distinct inputs collapsed with no stereo element dropped",
        canon,
    )


# ---------------------------------------------------------------------------
# part 1 — calibrate the oracle on hand-known chemistry facts
# ---------------------------------------------------------------------------

def _p(s: str) -> Mol:
    return parse_smiles(s)


def test_oracle_calibration_ez():
    trans_a, trans_b = _p("F/C=C/F"), _p("F\\C=C\\F")
    cis_a, cis_b = _p("F/C=C\\F"), _p("F\\C=C/F")
    assert brute_stereo_equal(trans_a, trans_b)
    assert brute_stereo_equal(cis_a, cis_b)
    assert not brute_stereo_equal(trans_a, cis_a)
    # unspecified is a DIFFERENT (unknown-geometry) specification
    assert not brute_stereo_equal(trans_a, _p("FC=CF"))


def test_oracle_calibration_tetrahedral():
    l_ala, d_ala = _p("N[C@@H](C)C(=O)O"), _p("N[C@H](C)C(=O)O")
    assert not brute_stereo_equal(l_ala, d_ala)
    # same enantiomer, respelled from the other end of the chain
    assert brute_stereo_equal(l_ala, _p("OC(=O)[C@H](C)N"))
    # non-stereocentre tag: flip denotes the same molecule
    assert brute_stereo_equal(_p("F[C@H](F)Br"), _p("F[C@@H](F)Br"))


def test_oracle_calibration_meso_tartaric():
    rs = _p("OC(=O)[C@H](O)[C@H](O)C(=O)O")
    sr = _p("OC(=O)[C@@H](O)[C@@H](O)C(=O)O")
    rr = _p("OC(=O)[C@H](O)[C@@H](O)C(=O)O")
    ss = _p("OC(=O)[C@@H](O)[C@H](O)C(=O)O")
    assert brute_stereo_equal(rs, sr)       # meso: mirror is itself
    assert brute_stereo_equal(rr, ss) is False  # true enantiomer pair
    assert not brute_stereo_equal(rs, rr)


def test_oracle_calibration_diene_symmetry():
    # symmetric hexadiene: the E,Z and Z,E spellings are the same
    # molecule (end-for-end flip); E,E and Z,Z are not. NOTE the
    # shared middle slash: flipping ONE bond means flipping an OUTER
    # token — "C/C=C\\C=C/C" flips the middle token of EE and is
    # therefore (Z,Z), not (Z,E); (Z,E) is "C/C=C\\C=C\\C".
    ez = _p("C/C=C/C=C\\C")
    ze = _p("C/C=C\\C=C\\C")
    ee = _p("C/C=C/C=C/C")
    zz = _p("C/C=C\\C=C/C")
    assert brute_stereo_equal(ez, ze)
    assert not brute_stereo_equal(ee, zz)
    assert not brute_stereo_equal(ee, ez)
    assert not brute_stereo_equal(zz, ez)


def test_oracle_calibration_para_cyclohexane():
    # 1,4-disubstituted cyclohexanes are ACHIRAL (mirror plane through
    # C1/C4), so flipping BOTH tags — the ADVICE r14 example "pair" —
    # denotes the SAME compound (the ring-flip automorphism through
    # the two CH2 arms carries one onto the other); the genuine
    # cis/trans diastereomer pair flips ONE tag. The oracle must see
    # both facts, and the engine's para-rule classes must match.
    a = _p("C[C@H]1CC[C@@H](N)CC1")
    a_mirror = _p("C[C@@H]1CC[C@H](N)CC1")
    b = _p("C[C@H]1CC[C@H](N)CC1")
    a_resp = _p("N[C@H]1CC[C@@H](C)CC1")  # a written from the N end
    assert brute_stereo_equal(a, a_mirror)
    assert brute_stereo_equal(a, a_resp)
    assert not brute_stereo_equal(a, b)
    assert canonical_smiles("C[C@H]1CC[C@@H](N)CC1") != canonical_smiles(
        "C[C@H]1CC[C@H](N)CC1"
    )


# ---------------------------------------------------------------------------
# part 2 — enumerated stereoisomer families: engine classes vs oracle
# ---------------------------------------------------------------------------

def _family_check(strings: list[str], expect_exact: bool) -> None:
    mols = [_p(s) for s in strings]
    canon = [canonical_smiles(s) for s in strings]
    assert all(c is not None for c in canon), strings
    for i, j in itertools.combinations(range(len(strings)), 2):
        be = brute_stereo_equal(mols[i], mols[j])
        ce = canon[i] == canon[j]
        # completeness: the engine never splits a true class
        assert not (be and not ce), (strings[i], strings[j], canon[i], canon[j])
        if expect_exact:
            assert be == ce, (strings[i], strings[j], canon[i], canon[j])
        elif ce and not be:
            _assert_collapse_is_honest(mols[i], mols[j], canon[i])


def _expand(template: str, slots: list[list[str]]) -> list[str]:
    out = []
    for combo in itertools.product(*slots):
        s = template
        for k, v in enumerate(combo):
            s = s.replace("{%d}" % k, v)
        out.append(s)
    return out


TT = ["@", "@@"]
SS = ["/", "\\"]


def test_family_simple_enantiomer():
    _family_check(_expand("N[C{0}H](C)C(=O)O", [TT]), expect_exact=True)


def test_family_non_stereogenic_tag():
    _family_check(_expand("F[C{0}H](F)Br", [TT]), expect_exact=True)


def test_family_tartaric():
    _family_check(
        _expand("OC(=O)[C{0}H](O)[C{1}H](O)C(=O)O", [TT, TT]),
        expect_exact=True,
    )


def test_family_para_cyclohexane():
    _family_check(
        _expand("C[C{0}H]1CC[C{1}H](N)CC1", [TT, TT]), expect_exact=True
    )


def test_family_para_lone_tag_drops():
    # a single tagged centre in the symmetric ring is NOT stereogenic
    # alone and must drop (honest) — oracle sees both spellings equal
    _family_check(_expand("C[C{0}H]1CCC(N)CC1", [TT]), expect_exact=True)


def test_family_butene_ez():
    _family_check(_expand("C{0}C=C{1}C", [SS, SS]), expect_exact=True)


def test_family_trisubstituted_alkene():
    _family_check(_expand("F{0}C(C)=C{1}Br", [SS, SS]), expect_exact=True)


def test_family_conjugated_diene():
    _family_check(
        _expand("C{0}C=C{1}C=C{2}C", [SS, SS, SS]), expect_exact=True
    )


def test_family_ez_plus_tetra():
    _family_check(
        _expand("C[C{0}H](O)/C=C{1}C", [TT, SS]), expect_exact=True
    )


def test_family_pseudoasymmetric_triol():
    # outer centres fixed meso (R,S); middle r/s is pseudo-asymmetric —
    # kept by the r15 fixpoint; oracle decides the true classes
    _family_check(
        _expand("C[C@H](O)[C{0}H](O)[C@@H](O)C", [TT]), expect_exact=True
    )


def test_family_pseudoasymmetric_all_tags():
    _family_check(
        _expand("C[C{0}H](O)[C{1}H](O)[C{2}H](O)C", [TT, TT, TT]),
        expect_exact=True,
    )


def test_family_long_chain_ez():
    _family_check(
        _expand("C{0}C=C{1}CCCCCC", [SS, SS]), expect_exact=True
    )


def test_family_ring_double_bond_drops():
    # in-ring double-bond geometry is a documented honest drop (the
    # writer discards macrocyclic cis/trans) — the engine collapses,
    # the oracle keeps them distinct, the drop certificate must hold
    _family_check(
        ["C/C1=C/CCCCCCCC1", "C/C1=C\\CCCCCCCC1"], expect_exact=False
    )


def test_family_imine():
    _family_check(_expand("C{0}N=C{1}C", [SS, SS]), expect_exact=True)


def test_family_two_ring_para_mutual():
    # mutual dependence: both ring centres witness each other
    _family_check(
        _expand("C[C{0}H]1CC[C{1}H](C(F)Cl)CC1", [TT, TT]),
        expect_exact=True,
    )


# ---------------------------------------------------------------------------
# part 3 — randomized sweeps against the oracle
# ---------------------------------------------------------------------------

def _canon_mol(m: Mol) -> str | None:
    return write_canonical(m)


def _flip_tet(m: Mol, g: int) -> Mol:
    m2 = Mol(
        atoms=[type(a)(**a.__dict__) for a in m.atoms],
        bonds=list(m.bonds),
        stereo={k: list(v) for k, v in m.stereo.items()},
        bdirs=dict(m.bdirs),
    )
    m2.atoms[g].chiral = 3 - m2.atoms[g].chiral
    return m2


def _flip_bdir(m: Mol, eid: int) -> Mol:
    m2 = Mol(
        atoms=[type(a)(**a.__dict__) for a in m.atoms],
        bonds=list(m.bonds),
        stereo={k: list(v) for k, v in m.stereo.items()},
        bdirs=dict(m.bdirs),
    )
    m2.bdirs[eid] = -m2.bdirs[eid]
    return m2


def _check_roundtrip_config(m: Mol, canon: str, ctx) -> None:
    """Configuration FIDELITY: when the canonical string specifies as
    many stereo elements as the (perceived) input did — nothing was
    dropped — it must denote the SAME stereoisomer, oracle-judged. A
    writer that systematically emitted mirror tags would pass every
    collapse-class check and idempotence; only this catches it."""
    from orderly_spark.functions.smiles import perceive_aromaticity

    p = perceive_aromaticity(m)
    cm = parse_smiles(canon)
    if _spec_counts(p) == _spec_counts(cm):
        assert brute_stereo_equal(p, cm), (*ctx, canon)


def _check_pair(m: Mol, m2: Mol, ctx) -> None:
    c1, c2 = _canon_mol(m), _canon_mol(m2)
    if c1 is None or c2 is None:
        return  # past a documented ceiling — nothing to judge
    be = brute_stereo_equal(m, m2)
    if be:
        assert c1 == c2, (*ctx, c1, c2)
    elif c1 == c2:
        _assert_collapse_is_honest(m, m2, c1)
    _check_roundtrip_config(m, c1, ctx)


def test_random_tetra_flip_sweep_vs_oracle():
    """Random molecules, tags sprinkled onto bracket atoms (validity
    mixed by construction); for EVERY tagged atom, the single-tag flip
    must collapse iff non-stereogenic (oracle-judged) or drop honestly.
    This is the direct audit of the keep rule, the fixpoint, and the
    para provisional soundness on arbitrary random skeletons."""
    rng = random.Random(150816)
    judged = 0
    for trial in range(800):
        tokens, edges, _zs = _random_molecule(rng)
        out_tokens, tagged = [], False
        for t in tokens:
            if t.startswith("[") and rng.random() < 0.5:
                k = 1
                while k < len(t) and t[k].isdigit():
                    k += 1
                k += 2 if t[k:k + 2] in ("Cl", "Br") else 1
                out_tokens.append(t[:k] + rng.choice(["@", "@@"]) + t[k:])
                tagged = True
            else:
                out_tokens.append(t)
        if not tagged:
            continue
        s = _serialize(out_tokens, edges, 0, random.Random(trial))
        try:
            m = parse_smiles(s)
        except Exception:  # noqa: BLE001 — generator can overreach
            continue
        for g in list(m.stereo):
            if m.atoms[g].chiral not in (1, 2):
                continue
            _check_pair(m, _flip_tet(m, g), (trial, s, g))
            judged += 1
    assert judged >= 180, judged


def test_random_ez_flip_sweep_vs_oracle():
    """Random molecules with double bonds; random directional marks set
    at the Mol level on single bonds adjacent to double bonds; every
    single-mark flip judged against the oracle. Shared marks in
    conjugated runs flip several bonds at once — the oracle judges the
    joint change, auditing the constraint-group emission."""
    rng = random.Random(20260815)
    judged = 0
    for trial in range(1000):
        tokens, edges, _zs = _random_molecule(rng)
        if not any(ch == "=" for _a, _b, ch in edges):
            continue
        s = _serialize(tokens, edges, 0, random.Random(trial))
        try:
            m = parse_smiles(s)
        except Exception:  # noqa: BLE001
            continue
        dbl_ends = {
            v for a, b, c in m.bonds if c == 2 for v in (a, b)
        }
        cand = [
            eid for eid, (a, b, c) in enumerate(m.bonds)
            if c == 1 and (a in dbl_ends or b in dbl_ends)
        ]
        if not cand:
            continue
        for eid in cand:
            if rng.random() < 0.6:
                m.bdirs[eid] = rng.choice([1, -1])
        if not m.bdirs:
            continue
        for eid in list(m.bdirs):
            _check_pair(m, _flip_bdir(m, eid), (trial, s, eid))
            judged += 1
    assert judged >= 250, judged


def test_random_mirror_sweep_vs_oracle():
    """Mirror image (all tags flipped, slashes kept — a tag-only mirror
    is the stereo part RDKit's CIP machinery sees) judged against the
    oracle: achiral-by-symmetry molecules collapse, chiral ones split
    or drop honestly."""
    rng = random.Random(77150816)
    judged = 0
    for trial in range(800):
        tokens, edges, _zs = _random_molecule(rng)
        out_tokens, tagged = [], False
        for t in tokens:
            if t.startswith("[") and rng.random() < 0.5:
                k = 1
                while k < len(t) and t[k].isdigit():
                    k += 1
                k += 2 if t[k:k + 2] in ("Cl", "Br") else 1
                out_tokens.append(t[:k] + rng.choice(["@", "@@"]) + t[k:])
                tagged = True
            else:
                out_tokens.append(t)
        if not tagged:
            continue
        s = _serialize(out_tokens, edges, 0, random.Random(trial))
        try:
            m = parse_smiles(s)
        except Exception:  # noqa: BLE001
            continue
        m2 = m
        for g in list(m.stereo):
            if m.atoms[g].chiral in (1, 2):
                m2 = _flip_tet(m2, g)
        _check_pair(m, m2, (trial, s, "mirror"))
        judged += 1
    assert judged >= 150, judged


def test_cumulated_end_ez_drops():
    """r15 hunt fix #1: a double bond whose end carries ANOTHER double
    bond (cumulated =X= sp end) has axial — not cis/trans — geometry;
    slashes there used to be kept and provably conflated distinct
    configurations. Now they drop at the candidate gate: output is
    slash-free and both slash senses collapse."""
    a = canonical_smiles("F/C(=S)=C(/Br)Cl")
    b = canonical_smiles("F/C(=S)=C(\\Br)Cl")
    assert a is not None and "/" not in a and "\\" not in a
    assert a == b
    assert canonical_smiles(a) == a
    # plain allene spelling was already dropped pre-fix; still is
    c = canonical_smiles("C/C=C=C/C")
    assert c is not None and "/" not in c and "\\" not in c


def test_completion_prune_triangle():
    """r15 hunt fix #2: the writer's dense slash emission for a KEPT
    exocyclic double bond used to land on both ends of the DROPPED
    in-ring double bond of a 3-ring, accidentally specifying a ring
    geometry the input never fixed (an invented slash). The completion
    prune now vetoes the kept bond instead: output slash-free, both
    input senses collapse, idempotent."""
    a = canonical_smiles("F/C=C1C(Cl)=C/1")
    b = canonical_smiles("F/C=C1C(Cl)=C\\1")
    assert a is not None and "/" not in a and "\\" not in a
    assert a == b
    assert canonical_smiles(a) == a
    # the hunt's original find (Mol-level dirs on a triangle-ring
    # molecule): flip variants must collapse HONESTLY or split —
    # re-judged by the oracle
    m = parse_smiles("N(=BrC)(O=1)N=1O=Br")
    dbl_ends = {v for x, y, c in m.bonds if c == 2 for v in (x, y)}
    for eid, (x, y, c) in enumerate(m.bonds):
        if c == 1 and (x in dbl_ends or y in dbl_ends):
            m.bdirs[eid] = 1
    for eid in list(m.bdirs):
        _check_pair(m, _flip_bdir(m, eid), ("triangle", eid))
    # a kept bridge bond NOT adjacent to any dropped double still keeps
    kept = canonical_smiles("F/C=C/C1CC1")
    assert kept is not None and ("/" in kept or "\\" in kept)


def test_perception_symmetry_no_split():
    """r15 hunt fix #3: aromaticity perception used to reconstruct ONE
    shortest cycle per edge (adjacency-ordered BFS), so of two
    symmetric Hückel rings sharing a stereocentre substituent pair,
    only one got marked aromatic — breaking a raw-graph symmetry the
    refinement then trusted, keeping a tag whose flip is automorphic
    to the original (the severe SPLIT direction: one molecule, two
    canonical strings). Perception now enumerates ALL shortest cycles
    per edge; the symmetric pair both perceive, the tag drops, and the
    oracle agrees the flip pair collapses."""
    s = "[13C@](Br1)(ON23)(O3)=O12(Cl)Cl"
    m = _p(s)
    m2 = _flip_tet(m, 0)
    assert brute_stereo_equal(m, m2)
    c1, c2 = _canon_mol(m), _canon_mol(m2)
    assert c1 is not None and c1 == c2, (c1, c2)
    assert canonical_smiles(c1) == c1
    from orderly_spark.functions.smiles import perceive_aromaticity

    p = perceive_aromaticity(m)
    # the two symmetric bridging oxygens (degree 2, bonded to C0 and
    # N only — raw-graph automorphic) must perceive IDENTICALLY
    sym_os = [
        i for i, a in enumerate(p.atoms)
        if a.z == 8
        and sum(1 for x, y, _c in p.bonds if i in (x, y)) == 2
    ]
    assert len(sym_os) == 2, sym_os
    assert len({p.atoms[i].aromatic for i in sym_os}) == 1, sym_os


def test_random_cross_spelling_sweep_vs_oracle():
    """Two independent serializations (different traversal orders) of
    the same tagged token multiset parse to two — generally DIFFERENT —
    stereoisomers on one skeleton (a written tag's meaning depends on
    the written slot order). The oracle judges each pair from scratch;
    the engine must collapse exactly the brute-equal ones or drop
    honestly. This audits the parser's slot-recording conventions
    across truly different written forms, with the oracle rather than
    the writer as the judge."""
    rng = random.Random(31508)
    judged = equal_seen = 0
    for trial in range(2000):
        tokens, edges, _zs = _random_molecule(rng)
        out_tokens, tagged = [], False
        for t in tokens:
            if t.startswith("[") and rng.random() < 0.5:
                k = 1
                while k < len(t) and t[k].isdigit():
                    k += 1
                k += 2 if t[k:k + 2] in ("Cl", "Br") else 1
                out_tokens.append(t[:k] + rng.choice(["@", "@@"]) + t[k:])
                tagged = True
            else:
                out_tokens.append(t)
        if not tagged or len(tokens) < 2:
            continue
        s1 = _serialize(out_tokens, edges, 0, random.Random(trial))
        s2 = _serialize(
            out_tokens, edges, rng.randrange(len(tokens)),
            random.Random(trial + 7919),
        )
        try:
            m1, m2 = parse_smiles(s1), parse_smiles(s2)
        except Exception:  # noqa: BLE001
            continue
        c1, c2 = _canon_mol(m1), _canon_mol(m2)
        if c1 is None or c2 is None:
            continue
        be = brute_stereo_equal(m1, m2)
        if be:
            equal_seen += 1
            assert c1 == c2, (trial, s1, s2, c1, c2)
        elif c1 == c2:
            _assert_collapse_is_honest(m1, m2, c1)
        judged += 1
    assert judged >= 350 and equal_seen >= 100, (judged, equal_seen)


def test_canon_groups_vs_oracle():
    """Bridge to the GRADED surface: every pair inside every
    registry CANON_GROUPS twin group (the x_canonical_smiles gate's
    fixture set) is judged by the independent oracle on the
    perceived, map-stripped molecules — either the pair is
    brute-isomorphic (the collapse the gate asserts is a true
    identity) or the collapse is certified as an honest drop. Most
    groups must be fully brute-equal (the bridge is not vacuous)."""
    from orderly_spark.functions.smiles import perceive_aromaticity
    from orderly_spark.queries.extract_battery import CANON_GROUPS

    def prep(s: str, strip: bool) -> Mol:
        m = parse_smiles(s)
        if strip:
            for a in m.atoms:
                a.atom_map = 0
        return perceive_aromaticity(m)

    # groups that EXIST to demonstrate an honest drop: one spelling
    # carries a stereo marker the keep rule discards, so the pair is
    # specified-vs-unspecified — brute-distinct by construction, and
    # the collapse is certified below instead
    drop_demos = {
        "neopentane_tagged", "gem_slash_dropped", "ring_slash_dropped",
        "cyhex14_lone_tag_dropped", "triol_chiral_c3_dropped",
    }
    not_eq: set[str] = set()
    for name, spellings, strip in CANON_GROUPS:
        mols = [prep(s, strip) for s in spellings]
        canon = {canonical_smiles(s, strip_atom_map=strip) for s in spellings}
        assert len(canon) == 1 and None not in canon, name
        for i, j in itertools.combinations(range(len(mols)), 2):
            if brute_stereo_equal(mols[i], mols[j]):
                continue
            not_eq.add(name)
            # collapse of brute-distinct spellings: honest drop only
            c = next(iter(canon))
            cm = parse_smiles(c)
            nt_c, nb_c = _spec_counts(cm)
            hi = max(sum(_spec_counts(mols[i])), sum(_spec_counts(mols[j])))
            assert nt_c + nb_c < hi, (name, spellings[i], spellings[j], c)
    assert not_eq == (drop_demos & {n for n, _s, _x in CANON_GROUPS}), not_eq


def test_oracle_idempotence_on_canonical_output():
    """parse(canon) must be brute-equal to the input it came from —
    the canonical string denotes the same stereoisomer RESTRICTED to
    kept elements; with everything kept it must be oracle-identical
    (a systematic mirror-image writer would fail exactly here)."""
    fixtures = [
        "N[C@@H](C)C(=O)O",
        "F/C=C/F",
        "C/C=C\\C=C/C",
        "C[C@H]1CC[C@@H](N)CC1",
        "C[C@H](O)/C=C/C",
        "OC(=O)[C@H](O)[C@H](O)C(=O)O",
        "C[C@H](O)c1ccccc1",
        "C[C@H](O)C1=CC=CC=C1",
        "F[C@]1(Cl)CC(C)CC1",
        "C/C(F)=C(\\Cl)Br",
    ]
    for s in fixtures:
        c = canonical_smiles(s)
        assert c is not None, s
        m = _p(s)
        nt_s, nb_s = _spec_counts(m)
        assert (nt_s + nb_s) > 0, s  # fixture must carry stereo
        _check_roundtrip_config(m, c, (s,))
        # every fixture here keeps ALL its elements — fidelity must
        # actually have been judged, not skipped on a count mismatch
        from orderly_spark.functions.smiles import perceive_aromaticity

        assert _spec_counts(perceive_aromaticity(m)) == _spec_counts(_p(c)), s
        assert canonical_smiles(c) == c, (s, c)
