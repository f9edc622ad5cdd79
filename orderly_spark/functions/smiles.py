"""Pure-Python SMILES graph parser + Morgan fingerprint (F5/F14
partial-close, r10 verdict item 2 — the S2 playbook applied to the
RDKit gap).

RDKit is absent from the harness image, so the chem kernels ran on
honest fallbacks (symbol scan for the transition-metal test, a
deterministic fake fingerprint). This module closes the gap for the
PARSEABLE subset of SMILES with a dependency-free parser built from
the public OpenSMILES grammar:

- bracket atoms ``[isotope? SYMBOL chiral? Hcount? charge? :map?]``
- the organic subset ``B C N O P S F Cl Br I`` and aromatic
  ``b c n o p s`` (parsed as written; the PARSER does no perception —
  Hückel aromaticity perception is a separate post-parse pass,
  :func:`perceive_aromaticity` (r13), consumed by the canonical
  writer and the Morgan kernel so Kekulé and aromatic spellings of
  one molecule collapse)
- bonds ``- = # $ : / \\`` (stereo slashes read as single bonds with
  their direction RECORDED — r15 retains cis/trans bond stereo through
  canonicalisation), ring closures (digit and ``%nn``), branches,
  and dot-disconnected components

Anything outside this grammar (e.g. ``@TH1`` chirality tags, ``*``
wildcards with unsupported suffixes, plain-text names) raises
:class:`SmilesParseError`, surfaced as ``None`` by the public
helpers — callers keep their documented fallbacks for that subset, so
the ceiling is explicit, not hidden.

What the parsed graph powers:
- :func:`molecule_has_tm` — the reference's transition-metal test
  (``orderly/extract/defaults.py:10-39``: atomic number in 22–29,
  40–47, 72–79) as an exact atomic-number walk instead of a regex.
- :func:`morgan_fingerprint` — a real radius-limited Morgan/ECFP
  fingerprint (Rogers & Hahn 2010) over the parsed graph, mirroring
  the reference's ``orderly/gen_fp/fingerprints.py:76-99`` contract
  (counted, hashed to ``n_bits``, zeros on parse failure handled by
  the caller). Engine-independent and deterministic: the hash is
  blake2b, never Python's randomised ``hash()``.

Correctness strategy without RDKit in the image: (a) hand-checkable
graph assertions on curated molecules (atom counts, bond orders, ring
closure targets); (b) the classic Morgan invariance property —
renumbering-equivalent SMILES spellings of the SAME molecule must
produce the SAME fingerprint; (c) skip-gated RDKit parity tests that
run wherever RDKit exists.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field

__all__ = [
    "SmilesParseError",
    "Atom",
    "Mol",
    "parse_smiles",
    "perceive_aromaticity",
    "molecule_has_tm",
    "morgan_fingerprint",
    "canonical_smiles",
    "write_canonical",
]


class SmilesParseError(ValueError):
    """Input not inside the supported SMILES subset."""


# Full periodic table, symbol → atomic number (public knowledge).
_ELEMENTS: dict[str, int] = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22,
    "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29,
    "Zn": 30, "Ga": 31, "Ge": 32, "As": 33, "Se": 34, "Br": 35, "Kr": 36,
    "Rb": 37, "Sr": 38, "Y": 39, "Zr": 40, "Nb": 41, "Mo": 42, "Tc": 43,
    "Ru": 44, "Rh": 45, "Pd": 46, "Ag": 47, "Cd": 48, "In": 49, "Sn": 50,
    "Sb": 51, "Te": 52, "I": 53, "Xe": 54, "Cs": 55, "Ba": 56, "La": 57,
    "Ce": 58, "Pr": 59, "Nd": 60, "Pm": 61, "Sm": 62, "Eu": 63, "Gd": 64,
    "Tb": 65, "Dy": 66, "Ho": 67, "Er": 68, "Tm": 69, "Yb": 70, "Lu": 71,
    "Hf": 72, "Ta": 73, "W": 74, "Re": 75, "Os": 76, "Ir": 77, "Pt": 78,
    "Au": 79, "Hg": 80, "Tl": 81, "Pb": 82, "Bi": 83, "Po": 84, "At": 85,
    "Rn": 86, "Fr": 87, "Ra": 88, "Ac": 89, "Th": 90, "Pa": 91, "U": 92,
    "Np": 93, "Pu": 94, "Am": 95, "Cm": 96, "Bk": 97, "Cf": 98, "Es": 99,
    "Fm": 100, "Md": 101, "No": 102, "Lr": 103, "Rf": 104, "Db": 105,
    "Sg": 106, "Bh": 107, "Hs": 108, "Mt": 109, "Ds": 110, "Rg": 111,
    "Cn": 112, "Nh": 113, "Fl": 114, "Mc": 115, "Lv": 116, "Ts": 117,
    "Og": 118,
}

# atoms writable WITHOUT brackets (OpenSMILES "organic subset") and
# their lowercase aromatic spellings
_ORGANIC = ("Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I")
_AROMATIC_ORGANIC = ("b", "c", "n", "o", "p", "s")
# aromatic symbols legal inside brackets
_AROMATIC_BRACKET = ("b", "c", "n", "o", "p", "s", "se", "as", "te", "si")

# default valences used for implicit-H assignment on organic-subset
# atoms (OpenSMILES table; multi-valent elements take the SMALLEST
# valence that fits the explicit bond-order sum)
_DEFAULT_VALENCES: dict[int, tuple[int, ...]] = {
    5: (3,),          # B
    6: (4,),          # C
    7: (3, 5),        # N
    8: (2,),          # O
    15: (3, 5),       # P
    16: (2, 4, 6),    # S
    9: (1,), 17: (1,), 35: (1,), 53: (1,),  # halogens
}

# bond-order codes for invariants: 1/2/3/4 real orders, 5 = aromatic
_BOND_CODES = {"-": 1, "=": 2, "#": 3, "$": 4, ":": 5, "/": 1, "\\": 1}


@dataclass
class Atom:
    z: int
    aromatic: bool = False
    isotope: int = 0
    charge: int = 0
    explicit_h: int | None = None  # None = implicit (organic subset)
    atom_map: int = 0
    chiral: int = 0        # 0 = none, 1 = '@' (TH1), 2 = '@@' (TH2)
    # filled after parsing:
    bond_sum: int = 0      # Σ bond orders (aromatic counted as 1)
    degree: int = 0        # heavy-atom neighbour count
    in_ring: bool = False


@dataclass
class Mol:
    atoms: list[Atom] = field(default_factory=list)
    bonds: list[tuple[int, int, int]] = field(default_factory=list)  # (i, j, code)
    # per chiral atom: neighbour slots in WRITTEN order (OpenSMILES
    # §3.9.2 — preceding atom, then the bracket implicit-H slot, then
    # ring-closure digits at their written positions, then subsequent
    # atoms); -1 encodes the implicit H (repeated for H2+, which can
    # never form a valid tetrahedral spec and is dropped by the writer)
    stereo: dict[int, list[int]] = field(default_factory=dict)
    # r15 (E/Z): per DIRECTIONAL single bond (written '/' or '\\'),
    # bond eid → ±1 — the slash sense read in the STORED (a, b)
    # direction of Mol.bonds: +1 = '/', -1 = '\\'. Chain bonds store
    # (prev, next) = the written direction, so the sign is direct;
    # ring-closure bonds store (opener, closer), so a slash written at
    # the CLOSING digit (direction closer→opener per OpenSMILES §3.9.4)
    # is flipped before recording. A ring bond slashed at BOTH ends is
    # consistent iff the tokens are opposite ('/'+'\\'); the same token
    # twice is self-contradictory and records NO direction (the honest
    # drop — never a wrong slash).
    bdirs: dict[int, int] = field(default_factory=dict)

    def implicit_h(self, idx: int) -> int:
        """Implicit hydrogen count per the OpenSMILES rule: the
        smallest default valence ≥ the explicit bond-order sum, minus
        that sum; 0 when no valence fits or the element has no default.
        Aromatic atoms get one bonding electron absorbed by the ring
        system (the standard no-perception approximation: add 1 to the
        sum) and never escalate past their LOWEST default valence —
        aromatic s in thiophene is divalent-with-0H, not the
        4-valent-with-1H the escalating rule would invent (r13 fix;
        the old rule made Kekulé and aromatic thiophene different
        molecules, defeating the perception collapse)."""
        a = self.atoms[idx]
        if a.explicit_h is not None:
            return a.explicit_h
        vals = _DEFAULT_VALENCES.get(a.z)
        if vals is None:
            return 0
        s = a.bond_sum
        if a.aromatic:
            s += 1
            vals = vals[:1]
        for v in vals:
            if v >= s:
                return v - s
        return 0

    def total_h(self, idx: int) -> int:
        return self.implicit_h(idx)


def _read_bracket_atom(s: str, i: int) -> tuple[Atom, int]:
    """Parse ``[...]`` starting at the '[' (index i); returns (atom,
    index past the ']')."""
    j = i + 1
    n = len(s)
    # isotope
    iso = 0
    while j < n and s[j].isdigit():
        iso = iso * 10 + int(s[j])
        j += 1
    # symbol: '*', two-letter element, one-letter element, or aromatic
    aromatic = False
    if j < n and s[j] == "*":
        z = 0
        j += 1
    elif j + 1 < n and s[j : j + 2] in _ELEMENTS and s[j].isupper() and s[j + 1].islower():
        z = _ELEMENTS[s[j : j + 2]]
        j += 2
    elif j < n and s[j] in _ELEMENTS:
        z = _ELEMENTS[s[j]]
        j += 1
    elif j + 1 < n and s[j : j + 2] in _AROMATIC_BRACKET:
        z = _ELEMENTS[s[j : j + 2].capitalize()]
        aromatic = True
        j += 2
    elif j < n and s[j] in _AROMATIC_BRACKET:
        z = _ELEMENTS[s[j].upper()]
        aromatic = True
        j += 1
    else:
        raise SmilesParseError(f"bad element symbol at {i}: {s[i:i+4]!r}")
    # chirality: @ / @@ only (named tags like @TH1 are outside the subset)
    chiral = 0
    if j < n and s[j] == "@":
        chiral = 1
        j += 1
        if j < n and s[j] == "@":
            chiral = 2
            j += 1
        if j < n and s[j].isalnum() and s[j] != "H":
            raise SmilesParseError(f"unsupported chirality tag at {j}")
    # explicit H count
    hcount = 0
    has_h = False
    if j < n and s[j] == "H":
        has_h = True
        j += 1
        if j < n and s[j].isdigit():
            hcount = 0
            while j < n and s[j].isdigit():
                hcount = hcount * 10 + int(s[j])
                j += 1
        else:
            hcount = 1
    # charge: +, -, ++, --, +2, -3 ...
    charge = 0
    if j < n and s[j] in "+-":
        sign = 1 if s[j] == "+" else -1
        c = s[j]
        j += 1
        if j < n and s[j].isdigit():
            mag = 0
            while j < n and s[j].isdigit():
                mag = mag * 10 + int(s[j])
                j += 1
            charge = sign * mag
        else:
            mag = 1
            while j < n and s[j] == c:
                mag += 1
                j += 1
            charge = sign * mag
    # atom map / class
    amap = 0
    if j < n and s[j] == ":":
        j += 1
        if j >= n or not s[j].isdigit():
            raise SmilesParseError(f"bad atom map at {j}")
        while j < n and s[j].isdigit():
            amap = amap * 10 + int(s[j])
            j += 1
    if j >= n or s[j] != "]":
        raise SmilesParseError(f"unterminated bracket atom at {i}")
    # bracket atoms have FULLY EXPLICIT hydrogens (OpenSMILES):
    # [C] is carbon with zero H, unlike organic-subset C — so
    # explicit_h is always set here (0 when no H token), has_h only
    # distinguishes '[CH]' (1) from '[C]' (0) above
    del has_h
    return (
        Atom(z=z, aromatic=aromatic, isotope=iso, charge=charge,
             explicit_h=hcount, atom_map=amap, chiral=chiral),
        j + 1,
    )


def parse_smiles(s: str) -> Mol:
    """Parse ``s`` into a :class:`Mol`; raises :class:`SmilesParseError`
    outside the supported subset. Ring-closure bonds are emitted at the
    CLOSING digit with the order promised by either side (mismatched
    explicit ring-bond orders are an error, per OpenSMILES)."""
    if not isinstance(s, str) or not s:
        raise SmilesParseError("empty input")
    mol = Mol()
    prev: int | None = None          # atom awaiting a bond to the next atom
    pending_bond: str | None = None  # explicit bond char read since prev
    stack: list[int] = []
    # ring# → (atom, bond char, opener's stereo-slot position or None)
    rings: dict[int, tuple[int, str | None, int | None]] = {}
    # written-order neighbour slots per chiral atom (r14 stereo):
    # preceding atom first, then -1 per bracket H, then ring digits /
    # subsequent atoms in textual order; ring OPENINGS reserve a slot
    # patched when the ring closes
    chi: dict[int, list[int | None]] = {}
    i, n = 0, len(s)

    def _add_atom(atom: Atom) -> None:
        nonlocal prev, pending_bond
        idx = len(mol.atoms)
        mol.atoms.append(atom)
        if atom.chiral:
            sl: list[int | None] = [] if prev is None else [prev]
            sl.extend([-1] * (atom.explicit_h or 0))
            chi[idx] = sl
        if prev is not None:
            if prev in chi:
                chi[prev].append(idx)
            eid = len(mol.bonds)
            _add_bond(prev, idx, pending_bond)
            # r15: chain bonds are stored in the written direction, so
            # a slash sense records directly
            if pending_bond == "/":
                mol.bdirs[eid] = 1
            elif pending_bond == "\\":
                mol.bdirs[eid] = -1
        prev = idx
        pending_bond = None

    def _add_bond(a: int, b: int, bond: str | None) -> None:
        if bond is None:
            code = 5 if (mol.atoms[a].aromatic and mol.atoms[b].aromatic) else 1
        else:
            code = _BOND_CODES[bond]
        mol.bonds.append((a, b, code))

    while i < n:
        ch = s[i]
        if ch == "[":
            atom, i = _read_bracket_atom(s, i)
            _add_atom(atom)
        elif ch.isupper():
            two = s[i : i + 2]
            if two in ("Cl", "Br"):
                _add_atom(Atom(z=_ELEMENTS[two]))
                i += 2
            elif ch in "BCNOPSFI":
                _add_atom(Atom(z=_ELEMENTS[ch]))
                i += 1
            else:
                raise SmilesParseError(f"element {ch!r} needs brackets (pos {i})")
        elif ch in _AROMATIC_ORGANIC:
            _add_atom(Atom(z=_ELEMENTS[ch.upper()], aromatic=True))
            i += 1
        elif ch in _BOND_CODES:
            if pending_bond is not None:
                raise SmilesParseError(f"two bond symbols in a row at {i}")
            pending_bond = ch
            i += 1
        elif ch.isdigit() or ch == "%":
            if prev is None:
                raise SmilesParseError(f"ring closure before any atom at {i}")
            if ch == "%":
                if i + 2 >= n or not (s[i + 1].isdigit() and s[i + 2].isdigit()):
                    raise SmilesParseError(f"bad %nn ring number at {i}")
                num = int(s[i + 1 : i + 3])
                i += 3
            else:
                num = int(ch)
                i += 1
            if num in rings:
                other, obond, oslot = rings.pop(num)
                if other == prev:
                    raise SmilesParseError(f"self ring bond {num}")
                if obond is not None and pending_bond is not None and obond != pending_bond:
                    # r15: '/' at one end + '\\' at the other is the
                    # CONSISTENT two-ended spelling of one directional
                    # ring bond (each token reads away from its own
                    # atom) — only non-slash order mismatches raise
                    if not (obond in ("/", "\\") and pending_bond in ("/", "\\")):
                        raise SmilesParseError(f"ring bond {num} order mismatch")
                if oslot is not None:
                    chi[other][oslot] = prev  # patch the opener's slot
                if prev in chi:
                    chi[prev].append(other)
                # r15: ring-bond slash sense, stored (opener, closer)
                # orientation. An OPENING slash reads opener→closer; a
                # CLOSING slash reads closer→opener (flip). The same
                # token at both ends is self-contradictory → record no
                # direction (honest drop, input stays parseable).
                sign: int | None = None
                if obond == "/":
                    sign = 1
                elif obond == "\\":
                    sign = -1
                if pending_bond in ("/", "\\"):
                    psign = -1 if pending_bond == "/" else 1
                    if sign is None:
                        sign = psign
                    elif sign != psign:
                        sign = None
                eid = len(mol.bonds)
                _add_bond(other, prev, obond or pending_bond)
                if sign is not None:
                    mol.bdirs[eid] = sign
            else:
                oslot = None
                if prev in chi:
                    chi[prev].append(None)  # reserved until the ring closes
                    oslot = len(chi[prev]) - 1
                rings[num] = (prev, pending_bond, oslot)
            pending_bond = None
        elif ch == "(":
            if prev is None:
                raise SmilesParseError(f"branch before any atom at {i}")
            stack.append(prev)
            i += 1
        elif ch == ")":
            if not stack:
                raise SmilesParseError(f"unbalanced ')' at {i}")
            prev = stack.pop()
            i += 1
        elif ch == ".":
            if pending_bond is not None:
                raise SmilesParseError(f"bond before '.' at {i}")
            prev = None
            i += 1
        else:
            raise SmilesParseError(f"unsupported character {ch!r} at {i}")
    if stack:
        raise SmilesParseError("unbalanced '('")
    if rings:
        raise SmilesParseError(f"unclosed ring bonds: {sorted(rings)}")
    if pending_bond is not None:
        raise SmilesParseError("dangling bond symbol at end")
    if not mol.atoms:
        raise SmilesParseError("no atoms")

    # derived per-atom facts
    for a, b, code in mol.bonds:
        order = 1 if code == 5 else code
        mol.atoms[a].bond_sum += order
        mol.atoms[b].bond_sum += order
        mol.atoms[a].degree += 1
        mol.atoms[b].degree += 1
    # every ring placeholder is patched (unclosed rings raised above)
    mol.stereo = {i: sl for i, sl in chi.items()}  # type: ignore[misc]
    _mark_ring_atoms(mol)
    return mol


def _mark_ring_atoms(mol: Mol) -> None:
    """An atom is in a ring iff some incident edge is NOT a bridge.
    Bridges via one iterative DFS (Tarjan low-link) — molecules are
    tiny, but the iterative form also survives long chains without
    recursion limits."""
    n = len(mol.atoms)
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]  # (nbr, edge id)
    for eid, (a, b, _) in enumerate(mol.bonds):
        adj[a].append((b, eid))
        adj[b].append((a, eid))
    disc = [-1] * n
    low = [0] * n
    bridge = [False] * len(mol.bonds)
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        stack = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            v, pe, it = stack[-1]
            advanced = False
            for w, eid in it:
                if eid == pe:
                    continue
                if disc[w] == -1:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, eid, iter(adj[w])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u, _, _ = stack[-1]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        bridge[pe] = True
    for eid, (a, b, _) in enumerate(mol.bonds):
        if not bridge[eid]:
            mol.atoms[a].in_ring = True
            mol.atoms[b].in_ring = True
    # single atoms / acyclic stay False (bridges everywhere)


# ---------------------------------------------------------------------------
# Aromaticity perception (r13) — Hückel 4n+2 over the parsed graph, so
# Kekulé and aromatic spellings of the same molecule collapse to ONE
# canonical form (the reference's F3 via RDKit perceives aromaticity,
# orderly/extract/canonicalise.py:12-72; this was the last documented
# semantic delta, VERDICT r12 "What's missing" #1).
#
# Model (a close cousin of RDKit's default model, built from the
# published description — exocyclic doubles to electronegative atoms
# contribute 0 π electrons, lone-pair heteroatoms contribute 2,
# charged carbons 2/0, Hückel count 4n+2):
#   candidate rings  = per-ring-edge shortest cycles through atoms
#                      that can contribute π electrons, deduped;
#   ring passes      = every atom contributes (not None) and the π
#                      total ≡ 2 (mod 4) → atoms + ring bonds aromatic;
#   ring-SYSTEM pass = when a whole 2-edge-connected system has all
#                      atoms eligible and system π ≡ 2 (mod 4), the
#                      system aromatizes as a unit (azulene,
#                      indolizine — cases no single SSSR ring covers).
#
# Spelling invariance: for a FIXED molecular graph (bond orders + H
# counts as written), which atoms carry a double bond is forced by
# valence arithmetic — alternative Kekulé matchings only move doubles
# among atoms that ALL contribute 1 — so the per-ring π count, and
# hence the perceived result, is identical for every Kekulé spelling
# of the same molecule.
#
# H-count preservation: converted atoms get ``explicit_h`` pinned to
# their pre-conversion total H, so pyrrole's N survives Kekulé→aromatic
# as ``[nH]`` (the aromatic implicit-H rule would say 0) and the output
# re-parses to the same molecule. Idempotent by construction: a fully
# aromatic ring (all atoms + bonds already aromatic) is skipped.
#
# Documented ceilings: no DE-aromatization (an aromatic-written ring
# that fails Hückel stays as written — RDKit rejects such inputs
# outright); the union pass is all-or-nothing per ring system (no
# subset enumeration between single rings and the full system); ring
# systems past _PERCEIVE_EDGE_CAP ring bonds skip perception entirely
# (deterministic, fuzzer-lattice guard).
# ---------------------------------------------------------------------------

# exocyclic C=X / N=X doubles to these contribute 0 π (carbonyl-like)
_PI_EXO_ACCEPTOR = frozenset({7, 8, 16, 34, 52})
# ring atoms that may sit in an aromatic ring at all (all writable
# aromatic: b c n o p s + as se te in brackets)
_PI_ELIGIBLE_Z = frozenset({5, 6, 7, 8, 15, 16, 33, 34, 52})
_PERCEIVE_EDGE_CAP = 4000


def _pi_contrib(
    mol: Mol,
    adj: list[list[tuple[int, int, int]]],
    hs: list[int],
    v: int,
    sysid: list[int],
) -> int | None:
    """π electrons atom ``v`` contributes to a ring it sits in, or
    ``None`` when the atom cannot be part of an aromatic ring (sp3,
    wrong element, exocyclic C=C, cumulated doubles...). Depends only
    on the written graph — never on which candidate ring is being
    tested — so every Kekulé spelling of one molecule scores alike."""
    a = mol.atoms[v]
    if a.aromatic:
        # as-written aromatic atom inside a mixed spelling. r14 (ADVICE
        # r13): when it carries ONLY single bonds (e.g. the [nH] in
        # C1=CC=C[nH]1 — its neighbours are non-aromatic, so no ':'
        # bond was implied), a lone-pair donor contributes 2 exactly as
        # its pure spellings score it; returning 1 made mixed pyrrole
        # fail Hückel and canonicalise apart from both pure spellings.
        # Atoms with any written multiple/':' bond keep the as-written
        # 1 (remaining documented ceiling: a lone-pair donor ':'-bonded
        # inside a mixed FUSED system still scores 1).
        if not any(c in (2, 3, 4, 5) for _u, c, _e in adj[v]):
            z, q = a.z, a.charge
            if z in (7, 15, 33) and q <= 0:
                return 2
            if z in (8, 16, 34, 52) and q == 0:
                return 2
            if z == 6 and q == -1:
                return 2
            if z == 6 and q == 1:
                return 0
        return 1
    if a.z not in _PI_ELIGIBLE_Z:
        return None
    dbl: list[int] = []
    for u, code, _eid in adj[v]:
        if code in (3, 4):
            return None  # triple/quadruple-bonded atoms are not sp2
        if code == 5:
            return 1  # explicit ':' bond — π system as written
        if code == 2:
            dbl.append(u)
    if len(dbl) > 1:
        return None  # cumulated diene center (sp carbon)
    if dbl:
        u = dbl[0]
        if sysid[u] != -1 and sysid[u] == sysid[v]:
            return 1  # double inside this ring system (in-ring or fused)
        # exocyclic double: carbonyl-like X=O/N/S contributes 0
        # (2-pyridone aromatic); exocyclic C=C kills the ring (fulvene
        # is NOT aromatic)
        if mol.atoms[u].z in _PI_EXO_ACCEPTOR and a.z in (6, 7, 15, 16):
            return 0
        return None
    # no multiple bond: lone-pair donor / empty orbital / charged C
    if a.degree + hs[v] > 3:
        return None  # 4 sigma bonds: sp3
    z, q = a.z, a.charge
    if z == 6:
        if q == -1:
            return 2  # cyclopentadienyl anion
        if q == 1:
            return 0  # tropylium cation
        return None  # neutral all-single-bond carbon: sp3
    if z == 5:
        return 0 if q == 0 else None  # boron: empty p orbital
    if z in (7, 15, 33):
        return 2 if q <= 0 else None  # pyrrole-type N/P/As lone pair
    if z in (8, 16, 34, 52):
        return 2 if q == 0 else None  # furan/thiophene-type O/S/Se/Te
    return None


def _nonbridge_edges(mol: Mol) -> list[bool]:
    """Per-edge ring membership (edge is in SOME cycle ⟺ not a
    bridge) — same iterative Tarjan low-link walk as
    :func:`_mark_ring_atoms`, kept separate so the parser spans above
    stay byte-identical (regrade-ledger discipline)."""
    n = len(mol.atoms)
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for eid, (a, b, _) in enumerate(mol.bonds):
        adj[a].append((b, eid))
        adj[b].append((a, eid))
    disc = [-1] * n
    low = [0] * n
    bridge = [False] * len(mol.bonds)
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        stack = [(root, -1, iter(adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            v, pe, it = stack[-1]
            advanced = False
            for w, eid in it:
                if eid == pe:
                    continue
                if disc[w] == -1:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, eid, iter(adj[w])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u, _, _ = stack[-1]
                    low[u] = min(low[u], low[v])
                    if low[v] > disc[u]:
                        bridge[pe] = True
    return [not b for b in bridge]


def perceive_aromaticity(mol: Mol) -> Mol:
    """Return ``mol`` with Hückel-aromatic rings converted to aromatic
    atoms/bonds (Kekulé doubles → aromatic bonds, converted atoms'
    total H pinned via ``explicit_h``). Returns the INPUT object
    untouched when nothing qualifies — already-aromatic spellings and
    ring-free molecules short-circuit, which also makes the pass
    idempotent."""
    if not any(a.in_ring for a in mol.atoms):
        return mol
    in_cycle = _nonbridge_edges(mol)
    if sum(in_cycle) > _PERCEIVE_EDGE_CAP:
        return mol  # fuzzer-lattice guard (documented ceiling)
    n = len(mol.atoms)
    adj: list[list[tuple[int, int, int]]] = [[] for _ in range(n)]
    radj: list[list[tuple[int, int]]] = [[] for _ in range(n)]  # ring edges only
    for eid, (a, b, code) in enumerate(mol.bonds):
        adj[a].append((b, code, eid))
        adj[b].append((a, code, eid))
        if in_cycle[eid]:
            radj[a].append((b, eid))
            radj[b].append((a, eid))
    # ring systems = connected components over non-bridge edges
    sysid = [-1] * n
    systems: list[list[int]] = []
    for root in range(n):
        if sysid[root] != -1 or not radj[root]:
            continue
        sid = len(systems)
        comp = [root]
        sysid[root] = sid
        q = [root]
        while q:
            u = q.pop()
            for v, _e in radj[u]:
                if sysid[v] == -1:
                    sysid[v] = sid
                    comp.append(v)
                    q.append(v)
        systems.append(comp)
    hs = [mol.total_h(i) for i in range(n)]
    contrib = [
        _pi_contrib(mol, adj, hs, v, sysid) if sysid[v] != -1 else None
        for v in range(n)
    ]
    arom_atoms: set[int] = set()
    arom_bonds: set[int] = set()

    def _mark(atoms: list[int], eids: list[int], pi: int) -> None:
        if pi >= 2 and pi % 4 == 2:
            arom_atoms.update(atoms)
            arom_bonds.update(eids)

    # pass 1: per-edge shortest cycles through eligible atoms — ALL
    # shortest cycles per edge (r15 brute-oracle hunt fix: the old
    # single-BFS-path reconstruction picked ONE shortest cycle by
    # adjacency order, so when several equal-length rings share an
    # edge and only some satisfy Hückel, ring membership — and the
    # stereo keep decisions downstream of the refinement ranks — could
    # depend on the input's bond order; enumerating the complete,
    # order-independent set makes perception a function of the
    # abstract graph again). Path count per edge is capped; a cap hit
    # skips the edge deterministically (honest under-perception, the
    # same ceiling class as _PERCEIVE_EDGE_CAP).
    seen_rings: set[frozenset[int]] = set()
    for eid, (a, b, _code) in enumerate(mol.bonds):
        if not in_cycle[eid] or contrib[a] is None or contrib[b] is None:
            continue
        # BFS distances from a over eligible ring atoms, excluding eid
        dist: dict[int, int] = {a: 0}
        q = [a]
        while q and b not in dist:
            nxt: list[int] = []
            for u in q:
                for v, e2 in radj[u]:
                    if e2 == eid or v in dist or contrib[v] is None:
                        continue
                    dist[v] = dist[u] + 1
                    nxt.append(v)
            q = nxt
        if b not in dist:
            continue
        # every shortest b→a path down the BFS distance DAG (capped)
        pend: list[tuple[list[int], list[int]]] = [([b], [])]
        full: list[tuple[list[int], list[int]]] = []
        overflow = False
        while pend:
            atoms_p, eids_p = pend.pop()
            u = atoms_p[-1]
            if u == a:
                full.append((atoms_p, eids_p))
                continue
            for v, e2 in radj[u]:
                if e2 == eid or dist.get(v, -2) != dist[u] - 1:
                    continue
                pend.append((atoms_p + [v], eids_p + [e2]))
            if len(pend) + len(full) > 128:
                overflow = True
                break
        if overflow:
            continue
        for atoms_p, eids_p in full:
            key = frozenset(atoms_p)
            if len(atoms_p) < 3 or key in seen_rings:
                continue
            seen_rings.add(key)
            ring_eids = eids_p + [eid]
            # fully aromatic as written → nothing to perceive
            if all(mol.atoms[v].aromatic for v in atoms_p) and all(
                mol.bonds[e][2] == 5 for e in ring_eids
            ):
                continue
            _mark(atoms_p, ring_eids, sum(contrib[v] for v in atoms_p))  # type: ignore[misc]
    # pass 2: whole ring system as one π unit (azulene, indolizine)
    for sid, comp in enumerate(systems):
        if len(comp) < 3 or any(contrib[v] is None for v in comp):
            continue
        eids = [
            eid
            for eid, (a, b, _c) in enumerate(mol.bonds)
            if in_cycle[eid] and sysid[a] == sid
        ]
        if all(mol.atoms[v].aromatic for v in comp) and all(
            mol.bonds[e][2] == 5 for e in eids
        ):
            continue
        _mark(comp, eids, sum(contrib[v] for v in comp))  # type: ignore[misc]
    # anything actually change?
    new_atoms = {v for v in arom_atoms if not mol.atoms[v].aromatic}
    new_bonds = {e for e in arom_bonds if mol.bonds[e][2] != 5}
    if not new_atoms and not new_bonds:
        return mol
    from dataclasses import replace

    atoms = [
        replace(a, aromatic=True, explicit_h=hs[i]) if i in new_atoms else a
        for i, a in enumerate(mol.atoms)
    ]
    bonds = [
        (a, b, 5) if eid in new_bonds else (a, b, code)
        for eid, (a, b, code) in enumerate(mol.bonds)
    ]
    out = Mol(
        atoms=atoms,
        bonds=bonds,
        stereo=dict(mol.stereo),
        # directions on bonds that just became aromatic are moot
        # (in-ring; E/Z keeps bridge doubles only) — drop them
        bdirs={e: s for e, s in mol.bdirs.items() if e not in new_bonds},
    )
    # recompute derived fields (bond_sum counts aromatic as 1)
    for i, a in enumerate(out.atoms):
        out.atoms[i] = replace(a, bond_sum=0, degree=0)
    for a, b, code in out.bonds:
        order = 1 if code == 5 else code
        out.atoms[a].bond_sum += order
        out.atoms[b].bond_sum += order
        out.atoms[a].degree += 1
        out.atoms[b].degree += 1
    for i, a in enumerate(mol.atoms):
        out.atoms[i].in_ring = a.in_ring
    return out


# ---------------------------------------------------------------------------
# F5 — exact transition-metal walk (defaults.py:10-39 ranges)
# ---------------------------------------------------------------------------

def _is_tm(z: int) -> bool:
    return 22 <= z <= 29 or 40 <= z <= 47 or 72 <= z <= 79


def molecule_has_tm(s: str) -> bool | None:
    """Exact atomic-number transition-metal test on the parsed graph;
    ``None`` when ``s`` is outside the parser's subset (caller falls
    back to the documented symbol scan)."""
    try:
        mol = parse_smiles(s)
    except SmilesParseError:
        return None
    return any(_is_tm(a.z) for a in mol.atoms)


# ---------------------------------------------------------------------------
# F14 — Morgan / ECFP fingerprint on the parsed graph
# ---------------------------------------------------------------------------

_PACKERS: dict[int, "struct.Struct"] = {}


def _h64(*parts: int) -> int:
    """Stable 64-bit hash of an int tuple (blake2b; NEVER Python's
    randomised hash())."""
    # inputs mix small signed ints (charge) and unsigned 64-bit chained
    # hashes — mask to unsigned 64-bit two's complement before packing.
    # struct.pack(">nQ") emits the same big-endian bytes as the
    # original per-part int.to_bytes join (pinned-value tests hold)
    # at ~25% less kernel time — this is the hot call (≈160/molecule).
    n = len(parts)
    pk = _PACKERS.get(n)
    if pk is None:
        pk = _PACKERS[n] = struct.Struct(">%dQ" % n)
    b = pk.pack(*[p & 0xFFFFFFFFFFFFFFFF for p in parts])
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def morgan_fingerprint(s: str, radius: int = 3, n_bits: int = 2048) -> list[int] | None:
    """Counted, hashed Morgan fingerprint (ECFP algorithm, Rogers &
    Hahn 2010) of the parsed molecule; ``None`` on parse failure.

    Initial atom invariants follow the ECFP standard set: atomic
    number, heavy-atom degree, total H, charge, isotope, ring
    membership, aromatic flag. Iteration r re-hashes each atom with
    its SORTED (bond code, neighbour invariant) list — sorted, so the
    result is invariant to the SMILES atom order (the property the
    unit tests pin via renumbered spellings). ECFP environment dedup:
    two features describing the same bond set keep only the first
    (lower radius, then smaller invariant). Mirrors the CONTRACT of
    the reference's GetHashedMorganFingerprint use
    (fingerprints.py:76-99): counts folded to ``n_bits``; exact RDKit
    bit parity is NOT claimed (different internal hash), equality /
    invariance parity is, and is skip-gate-tested where RDKit exists."""
    try:
        mol = parse_smiles(s)
    except SmilesParseError:
        return None
    # r13: perceive aromaticity first, so Kekulé and aromatic spellings
    # of one molecule fingerprint identically (RDKit's Morgan is
    # aromatic-aware the same way — parity pinned by the skip-gated
    # equality-class tests)
    mol = perceive_aromaticity(mol)
    n = len(mol.atoms)
    adj: list[list[tuple[int, int, int]]] = [[] for _ in range(n)]  # (nbr, code, eid)
    for eid, (a, b, code) in enumerate(mol.bonds):
        adj[a].append((b, code, eid))
        adj[b].append((a, code, eid))
    inv = [
        _h64(
            a.z, a.degree, mol.total_h(i), a.charge, a.isotope,
            int(a.in_ring), int(a.aromatic),
        )
        for i, a in enumerate(mol.atoms)
    ]
    # feature set with ECFP environment dedup
    env: list[frozenset[int]] = [frozenset() for _ in range(n)]
    seen_env: dict[frozenset[int], int] = {}
    features: list[int] = []
    for i in range(n):
        features.append(inv[i])  # radius-0 features are all kept
    for _r in range(1, radius + 1):
        new_inv = list(inv)
        new_env = list(env)
        round_feats: list[tuple[int, frozenset[int]]] = []
        for i in range(n):
            ai = adj[i]
            nbrs = sorted((code, inv[j]) for j, code, _e in ai)
            parts = [_r, inv[i]]
            for code, nv in nbrs:
                parts.append(code)
                parts.append(nv)
            new_inv[i] = _h64(*parts)
            e = set(env[i])
            for j, _c, eid in ai:
                e.add(eid)
                e |= env[j]
            new_env[i] = frozenset(e)
            round_feats.append((new_inv[i], new_env[i]))
        inv, env = new_inv, new_env
        # dedup within/across rounds by bond-set environment: first
        # (earliest round, then smallest invariant) wins
        for fv, fe in sorted(round_feats, key=lambda t: t[0]):
            if not fe:
                continue  # isolated atom: env empty, radius-0 already covers
            if fe not in seen_env:
                seen_env[fe] = fv
                features.append(fv)
    out = [0] * n_bits
    for fv in features:
        out[fv % n_bits] += 1
    return out


# ---------------------------------------------------------------------------
# F3 — canonical SMILES writer on the parsed graph (r12)
#
# The classic two-part construction (Morgan 1965; Weininger, Weininger
# & Weininger 1989 — CANGEN):
#   1. RANK: partition atoms by graph invariants, refine the partition
#      with neighbour-rank multisets until stable (Morgan relaxation).
#   2. TIE-BREAK: if atoms remain tied, branch — force each member of
#      the first tied class to the front in turn, re-refine, recurse —
#      and keep the lexicographically smallest output string. Trying
#      ALL members of the class makes the result independent of input
#      atom order even when tied atoms are NOT automorphic (the known
#      unsoundness of "pick any" tie-breaking); automorphic branches
#      simply produce identical strings.
# The writer then emits a deterministic DFS spelling from the rank-0
# atom, children in rank order, ring-closure digits assigned in output
# order with lowest-free-number reuse. Components are written
# independently and joined sorted, so dot order is canonical too.
#
# Explicit ceilings (documented, not hidden):
# - tetrahedral chirality (@/@@) IS retained (r14, see the stereo
#   block above _perm_parity) with the documented keep/drop rule, and
#   r15 extends retention to cis/trans bond slashes (constraint-system
#   emission), pseudo-asymmetric centres (descriptor fixpoint) and
#   para/dependent ring centres (provisional rule) — remaining honest
#   drops: in-ring double-bond slashes, allene axial stereo;
# - aromaticity IS perceived (r13, :func:`perceive_aromaticity`):
#   Kekulé and aromatic spellings of a Hückel-aromatic ring
#   canonicalise to ONE aromatic string, matching the reference's
#   RDKit behaviour; remaining perception ceilings (no
#   de-aromatization of non-Hückel aromatic-written input,
#   all-or-nothing ring-system union pass) are documented on that
#   function;
# - pathological symmetry beyond _CANON_BRANCH_BUDGET branch nodes or
#   >99 simultaneously-open ring bonds returns None (caller keeps its
#   fallback). Real reaction-corpus molecules sit orders of magnitude
#   below both limits; simple cycles (plain macrocycles included)
#   bypass the tie-break entirely via the r13 rotation-orbit path.
# ---------------------------------------------------------------------------

_SYMBOL: dict[int, str] = {z: sym for sym, z in _ELEMENTS.items()}
# tie-break work budget in atom·refine-iteration units, charged ONLY
# inside tie-break branches (the top-level refinement is free, so
# asymmetric molecules of any size — substituted chains, macrolides —
# never touch it). Calibration (1 unit ≈ 1–2 µs): mirror-symmetric
# plain chains cost ~n²/2 units (C500 ≈ 125k — completes), plain
# macrocycles ~n³/4 (complete through ~C30; C60 and beyond fall back
# to None in under half a second). The ceiling is deliberately deterministic: a
# time-based budget would break cross-host canon determinism.
_CANON_BRANCH_BUDGET = 300000
_BOND_CHAR = {2: "=", 3: "#", 4: "$"}


class _CanonLimit(Exception):
    """Internal: branch budget / ring-digit space exhausted."""


def _implied_h(z: int, bond_sum: int, aromatic: bool) -> int:
    """H count a BARE (organic-subset) spelling would imply on
    re-parse — must equal the atom's actual total H for the writer to
    drop the brackets. Mirrors Mol.implicit_h's explicit_h=None path
    (including the r13 aromatic lowest-valence-only rule)."""
    vals = _DEFAULT_VALENCES.get(z)
    if vals is None:
        return 0
    s = bond_sum
    if aromatic:
        s += 1
        vals = vals[:1]
    for v in vals:
        if v >= s:
            return v - s
    return 0


def _atom_token(a: Atom, h: int, chiral: int = 0) -> str:
    """Write one atom: bare organic-subset spelling when re-parsing it
    reproduces (z, aromatic, H, charge=0, isotope=0, map=0); brackets
    with an explicit H count otherwise. ``chiral`` is the tag AS
    EMITTED for this writer's neighbour order (0 = none — either no
    tag was parsed or the resolver dropped it); a nonzero tag forces
    brackets."""
    sym = "*" if a.z == 0 else _SYMBOL[a.z]
    if chiral == 0 and a.isotope == 0 and a.charge == 0 and a.atom_map == 0 and a.z != 0:
        if a.aromatic:
            if sym.lower() in _AROMATIC_ORGANIC and _implied_h(a.z, a.bond_sum, True) == h:
                return sym.lower()
        elif sym in _ORGANIC and _implied_h(a.z, a.bond_sum, False) == h:
            return sym
    out = "["
    if a.isotope:
        out += str(a.isotope)
    out += sym.lower() if (a.aromatic and sym.lower() in _AROMATIC_BRACKET) else sym
    if chiral:
        out += "@" if chiral == 1 else "@@"
    if h == 1:
        out += "H"
    elif h > 1:
        out += f"H{h}"
    if a.charge == 1:
        out += "+"
    elif a.charge == -1:
        out += "-"
    elif a.charge > 1:
        out += f"+{a.charge}"
    elif a.charge < -1:
        out += f"-{-a.charge}"
    if a.atom_map:
        out += f":{a.atom_map}"
    return out + "]"


def _bond_token(code: int, a: Atom, b: Atom) -> str:
    """Bond spelling between two written atoms; '' where the reader's
    default (aromatic iff both atoms aromatic, else single) already
    gives this code."""
    both_arom = a.aromatic and b.aromatic
    if code == 5:
        return "" if both_arom else ":"
    if code == 1:
        return "-" if both_arom else ""
    return _BOND_CHAR[code]


# ---------------------------------------------------------------------------
# Stereo retention (r14 tetrahedral, r15 cis/trans + stereo-aware
# refinement fixpoint) — @/@@ and /,\ through canonicalisation.
#
# TETRAHEDRAL model (OpenSMILES §3.9.2): a tetrahedral spec is an
# ORDERED list of the centre's four neighbour slots as written
# (preceding atom, the bracket implicit-H slot, ring-closure digits at
# their written positions, then subsequent atoms) plus a sense tag;
# two (order, tag) pairs denote the SAME configuration iff the
# permutation between the orders is even for equal tags / odd for
# flipped tags. The parser records the written order (Mol.stereo); the
# writer re-emits the tag flipped by the parity of the
# written-vs-output neighbour permutation, so every respelling of one
# enantiomer canonicalises to ONE string while its mirror stays
# distinct (the reference keeps @/@@ through RDKit MolToSmiles,
# orderly/extract/canonicalise.py:25-47).
#
# BOND (E/Z) model (OpenSMILES §3.9.4, r15): a directional single bond
# written X/Y means "X below Y" reading left-to-right; for a double
# bond C1=C2, substituent A of C1 and B of C2 are on the SAME side
# (cis) iff sign(A→C1)·sign(B→C2) = +1, where sign(x→y) is +1 when the
# bond reads '/' in the x→y direction. The parser records each slash's
# sign in the stored bond orientation (Mol.bdirs); the resolver turns
# the signs into a per-double-bond SIDE labelling σ: substituent →
# {0,1} (flip-symmetric — only side EQUALITY is a fact). Emission is a
# CONSTRAINT SYSTEM, not a per-bond flip: slash tokens are shared
# between adjacent double bonds in conjugated systems, so the resolver
# builds parity-linked groups over the directional bonds (union-find;
# acyclic by construction — kept double bonds are bridges, so the
# constraint graph cannot cycle) and the writer fixes each group's one
# free sign deterministically (the earliest-emitted bond of the group
# becomes '/').
#
# Keep/drop rule (what makes respelling-invariance SOUND): a stereo
# element survives only when no automorphism of the molecule can
# exchange the substituents that define it. Decided in three passes,
# all spelling-invariant:
#   1. stereo-blind stable Morgan refinement — a tetrahedral tag needs
#      4 pairwise-distinct slots (≤1 implicit H) with pairwise-distinct
#      heavy-neighbour ranks; an E/Z bond needs a bridge (non-ring),
#      non-aromatic-ended double bond with 1–2 substituents per end,
#      every substituent attached by a SINGLE bond (a cumulated =X=
#      end is sp — axial stereo, not cis/trans — and drops),
#      ≥1 directional single bond per end, per-end (bond code, rank)
#      keys pairwise distinct, and per-end input slashes consistent.
#   2. stereo-aware refinement FIXPOINT (r15, removes the r14
#      over-drop ceiling): each kept element contributes a canonical
#      spelling-invariant DESCRIPTOR (tetra: tag flipped to the
#      rank-sorted slot order; bond: cis/trans of the per-end min-rank
#      covered substituents); descriptors augment the refinement
#      colours and the keep scan re-runs until stable. This keeps
#      pseudo-asymmetric centres (the meso-triol middle carbon, r/s)
#      and any centre distinguished only by neighbouring stereo.
#   3. PARA (dependent ring) stereocentres (r15): a tagged atom with
#      exactly one refinement-TIED slot pair, both tied atoms in the
#      same ring system as the centre, is kept PROVISIONALLY when that
#      ring system contains another kept or provisional stereo element
#      (pruned to a fixpoint). cis/trans-1,4-disubstituted cyclohexanes
#      are the canonical case: neither centre is independently
#      stereogenic, but together they are. Provisional tags carry no
#      descriptor (their parity is not rank-expressible); soundness
#      comes from the tie-break machinery — the branch enumeration
#      covers every automorphic relabelling, so the min string is the
#      same for every spelling of one diastereomer, and two tag
#      assignments collapse iff an automorphism maps one onto the
#      other, i.e. iff they ARE the same stereoisomer.
#
# Documented ceilings: in-ring double bonds drop their slashes (ring
# cis/trans is geometry, honest drop — macrocycle E/Z included);
# allene/axial stereo is dropped (a 2-neighbour centre never has 4
# slots, and slashes on a cumulated double bond drop at the candidate
# gate — r15 hunt fix); the para rule may keep a tag in exotic polycyclic cases
# where RDKit's full automorphism analysis would strip it (collapse
# stays internally sound via the orbit argument; an over-KEPT tag is
# consistently kept for every spelling, never invented on untagged
# input); a dropped or absent element never invents stereo. A wrong
# bit is worse than an honest drop — every kept element round-trips
# (the property tests re-parse the canonical output and check
# configuration equivalence).
# ---------------------------------------------------------------------------


def _perm_parity(src: list[int], dst: list[int]) -> int:
    """Parity (0 even / 1 odd) of the permutation carrying ``src`` onto
    ``dst`` (same 4 distinct elements, caller-checked)."""
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


def _emit_tag(cfg: tuple[list[int], int], out_slots: list[int]) -> int:
    """Tag to WRITE for a kept configuration given this writer's output
    neighbour order: the parsed tag, flipped when the written→output
    permutation is odd. Returns 0 (no tag) if the slot sets diverge —
    defensive only; the resolver guarantees agreement."""
    slots, tag = cfg
    if len(out_slots) != 4 or set(out_slots) != set(slots):
        return 0
    return tag if _perm_parity(slots, out_slots) == 0 else 3 - tag


def _resolve_stereo(
    mol: Mol,
    comps: list[list[int]],
    adj: list[list[tuple[int, int, int]]],
    hs: list[int],
) -> tuple[dict[int, tuple[list[int], int]], dict[int, tuple[int, int]]]:
    """Apply the keep/drop rule (header block above) to every parsed
    stereo element. Returns ``(tetra, slash)``:

    - ``tetra``: atom → (written slot order, tag) for kept tetrahedral
      configurations (fixpoint-kept + provisional para centres);
    - ``slash``: directional-single-bond eid → (constraint-group root,
      parity relative to that root) for every substituent bond of a
      kept E/Z double bond. The writer fixes one sign per group.

    Early-exits to ``({}, {})`` when the input carried no stereo at
    all, so tagless corpora pay nothing (the r14 perf contract)."""
    if not mol.stereo and not mol.bdirs:
        return {}, {}
    kept_t: dict[int, tuple[list[int], int]] = {}
    slash: dict[int, tuple[int, int]] = {}
    # lazy shared ring facts (needed for E/Z bridge test + para rule)
    in_cycle: list[bool] | None = None
    sysid: list[int] | None = None

    def _ring_facts() -> tuple[list[bool], list[int]]:
        nonlocal in_cycle, sysid
        if in_cycle is None:
            in_cycle = _nonbridge_edges(mol)
            sid = [-1] * len(mol.atoms)
            nsys = 0
            radj: list[list[int]] = [[] for _ in range(len(mol.atoms))]
            for eid, (a, b, _c) in enumerate(mol.bonds):
                if in_cycle[eid]:
                    radj[a].append(b)
                    radj[b].append(a)
            for root in range(len(mol.atoms)):
                if sid[root] != -1 or not radj[root]:
                    continue
                sid[root] = nsys
                q = [root]
                while q:
                    u = q.pop()
                    for v in radj[u]:
                        if sid[v] == -1:
                            sid[v] = nsys
                            q.append(v)
                nsys += 1
            sysid = sid
        assert sysid is not None
        return in_cycle, sysid

    # union-find with parity over directional-bond eids (global — the
    # constraint graph never crosses a component boundary anyway)
    uf_par: dict[int, tuple[int, int]] = {}  # eid → (parent, parity to parent)

    def _find(x: int) -> tuple[int, int]:
        path = []
        p = 0
        while True:
            pa, pp = uf_par.setdefault(x, (x, 0))
            if pa == x:
                break
            path.append((x, p))
            p ^= pp
            x = pa
        root, rootpar = x, p
        # path compression: repoint every visited node at the root
        for node, pre in path:
            uf_par[node] = (root, rootpar ^ pre)
        return root, rootpar

    def _union(x: int, y: int, parity: int) -> bool:
        rx, px = _find(x)
        ry, py = _find(y)
        if rx == ry:
            return (px ^ py) == parity  # False = contradiction
        uf_par[ry] = (rx, px ^ py ^ parity)
        return True

    bad_roots: set[int] = set()

    for comp in comps:
        comp_eids = sorted({e for g in comp for _v, _c, e in adj[g]})
        tagged = [
            g for g in comp if g in mol.stereo and mol.atoms[g].chiral in (1, 2)
        ]
        has_dirs = any(e in mol.bdirs for e in comp_eids)
        if not tagged and not has_dirs:
            continue
        # --- tetra candidate validity before paying for refinement
        cands_t: list[tuple[int, list[int]]] = []
        for g in tagged:
            slots = list(mol.stereo[g])
            if len(slots) != 4 or len(set(slots)) != 4:
                continue  # <4 slots, duplicate H, or 5+ slots upstream
            heavies = {v for v, _c, _e in adj[g]}
            if {v for v in slots if v != -1} != heavies:
                continue  # defensive: slots must BE the neighbour set
            if (-1 in slots) != (hs[g] == 1):
                continue  # H slot must match the written H count
            cands_t.append((g, slots))
        # --- E/Z candidate validity (r15): bridge double bonds whose
        # ends are non-aromatic, carry 1-2 substituents each, and have
        # a CONSISTENT directional single bond on each end
        cands_b: list[tuple[int, tuple[int, int], dict[int, list[tuple[int, int, int]]], dict[int, int]]] = []
        if has_dirs:
            cyc, _sid = _ring_facts()
            for eid in comp_eids:
                a, b, code = mol.bonds[eid]
                if code != 2 or cyc[eid]:
                    continue
                if mol.atoms[a].aromatic or mol.atoms[b].aromatic:
                    continue
                subs: dict[int, list[tuple[int, int, int]]] = {}
                sides: dict[int, int] = {}  # substituent atom → 0/1
                ok = True
                for end, partner in ((a, b), (b, a)):
                    ss = [(v, c, e) for v, c, e in adj[end] if e != eid]
                    if not 1 <= len(ss) <= 2:
                        ok = False
                        break
                    if any(c != 1 for _v, c, _e in ss):
                        # cumulated end (=X= / #X): the end is sp, its
                        # substituents sit on an AXIS — per-bond
                        # cis/trans is undefined there (allene-class
                        # axial stereo), and emitting slashes for it
                        # provably conflates distinct geometries (the
                        # r15 brute-oracle hunt caught exactly that).
                        # Honest drop, CANON_VERSION 4→5.
                        ok = False
                        break
                    end_sides: dict[int, int] = {}
                    for v, c, e in ss:
                        if c != 1 or e not in mol.bdirs:
                            continue
                        ea, _eb, _ec = mol.bonds[e]
                        s = mol.bdirs[e] if ea == v else -mol.bdirs[e]
                        sd = 0 if s == 1 else 1
                        if end_sides.get(v, sd) != sd:
                            ok = False  # defensive (one bond, one sign)
                        end_sides[v] = sd
                    if not ok or not end_sides:
                        ok = False  # no directional bond on this end
                        break
                    if len(end_sides) == 2 and len(set(end_sides.values())) != 2:
                        ok = False  # both subs written on ONE side
                        break
                    # complement for an undirected single-bond sibling
                    if len(end_sides) == 1 and len(ss) == 2:
                        other = next(
                            v for v, c, _e in ss
                            if v not in end_sides
                        )
                        oc = next(c for v, c, _e in ss if v == other)
                        if oc == 1:
                            end_sides[other] = 1 - next(iter(end_sides.values()))
                    subs[end] = ss
                    sides.update(end_sides)
                if ok:
                    cands_b.append((eid, (a, b), subs, sides))
        if not cands_t and not cands_b:
            continue
        # --- stereo-blind refinement, then the descriptor fixpoint
        local = {g: i for i, g in enumerate(comp)}
        ladj: list[list[tuple[int, int]]] = [
            [(local[v], code) for v, code, _e in adj[g]] for g in comp
        ]
        init_keys = [
            (
                a.z,
                int(a.aromatic),
                a.isotope,
                a.charge,
                hs[g],
                a.degree,
                a.bond_sum,
                int(a.in_ring),
                a.atom_map,
            )
            for g in comp
            for a in (mol.atoms[g],)
        ]
        uniq = {k: r for r, k in enumerate(sorted(set(init_keys)))}
        ranks0 = [uniq[k] for k in init_keys]

        def _resolve_comp(
            active_b: list[
                tuple[int, tuple[int, int], dict[int, list[tuple[int, int, int]]], dict[int, int]]
            ],
        ) -> tuple[
            dict[int, tuple[list[int], int]],
            dict[int, tuple[tuple[int, int], dict[int, list[tuple[int, int, int]]], dict[int, int]]],
        ]:
            ranks = _refine(ladj, list(ranks0))
            kept_tc: dict[int, tuple[list[int], int]] = {}
            desc_t: dict[int, int] = {}
            kept_bc: dict[int, tuple[tuple[int, int], dict[int, list[tuple[int, int, int]]], dict[int, int]]] = {}
            desc_b: dict[int, int] = {}
            while True:
                new = False
                for g, slots in cands_t:
                    if g in kept_tc:
                        continue
                    rs = [ranks[local[v]] for v in slots if v != -1]
                    if len(set(rs)) != len(rs):
                        continue  # heavy slots not pairwise separated (yet)
                    tag = mol.atoms[g].chiral
                    kept_tc[g] = (slots, tag)
                    # canonical descriptor: tag re-expressed in the
                    # rank-sorted slot order (H first) — spelling-invariant
                    srt = sorted(
                        slots,
                        key=lambda v: (-1,) if v == -1 else (0, ranks[local[v]]),
                    )
                    desc_t[g] = tag if _perm_parity(slots, srt) == 0 else 3 - tag
                    new = True
                for eid, ends, subs, sides in active_b:
                    if eid in kept_bc:
                        continue
                    reps: list[int] = []
                    distinct = True
                    for end in ends:
                        keys = [(c, ranks[local[v]]) for v, c, _e in subs[end]]
                        if len(set(keys)) != len(keys):
                            distinct = False  # swappable substituents
                            break
                        cov = [v for v, _c, _e in subs[end] if v in sides]
                        rep = min(cov, key=lambda v: ranks[local[v]])
                        reps.append(sides[rep])
                    if not distinct:
                        continue
                    kept_bc[eid] = (ends, subs, sides)
                    desc_b[eid] = 1 if reps[0] == reps[1] else 0  # 1 = cis
                    new = True
                if not new:
                    break
                # augment colours with the new descriptors and re-refine;
                # the previous rank leads the key, so the partition only
                # ever refines and earlier descriptors stay valid
                incid: dict[int, list[int]] = {}
                for eid in kept_bc:
                    ea, eb, _c = mol.bonds[eid]
                    incid.setdefault(ea, []).append(desc_b[eid])
                    incid.setdefault(eb, []).append(desc_b[eid])
                aug = [
                    (
                        ranks[i],
                        desc_t.get(g, 0),
                        tuple(sorted(incid.get(g, ()))),
                    )
                    for i, g in enumerate(comp)
                ]
                uniq2 = {k: r for r, k in enumerate(sorted(set(aug)))}
                ranks = _refine(ladj, [uniq2[k] for k in aug])
            # --- para (dependent ring) centres: provisional keeps
            prov: list[tuple[int, list[int]]] = []
            for g, slots in cands_t:
                if g in kept_tc:
                    continue
                heavies = [v for v in slots if v != -1]
                cnt: dict[int, int] = {}
                for v in heavies:
                    cnt[ranks[local[v]]] = cnt.get(ranks[local[v]], 0) + 1
                tied = [r for r, c in cnt.items() if c > 1]
                if len(tied) != 1 or cnt[tied[0]] != 2:
                    continue  # need exactly one tied PAIR
                pair = [v for v in heavies if ranks[local[v]] == tied[0]]
                _cyc, sid = _ring_facts()
                if sid[g] == -1 or sid[pair[0]] != sid[g] or sid[pair[1]] != sid[g]:
                    continue  # tied pair must ring back to the centre
                prov.append((g, slots))
            if prov:
                _cyc, sid = _ring_facts()
                kept_sys = {sid[g] for g in kept_tc if sid[g] != -1}
                for eid in kept_bc:
                    ea, eb, _c = mol.bonds[eid]
                    for t in (ea, eb):
                        if sid[t] != -1:
                            kept_sys.add(sid[t])
                while True:
                    surv = []
                    for g, slots in prov:
                        others = sum(
                            1 for h, _s in prov if h != g and sid[h] == sid[g]
                        )
                        if sid[g] in kept_sys or others:
                            surv.append((g, slots))
                    if len(surv) == len(prov):
                        break
                    prov = surv
                for g, slots in prov:
                    kept_tc[g] = (slots, mol.atoms[g].chiral)
            return kept_tc, kept_bc

        # --- completion prune (r15 brute-oracle hunt fix): the writer
        # re-emits a slash for EVERY covered substituent bond of every
        # kept double bond; if those tokens land on BOTH ends of a
        # double bond that was NOT kept, the output would accidentally
        # SPECIFY a geometry for it that the input never fixed — an
        # invented slash. Veto the kept bonds whose covered subs touch
        # such a completed bond and re-resolve the whole component
        # (keep set, descriptor fixpoint, and para keeps must stay
        # mutually consistent); monotone in the veto set, terminates.
        # The veto/completion tests are purely structural (adjacency of
        # emitted tokens), so the outcome is spelling-invariant.
        veto: set[int] = set()
        while True:
            kept_tc, kept_bc = _resolve_comp(
                [cb for cb in cands_b if cb[0] not in veto]
            )
            emitted: set[int] = set()
            for _eid, (ends, subs, sides) in kept_bc.items():
                for end in ends:
                    for v, c, e in subs[end]:
                        if c == 1 and v in sides:
                            emitted.add(e)
            dends: set[int] = set()
            for eid2 in comp_eids:
                a2, b2, c2 = mol.bonds[eid2]
                if c2 != 2 or eid2 in kept_bc:
                    continue
                if all(
                    any(
                        e in emitted
                        for _v, c, e in adj[x]
                        if e != eid2 and c == 1
                    )
                    for x in (a2, b2)
                ):
                    dends.update((a2, b2))
            if not dends:
                break
            drops = {
                keid
                for keid, (ends, subs, sides) in kept_bc.items()
                for end in ends
                for v, c, _e in subs[end]
                if c == 1 and v in sides and (v in dends or end in dends)
            }
            if not drops:  # defensive: completion implies an adjacent keep
                break
            veto |= drops
        kept_t.update(kept_tc)
        # --- E/Z slash constraint groups (per kept bond: the bit of
        # every covered substituent bond, in its STORED orientation,
        # equals flip(sub) XOR σ(sub) XOR one per-double-bond free
        # sign — so subs of one double bond union pairwise)
        for eid, (ends, subs, sides) in kept_bc.items():
            anchor: tuple[int, int] | None = None
            for end in ends:
                for v, c, e in subs[end]:
                    if c != 1 or v not in sides:
                        continue
                    ea, _eb, _ec = mol.bonds[e]
                    flip = 0 if ea == v else 1
                    t = flip ^ sides[v]
                    if anchor is None:
                        anchor = (e, t)
                        _find(e)  # materialise singleton
                    elif not _union(e, anchor[0], t ^ anchor[1]):
                        bad_roots.add(_find(e)[0])  # defensive; unreachable
    # finalise slash groups (skip any contradicted group wholesale —
    # defensive only: kept doubles are bridges, so the constraint
    # graph is acyclic and contradictions cannot arise from valid σ)
    for e in uf_par:
        root, p = _find(e)
        if root not in bad_roots:
            slash[e] = (root, p)
    return kept_t, slash


def _refine(
    adj: list[list[tuple[int, int]]],
    ranks: list[int],
    budget: list[int] | None = None,
) -> list[int]:
    """Morgan relaxation: re-key each atom by (own rank, sorted
    (bond code, neighbour rank) multiset) until the class count stops
    growing. Old rank leads the key, so partitions only ever refine —
    equal counts means an identical partition, hence stable. When
    ``budget`` is given, each iteration charges the atom count and
    raises :class:`_CanonLimit` on exhaustion."""
    n = len(ranks)
    nclasses = len(set(ranks))
    while True:
        if budget is not None:
            budget[0] -= n
            if budget[0] < 0:
                raise _CanonLimit("tie-break budget exhausted")
        keys = [
            (ranks[i], tuple(sorted((code, ranks[j]) for j, code in adj[i])))
            for i in range(n)
        ]
        order = sorted(range(n), key=keys.__getitem__)
        new = [0] * n
        r = 0
        for k, i in enumerate(order):
            if k and keys[i] != keys[order[k - 1]]:
                r += 1
            new[i] = r
        if r + 1 == nclasses:
            return new
        nclasses = r + 1
        ranks = new


def _write_component(
    mol: Mol,
    comp: list[int],
    adj: list[list[tuple[int, int, int]]],
    ranks_g: dict[int, int],
    hs: list[int],
    stereo: dict[int, tuple[list[int], int]] | None = None,
    slash: dict[int, tuple[int, int]] | None = None,
) -> str:
    """Emit one connected component given a DISCRETE ranking
    (``ranks_g``: global atom index → rank, unique within the
    component). Fully iterative — survives chain molecules far past
    Python's recursion limit. Kept stereo configurations (r14) are
    re-emitted with the tag flipped by the parity of the
    written-vs-output neighbour permutation; the output order mirrors
    exactly what a re-parse of this writer's string records (parent,
    bracket-H slot, ring digits in emission order, children). Kept E/Z
    groups (r15, ``slash``: eid → (group root, parity)) emit '/' and
    '\\' tokens: each group's free sign is fixed so its
    earliest-emitted bond reads '/', then every other token follows
    the resolver's parities — re-parsing reproduces the side relations
    exactly, whichever free sign was chosen."""
    stereo = stereo or {}
    slash = slash or {}
    start = min(comp, key=ranks_g.__getitem__)
    # --- plan: DFS preorder, tree children in rank order, ring edges
    disc: dict[int, int] = {}
    parent: dict[int, int | None] = {start: None}
    children: dict[int, list[tuple[int, int, int]]] = {i: [] for i in comp}  # (child, code, eid)
    ring_open: dict[int, list[tuple[int, int, int]]] = {i: [] for i in comp}  # at opener: (closer, code, eid)
    ring_close: dict[int, list[tuple[int, int, int]]] = {i: [] for i in comp}  # at closer: (opener, code, eid)
    used: set[int] = set()
    stack: list[tuple[int, "object"]] = []

    def _nbr_iter(u: int):
        return iter(sorted(adj[u], key=lambda t: ranks_g[t[0]]))

    disc[start] = 0
    stack.append((start, _nbr_iter(start)))
    t = 1
    while stack:
        u, it = stack[-1]
        advanced = False
        for v, code, eid in it:
            if eid in used:
                continue
            used.add(eid)
            if v in disc:
                # back edge: opened at the earlier-discovered endpoint
                ring_open[v].append((u, code, eid))
                ring_close[u].append((v, code, eid))
                continue
            disc[v] = t
            t += 1
            parent[v] = u
            children[u].append((v, code, eid))
            stack.append((v, _nbr_iter(v)))
            advanced = True
            break
        if not advanced:
            stack.pop()
    # order closure lists by the OTHER endpoint's discovery index, then
    # assign digits in output (preorder) order with lowest-free reuse
    for i in comp:
        ring_open[i].sort(key=lambda x: disc[x[0]])
        ring_close[i].sort(key=lambda x: disc[x[0]])
    digit: dict[int, int] = {}
    free: list[int] = []
    next_num = 1
    for u in sorted(comp, key=disc.__getitem__):
        for _v, _code, eid in ring_open[u] + ring_close[u]:
            if eid in digit:
                continue
            if free:
                num = min(free)
                free.remove(num)
            else:
                num = next_num
                next_num += 1
            if num > 99:
                raise _CanonLimit("ring digit space exhausted")
            digit[eid] = num
        for _v, _code, eid in ring_close[u]:
            free.append(digit[eid])

    # r15: fix each E/Z constraint group's one free sign — the group's
    # earliest-emitted bond (first-written endpoint, then eid) reads
    # '/'; every other token follows the resolver's relative parities
    gflip: dict[int, int] = {}
    if slash:
        best: dict[int, tuple[tuple[int, int], int]] = {}
        for eid in used:
            rp = slash.get(eid)
            if rp is None:
                continue
            a, b, _c = mol.bonds[eid]
            # first appearance writes the bond FROM its earlier-
            # discovered endpoint (tree: parent→child; ring: opener→
            # closer) — the free sign is fixed in THAT direction, and
            # the earliest bond is keyed by BOTH endpoints' output
            # positions, so the choice is a function of the plan,
            # never of the input's stored bond order or eids
            u0, v0 = (a, b) if disc[a] <= disc[b] else (b, a)
            orient = 0 if a == u0 else 1
            k = (disc[u0], disc[v0])
            root, p = rp
            if root not in best or k < best[root][0]:
                best[root] = (k, p ^ orient)
        gflip = {root: p for root, (_k, p) in best.items()}

    def _slash_tok(eid: int, u: int, v: int) -> str:
        """Directional token for bond ``eid`` written in the u→v
        direction (ring sites write it from BOTH ends — consistently
        opposite tokens, which the parser reads back as one sign)."""
        root, p = slash[eid]
        bit = p ^ gflip[root]
        if mol.bonds[eid][0] != u:
            bit ^= 1
        return "/" if bit == 0 else "\\"

    def _ring_tokens(u: int) -> str:
        out = []
        for v, code, eid in ring_open[u] + ring_close[u]:
            num = digit[eid]
            if eid in slash:
                tok = _slash_tok(eid, u, v)
            else:
                tok = _bond_token(code, mol.atoms[u], mol.atoms[v])
            out.append(f"{tok}{num}" if num <= 9 else f"{tok}%{num:02d}")
        return "".join(out)

    # --- emit (iterative preorder with explicit parenthesis tokens)
    out: list[str] = []
    estack: list[tuple[str, object]] = [("atom", start)]
    while estack:
        kind, val = estack.pop()
        if kind == "text":
            out.append(val)  # type: ignore[arg-type]
            continue
        u = val  # type: ignore[assignment]
        cfg = stereo.get(u)
        ch = 0
        if cfg is not None:
            out_slots: list[int] = []
            if parent[u] is not None:
                out_slots.append(parent[u])  # type: ignore[arg-type]
            if -1 in cfg[0]:
                out_slots.append(-1)  # bracket H, right after the parent
            out_slots += [v for v, _c, _e in ring_open[u] + ring_close[u]]
            out_slots += [v for v, _c, _e in children[u]]
            ch = _emit_tag(cfg, out_slots)
        out.append(_atom_token(mol.atoms[u], hs[u], ch) + _ring_tokens(u))
        kids = children[u]
        items: list[tuple[str, object]] = []
        for idx, (v, code, eid) in enumerate(kids):
            if eid in slash:
                bt = _slash_tok(eid, u, v)
            else:
                bt = _bond_token(code, mol.atoms[u], mol.atoms[v])
            if idx < len(kids) - 1:
                items.append(("text", "(" + bt))
                items.append(("atom", v))
                items.append(("text", ")"))
            else:
                items.append(("text", bt))
                items.append(("atom", v))
        estack.extend(reversed(items))
    return "".join(out)


def _canon_tree(
    mol: Mol,
    comp: list[int],
    adj: list[list[tuple[int, int, int]]],
    hs: list[int],
    stereo: dict[int, tuple[list[int], int]] | None = None,
) -> str:
    """Canonical SMILES of an ACYCLIC component via AHU rooted-tree
    canonicalisation (Aho–Hopcroft–Ullman): root at the tree center
    (≤ 2 candidates, graph-invariant), order every node's children by
    their emitted subtree string, take the lexicographic minimum over
    the candidate roots. Linear-ish and branch-free — the refinement
    path's tie-break budget is never touched, so balanced symmetric
    trees (dendrimers, neopentyl forests — the r12 probe's
    branch_storm family, which exhausted the budget at ~0.7 s per
    molecule) and long chains canonicalise fast and exactly. Fully
    iterative: parse-order stacks, no recursion, so kilo-atom chains
    survive Python's recursion limit.

    Stereo (r14): kept tags are emitted inside the subtree signatures
    (post-order, so a node's children are already ordered when its
    own output neighbour order — parent, bracket-H, children in
    sorted-signature order — is known). A kept centre's child
    signatures are necessarily pairwise distinct: equal signatures
    would mean isomorphic subtrees, hence refinement-tied neighbours,
    hence the resolver dropped the tag — so the sorted order at a
    stereocentre is never an arbitrary tie."""
    stereo = stereo or {}
    if len(comp) == 1:
        return _atom_token(mol.atoms[comp[0]], hs[comp[0]])
    # tree center by iterative leaf stripping
    deg = {g: len(adj[g]) for g in comp}
    removed: set[int] = set()
    layer = [g for g in comp if deg[g] <= 1]
    remaining = len(comp)
    while remaining > 2:
        nxt: list[int] = []
        for v in layer:
            removed.add(v)
            remaining -= 1
            for u, _c, _e in adj[v]:
                if u in removed:
                    continue
                deg[u] -= 1
                if deg[u] == 1:
                    nxt.append(u)
        layer = nxt
    centers = [g for g in comp if g not in removed]

    def rooted(root: int) -> str:
        parent: dict[int, int | None] = {root: None}
        order: list[int] = []
        stack = [root]
        while stack:
            v = stack.pop()
            order.append(v)
            for u, _c, _e in adj[v]:
                if u not in parent:
                    parent[u] = v
                    stack.append(u)
        sig: dict[int, str] = {}
        for v in reversed(order):  # post-order: children before parents
            kids = [
                (u, _bond_token(code, mol.atoms[v], mol.atoms[u]) + sig[u])
                for u, code, _e in adj[v]
                if parent.get(u) == v
            ]
            kids.sort(key=lambda t: t[1])
            cfg = stereo.get(v)
            ch = 0
            if cfg is not None:
                out_slots: list[int] = []
                if parent[v] is not None:
                    out_slots.append(parent[v])  # type: ignore[arg-type]
                if -1 in cfg[0]:
                    out_slots.append(-1)
                out_slots += [u for u, _s in kids]
                ch = _emit_tag(cfg, out_slots)
            tok = _atom_token(mol.atoms[v], hs[v], ch)
            strs = [s for _u, s in kids]
            if strs:
                sig[v] = tok + "".join(f"({k})" for k in strs[:-1]) + strs[-1]
            else:
                sig[v] = tok
        return sig[root]

    return min(rooted(r) for r in centers)


# r13: pure-cycle fast path toggle (tests flip it to cross-check the
# fast path against the general refinement path on the same molecule)
_CYCLE_FAST = True


def _cyclic_period(seq: list) -> int:
    """Smallest p with rotate(seq, p) == seq (p divides len(seq));
    KMP failure function, O(n)."""
    n = len(seq)
    fail = [0] * (n + 1)
    k = 0
    for i in range(1, n):
        while k and seq[i] != seq[k]:
            k = fail[k]
        if seq[i] == seq[k]:
            k += 1
        fail[i + 1] = k
    p = n - fail[n]
    return p if n % p == 0 else n


def _canon_cycle(
    mol: Mol,
    comp: list[int],
    adj: list[list[tuple[int, int, int]]],
    hs: list[int],
    budget: list[int],
) -> str:
    """Canonical SMILES of a component that is one simple cycle (every
    atom degree 2): the minimum of the writer's output over all 2·n
    (start atom, direction) walks — on a cycle the DFS writer's string
    is fully determined by that pair, so this orbit IS the set of
    spellings the general tie-break path could emit, and its minimum is
    exactly the general path's answer at a fraction of the work (the
    r12 probe's only fallback family, plain C36–C154 macrocycles, was
    the general path exhausting its budget here; VERDICT r12 item 4).

    r15 (closes the r13/r14 verdict slack item): rotations congruent
    modulo the cyclic PERIOD of the walk's (atom token, entering bond
    code) chunk sequence produce character-identical candidate strings
    — the emitted string is a pure function of that cyclic sequence
    and the rotation — so only p representatives per direction need a
    real walk (chunk-level KMP period, O(n)). Every real all-degree-2
    molecule is a short repeat (Cn p=1, crown ethers p≤3), making the
    path O(n) where it used to exhaust the budget past ~C380; a fully
    aperiodic fuzzer ring still pays p=n walks into the shared budget
    and falls back deterministically as before."""
    n = len(comp)
    best: str | None = None
    s0 = comp[0]
    for first, _c0, _e0 in adj[s0]:
        order = [s0, first]
        prev, cur = s0, first
        while len(order) < n:
            nxt = next(v for v, _c, _e in adj[cur] if v != prev)
            order.append(nxt)
            prev, cur = cur, nxt
        chunks = []
        for i in range(n):
            u, pu = order[i], order[i - 1]
            code = next(c for v, c, _e in adj[u] if v == pu)
            chunks.append((_atom_token(mol.atoms[u], hs[u]), code))
        p = _cyclic_period(chunks)
        for r in range(p):
            budget[0] -= n
            if budget[0] < 0:
                raise _CanonLimit("cycle orbit budget exhausted")
            ranks_g = {order[(r + i) % n]: i for i in range(n)}
            out = _write_component(mol, comp, adj, ranks_g, hs)
            if best is None or out < best:
                best = out
    assert best is not None
    return best


def _canon_component(
    mol: Mol,
    comp: list[int],
    adj: list[list[tuple[int, int, int]]],
    hs: list[int],
    budget: list[int],
    stereo: dict[int, tuple[list[int], int]] | None = None,
    slash: dict[int, tuple[int, int]] | None = None,
) -> str:
    """Lexicographically smallest spelling of one component over all
    invariant-consistent tie-breaks. Acyclic components short-circuit
    to the branch-free AHU tree path (:func:`_canon_tree`); simple
    cycles to the rotation-orbit path (:func:`_canon_cycle` — a
    degree-2 atom can never hold 4 distinct stereo slots, and a pure
    cycle has no bridge double bonds, so the resolver guarantees that
    path is stereo-free); the Morgan-refinement + tie-break machinery
    below serves the cyclic rest — and (r15) any component with kept
    E/Z bonds: slash tokens are a GLOBAL constraint solution over the
    planned output, which the plan-then-emit general path provides and
    the signature-bottom-up AHU path cannot (an acyclic component with
    kept bond stereo routes here; the extra tie-break branches are
    budget-capped as ever). Stereo tags and slashes participate in the
    emitted strings, so the tie-break's min-over-branches stays
    input-spelling-invariant with stereo exactly as without: the
    candidate string set per discrete ranking is spelling-independent
    (a kept configuration is the same abstract configuration however
    the input spelled it)."""
    stereo = stereo or {}
    slash = slash or {}
    has_slash = bool(slash) and any(
        e in slash for g in comp for _v, _c, e in adj[g]
    )
    n_edges = sum(len(adj[g]) for g in comp) // 2
    if n_edges == len(comp) - 1 and not has_slash:
        return _canon_tree(mol, comp, adj, hs, stereo)
    if (
        _CYCLE_FAST
        and not has_slash
        and len(comp) > 2
        and all(len(adj[g]) == 2 for g in comp)
    ):
        return _canon_cycle(mol, comp, adj, hs, budget)
    local = {g: i for i, g in enumerate(comp)}
    ladj: list[list[tuple[int, int]]] = [
        [(local[v], code) for v, code, _e in adj[g]] for g in comp
    ]
    init_keys = [
        (
            a.z,
            int(a.aromatic),
            a.isotope,
            a.charge,
            hs[g],
            a.degree,
            a.bond_sum,
            int(a.in_ring),
            a.atom_map,
        )
        for g in comp
        for a in (mol.atoms[g],)
    ]
    uniq = {k: r for r, k in enumerate(sorted(set(init_keys)))}
    ranks0 = [uniq[k] for k in init_keys]

    def rec(ranks: list[int], depth: int) -> str:
        # the first refinement (depth 0) is free: it is the whole cost
        # for every discrete-partition molecule; only tie-break
        # branches pay into the budget
        ranks = _refine(ladj, ranks, budget if depth else None)
        classes: dict[int, list[int]] = {}
        for i, r in enumerate(ranks):
            classes.setdefault(r, []).append(i)
        tied = sorted(r for r, members in classes.items() if len(members) > 1)
        if not tied:
            ranks_g = {comp[i]: ranks[i] for i in range(len(comp))}
            return _write_component(mol, comp, adj, ranks_g, hs, stereo, slash)
        best: str | None = None
        for a in classes[tied[0]]:
            forced = [2 * r for r in ranks]
            forced[a] -= 1
            s = rec(forced, depth + 1)
            if best is None or s < best:
                best = s
        assert best is not None
        return best

    return rec(ranks0, 0)


def write_canonical(mol: Mol, strip_atom_map: bool = False) -> str | None:
    """Canonical SMILES of a parsed :class:`Mol`; ``None`` when the
    molecule exceeds the documented symmetry/ring-digit ceilings."""
    if strip_atom_map and any(a.atom_map for a in mol.atoms):
        from dataclasses import replace

        mol = Mol(
            atoms=[replace(a, atom_map=0) for a in mol.atoms],
            bonds=list(mol.bonds),
            stereo=dict(mol.stereo),
            bdirs=dict(mol.bdirs),
        )
    # r13: Hückel aromaticity perception — Kekulé and aromatic
    # spellings of one molecule canonicalise to the SAME (aromatic)
    # string, matching the reference's RDKit behaviour
    # (canonicalise.py:12-72). No-op on already-aromatic input, so the
    # writer stays idempotent.
    mol = perceive_aromaticity(mol)
    n = len(mol.atoms)
    adj: list[list[tuple[int, int, int]]] = [[] for _ in range(n)]
    for eid, (a, b, code) in enumerate(mol.bonds):
        adj[a].append((b, code, eid))
        adj[b].append((a, code, eid))
    hs = [mol.total_h(i) for i in range(n)]
    # connected components from the BOND graph (dots are not component
    # boundaries: SMILES ring closures may span '.')
    seen = [False] * n
    comps: list[list[int]] = []
    for root in range(n):
        if seen[root]:
            continue
        comp = [root]
        seen[root] = True
        q = [root]
        while q:
            u = q.pop()
            for v, _c, _e in adj[u]:
                if not seen[v]:
                    seen[v] = True
                    comp.append(v)
                    q.append(v)
        comps.append(comp)
    # r14/r15: resolve tetrahedral tags and E/Z bonds ONCE (keep/drop
    # rule + descriptor fixpoint per stereo-bearing component), then
    # emit per writer path
    stereo, slash = _resolve_stereo(mol, comps, adj, hs)
    budget = [_CANON_BRANCH_BUDGET]
    try:
        parts = [
            _canon_component(mol, comp, adj, hs, budget, stereo, slash)
            for comp in comps
        ]
    except _CanonLimit:
        return None
    return ".".join(sorted(parts))


# Canonical-output VERSION (r14, VERDICT item 6): bump whenever the
# canonical SPELLING of any molecule can change between engine
# versions, so persisted canonical strings can be detected as stale.
# History: 1 = pre-r13 (no aromaticity perception); 2 = r13 (Hückel
# perception + pure-cycle rotation-orbit minimum — pure-cycle
# spellings changed vs v1); 3 = r14 (tetrahedral stereo retention —
# strings for @/@@ inputs gained tags vs v2; mixed-spelling lone-pair
# perception fix); 4 = r15 (cis/trans bond stereo retention — strings
# for '/'+'\\' inputs gained slashes vs v3; stereo-aware refinement
# fixpoint + para rule — pseudo-asymmetric and dependent ring centres
# now KEEP tags v3 dropped); 5 = r15 (cumulated-end E/Z dropped at the
# candidate gate — slashes previously emitted around =X= sp ends are
# gone; found by the brute-force stereo-isomorphism oracle, which
# proved the old emission conflated distinct cumulated geometries;
# also: periodic pure-cycle macrocycles past ~C380 now canonicalise —
# previously the orbit budget returned None and callers kept the
# original spelling, so persisted v≤4 canon columns may hold raw
# spellings for rings v5 canonicalises).
# The wide-export config sink (S12) records
# this value; persisted canon columns produced under a different
# version must be re-canonicalised before being compared or joined
# against fresh output — at 100 TB a silent version mix across re-runs
# is a drift class, not a cosmetic (see the x_canon_version_guard
# lineage query).
CANON_VERSION = 5


def canonical_smiles(s: str, strip_atom_map: bool = False) -> str | None:
    """F3 (reference ``orderly/extract/canonicalise.py:12-72``):
    canonical SMILES of ``s``, atom maps stripped when
    ``strip_atom_map`` — ``None`` when ``s`` is outside the parser's
    subset or past the writer's ceilings (caller keeps its documented
    fallback). Deterministic and input-spelling-invariant: every
    renumbered spelling of the same molecule yields the same string
    (pinned by the randomized two-DFS sweep in tests/test_smiles.py);
    r14: that now includes tetrahedral stereo — respellings of one
    enantiomer collapse, mirror spellings stay distinct (reference
    parity via RDKit MolToSmiles, canonicalise.py:25-47); r15: and
    cis/trans bond stereo — slash respellings of one geometric isomer
    collapse, E/Z stay distinct, conjugated shared-slash systems
    re-emitted as one consistent constraint solution.

    VERSIONING: output spellings are stable within one engine version
    but MAY change across versions (see :data:`CANON_VERSION`);
    consumers persisting canonical strings should store the version
    alongside and re-canonicalise on mismatch."""
    try:
        mol = parse_smiles(s)
    except SmilesParseError:
        return None
    return write_canonical(mol, strip_atom_map=strip_atom_map)
