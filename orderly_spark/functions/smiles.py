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
  ``b c n o p s`` (parsed as written — NO aromaticity perception or
  kekulisation; the aromatic flag is an atom/bond property only)
- bonds ``- = # $ : / \\`` (stereo slashes read as single bonds,
  direction discarded), ring closures (digit and ``%nn``), branches,
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
    "molecule_has_tm",
    "morgan_fingerprint",
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
    # filled after parsing:
    bond_sum: int = 0      # Σ bond orders (aromatic counted as 1)
    degree: int = 0        # heavy-atom neighbour count
    in_ring: bool = False


@dataclass
class Mol:
    atoms: list[Atom] = field(default_factory=list)
    bonds: list[tuple[int, int, int]] = field(default_factory=list)  # (i, j, code)

    def implicit_h(self, idx: int) -> int:
        """Implicit hydrogen count per the OpenSMILES rule: the
        smallest default valence ≥ the explicit bond-order sum, minus
        that sum; 0 when no valence fits or the element has no default.
        Aromatic atoms get one bonding electron absorbed by the ring
        system (the standard no-perception approximation: subtract 1
        when any incident bond is aromatic)."""
        a = self.atoms[idx]
        if a.explicit_h is not None:
            return a.explicit_h
        vals = _DEFAULT_VALENCES.get(a.z)
        if vals is None:
            return 0
        s = a.bond_sum
        if a.aromatic:
            s += 1
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
    if j < n and s[j] == "@":
        j += 1
        if j < n and s[j] == "@":
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
             explicit_h=hcount, atom_map=amap),
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
    rings: dict[int, tuple[int, str | None]] = {}  # ring# → (atom, bond char)
    i, n = 0, len(s)

    def _add_atom(atom: Atom) -> None:
        nonlocal prev, pending_bond
        idx = len(mol.atoms)
        mol.atoms.append(atom)
        if prev is not None:
            _add_bond(prev, idx, pending_bond)
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
                other, obond = rings.pop(num)
                if other == prev:
                    raise SmilesParseError(f"self ring bond {num}")
                if obond is not None and pending_bond is not None and obond != pending_bond:
                    raise SmilesParseError(f"ring bond {num} order mismatch")
                _add_bond(other, prev, obond or pending_bond)
            else:
                rings[num] = (prev, pending_bond)
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
