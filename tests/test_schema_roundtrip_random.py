"""Seeded random wide⇄array pivot property test (r9 cross-file
interaction pass): wide_to_array then array_to_wide, checked against
an independent pure-Python model of the P9 semantics — sentinel/null
drops with left-compaction, suffix-paired product↔yield alignment
(yields keep their slot when the product is populated), and
NULL-padded export. Three random column layouts (including sparse
suffixes like yield_001 without yield_000 — the positional-pairing
regression shape) × 30 random rows each.
"""

from __future__ import annotations

import random

from orderly_spark.schema import MISSING, ROLES, array_to_wide, wide_to_array

_VALUES = ["CCO", "O", "N#N", "[Na+]", MISSING, None, "c1ccccc1"]


def _model_arrays(row: dict, groups: dict[str, list[str]]):
    """Pure-Python twin of wide_to_array's semantics for one row."""
    out: dict[str, list] = {}
    for role in ROLES:
        if role == "product":
            continue
        cols = sorted(groups.get(role, []))
        out[role + "s"] = [
            row[c] for c in cols if row[c] is not None and row[c] != MISSING
        ]
    pcols = sorted(groups.get("product", []))
    ysuffix = {c.split("_")[1]: c for c in groups.get("yield", [])}
    prods, ylds = [], []
    for pc in pcols:
        p = row[pc]
        if p is None or p == MISSING:
            continue
        prods.append(p)
        yc = ysuffix.get(pc.split("_")[1])
        ylds.append(row[yc] if yc else None)
    out["products"] = prods
    out["yields"] = ylds
    return out


def _layout(rng: random.Random) -> dict[str, list[str]]:
    groups: dict[str, list[str]] = {}
    for role in list(ROLES) + ["yield"]:
        width = rng.randint(0, 3)
        suffixes = sorted(rng.sample(range(4), k=width)) if width else []
        if suffixes:
            groups[role] = [f"{role}_{i:03d}" for i in suffixes]
    # guarantee the sparse product/yield misalignment shape shows up
    groups.setdefault("product", ["product_000", "product_001"])
    groups["yield"] = [c for c in groups.get("yield", []) if c != "yield_000"]
    groups["yield"] = groups["yield"] or ["yield_001"]
    return groups


def test_wide_array_roundtrip_matches_python_model(spark):
    rng = random.Random(131)
    for scenario in range(3):
        groups = _layout(rng)
        cols = ["rid"] + sorted(c for cs in groups.values() for c in cs)
        rows = []
        for rid in range(30):
            row = {"rid": rid}
            for c in cols[1:]:
                row[c] = (
                    rng.uniform(0, 100)
                    if c.startswith("yield_") and rng.random() < 0.7
                    else (None if c.startswith("yield_") else rng.choice(_VALUES))
                )
            rows.append(row)
        schema = ", ".join(
            f"{c} {'long' if c == 'rid' else 'double' if c.startswith('yield_') else 'string'}"
            for c in cols
        )
        df = spark.createDataFrame([tuple(r[c] for c in cols) for r in rows], schema)
        arr = wide_to_array(df)
        got = {r["rid"]: r.asDict() for r in arr.collect()}
        for row in rows:
            want = _model_arrays(row, groups)
            g = got[row["rid"]]
            for k, v in want.items():
                assert g[k] == v, (scenario, row["rid"], k, g[k], v)
        # export: arrays padded/truncated to fixed counts
        counts = {"reactant": 2, "product": 2, "yield": 2}
        wide = array_to_wide(arr, counts)
        gw = {r["rid"]: r.asDict() for r in wide.collect()}
        for row in rows:
            want = _model_arrays(row, groups)
            g = gw[row["rid"]]
            for role, n in counts.items():
                src = want["yields" if role == "yield" else role + "s"]
                for i in range(n):
                    exp = src[i] if i < len(src) else None
                    assert g[f"{role}_{i:03d}"] == exp, (scenario, row["rid"], role, i)
