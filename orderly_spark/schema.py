"""Canonical reaction schema (SURVEY §1.3) and the wide⇄array pivots.

The reference stores positional wide columns (`reactant_000…`,
`yield_000…`) whose per-file width is dynamic
(reference: orderly/extract/extractor.py:1164-1182); the engine's
native model is fixed-schema arrays, with the wide layout produced
only at export. Arrays dissolve the reference's pad/truncate/
renumber machinery (cleaner.py:148-225) into `slice`/`size` ops.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MISSING = "<missing>"  # on-disk sentinel (extractor.py:1193-1265)

ROLES = ("reactant", "agent", "reagent", "solvent", "catalyst", "product")

REACTION_SCHEMA = T.StructType(
    [
        T.StructField("rxn_str", T.StringType(), True),
        T.StructField("reactants", T.ArrayType(T.StringType()), True),
        T.StructField("agents", T.ArrayType(T.StringType()), True),
        T.StructField("reagents", T.ArrayType(T.StringType()), True),
        T.StructField("solvents", T.ArrayType(T.StringType()), True),
        T.StructField("catalysts", T.ArrayType(T.StringType()), True),
        T.StructField("products", T.ArrayType(T.StringType()), True),
        T.StructField("yields", T.ArrayType(T.DoubleType()), True),  # parallel to products
        T.StructField("temperature", T.DoubleType(), True),  # Celsius
        T.StructField("rxn_time", T.DoubleType(), True),  # hours
        T.StructField("procedure_details", T.StringType(), True),
        T.StructField("date_of_experiment", T.TimestampType(), True),
        T.StructField("grant_date", T.TimestampType(), True),
        T.StructField("is_mapped", T.BooleanType(), True),
        T.StructField("extracted_from_file", T.StringType(), True),
    ]
)

_WIDE_RE = re.compile(r"^(reactant|agent|reagent|solvent|catalyst|product|yield)_(\d{3})$")


def role_array_col(role: str) -> str:
    return "yields" if role == "yield" else role + "s"


def wide_to_array(df: DataFrame) -> DataFrame:
    """Pivot positional wide columns into the array model.

    `"<missing>"` sentinels and nulls are dropped (SURVEY P9 —
    the cleaner's read-time normalisation, cleaner.py:129-134), with
    one exception: ``yields`` keeps a slot (as null) wherever its
    paired ``product`` slot is populated, preserving the parallel-list
    alignment (extractor.py:879-923).
    """
    groups: dict[str, list[str]] = {}
    passthrough: list[str] = []
    for c in df.columns:
        m = _WIDE_RE.match(c)
        if m:
            groups.setdefault(m.group(1), []).append(c)
        else:
            passthrough.append(c)
    if not groups:
        # already array-model (e.g. the engine's own extract output) —
        # idempotent no-op, never duplicate the role columns
        return df
    for cols in groups.values():
        cols.sort()

    have = set(passthrough)
    out_cols: list[Column] = [F.col(c) for c in passthrough]
    product_cols = groups.get("product", [])
    for role in ROLES:
        if role == "product":
            continue  # handled with yields below (parallel-list pair)
        if role_array_col(role) in have:
            continue  # array column already present on the input
        cols = groups.get(role, [])
        if not cols:
            # a source file set may carry zero columns for a role (e.g.
            # extraction already pooled catalysts/reagents into agents)
            # — the array model always has all six roles
            out_cols.append(F.array().cast("array<string>").alias(role_array_col(role)))
            continue
        arr = F.array(*[F.col(c) for c in cols])
        cleaned = F.filter(arr, lambda x: x.isNotNull() & (x != MISSING))
        out_cols.append(cleaned.alias(role_array_col(role)))
    # pair product_NNN with yield_NNN by NUMERIC SUFFIX, not by the
    # position of two independently sorted lists: a sparse column set
    # (e.g. yield_001 present but yield_000 dropped by a writer) would
    # positionally misattribute yields to the wrong product (review
    # finding). Suffix matching is exact under any column subset.
    def _suffix(col_name: str) -> str:
        mm = _WIDE_RE.match(col_name)
        return mm.group(2) if mm else col_name

    ycols_by_suffix = {_suffix(c): c for c in groups.get("yield", [])}
    pairs = []
    for pc in product_cols:
        yname = ycols_by_suffix.get(_suffix(pc))
        yc = F.col(yname).cast("double") if yname else F.lit(None).cast("double")
        pairs.append(F.struct(F.col(pc).alias("p"), yc.alias("y")))
    if "products" in have or "yields" in have:
        # parallel pair already array-model on the input; synthesize only
        # a missing counterpart so the pair always exists together
        if "products" not in have:
            out_cols.append(F.array().cast("array<string>").alias("products"))
        if "yields" not in have:
            out_cols.append(F.array().cast("array<double>").alias("yields"))
    elif pairs:
        zipped = F.filter(F.array(*pairs), lambda s: s.p.isNotNull() & (s.p != MISSING))
        out_cols.append(F.transform(zipped, lambda s: s.p).alias("products"))
        out_cols.append(F.transform(zipped, lambda s: s.y).alias("yields"))
    else:
        out_cols.append(F.array().cast("array<string>").alias("products"))
        out_cols.append(F.array().cast("array<double>").alias("yields"))
    return df.select(*out_cols)


def array_to_wide(df: DataFrame, counts: dict[str, int]) -> DataFrame:
    """Export pivot: arrays → positional wide columns padded/truncated
    to ``counts`` (e.g. {"reactant": 2, "product": 1, ...}), slots
    named ``role_NNN`` with null padding — byte-compatible with the
    reference's cleaned output (cleaner.py:170-225) minus sentinels."""
    out: list[Column] = []
    array_names = {role_array_col(r) for r in list(ROLES) + ["yield"]}
    for c in df.columns:
        if c not in array_names:
            out.append(F.col(c))
    for role, n in counts.items():
        src = role_array_col(role)
        if src not in df.columns:
            continue
        for i in range(n):
            # F.get is null-on-out-of-bounds (ANSI-safe padding),
            # unlike element_at which raises under Spark 4 ANSI mode
            out.append(F.get(F.col(src), i).alias(f"{role}_{i:03d}"))
    return df.select(*out)
