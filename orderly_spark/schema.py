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
    # MIXED-LAYOUT handling (review finding, r8): a mergeSchema read
    # over a directory mixing array-model and wide-model files yields
    # BOTH the array column (NULL on wide-file rows) and the wide
    # columns (NULL on array-file rows). The old code dropped the
    # wide data entirely whenever the array column existed — silent
    # row-level data loss. Now: array column COALESCEd with the
    # wide-built array, so each row keeps whichever model its source
    # file wrote. Pure-array and pure-wide inputs are byte-identical
    # to before (coalesce never fires / branch not taken).
    replaced: dict[str, Column] = {}
    extra_cols: list[Column] = []
    product_cols = groups.get("product", [])
    for role in ROLES:
        if role == "product":
            continue  # handled with yields below (parallel-list pair)
        name = role_array_col(role)
        cols = groups.get(role, [])
        if name in have:
            if cols:
                arr = F.array(*[F.col(c) for c in cols])
                cleaned = F.filter(arr, lambda x: x.isNotNull() & (x != MISSING))
                replaced[name] = F.coalesce(F.col(name), cleaned).alias(name)
            continue  # array column already present on the input
        if not cols:
            # a source file set may carry zero columns for a role (e.g.
            # extraction already pooled catalysts/reagents into agents)
            # — the array model always has all six roles
            extra_cols.append(F.array().cast("array<string>").alias(name))
            continue
        arr = F.array(*[F.col(c) for c in cols])
        cleaned = F.filter(arr, lambda x: x.isNotNull() & (x != MISSING))
        extra_cols.append(cleaned.alias(name))
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
    built_p = built_y = None
    if pairs:
        zipped = F.filter(F.array(*pairs), lambda s: s.p.isNotNull() & (s.p != MISSING))
        built_p = F.transform(zipped, lambda s: s.p)
        built_y = F.transform(zipped, lambda s: s.y)
    if "products" in have or "yields" in have:
        # array-model pair (possibly partial) already on the input:
        # per row, prefer the array value and fall back to the
        # wide-built pair (mixed-layout fix — previously the wide
        # data was DISCARDED here); synthesize an empty counterpart
        # only when there is no wide data to build it from
        if pairs:
            if "products" in have:
                replaced["products"] = F.coalesce(F.col("products"), built_p).alias("products")
            else:
                extra_cols.append(built_p.alias("products"))
            if "yields" in have:
                replaced["yields"] = F.coalesce(F.col("yields"), built_y).alias("yields")
            else:
                extra_cols.append(built_y.alias("yields"))
        else:
            if "products" not in have:
                extra_cols.append(F.array().cast("array<string>").alias("products"))
            if "yields" not in have:
                extra_cols.append(F.array().cast("array<double>").alias("yields"))
    elif pairs:
        extra_cols.append(built_p.alias("products"))
        extra_cols.append(built_y.alias("yields"))
    else:
        extra_cols.append(F.array().cast("array<string>").alias("products"))
        extra_cols.append(F.array().cast("array<double>").alias("yields"))
    out_cols: list[Column] = [replaced.get(c, F.col(c)) for c in passthrough]
    return df.select(*out_cols, *extra_cols)


def array_to_wide(df: DataFrame, counts: dict[str, int]) -> DataFrame:
    """Export pivot: arrays → positional wide columns padded/truncated
    to ``counts`` (e.g. {"reactant": 2, "product": 1, ...}), slots
    named ``role_NNN`` with null padding — byte-compatible with the
    reference's cleaned output (cleaner.py:170-225) minus sentinels."""
    out: list[Column] = []
    array_names = {role_array_col(r) for r in list(ROLES) + ["yield"]}
    generated = {f"{role}_{i:03d}" for role, n in counts.items() for i in range(n)}
    for c in df.columns:
        # also exclude pre-existing columns that collide with the
        # generated wide names (review finding, r8: a half-wide input
        # carrying product_000 plus a products array produced
        # duplicate output columns)
        if c not in array_names and c not in generated:
            out.append(F.col(c))
    for role, n in counts.items():
        src = role_array_col(role)
        for i in range(n):
            name = f"{role}_{i:03d}"
            if src in df.columns:
                # F.get is null-on-out-of-bounds (ANSI-safe padding),
                # unlike element_at which raises under Spark 4 ANSI mode
                out.append(F.get(F.col(src), i).alias(name))
            elif name in df.columns:
                # absent role whose wide column ALREADY exists on the
                # input: pass it through (r9 advice fix — the r8
                # collision exclusion above removed it from
                # passthrough, and re-emitting NULL here silently
                # destroyed the pre-existing data)
                out.append(F.col(name))
            else:
                # absent role, no source at all: emit NULL-padded
                # slots rather than silently dropping the requested
                # columns from the export schema (review finding, r8)
                typ = "double" if role == "yield" else "string"
                out.append(F.lit(None).cast(typ).alias(name))
    return df.select(*out)
