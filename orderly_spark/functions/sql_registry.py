"""SQL function registry — SURVEY §4 custom-work item 1: "a function
registry so SQL users can call canonical_smiles(x)".

Two tiers, matching how each function should execute:

1. **SQL scalar functions** (``CREATE OR REPLACE TEMPORARY FUNCTION …
   RETURN <expr>``, Spark 4 SQL UDFs): the pure-expression reference
   functions (F1 strip_filename, F6/F7 unit conversions, F10
   is_number, F13 reaction_hash, S4 grant-date parse). These inline
   into the calling query's plan at analysis time — they stay inside
   whole-stage codegen, cost nothing over hand-written expressions,
   and never leave the JVM.

2. **Python/pandas UDFs** (``spark.udf.register``): the chem functions
   that genuinely need RDKit (F3 canonical_smiles, F5
   has_transition_metal, F14 morgan_fp). Arrow-batched pandas UDFs
   with executor-local memoisation — the unavoidable slow path, kept
   off the hot path by the distinct→broadcast dimension pattern
   (functions/chem.py canonicalise_via_dimension).

Register once per session with :func:`register_sql_functions`; the
functions are session-scoped temporary functions (at 100 TB these
would ship in a shared catalog — persistent SQL UDFs land the same
plan shape).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from orderly_spark.functions.chem import (
    canonical_smiles_udf,
    has_transition_metal_udf,
    morgan_fingerprint_udf,
)

# F1 (extractor.py:23-26,55-65) — mirrors functions/rxn.strip_filename.
_STRIP_FILENAME = """
CREATE OR REPLACE TEMPORARY FUNCTION strip_filename(s STRING) RETURNS STRING
RETURN lower(
  regexp_replace(
    regexp_replace(
      regexp_replace(regexp_replace(s, '/', '-fs-'), '[:"\\']', ''),
      ' ', '_'),
    '\\\\.', '-'))
"""

# F10 (extractor.py:754-771) — Python float()/int() semantics incl.
# the digit-sandwich underscore rule; mirrors functions/rxn.is_number
# (including the r8 Java-ism exclusions: trailing [dDfF] suffix and
# hex-float literals, which Spark's cast accepts but Python rejects).
_IS_NUMBER = """
CREATE OR REPLACE TEMPORARY FUNCTION is_number(s STRING) RETURNS BOOLEAN
RETURN CASE
  WHEN trim(s) RLIKE '(?i)^[+-]?0x' OR trim(s) RLIKE '[0-9.][dDfF]$'
    THEN false
  WHEN contains(s, '_')
    THEN NOT (s RLIKE '(^_)|(_$)|(_[^0-9])|([^0-9]_)')
         AND try_cast(regexp_replace(s, '_', '') AS DOUBLE) IS NOT NULL
  ELSE try_cast(s AS DOUBLE) IS NOT NULL
END
"""

# F13 (cleaner.py:913-924) — mirrors operators/cleaning.reaction_hash.
_REACTION_HASH = """
CREATE OR REPLACE TEMPORARY FUNCTION reaction_hash(
    reactants ARRAY<STRING>, products ARRAY<STRING>) RETURNS STRING
RETURN sha2(concat_ws('.', concat(
  array_sort(transform(coalesce(reactants, array()), x -> coalesce(x, 'NULL'))),
  array_sort(transform(coalesce(products,  array()), x -> coalesce(x, 'NULL'))))), 256)
"""

# F6 (extractor.py:424-455) — mirrors functions/rxn.temperature_to_celsius
# (control-type defaults AMBIENT=25, ICE_BATH=0, DRY_ICE=-78.5,
# LIQUID_NITROGEN=-196).
_TEMP_TO_CELSIUS = """
CREATE OR REPLACE TEMPORARY FUNCTION temp_to_celsius(
    value DOUBLE, unit STRING, control_type STRING) RETURNS DOUBLE
RETURN coalesce(
  CASE WHEN unit = 'FAHRENHEIT' THEN (value - 32.0D) * 5.0D / 9.0D
       WHEN unit = 'KELVIN'     THEN value - 273.15D
       WHEN unit = 'CELSIUS'    THEN value END,
  CASE control_type WHEN 'AMBIENT' THEN 25.0D
                    WHEN 'ICE_BATH' THEN 0.0D
                    WHEN 'DRY_ICE' THEN -78.5D
                    WHEN 'LIQUID_NITROGEN' THEN -196.0D END)
"""

# F7 (extractor.py:458-474) — mirrors functions/rxn.time_to_hours.
# bround (HALF_EVEN), in lockstep with the Column twin: the reference
# uses Python round(), which is banker's rounding (r9).
_TIME_TO_HOURS = """
CREATE OR REPLACE TEMPORARY FUNCTION time_to_hours(
    value DOUBLE, unit STRING) RETURNS DOUBLE
RETURN bround(CASE WHEN unit = 'MINUTE' THEN value / 60.0D
                   WHEN unit = 'SECOND' THEN value / 3600.0D
                   WHEN unit = 'DAY'    THEN value * 24.0D
                   WHEN unit = 'HOUR'   THEN value END, 2)
"""

# S4 (extractor.py:78-81) — mirrors functions/rxn.grant_date_from_filename.
_GRANT_DATE = """
CREATE OR REPLACE TEMPORARY FUNCTION grant_date_from_filename(s STRING)
RETURNS TIMESTAMP
RETURN try_to_timestamp(
  nullif(regexp_extract(s, 'grants?-(\\\\d{4}_\\\\d{2})', 1), ''), 'yyyy_MM')
"""

_SQL_FUNCTIONS = (
    _STRIP_FILENAME,
    _IS_NUMBER,
    _REACTION_HASH,
    _TEMP_TO_CELSIUS,
    _TIME_TO_HOURS,
    _GRANT_DATE,
)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine's function surface for SQL callers.

    Returns the list of registered function names. Safe to call
    repeatedly (CREATE OR REPLACE / re-register are idempotent).
    """
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)
    # Chem tier: Arrow-batched pandas UDFs (RDKit-gated; the UDFs fall
    # back to deterministic pure-Python kernels when RDKit is absent).
    spark.udf.register("canonical_smiles", canonical_smiles_udf)
    spark.udf.register("has_transition_metal", has_transition_metal_udf)
    spark.udf.register("morgan_fp", morgan_fingerprint_udf())
    return [
        "strip_filename",
        "is_number",
        "reaction_hash",
        "temp_to_celsius",
        "time_to_hours",
        "grant_date_from_filename",
        "canonical_smiles",
        "has_transition_metal",
        "morgan_fp",
    ]
