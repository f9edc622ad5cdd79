"""Local replica of the driver's DuckDB-oracle correctness check.

Runs each registered query through Spark AND its oracle SQL through
DuckDB over the same parquet tables, then compares row count, column
names, and (order-insensitively) values. Used by tests/test_oracle.py
so mismatches surface before the driver's per-round gate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from orderly_spark.registry import Query
from orderly_spark.tables import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalise dtypes, sort rows — the
    order-insensitive shape the driver hashes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, q: Query, sf_dir: str
) -> CompareResult:
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return CompareResult(q.name, True, f"rows-only ({len(spark_pdf)} rows)")
    duck_pdf = con.execute(q.oracle).fetchdf()
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return CompareResult(
            q.name, False, f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        return CompareResult(q.name, False, f"rowcount differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    # Driver-fidelity guard (r6 verdict finding #2): the driver hashes raw
    # stringified values, so a DuckDB HUGEINT (uncast integer SUM) that
    # fetchdf() materializes as float64 ("2.0") mismatches Spark's BIGINT
    # ("2") at the driver even though the numbers are equal. _normalize used
    # to erase exactly that divergence by casting both sides to int64. Fail
    # on any float-vs-int dtype disagreement BEFORE normalizing so the
    # HUGEINT class is caught locally (r_compaction_bin_packing, r6 red).
    for c in spark_pdf.columns:
        sd, dd = spark_pdf[c], duck_pdf[c]
        s_float = pd.api.types.is_float_dtype(sd)
        s_int = pd.api.types.is_integer_dtype(sd)
        d_float = pd.api.types.is_float_dtype(dd)
        d_int = pd.api.types.is_integer_dtype(dd)
        if (s_float and d_int) or (s_int and d_float):
            return CompareResult(
                q.name,
                False,
                f"col {c}: float-vs-int dtype disagreement (spark={sd.dtype} duck={dd.dtype}) "
                "— driver hash would mismatch; uncast integer SUM in the oracle? "
                "CAST(... AS BIGINT) per queries/relational.py:8",
            )
        # bool-vs-numeric drift (review finding, r8): pandas 1 == True,
        # but the driver hashes 'True' vs '1' — fail it locally too
        s_bool = pd.api.types.is_bool_dtype(sd)
        d_bool = pd.api.types.is_bool_dtype(dd)
        if s_bool != d_bool and (s_bool or d_bool) and (
            s_float or s_int or d_float or d_int
        ):
            return CompareResult(
                q.name,
                False,
                f"col {c}: bool-vs-numeric dtype disagreement (spark={sd.dtype} "
                f"duck={dd.dtype}) — driver stringifies True/1 differently; "
                "cast one side so both twins emit the same type",
            )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            import numpy as np

            # ±0.0 (review finding, r8): pandas -0.0 == 0.0 is True,
            # but the driver hashes '-0.0' vs '0.0' — a signed-zero
            # disagreement (e.g. Spark MIN's total order ranks
            # -0.0 < 0.0, DuckDB's doesn't) must fail locally too
            eq = av == bv
            zero_sign_diff = (
                eq
                & (av == 0.0)
                & (
                    np.signbit(av.to_numpy(dtype="float64", na_value=0.0))
                    != np.signbit(bv.to_numpy(dtype="float64", na_value=0.0))
                )
            )
            bad = ~(
                (av.isna() & bv.isna())
                | (eq & ~zero_sign_diff)
            )
            if bad.any():
                i = bad.idxmax()
                diff = abs(float(av[i]) - float(bv[i])) if not (math.isnan(av[i]) or math.isnan(bv[i])) else float("nan")
                return CompareResult(
                    q.name,
                    False,
                    f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r} (absdiff={diff:.3e})",
                )
        else:
            bad = ~((av.isna() & bv.isna()) | (av == bv))
            if bad.any():
                i = bad.idxmax()
                return CompareResult(q.name, False, f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return CompareResult(q.name, True, f"{len(a)} rows exact-match")


# (run_all removed — review finding, r8: it was dead code with its
# own never-exercised exception semantics and a names filter that
# silently ignored typos; tests/test_oracle.py and the tools call
# compare_query directly.)
