"""Query registry: every operator from SURVEY.md §2 (plus the
beyond-reference LLM-pipeline operators) is declared here as a named
query over the testdata tables, paired with the ANSI-SQL oracle the
driver runs through DuckDB.

Contract (from the driver):
- ``fn(spark, sf_dir) -> DataFrame``
- ``oracle`` is DuckDB-runnable SQL over pre-registered views
  (region nation customer supplier part orders lineitem events
  documents embeddings); ``None`` for non-SQL-expressible ops
  (rows-only check).
- Column names must match between the Spark result and the oracle —
  alias every computed column on both sides.

Float discipline: the driver hash-compares values, so floating-point
aggregates must be bit-identical between Spark (parallel, arbitrary
reduce order) and DuckDB (sequential). Sums therefore go through
exact DECIMAL(38,6) accumulation and are cast back to double at the
end — order-independent and identical in both engines. Helpers
``dsum`` / ``davg`` (Spark side) mirror ``DSUM`` / ``DAVG`` SQL text.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str = ""
    survey: str = ""  # SURVEY §2 operator ids this query exercises
    doc: str = field(default="")


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    *,
    category: str = "",
    survey: str = "",
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, category=category, survey=survey, doc=fn.__doc__ or ""
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact-aggregation helpers (order-independent floats)
# ---------------------------------------------------------------------------

def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column (exact decimal accumulate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    # exact decimal sum → double, THEN an IEEE double division: both
    # steps are order-independent and bit-identical across engines
    # (decimal/decimal division scale rules differ between engines).
    return F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c)


def DSUM(expr: str) -> str:
    """SQL text mirroring :func:`dsum` for the DuckDB oracle."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def DAVG(expr: str) -> str:
    """SQL text mirroring :func:`davg`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"


def DROUND(expr: str, scale: int) -> str:
    """SQL text mirroring Spark's ``F.round(double, scale)``.

    Spark rounds HALF_UP on BigDecimal.valueOf(double) — i.e. on the
    double's SHORTEST decimal representation ('1.035' → 1.04) — while
    DuckDB's ROUND works on the raw binary double (1.03499… → 1.03).
    Routing through VARCHAR reproduces the shortest-repr + HALF_UP
    (away-from-zero) path exactly. Scale 20 > the 17 significant
    digits a double's shortest repr can carry, so the decimal cast is
    lossless (a narrower scale would itself round, e.g.
    0.19499999999999998 → 0.195 → wrong direction)."""
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)), {scale}) AS DOUBLE)"
    )
