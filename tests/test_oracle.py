"""Replicates the driver's t2 gate locally: every registered query with
an oracle must exact-match DuckDB at sf0.001 (fast) — run manually at
sf0.01 via ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_oracle.py.
"""

from __future__ import annotations

import os

import pytest

import orderly_spark.queries  # noqa: F401
from orderly_spark.oracle import compare_query, duckdb_connect
from orderly_spark.registry import REGISTRY

SF_DIR = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    return duckdb_connect(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_match(spark, duck, name):
    res = compare_query(spark, duck, REGISTRY[name], SF_DIR)
    assert res.ok, f"{name}: {res.detail}"
