"""Array-model operator battery: the ORDerly clean pipeline's array
semantics (SURVEY A2/O2/F13/F16/P2/P8/J5) exercised over the star
schema — per-order item lists play the role of per-reaction molecule
lists. Plus the scalar-function battery (F1/F6/F9/F10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orderly_spark.registry import DBROUND, DROUND, query
from orderly_spark.tables import load


@query(
    "r_basket_hash",
    oracle="""
    SELECT l_orderkey,
           sha256(array_to_string(list_sort(list_distinct(list(CAST(l_partkey AS VARCHAR)))), '.'))
             AS basket_hash
    FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey
    """,
    category="array",
    survey="A2,O2,F13",
)
def r_basket_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F13 reaction hash generalised: per-group sorted-distinct
    member list → '.'-joined → sha256. The dedup/leakage-split key
    (cleaner.py:913-924) as a pure expression."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    basket = F.array_sort(F.array_distinct(F.collect_list(F.col("l_partkey").cast("string"))))
    return l.groupBy("l_orderkey").agg(
        F.sha2(F.concat_ws(".", basket), 256).alias("basket_hash")
    )


@query(
    "r_component_count_filter",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS np FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders JOIN sizes ON o_orderkey = l_orderkey
    WHERE np BETWEEN 1 AND 5
    GROUP BY o_orderstatus
    """,
    category="array",
    survey="P2,P3",
)
def r_component_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P2/P3: drop groups with too many (or zero) components —
    the reference's drop-excess-components filter on the array model."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    sizes = l.groupBy("l_orderkey").agg(F.countDistinct("l_partkey").alias("np"))
    return (
        o.join(sizes, o.o_orderkey == sizes.l_orderkey)
        .filter(F.col("np").between(1, 5))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "r_deterministic_scramble",
    oracle="""
    SELECT l_orderkey,
           array_to_string(
             list(CAST(l_partkey AS VARCHAR)
                  ORDER BY md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR)), l_partkey),
             '.') AS scrambled
    FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey
    """,
    category="array",
    survey="F16,W1",
)
def r_deterministic_scramble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F16: seeded per-row scramble, distributed-safe — order
    by md5(rowkey:member) instead of an RNG, so the permutation is a
    pure function of the data (identical on any cluster/retry; the
    reference admits its numpy version is platform-dependent,
    cleaner.py:483)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    keyed = l.select(
        "l_orderkey",
        F.struct(
            F.md5(
                F.concat_ws(":", F.col("l_orderkey").cast("string"), F.col("l_partkey").cast("string"))
            ).alias("k"),
            F.col("l_partkey").alias("pk"),
        ).alias("kv"),
    )
    return keyed.groupBy("l_orderkey").agg(
        F.concat_ws(
            ".", F.transform(F.array_sort(F.collect_list("kv")), lambda s: s.pk.cast("string"))
        ).alias("scrambled")
    )


@query(
    "r_zip_align_filter",
    # DROUND, not raw round: the Spark side is F.round (shortest-repr
    # HALF_UP); raw DuckDB round works on the binary double. Values
    # matched anyway because extendedprice*100 is always within ~1e-9
    # of an integer, but the macro keeps the twin principled (r10
    # lint-tightening fallout).
    oracle=f"""
    SELECT l_orderkey,
           coalesce(array_to_string(
             list(CAST(CAST({DROUND("l_extendedprice * 100", 0)} AS BIGINT) AS VARCHAR)
                  ORDER BY l_linenumber, l_quantity, l_extendedprice) FILTER (WHERE l_quantity > 25),
             '.'), '') AS kept_price_cents
    FROM lineitem WHERE l_orderkey < 500 GROUP BY l_orderkey
    """,
    category="array",
    survey="P8,J5,O4",
)
def r_zip_align_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P8/J5: parallel-list alignment — keep one list's values
    where the paired list passes a predicate, preserving order (the
    products↔yields alignment through filters, as zip → filter →
    project on sorted struct arrays)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    arr = F.array_sort(F.collect_list(item))
    kept = F.filter(arr, lambda s: s.qty > 25)
    return l.groupBy("l_orderkey").agg(
        F.concat_ws(".", F.transform(kept, lambda s: s.cents.cast("string"))).alias("kept_price_cents")
    )


@query(
    "f_string_normalize",
    oracle=r"""
    SELECT p_partkey,
           lower(regexp_replace(regexp_replace(regexp_replace(p_name, '[/:]', '-', 'g'), '\s+', '_', 'g'), '[.]', '-', 'g'))
             AS norm_name
    FROM part WHERE p_partkey < 200
    """,
    category="scalar",
    survey="F1",
)
def f_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F1: chained replace + lower filename normalisation."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    norm = F.lower(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.col("p_name"), "[/:]", "-"), r"\s+", "_"),
            r"[.]",
            "-",
        )
    )
    return p.select("p_partkey", norm.alias("norm_name"))


@query(
    "f_date_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%m/%d/%Y') AS us_date,
           strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS reparsed
    FROM orders WHERE o_orderkey < 300
    """,
    category="scalar",
    survey="F9,S4",
)
def f_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F9: %m/%d/%Y format + parse round-trip (the reference's
    date_of_experiment parser)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    us = F.date_format("o_orderdate", "MM/dd/yyyy")
    return o.select(
        "o_orderkey", us.alias("us_date"), F.to_timestamp(us, "MM/dd/yyyy").alias("reparsed")
    )


@query(
    "f_is_number_filter",
    oracle="""
    SELECT event_type,
           COUNT(*) FILTER (WHERE TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS DOUBLE) IS NOT NULL)
             AS n_numeric,
           COUNT(*) AS n_total
    FROM events GROUP BY event_type
    """,
    category="scalar",
    survey="F10,P7",
)
def f_is_number_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F10/P7: numeric-identifier detection via safe cast."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.groupBy("event_type").agg(
        # try_cast, not cast: under Spark 4's default ANSI mode a plain
        # cast THROWS on non-numeric input instead of producing the
        # NULL this safe-cast detector needs (review finding; the
        # oracle already used TRY_CAST)
        F.count(F.when(k.try_cast("double").isNotNull(), 1)).alias("n_numeric"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "f_unit_conversion",
    # DBROUND/bround (HALF_EVEN), matching the reference's Python
    # round() (r9); the shortest-repr route is still required — DuckDB
    # otherwise rounds the raw binary double while Spark rounds the
    # shortest decimal repr (review finding, r8)
    oracle=f"""
    SELECT event_id,
           {DBROUND('(value - 32) * 5 / 9', 2)} AS celsius,
           {DBROUND('value / 60', 2)} AS hours
    FROM events WHERE event_id < 200
    """,
    category="scalar",
    survey="F6,F7",
)
def f_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY F6/F7: unit conversion arithmetic with round(x, 2) —
    HALF_EVEN via bround, the reference's Python round() semantics."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.bround((F.col("value") - 32) * 5 / 9, 2).alias("celsius"),
        F.bround(F.col("value") / 60, 2).alias("hours"),
    )
