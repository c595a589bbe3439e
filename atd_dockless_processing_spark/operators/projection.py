"""Projection / filter / predicate operators — SURVEY.md §2.2.

These generalize the reference's validate/filter/field-mapping steps
([P]: drop bad duration/distance rows, map to publish schema —
SURVEY §3.1). All are pure narrow transformations: no shuffle, fully
pushed down to the parquet scan by Catalyst (verify: PushedFilters in
.explain()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "prj_select_rename",
    oracle="""
    SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment
    FROM customer
    """,
)
def prj_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename (publish-schema field mapping, [P high])."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "prj_derived_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS gross_charge
    FROM lineitem
    """,
)
def prj_derived_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derived column (derived trip metrics, [P med]).

    Rounded to 6 dp, not 4: the true product of 2-dp decimals has at
    most 6 decimal digits, so round-6 is the identity on the exact
    value and both engines return the same double; round-4 sits on
    exact .xxxx5 ties where their half-rounding modes differ."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("gross_charge"),
    )


@query(
    "prj_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                ELSE 'large' END AS price_tier
    FROM orders
    """,
)
def prj_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN bucket classification (trip-type classification, [P med])."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
        .alias("price_tier"),
    )


@query(
    "flt_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity >= 10 AND l_quantity < 40
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def flt_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric + date band predicate (the reference's trip
    duration/distance validation filters, [P high])."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") < 40)
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "flt_in_set",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def flt_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list on an enum column (vehicle-type/provider filter, [P med])."""
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "flt_null_coalesce",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS segment,
           CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END AS was_null
    FROM customer
    WHERE COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'X') <> 'X'
    """,
)
def flt_null_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-aware filter + coalesce defaulting; nulls synthesized via
    nullif (missing-field handling, [P high])."""
    c = load(spark, sf_dir, "customer")
    seg_n = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        c.where(F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("X")) != "X")
        .select(
            "c_custkey",
            F.coalesce(seg_n, F.lit("N/A")).alias("segment"),
            F.when(seg_n.isNull(), 1).otherwise(0).alias("was_null"),
        )
    )


@query(
    "flt_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE 's%' AND regexp_matches(p_brand, '^Brand#1[0-9]$')
    """,
)
def flt_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix + regex predicate on strings (core)."""
    return (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("s%") & F.col("p_brand").rlike("^Brand#1[0-9]$"))
        .select("p_partkey", "p_name", "p_brand")
    )


@query(
    "dq_constraint_report",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(*) FILTER (l_quantity <= 0 OR l_quantity > 50) AS BIGINT)
        AS bad_quantity,
      CAST(COUNT(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS BIGINT)
        AS bad_discount,
      CAST(COUNT(*) FILTER (l_shipdate IS NULL) AS BIGINT) AS null_shipdate,
      CAST(COUNT(*) FILTER (l_extendedprice <= 0) AS BIGINT) AS bad_price,
      CAST((SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        AS orphan_lineitems
    FROM lineitem
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality report: range violations, null checks,
    and referential-integrity orphans — the reference's row-at-a-time
    validation filters ([P high]) generalized into a single scan of
    conditional aggregates plus one anti-join. This is the
    assert-before-publish gate of an ETL pipeline: at 100 TB the
    conditional counts ride ONE scan (no per-rule passes), and the
    RI check is a broadcast/shuffle anti-join, not a lookup loop."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    orphans = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    report = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("bad_quantity"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(0)
        ).alias("bad_discount"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias("null_shipdate"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias("bad_price"),
    )
    return report.crossJoin(orphans)
