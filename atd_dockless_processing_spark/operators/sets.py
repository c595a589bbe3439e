"""Set operators — SURVEY.md §2.7.

union/intersect/except over period slices. Generalizes the
reference's multi-page batch appends and overlapping re-pull dedup
([P high], SURVEY §2.7). INTERSECT/EXCEPT have SQL distinct
semantics — matched to Spark's intersect()/.exceptAll-vs-except
distinction (SURVEY §7 hard-part #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def _slice(spark, sf_dir, lo: str, hi: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("od"))
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
    UNION ALL
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-03-01'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two month slices (batch appends across API pages,
    [P high])."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-02-01")
    b = _slice(spark, sf_dir, "1996-02-01", "1996-03-01")
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-03-01'
    UNION
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-04-01'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup of overlapping slices (overlapping re-pulls,
    [P high])."""
    a = _slice(spark, sf_dir, "1996-01-01", "1996-03-01")
    b = _slice(spark, sf_dir, "1996-02-01", "1996-04-01")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both periods (INTERSECT, distinct
    semantics; core)."""
    orders = load(spark, sf_dir, "orders")
    a = orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    b = orders.where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in period A but not B. SQL EXCEPT has distinct
    semantics = Spark ``subtract`` (``exceptAll`` is bag-difference
    and would diverge; SURVEY §7 hard-part #2). Churn detection
    ([P low])."""
    orders = load(spark, sf_dir, "orders")
    a = orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    b = orders.where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return a.subtract(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-preserving difference):
    a customer with 5 early orders and 2 late ones keeps 3 rows —
    vs `set_except`'s set semantics. Spark plans this as a
    left-anti-style hash join on counts, one shuffle."""
    o = load(spark, sf_dir, "orders")
    early = o.where(F.col("o_orderdate") < "1997-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    late = o.where(F.col("o_orderdate") >= "1997-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    return early.exceptAll(late)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity-preserving
    intersection): a customer with 5 early and 2 late orders keeps
    min(5,2)=2 rows — completes the set-op surface alongside
    `set_intersect`'s distinct semantics. One shuffle on the key,
    min-of-counts semantics planned as a hash join."""
    o = load(spark, sf_dir, "orders")
    early = o.where(F.col("o_orderdate") < "1997-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    late = o.where(F.col("o_orderdate") >= "1997-01-01").select(
        F.col("o_custkey").alias("custkey")
    )
    return early.intersectAll(late)
