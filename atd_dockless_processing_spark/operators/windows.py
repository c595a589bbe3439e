"""Window-function operators — SURVEY.md §2.5.

Window ops shuffle once on the partition key, then sort within
partitions. At 100 TB the concern is partition-key skew: per-customer
and per-user partitions here are naturally bounded; a skewed key
would call for a two-level (salted partial) rewrite.
Every window has a total order (tie-breakers) so results hash
deterministically (SURVEY §5.2 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer via row_number (core)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS drnk
    FROM part
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank within brand (tie-heavy ordering; core).
    rank/dense_rank are deterministic under ties, so no tie-break
    column is needed for hash stability."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return load(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           CAST(date_diff('second',
                LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                CAST(ts AS TIMESTAMP)) AS BIGINT) AS gap_s,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap via lag(ts) + lead(event_id) (trip
    sequence deltas, [P med])."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("timestamp")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (ts.cast("long") - F.lag(ts).over(w).cast("long")).alias("gap_s"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_rev
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date (core)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_rev"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
    FROM orders
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of order totalprice per customer
    (smoothing, [P low])."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, 0)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("ma7"),
    )


@query(
    "win_ntile_pct",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank
    FROM orders
    """,
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) + percent_rank over order totals (core), computed as
    an exact RANGE-PARTITIONED global rank (r7 de-weak — the naive
    ``Window.orderBy`` form is a single-reducer sort, the one plan
    shape that can never scale; ×100 A/B: 41.3 s single-reducer vs
    8.0 s distributed, identical rows at every SF):

    1. ``repartitionByRange`` on the total order (sampled range
       boundaries, each partition a contiguous key range);
    2. per-partition ``row_number`` — parallel local sorts;
    3. per-partition counts -> prefix-sum offsets (a P-row window,
       driver-scale) broadcast-joined back; global rank = offset +
       local rank. Both consumers read ONE physical range exchange
       (ReuseExchange; equality across forms is pinned by a test, as
       boundary sampling must not diverge between consumers);
    4. closed forms: percent_rank = (r-1)/(n-1) (ordering is unique,
       so rank == row_number; single correctly-rounded IEEE division
       on both engines); ntile(4) from the SQL-standard remainder
       rule — the first n%4 buckets take ceil(n/4) rows.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rp = o.repartitionByRange(32, "o_totalprice", "o_orderkey")
    wloc = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    loc = rp.withColumn("pid", F.spark_partition_id()).withColumn(
        "rn", F.row_number().over(wloc)
    )
    wcum = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        loc.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "pid",
            F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("off"),
            F.sum("c").over(Window.partitionBy()).alias("n"),
        )
    )
    g = loc.join(F.broadcast(off), "pid").select(
        "o_orderkey", (F.col("off") + F.col("rn")).alias("r"), "n"
    )
    k = ((F.col("n") - F.col("n") % 4) / 4).cast("long")  # floor(n/4)
    m = F.col("n") % 4
    big = m * (k + 1)  # rows covered by the m size-(k+1) buckets
    quartile = (
        F.when(F.col("r") <= big, ((F.col("r") - 1) / (k + 1)).cast("long") + 1)
        .otherwise(m + ((F.col("r") - big - 1) / k).cast("long") + 1)
    )
    return g.select(
        "o_orderkey",
        quartile.cast("int").alias("quartile"),
        F.round((F.col("r") - 1) / (F.col("n") - 1), 6).alias("pct_rank"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW), 4) AS rev_7d
    FROM orders
    WHERE o_custkey < 100
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: trailing-7-day revenue per
    customer — the frame is bounded by VALUE distance (6 days back in
    epoch seconds = 518400), not row count, so multiple orders on one
    day all fall in each other's frame and gaps shorten the window.
    This is the moving-aggregate semantics a rows-frame cannot give
    on irregular event times."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-518400, 0)
    )
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 4).alias("rev_7d")
    )


@query(
    "win_cume_dist",
    oracle="""
    SELECT o_orderkey,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 4) AS cd
    FROM orders
    WHERE o_custkey < 50
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution within group (empirical CDF position
    of each order's value; total order via the key tie-break)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    return o.select(
        "o_orderkey", F.round(F.cume_dist().over(w), 4).alias("cd")
    )
