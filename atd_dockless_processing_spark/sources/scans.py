"""Scan/source operators — SURVEY.md §2.1.

Covers the reference's ingest surface ([P]: MDS JSON feeds, CSV
extracts — SURVEY §1.1) re-expressed as Spark readers with explicit
schemas. Scale notes: parquet scans get predicate pushdown + column
pruning from Catalyst; CSV/JSON readers with explicit schemas avoid
the inference pass (a full extra read at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load, scratch_dir


@query(
    "src_parquet_scan",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem
    """,
)
def src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-projection parquet scan of lineitem (timestamp cast to date
    for cross-engine hash stability)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )


_CSV_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("ship_date", T.DateType()),
    ]
)


@query(
    "src_csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    """,
)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a lineitem subset to CSV (header), re-read with an explicit
    schema, aggregate. Mirrors the reference's CSV ingest ([P high],
    SURVEY §2.1)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") < "1996-01-01")
    subset = li.select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )
    path = scratch_dir("src_csv_roundtrip", sf_dir.strip("/").replace("/", "_"))
    subset.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(_CSV_SCHEMA).option("header", True).csv(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
    )


_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@query(
    "src_json_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type
    """,
)
def src_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an events subset to JSON-lines, re-read with explicit
    schema, aggregate. Mirrors MDS JSON feed ingest ([P high])."""
    ev = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    subset = ev.select("event_id", "user_id", "event_type", "value")
    path = scratch_dir("src_json_roundtrip", sf_dir.strip("/").replace("/", "_"))
    subset.write.mode("overwrite").json(path)
    back = spark.read.schema(_JSON_SCHEMA).json(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


_ORC_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
    ]
)


@query(
    "src_orc_roundtrip",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_price
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_linestatus
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a lineitem subset to ORC, re-read with explicit schema,
    aggregate. ORC is Spark's second first-class columnar format
    (predicate pushdown + column pruning, like parquet) — format
    breadth for ingest interop."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 25)
    subset = li.select("l_orderkey", "l_linestatus", "l_quantity", "l_extendedprice")
    path = scratch_dir("src_orc_roundtrip", sf_dir.strip("/").replace("/", "_"))
    subset.write.mode("overwrite").orc(path)
    back = spark.read.schema(_ORC_SCHEMA).orc(path)
    return back.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


@query(
    "src_text_log_parse",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type
    """,
)
def src_text_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured log-line ingest: render events as text log
    lines, write with the text sink, re-read with spark.read.text and
    parse fields back out with regexp_extract — the classic
    "raw application logs -> typed columns" ETL entry path ([P high]:
    the reference's ingest is parsing semi-structured provider
    payloads). The value field is serialized via %s (Java shortest
    round-trip repr), so the re-parsed double is bit-identical and
    the oracle can aggregate the original parquet directly."""
    ev = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    lines = ev.select(
        F.format_string(
            "evt id=%d type=%s value=%s", "event_id", "event_type", "value"
        ).alias("value")
    )
    path = scratch_dir("src_text_log", sf_dir.strip("/").replace("/", "_"))
    lines.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    parsed = back.select(
        F.regexp_extract("value", r"type=(\w+)", 1).alias("event_type"),
        F.regexp_extract("value", r"value=(\S+)$", 1).cast("double").alias("val"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("val"), 4).alias("sum_value"),
    )
