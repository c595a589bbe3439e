"""SparkSession factory with the binding config from SURVEY.md §4.

Config rationale (100 TB notes inline):
- ``spark.sql.session.timeZone=UTC`` — oracle (DuckDB) timestamps are
  naive; pinning UTC makes both engines agree (SURVEY §1.2 item 4).
- ``spark.sql.shuffle.partitions`` — small for local sf0.1; on a real
  cluster this is sized to ~2-3x total cores and AQE coalesces.
- AQE on: runtime partition coalescing, skew-join splitting, and
  sort-merge->broadcast conversion. This is the scale story: the same
  declarative plans re-optimize at 100 TB without code changes.
- Arrow enabled: every Python<->JVM data transfer (collect, pandas
  UDFs, applyInPandas) is columnar instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "atd-dockless-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    spark = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session confs (for sessions we did not build)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark
