"""Table loading helpers for the driver-provided parquet tables.

Tables and schemas are fixed (FIXTURES.md §A); one parquet file per
table per scale-factor directory (TESTDATA.md). At 100 TB each
"file" becomes a partitioned parquet dataset — ``spark.read.parquet``
is unchanged, and filters/projections push down to row groups.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_DIMS = {"region", "nation", "supplier"}

REPO_ROOT = Path(__file__).resolve().parent.parent
SCRATCH = REPO_ROOT / ".scratch"


# Optional table provider (catalog indirection): harnesses can serve
# alternative physical representations of the logical tables — e.g.
# bench.py registers repartitioned+cached DataFrames so post-scan
# stages parallelize past the single-row-group parquet files. Query
# code is unchanged: same logical tables, different physical source.
_PROVIDER = None


def set_table_provider(provider) -> None:
    global _PROVIDER
    _PROVIDER = provider


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark 4 refuses
    by default; we read it as raw nanos (legacy conf) and convert to
    a µs TimestampType with integer division (the data is µs-precise
    — FIXTURES.md — so this is lossless, and matches DuckDB's
    CAST(ts AS TIMESTAMP) truncation). Plain double division would be
    lossy: 2024 epoch-nanos ~ 1.7e18 > 2^53.
    """
    if _PROVIDER is not None:
        df = _PROVIDER(spark, sf_dir, name)
        if df is not None:
            return df
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scratch_dir(*parts: str) -> str:
    p = SCRATCH.joinpath(*parts)
    p.parent.mkdir(parents=True, exist_ok=True)
    return str(p)
