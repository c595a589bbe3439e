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
import shutil
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_PKG_ZIP: str | None = None


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable in Spark's Python WORKER processes.

    The driver may run from any cwd with the repo reachable only via
    its own sys.path; workers inherit neither. Closures sent to
    workers (mapInPandas, applyInPandasWithState, pandas UDFs) hold
    by-reference cloudpickle pointers to module-level helpers, so the
    workers must be able to import the package — addPyFile ships a
    zip of it to every worker's sys.path.
    """
    global _PKG_ZIP
    if _PKG_ZIP is None:
        pkg_dir = Path(__file__).resolve().parent
        scratch = pkg_dir.parent / ".scratch" / "pyfiles"
        scratch.mkdir(parents=True, exist_ok=True)
        tmp = scratch / "atd_dockless_processing_spark.zip.tmp"
        dst = scratch / "atd_dockless_processing_spark.zip"
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in sorted(pkg_dir.rglob("*.py")):
                zf.write(p, f"{pkg_dir.name}/{p.relative_to(pkg_dir)}")
        shutil.move(tmp, dst)
        _PKG_ZIP = str(dst)
    shipped = spark.sparkContext.environment.get("__atd_pkg_shipped__")
    if not shipped:
        spark.sparkContext.addPyFile(_PKG_ZIP)
        spark.sparkContext.environment["__atd_pkg_shipped__"] = "1"


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
        # Allow shuffled-hash-join where the per-partition build side
        # fits memory (Catalyst still requires canBuildLocalHashMap;
        # AQE re-plans if runtime sizes disagree). Measured on the
        # x100 rehearsal: Q3-shape 3-way join 5.9s (sort-merge) ->
        # 2.9s (hash) — the sorts, not the shuffles, were the cost.
        # Hinted merge joins (bucketed tables) are unaffected.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Default 1g (Spark's own default). The xN rehearsal raises it
        # via env: map-only shapes (fn_/flt_/prj_) produce table-sized
        # result sets, and the harness's toPandas intentionally pays
        # the same full-materialization cost DuckDB's fetchall pays —
        # at x100 that legitimately exceeds 1 GiB of task results. A
        # production pipeline writes such outputs to a sink instead.
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_MAX_RESULT", "1g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session confs (for sessions we did not
    build). Idempotent and cheap on repeat calls: the whole body runs
    once per SparkContext (the driver's correctness harness calls
    tune() before every key — the flag makes call 2..n a no-op instead
    of n py4j conf round-trips + a zip stat)."""
    env = spark.sparkContext.environment
    if env.get("__atd_tuned__"):
        return spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    except Exception:
        pass
    _ship_package(spark)
    env["__atd_tuned__"] = "1"
    return spark
