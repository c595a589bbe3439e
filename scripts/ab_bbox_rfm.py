"""Decompose geo_bbox_join (3.96x) and evt_rfm_segments (2.93x) at
x100 to find where the time goes, and A/B a grid-bucketed equi-join
form of the bbox join (the interval-overlap lesson on 2-D space).

Usage: python scripts/ab_bbox_rfm.py [--runs 5]
"""
import math
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import QUERIES  # noqa: E402
from atd_dockless_processing_spark.operators.geo import _ZONES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

OUT = str(REPO / ".scratch" / "scale_x100")
W = 100.0  # grid cell width on x


def bbox_scan_only(spark):
    ev = load(spark, OUT, "events").select(
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("int").alias("y"),
    )
    return ev.agg(F.count("x").alias("nx"), F.sum("y").alias("sy"))


def bbox_grid(spark):
    ev = load(spark, OUT, "events").select(
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("int").alias("y"),
    ).withColumn("cell", F.floor(F.col("x") / W).cast("long"))
    rows = []
    for zone, xlo, xhi, ylo, yhi in _ZONES:
        for c in range(int(math.floor(xlo / W)), int(math.floor((xhi - 1e-9) / W)) + 1):
            rows.append((zone, xlo, xhi, ylo, yhi, c))
    zones = spark.createDataFrame(
        rows, "zone string, xlo double, xhi double, ylo int, yhi int, cell long"
    )
    j = ev.join(F.broadcast(zones), "cell").where(
        (F.col("x") >= F.col("xlo")) & (F.col("x") < F.col("xhi"))
        & (F.col("y") >= F.col("ylo")) & (F.col("y") < F.col("yhi"))
    )
    return j.groupBy("zone").agg(F.count(F.lit(1)).alias("n_points"))


def rfm_agg_only(spark):
    ev = load(spark, OUT, "events").where(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("value").alias("monetary"),
    )
    return per_user.agg(F.count(F.lit(1)).alias("n"), F.sum("monetary").alias("m"))


def rfm_one_window(spark):
    ev = load(spark, OUT, "events").where(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("value").alias("monetary"),
    )
    scored = per_user.select(
        "monetary",
        F.ntile(5).over(Window.orderBy("monetary", "user_id")).alias("m_score"),
    )
    return scored.groupBy("m_score").agg(F.count(F.lit(1)).alias("n_users"))


def hot(fn, runs):
    fn().toPandas()
    times = []
    for _ in range(runs):
        df = fn()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 5
    spark = get_spark("ab-bbox-rfm")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    forms = {
        "bbox scan+json only (no join)": lambda: bbox_scan_only(spark),
        "bbox A (broadcast theta BNLJ)": lambda: QUERIES["geo_bbox_join"](spark, OUT),
        "bbox B (grid-bucket equi join)": lambda: bbox_grid(spark),
        "rfm agg only (no windows)": lambda: rfm_agg_only(spark),
        "rfm one ntile window": lambda: rfm_one_window(spark),
        "rfm A (full, 3 windows)": lambda: QUERIES["evt_rfm_segments"](spark, OUT),
    }
    for label, fn in forms.items():
        print(f"{label}: {hot(fn, runs):.3f} s", flush=True)
    # sanity: grid form matches theta form
    a = QUERIES["geo_bbox_join"](spark, OUT).toPandas().sort_values("zone").reset_index(drop=True)
    b = bbox_grid(spark).toPandas().sort_values("zone").reset_index(drop=True)
    print("grid==theta:", a.equals(b))


if __name__ == "__main__":
    main()
