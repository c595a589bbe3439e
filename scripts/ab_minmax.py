"""A/B ordering-key forms for agg_minmax_by (3.84x / 4.5 s at x100).

A (current): format_string('%013d|%013d', cents, orderkey) — java
util.Formatter per row, suspect dominant.
B: lpad-concat of the same padded decimal string (identical bytes,
no Formatter).
C: struct(cents, orderkey) ordering key — no strings at all; struct
order == padded-string order for non-negative fixed-width ints, so
the ARGMAX (the only thing that crosses engines) is unchanged.

Usage: python scripts/ab_minmax.py [--runs 5]
"""
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

OUT = str(REPO / ".scratch" / "scale_x100")


def _base_modal(o, price_key, modal_key):
    base = o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", price_key).alias("top_order"),
        F.min_by("o_orderkey", price_key).alias("bottom_order"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    modal = (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("o_orderpriority")
        .agg(F.max_by("o_orderstatus", modal_key).alias("modal_status"))
    )
    return base.join(modal, "o_orderpriority")


def form_b(spark):
    o = load(spark, OUT, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    key = F.concat(
        F.lpad(cents.cast("string"), 13, "0"),
        F.lit("|"),
        F.lpad(F.col("o_orderkey").cast("string"), 13, "0"),
    )
    mkey = F.concat(
        F.lpad(F.col("n").cast("string"), 10, "0"), F.lit("|"), F.col("o_orderstatus")
    )
    return _base_modal(o, key, mkey)


def form_c(spark):
    o = load(spark, OUT, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    key = F.struct(cents.alias("c"), F.col("o_orderkey").alias("k"))
    mkey = F.struct(F.col("n").alias("n"), F.col("o_orderstatus").alias("s"))
    return _base_modal(o, key, mkey)


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
    spark = get_spark("ab-minmax")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("A (format_string):", f"{hot(lambda: QUERIES['agg_minmax_by'](spark, OUT), runs):.3f} s", flush=True)
    print("B (lpad-concat):  ", f"{hot(lambda: form_b(spark), runs):.3f} s", flush=True)
    print("C (struct key):   ", f"{hot(lambda: form_c(spark), runs):.3f} s", flush=True)
    a = QUERIES["agg_minmax_by"](spark, OUT).toPandas().sort_values("o_orderpriority").reset_index(drop=True)
    for name, fn in (("B", form_b), ("C", form_c)):
        x = fn(spark).toPandas().sort_values("o_orderpriority").reset_index(drop=True)
        print(f"{name}==A:", a.equals(x))


if __name__ == "__main__":
    main()
