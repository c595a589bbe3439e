"""A/B join orders for join_multiway_5 (2.66x at x100, 4.0 s).

Form A (current): lineitem ⋈ filtered-orders on orderkey first
(shuffles all 60M lineitem rows), then ⋈ customer on custkey.
Form B: filtered-orders ⋈ customer on custkey first (17M-row
exchange), then the 2.3M result ⋈ lineitem on orderkey.
Form C: form A under AQE ON (runtime re-plan / coalesce).

Usage: python scripts/ab_multiway.py [--runs 5]
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


def form_b(spark):
    customer = load(spark, OUT, "customer")
    orders = load(spark, OUT, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, OUT, "lineitem")
    supplier = load(spark, OUT, "supplier")
    nation = load(spark, OUT, "nation")
    region = load(spark, OUT, "region").where(F.col("r_name") == "ASIA")
    oc = orders.join(customer, customer.c_custkey == orders.o_custkey)
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (oc.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


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
    spark = get_spark("ab-multiway")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("A (li-first):", f"{hot(lambda: QUERIES['join_multiway_5'](spark, OUT), runs):.3f} s", flush=True)
    print("B (oc-first):", f"{hot(lambda: form_b(spark), runs):.3f} s", flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print("C (A, AQE on):", f"{hot(lambda: QUERIES['join_multiway_5'](spark, OUT), runs):.3f} s", flush=True)
    a = QUERIES["join_multiway_5"](spark, OUT).toPandas().sort_values("n_name").reset_index(drop=True)
    b = form_b(spark).toPandas().sort_values("n_name").reset_index(drop=True)
    print("B==A:", a.equals(b))


if __name__ == "__main__":
    main()
