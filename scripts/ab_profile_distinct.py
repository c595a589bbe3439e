"""A/B alternative plan forms for the two worst batch-4 legacy shapes.

dq_profile_table (4.67x at x100): the multi-distinct agg plans with
Expand x(ncols+1) — every orders row is replicated 6x into the
distinct-hash shuffle. Candidate B: one union branch per column,
each a groupBy(col).count() (map-side combinable, shuffle bounded by
the column's distinct cardinality) folded to a 1-row profile —
5 column-pruned scans instead of one 6x-expanded pass.

agg_distinct_count (2.97x at x100): same Expand disease (gid=2 for
the distinct + plain count). Candidate B: pre-aggregate exact
(priority, custkey) pairs with a plain count (1 combinable
exchange), then count pairs per priority (second exchange is
distinct-sized, not row-sized).

Usage: python scripts/ab_profile_distinct.py [--runs 5]
Runs each form HOT (fresh plan per run, build outside timer, AQE
off) against .scratch/scale_x100; prints medians.
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
PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_orderdate", "o_custkey", "o_totalprice"]


def profile_union(spark):
    branches = []
    o = load(spark, OUT, "orders")
    for c in PROFILE_COLS:
        g = o.groupBy(F.col(c).alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
        branches.append(
            g.agg(
                F.lit(c).alias("col_name"),
                F.sum("cnt").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("v").isNull(), F.col("cnt"))), F.lit(0)
                ).alias("n_null"),
                F.count_if(F.col("v").isNotNull()).alias("n_distinct"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def distinct_pairs(spark):
    o = load(spark, OUT, "orders")
    pairs = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return pairs.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_custs"), F.sum("n").alias("n_orders")
    )


def hot(fn, runs):
    fn().toPandas()  # warm
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
    spark = get_spark("ab-profile-distinct")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    forms = {
        "profile A (multi-distinct Expand)": lambda: QUERIES["dq_profile_table"](spark, OUT),
        "profile B (per-column groupBy union)": lambda: profile_union(spark),
        "distinct A (countDistinct Expand)": lambda: QUERIES["agg_distinct_count"](spark, OUT),
        "distinct B (pair pre-agg)": lambda: distinct_pairs(spark),
    }
    for label, fn in forms.items():
        print(f"{label}: {hot(fn, runs):.3f} s", flush=True)


if __name__ == "__main__":
    main()
