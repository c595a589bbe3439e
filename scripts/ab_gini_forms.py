"""Probe: agg_gini histogram (rank-block) form vs registered
window-rank form at x100, plus the DuckDB oracle denominator.

Usage: python scripts/ab_gini_forms.py [form ...] where form in
{hist, rank, duck}. Default: all three in-process (probe only —
the registering A/B must be isolated per process, r14 lesson).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import ORACLES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def gini_rank(o):
    """The registered form (copy): per-row row_number window."""
    o = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    c = o.withColumn("i", F.row_number().over(w))
    s = c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "o_orderpriority",
        "n",
        "sum_cents",
        F.round(
            (2.0 * F.col("s2").cast("double"))
            / (nd * F.col("sum_cents").cast("double"))
            - (nd + 1.0) / nd,
            6,
        ).alias("gini"),
    )


def gini_hist(o):
    """Histogram / rank-block form: group to (priority, cents) cells,
    cumulative cell counts give each tie block's rank span; the
    block's exact rank sum is c*C + c*(c+1)/2."""
    o = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    cells = o.groupBy("o_orderpriority", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cells.withColumn(
        "cbefore", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    block = (
        F.col("c") * F.col("cbefore")
        + F.expr("(c * (c + 1)) div 2")
    ).cast("decimal(38,0)")
    s = cum.groupBy("o_orderpriority").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("cents")).alias("sum_cents"),
        F.sum(block * F.col("cents")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "o_orderpriority",
        "n",
        "sum_cents",
        F.round(
            (2.0 * F.col("s2").cast("double"))
            / (nd * F.col("sum_cents").cast("double"))
            - (nd + 1.0) / nd,
            6,
        ).alias("gini"),
    )


def hot(spark, build_df, runs=RUNS) -> float:
    build_df().toPandas()
    times = []
    for _ in range(runs):
        df = build_df()
        df._jdf.queryExecution().executedPlan()
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    forms = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "hist",
        "rank",
        "duck",
    ]
    sf = str(X100)
    if "duck" in forms:
        con = duckdb.connect()
        con.execute("SET threads TO 4")
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{X100}/orders.parquet/*.parquet')"
        )
        sql = ORACLES["agg_gini"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    if {"hist", "rank"} & set(forms):
        spark = get_spark("ab-gini")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        o = lambda: load(spark, sf, "orders")  # noqa: E731
        # value check first: both forms must agree exactly
        if "hist" in forms and "rank" in forms:
            ph = gini_hist(o()).toPandas().sort_values("o_orderpriority")
            pr = gini_rank(o()).toPandas().sort_values("o_orderpriority")
            same = ph.reset_index(drop=True).equals(pr.reset_index(drop=True))
            print(f"values identical: {same}")
            if not same:
                print(ph)
                print(pr)
        for form in forms:
            if form == "duck":
                continue
            fn = {"hist": gini_hist, "rank": gini_rank}[form]
            t = hot(spark, lambda: fn(o()))
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
