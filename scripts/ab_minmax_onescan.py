"""Probe: agg_minmax_by one-scan cell form vs the registered two-scan
form at x100, plus the DuckDB oracle denominator.

The registered form consumes orders TWICE — a row-grain groupBy for
the argmax/argmin/max/count block and a (priority, status) groupBy for
the modal status — then joins the two 5-row results. Every aggregate
in the first block decomposes exactly over (priority, status) cells:
price_key = struct(cents, orderkey) is a TOTAL order (orderkey breaks
cent ties), so the unique global argmax per priority is the argmax of
the per-cell argmaxes; MAX/COUNT decompose trivially; and the modal
block already IS a cell aggregate. One scan + one cell-sized second
agg therefore replaces two scans + a join, shipping ~15 cells through
the only exchange (guide §2.4 remove shuffles / shared-scan shape).

Usage: python scripts/ab_minmax_onescan.py [form ...] where form in
{onescan, reg, duck}. Default: value check + all three in-process
(probe only — the registering A/B must be isolated per process,
r14 lesson).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark import ORACLES, QUERIES  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def minmax_onescan(o):
    """One-scan cell form: every aggregate decomposes over cells."""
    o = o.select(
        "o_orderpriority",
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.struct(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.col("o_orderkey").alias("k"),
        ).alias("price_key"),
    )
    cells = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("price_key").alias("mpk_top"),
        F.min("price_key").alias("mpk_bot"),
        F.max("o_totalprice").alias("mx_price"),
    )
    return cells.groupBy("o_orderpriority").agg(
        F.max("mpk_top").getField("k").alias("top_order"),
        F.min("mpk_bot").getField("k").alias("bottom_order"),
        F.round(F.max("mx_price"), 4).alias("max_price"),
        F.sum("n").alias("n_orders"),
        F.max_by(
            "o_orderstatus",
            F.struct(F.col("n").alias("n"), F.col("o_orderstatus").alias("s")),
        ).alias("modal_status"),
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
        "onescan",
        "reg",
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
        sql = ORACLES["agg_minmax_by"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    if {"onescan", "reg"} & set(forms):
        spark = get_spark("ab-minmax1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        o = lambda: load(spark, sf, "orders")  # noqa: E731
        reg = lambda: QUERIES["agg_minmax_by"](spark, sf)  # noqa: E731
        if "onescan" in forms and "reg" in forms:
            cols = ["o_orderpriority"]
            po = minmax_onescan(o()).toPandas().sort_values(cols)
            pr = reg().toPandas().sort_values(cols)
            po = po[pr.columns]  # align column order for the compare
            same = po.reset_index(drop=True).equals(pr.reset_index(drop=True))
            print(f"values identical: {same}")
            if not same:
                print(po)
                print(pr)
        for form in forms:
            if form == "duck":
                continue
            fn = {"onescan": lambda: minmax_onescan(o()), "reg": reg}[form]
            t = hot(spark, fn)
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
