"""Probe: dq_fk_orphans single-pass cell form vs registered
anti-join form at x100, plus the DuckDB oracle denominator.

Usage: python scripts/ab_fk_orphans_forms.py [form ...] form in
{cells, anti, duck}.
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
from atd_dockless_processing_spark.operators.pipeline_r6e import (  # noqa: E402
    _FK_EDGES,
)
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

X100 = REPO / ".scratch" / "scale_x100"
RUNS = 5


def fk_cells(spark, sf):
    out = None
    for label, ct, ck, pt, pk in _FK_EDGES:
        cells = (
            load(spark, sf, ct)
            .select(F.col(ck).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        parent = (
            load(spark, sf, pt)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_p", F.lit(1))
        )
        j = cells.join(parent, "k", "left")
        row = j.agg(
            F.sum("cnt").alias("n_child"),
            F.coalesce(
                F.sum(F.when(F.col("_p").isNull(), F.col("cnt"))),
                F.lit(0).cast("long"),
            ).alias("n_orphan_rows"),
            F.count_distinct(
                F.when(F.col("_p").isNull(), F.col("k"))
            ).alias("n_orphan_keys"),
        ).select(
            F.lit(label).alias("fk"),
            "n_child",
            "n_orphan_rows",
            "n_orphan_keys",
        )
        out = row if out is None else out.unionByName(row)
    return out


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
        "cells",
        "anti",
        "duck",
    ]
    sf = str(X100)
    if "duck" in forms:
        con = duckdb.connect()
        con.execute("SET threads TO 4")
        for _, ct, _, pt, _ in _FK_EDGES:
            for t in (ct, pt):
                p = X100 / f"{t}.parquet"
                glob = f"{p}/*.parquet" if p.is_dir() else str(p)
                try:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{glob}')"
                    )
                except duckdb.CatalogException:
                    pass
        sql = ORACLES["dq_fk_orphans"]
        con.execute(sql).fetchall()
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(f"duck {statistics.median(times):.3f} s")
    if {"cells", "anti"} & set(forms):
        spark = get_spark("ab-fk")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        if "cells" in forms and "anti" in forms:
            pc = (
                fk_cells(spark, sf)
                .toPandas()
                .sort_values("fk")
                .reset_index(drop=True)
            )
            pa = (
                QUERIES["dq_fk_orphans"](spark, sf)
                .toPandas()
                .sort_values("fk")
                .reset_index(drop=True)
            )
            print(f"values identical: {pc.equals(pa)}")
            if not pc.equals(pa):
                print(pc)
                print(pa)
        for form in forms:
            if form == "duck":
                continue
            fn = {
                "cells": lambda: fk_cells(spark, sf),
                "anti": lambda: QUERIES["dq_fk_orphans"](spark, sf),
            }[form]
            t = hot(spark, fn)
            print(f"{form} {t:.3f} s")


if __name__ == "__main__":
    main()
