"""A/B the geo_bbox_join adaptive switch at MANY zones on x100 data
(VERDICT r6 item 4): 2048 synthetic overlapping zones over the x100
events table, theta (broadcast nested-loop) vs grid (cell-bucketed
broadcast equi-join), plus DuckDB on the same join for the ratio.

Usage: python scripts/ab_bbox_many_zones.py [--runs 3] [--zones 2048]
"""
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark.operators.geo import bbox_join_plan  # noqa: E402
from atd_dockless_processing_spark.session import get_spark  # noqa: E402
from atd_dockless_processing_spark.tables import load  # noqa: E402

OUT = str(REPO / ".scratch" / "scale_x100")


def make_zones(n: int) -> list:
    # overlapping, edge-unaligned rectangles tiling the (value, k)
    # domain (x ~ 0..10000, y 0..100) — every point lands in several
    return [
        (
            f"z{i:04d}",
            (i % 512) * 19.3,
            (i % 512) * 19.3 + 57.1,
            (i % 7) * 11,
            (i % 7) * 11 + 29,
        )
        for i in range(n)
    ]


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
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    nz = int(sys.argv[sys.argv.index("--zones") + 1]) if "--zones" in sys.argv else 2048
    zones = make_zones(nz)
    spark = get_spark("ab-bbox-many-zones")

    ev = load(spark, OUT, "events").select(
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("int").alias("y"),
    )

    res = {}
    for strat in ("grid", "theta"):
        t = hot(lambda s=strat: bbox_join_plan(spark, ev, zones, strategy=s), runs)
        n = bbox_join_plan(spark, ev, zones, strategy=strat).count()
        res[strat] = t
        print(f"spark {strat:5s}: {t:8.2f} s  ({n} zones matched)")

    con = duckdb.connect()
    con.execute("SET threads TO 4")  # baseline harness thread count
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{OUT}/events.parquet/*.parquet')"
    )
    con.execute(
        "CREATE TABLE zones(zone VARCHAR, xlo DOUBLE, xhi DOUBLE, ylo INT, yhi INT)"
    )
    con.executemany("INSERT INTO zones VALUES (?,?,?,?,?)", zones)
    sql = """
    WITH pts AS (
      SELECT value AS x, CAST(json_extract_string(props, '$.k') AS INTEGER) AS y
      FROM events
    )
    SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM pts JOIN zones ON x >= xlo AND x < xhi AND y >= ylo AND y < yhi
    GROUP BY zone
    """
    con.execute(sql).fetchall()
    dts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dts.append(time.perf_counter() - t0)
    d = statistics.median(dts)
    print(f"duckdb      : {d:8.2f} s")
    print(
        f"| bbox join, {nz} zones (x100 events) | {d:.2f} s | grid {res['grid']:.2f} s"
        f" / theta {res['theta']:.2f} s | grid {res['grid'] / d:.2f}x |"
    )


if __name__ == "__main__":
    main()
