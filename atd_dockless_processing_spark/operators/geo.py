"""Geo/grid operators — SURVEY.md §2.9.

The reference's spatial core is point-in-polygon assignment of trip
endpoints to coarse geographies (council district / census tract /
grid cell) for privacy ([P high], SURVEY §3.1). Testdata has no
lat/lon, so the *operator shapes* are declared on numeric columns:
identical algebra, different units. Both are pure expressions /
broadcast theta joins — embarrassingly parallel at 100 TB (no
shuffle of the point table before aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "geo_grid_bin",
    oracle="""
    SELECT CONCAT(CAST(CAST(FLOOR(value / 50) AS BIGINT) AS VARCHAR), '_',
                  CAST(CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 25.0) AS BIGINT) AS VARCHAR)) AS cell_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def geo_grid_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-grid cell id from two numeric coordinates (value, k) —
    the hex/grid-cell privacy binning shape ([P high]). Pure
    expression: codegen'd, zero shuffle before the final agg."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    cell = F.concat_ws(
        "_",
        F.floor(F.col("value") / 50).cast("string"),
        F.floor(k / 25.0).cast("string"),
    )
    return (
        ev.groupBy(cell.alias("cell_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


_ZONES = [
    # (zone, xlo, xhi, ylo, yhi) over (value, k) space
    ("downtown", 0.0, 100.0, 0, 50),
    ("east", 100.0, 300.0, 0, 100),
    ("west", 0.0, 100.0, 50, 100),
    ("far", 300.0, 10000.0, 0, 100),
]


@query(
    "geo_bbox_join",
    oracle="""
    WITH zones(zone, xlo, xhi, ylo, yhi) AS (
      VALUES ('downtown', 0.0, 100.0, 0, 50), ('east', 100.0, 300.0, 0, 100),
             ('west', 0.0, 100.0, 50, 100), ('far', 300.0, 10000.0, 0, 100)
    ), pts AS (
      SELECT value AS x, CAST(json_extract_string(props, '$.k') AS INTEGER) AS y
      FROM events
    )
    SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM pts JOIN zones ON x >= xlo AND x < xhi AND y >= ylo AND y < yhi
    GROUP BY zone
    """,
)
def geo_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-rectangle via broadcast theta join — the
    point-in-polygon generalization ([P high]). The zone dim is
    broadcast; at 100 TB the point table never shuffles."""
    ev = load(spark, sf_dir, "events").select(
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("int").alias("y"),
    )
    zones = spark.createDataFrame(
        _ZONES, "zone string, xlo double, xhi double, ylo int, yhi int"
    )
    cond = (
        (ev.x >= zones.xlo) & (ev.x < zones.xhi) & (ev.y >= zones.ylo) & (ev.y < zones.yhi)
    )
    return (
        ev.join(F.broadcast(zones), cond)
        .groupBy("zone")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


_HEX_SIZE = 40.0


@query(
    "geo_hex_bin",
    oracle=f"""
    WITH pts AS (
      SELECT value AS x,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS y
      FROM events
    ), axial AS (
      SELECT x, y,
             (sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / {_HEX_SIZE} AS q,
             (2.0 / 3.0 * y) / {_HEX_SIZE} AS r
      FROM pts
    ), cube AS (
      SELECT x, q, r, -q - r AS s,
             round(q) AS rq, round(r) AS rr, round(-q - r) AS rs
      FROM axial
    ), fixed AS (
      SELECT x,
             CASE WHEN abs(rq - q) > abs(rr - r) AND abs(rq - q) > abs(rs - s)
                  THEN -rr - rs ELSE rq END AS hq,
             CASE WHEN abs(rr - r) > abs(rq - q) AND abs(rr - r) >= abs(rs - s)
                       AND NOT (abs(rq - q) > abs(rr - r) AND abs(rq - q) > abs(rs - s))
                  THEN -rq - rs ELSE rr END AS hr
      FROM cube
    )
    SELECT CAST(hq AS INTEGER) AS hex_q, CAST(hr AS INTEGER) AS hex_r,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(SUM(x), 4) AS sum_value
    FROM fixed
    GROUP BY 1, 2
    """,
)
def geo_hex_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal binning (pointy-top axial coordinates, cube rounding
    with largest-residual correction) — the H3-style privacy binning
    the reference applies to trip endpoints, on (value, k) space.
    Pure expressions end-to-end: the same identical formula runs in
    the oracle, and at 100 TB it is a codegen'd map + one combinable
    aggregation, exactly like geo_grid_bin."""
    ev = load(spark, sf_dir, "events")
    x = F.col("value")
    y = F.get_json_object("props", "$.k").cast("int")
    q = (F.sqrt(F.lit(3.0)) / 3.0 * x - F.lit(1.0) / 3.0 * y) / _HEX_SIZE
    r = (F.lit(2.0) / 3.0 * y) / _HEX_SIZE
    s = -q - r
    rq, rr, rs = F.round(q, 0), F.round(r, 0), F.round(s, 0)
    dq, dr, ds = F.abs(rq - q), F.abs(rr - r), F.abs(rs - s)
    hq = F.when((dq > dr) & (dq > ds), -rr - rs).otherwise(rq)
    hr = F.when(
        (dr > dq) & (dr >= ds) & ~((dq > dr) & (dq > ds)), -rq - rs
    ).otherwise(rr)
    return (
        ev.select(x.alias("x"), hq.cast("int").alias("hex_q"), hr.cast("int").alias("hex_r"))
        .groupBy("hex_q", "hex_r")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("x"), 4).alias("sum_value"),
        )
    )
