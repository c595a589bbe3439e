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

from ..functions.json_fast import with_json_field
from ..registry import query
from ..tables import load


@query(
    "geo_grid_bin",
    oracle="""
    SELECT CONCAT(CAST(CAST(FLOOR(value / 50) AS BIGINT) AS VARCHAR), '_',
                  COALESCE(CAST(CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 25.0) AS BIGINT) AS VARCHAR), 'x')) AS cell_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def geo_grid_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-grid cell id from two numeric coordinates (value, k) —
    the hex/grid-cell privacy binning shape ([P high]). Pure
    expression: codegen'd, zero shuffle before the final agg. The
    props field rides the anchored-regex fast path
    (functions/json_fast.py) — exact Jackson semantics, ~3.5× less
    per-row parse tax."""
    ev = with_json_field(load(spark, sf_dir, "events"), "_kj", "props", "k", "int")
    k = F.col("_kj")
    # COALESCE the k-derived component: DuckDB CONCAT keeps the '_'
    # when an operand is NULL while concat_ws drops it, so a NULL k
    # would silently diverge ('3_' vs '3'); 'x' pins both engines to
    # the same sentinel cell.
    cell = F.concat_ws(
        "_",
        F.floor(F.col("value") / 50).cast("string"),
        F.coalesce(F.floor(k / 25.0).cast("string"), F.lit("x")),
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

# Below this zone count a broadcast nested-loop theta join wins (the
# per-row probe over a handful of rectangles is ~free and there is no
# cell-explode overhead); at or above it the grid-bucketed equi-join
# takes over. The r6 ×100 A/B measured the crossover direction at both
# ends: 4 zones → grid LOSES (2.63 s vs 2.87 s total is within the
# scan floor, and the explode adds a stage); 2048 zones → theta is
# O(points × zones) row-compares while grid is O(points + candidates)
# (r7 A/B numbers in BASELINE.md "bbox many-zone switch").
_BBOX_GRID_MIN_ZONES = 64


def bbox_join_plan(
    spark: SparkSession, ev: DataFrame, zone_rows: list, strategy: str | None = None
) -> DataFrame:
    """Adaptive point-in-rectangle join over `ev(x double, y int)`.

    `zone_rows` is the (zone, xlo, xhi, ylo, yhi) dim — driver-side
    literals here, a collected broadcast-small dim in production; the
    strategy switch and grid sizing read ONLY this list, never the
    point table.

    * theta (``len < _BBOX_GRID_MIN_ZONES``): broadcast nested-loop —
      every point row tests every zone. Optimal for a when-chain-sized
      dim; quadratic in zones.
    * grid: derive cell widths from the MEDIAN zone extent (cells per
      zone ~2 per axis), explode each zone to the grid cells its box
      covers, then broadcast-HASH-join points on the exact cell key
      ``(floor(x/Wx), floor(y/Wy))`` with the range test as a residual
      filter — the interval-overlap bucket trick in 2-D. Probe cost
      per point is the hash lookup + candidates in ITS cell only, so
      cost is O(points + Σ cell-candidates) instead of
      O(points × zones). The explode stays driver-invisible (a Spark
      ``sequence``/``explode`` over the broadcast dim): ~4-6 cells per
      zone at median sizing, broadcastable into the millions of zones.
    """
    zones = spark.createDataFrame(
        zone_rows, "zone string, xlo double, xhi double, ylo int, yhi int"
    )
    if strategy is None:
        strategy = "grid" if len(zone_rows) >= _BBOX_GRID_MIN_ZONES else "theta"
    if strategy == "theta":
        cond = (
            (ev.x >= zones.xlo)
            & (ev.x < zones.xhi)
            & (ev.y >= zones.ylo)
            & (ev.y < zones.yhi)
        )
        j = ev.join(F.broadcast(zones), cond)
    else:
        # median zone width per axis → ~2 covered cells per zone per
        # axis; max() guards degenerate all-zero-width dims
        def _median(vals: list[float]) -> float:
            s = sorted(vals)
            return s[len(s) // 2]

        wx = max(_median([r[2] - r[1] for r in zone_rows]), 1e-9)
        wy = max(_median([float(r[4] - r[3]) for r in zone_rows]), 1e-9)
        cells = (
            zones.withColumn(
                "cx",
                F.explode(
                    F.sequence(
                        F.floor(F.col("xlo") / wx), F.floor(F.col("xhi") / wx)
                    )
                ),
            )
            .withColumn(
                "cy",
                F.explode(
                    F.sequence(
                        F.floor(F.col("ylo") / wy), F.floor(F.col("yhi") / wy)
                    )
                ),
            )
        )
        pts = ev.withColumn("cx", F.floor(ev.x / wx)).withColumn(
            "cy", F.floor(ev.y / wy)
        )
        j = pts.join(F.broadcast(cells), ["cx", "cy"]).where(
            (F.col("x") >= F.col("xlo"))
            & (F.col("x") < F.col("xhi"))
            & (F.col("y") >= F.col("ylo"))
            & (F.col("y") < F.col("yhi"))
        )
    return j.groupBy("zone").agg(F.count(F.lit(1)).alias("n_points"))


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
    broadcast; at 100 TB the point table never shuffles.

    ADAPTIVE (r7, via ``bbox_join_plan``): with the 4-zone literal dim
    this plans the broadcast nested-loop theta join (optimal — the r6
    ×100 A/B showed the grid form loses at 4 zones, 2.63 s vs a 2.87 s
    total whose scan + get_json_object floor alone is 1.33 s); at
    ``_BBOX_GRID_MIN_ZONES``+ zones the SAME call plans the
    grid-bucketed broadcast equi-join, which the r7 2048-zone ×100 A/B
    measured as the production path (theta's O(points × zones)
    row-compares vs grid's hash probe — BASELINE.md "bbox many-zone
    switch")."""
    ev = with_json_field(load(spark, sf_dir, "events"), "y", "props", "k", "int").select(
        F.col("value").alias("x"), "y"
    )
    return bbox_join_plan(spark, ev, _ZONES)


# ---------------------------------------------------------------------------
# Real point-in-polygon (ray casting) on synthesized lat/lon
# ---------------------------------------------------------------------------

# Austin-ish coordinates derived deterministically from (value,
# user_id); the polygon table is literal, broadcast-sized, and one
# polygon is deliberately NON-convex (L-shape) so the ray-cast parity
# is exercised beyond what bbox tests cover.
_PIP_POLYGONS = [
    (
        "central",  # non-convex L-shape
        [
            (-97.80, 30.15), (-97.65, 30.15), (-97.65, 30.30),
            (-97.72, 30.30), (-97.72, 30.42), (-97.80, 30.42),
        ],
    ),
    ("east_wedge", [(-97.64, 30.12), (-97.56, 30.20), (-97.64, 30.38)]),
]


def _pip_sql(poly) -> str:
    """PNPOLY crossing-parity test as DuckDB SQL over (x, y) columns.

    `e0` suffixes force DOUBLE literals (a bare decimal is DECIMAL in
    DuckDB, whose division-by-zero on horizontal edges would error;
    IEEE doubles give inf/nan, which the crossing conjunction then
    discards identically on both engines)."""
    n = len(poly)
    terms = []
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        lx1, ly1, lx2, ly2 = (f"({v!r}e0)" for v in (x1, y1, x2, y2))
        terms.append(
            f"(CASE WHEN (({ly1} > y) <> ({ly2} > y)) AND "
            f"x < ({lx2} - {lx1}) * (y - {ly1}) / ({ly2} - {ly1}) + {lx1} "
            f"THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _pip_col(poly, x, y):
    """Same PNPOLY parity test as a Spark Column expression."""
    total = F.lit(0)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        crosses = ((F.lit(y1) > y) != (F.lit(y2) > y)) & (
            x
            < (F.lit(x2) - F.lit(x1)) * (y - F.lit(y1)) / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        total = total + F.when(crosses, 1).otherwise(0)
    return total % 2 == 1


_PIP_ZONE_SQL = (
    "CASE WHEN "
    + _pip_sql(_PIP_POLYGONS[0][1])
    + f" THEN '{_PIP_POLYGONS[0][0]}' WHEN "
    + _pip_sql(_PIP_POLYGONS[1][1])
    + f" THEN '{_PIP_POLYGONS[1][0]}' ELSE 'outside' END"
)


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT (-97.95e0) + (abs(value) % 40.0e0) / 100.0e0 AS x,
             30.10e0 + (user_id % 40) / 100.0e0 AS y,
             value
      FROM events
    )
    SELECT {_PIP_ZONE_SQL} AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(SUM(value), 4) AS sum_value
    FROM pts
    GROUP BY 1
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL point-in-polygon: ray casting (PNPOLY crossing parity)
    against literal polygons, one non-convex — the reference's actual
    spatial core (trip endpoints -> council district / census tract,
    [P high], SURVEY §2.9). Testdata has no lat/lon, so coordinates
    are synthesized deterministically from (value, user_id) with the
    identical formula in the oracle.

    Scale shape: the polygon set is compiled INTO the expression (the
    per-edge crossing tests unroll into one codegen stage — for a
    real district table of a few hundred polygons you'd broadcast the
    vertex table and F.aggregate over it instead), so the point table
    is never shuffled before the final combinable agg: a pure map at
    100 TB, same as geo_grid_bin/geo_hex_bin. Horizontal edges give
    IEEE inf/nan in the slope term on both engines; the crossing
    conjunction's first clause is then false, so parity is exact."""
    ev = load(spark, sf_dir, "events")
    # Stage (x, y) in their own Project: the ~45 per-row references
    # the unrolled edge tests make would otherwise each re-evaluate
    # the full coordinate derivation (Catalyst CSE gap — the
    # geo_hex_bin finding; ×100 A/B: 1.08 s -> 0.375 s).
    x = F.lit(-97.95) + (F.abs(F.col("value")) % F.lit(40.0)) / F.lit(100.0)
    y = F.lit(30.10) + (F.col("user_id") % 40) / F.lit(100.0)
    pts = ev.select(x.alias("x"), y.alias("y"), "value")
    zone = (
        F.when(_pip_col(_PIP_POLYGONS[0][1], F.col("x"), F.col("y")), _PIP_POLYGONS[0][0])
        .when(_pip_col(_PIP_POLYGONS[1][1], F.col("x"), F.col("y")), _PIP_POLYGONS[1][0])
        .otherwise("outside")
    )
    return (
        pts.select(zone.alias("zone"), "value")
        .groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
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
      SELECT x,
             (sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / {_HEX_SIZE} AS q,
             (2.0 / 3.0 * y) / {_HEX_SIZE} AS r
      FROM pts
    ), cube AS (
      SELECT x, q, r, -q - r AS s,
             CASE WHEN q >= 0 THEN floor(q + 0.5) ELSE -floor(0.5 - q) END AS rq,
             CASE WHEN r >= 0 THEN floor(r + 0.5) ELSE -floor(0.5 - r) END AS rr,
             CASE WHEN -q - r >= 0 THEN floor(-q - r + 0.5)
                  ELSE -floor(0.5 - (-q - r)) END AS rs
      FROM axial
    ), resid AS (
      SELECT x, rq, rr, rs,
             abs(rq - q) AS dq, abs(rr - r) AS dr, abs(rs - s) AS ds
      FROM cube
    ), fixed AS (
      SELECT x,
             CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END AS hq,
             CASE WHEN dr > dq AND dr >= ds AND NOT (dq > dr AND dq > ds)
                  THEN -rq - rs ELSE rr END AS hr
      FROM resid
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
    aggregation, exactly like geo_grid_bin.

    Two ×100-measured performance rules shape the form (the naive
    single-projection F.round version ran 10.3 s / 10M rows):
    (1) STAGED projections — Catalyst does not de-duplicate
    non-cheap expressions referenced repeatedly inside ONE
    projection (the fn_json_extract finding), and the cube-rounding
    residual logic references each rounded coordinate many times, so
    q/r/s → rq/rr/rs → dq/dr/ds → hq/hr are materialized one
    Project per tier (CollapseProject keeps tiers that would
    duplicate non-cheap producers) — every un-staged reference
    re-evaluated the FULL upstream subtree, sqrt chain and JSON
    parse included (a single per-row round is itself nearly free:
    0.23 s vs 0.31 s scan baseline over 10M rows, micro-A/B'd);
    (2) the rounding is the branch-free SHARED half-away tree
    floor(|v|+0.5)·sign — mirroring one floor-based IEEE tree in
    BOTH engines is stronger parity: exact agreement by
    construction (hazard rule 6), not an assumption that two
    engines' round() tie behavior matches."""
    ev = with_json_field(load(spark, sf_dir, "events"), "_yj", "props", "k", "int")

    def rnd(v):
        return F.when(v >= 0, F.floor(v + 0.5)).otherwise(-F.floor(0.5 - v))

    x = F.col("value")
    y = F.col("_yj")  # staged once: q and r both reference it
    axial = ev.select(
        x.alias("x"),
        ((F.sqrt(F.lit(3.0)) / 3.0 * x - F.lit(1.0) / 3.0 * y) / _HEX_SIZE).alias("q"),
        ((F.lit(2.0) / 3.0 * y) / _HEX_SIZE).alias("r"),
    )
    cube = axial.select(
        "x", "q", "r",
        (-F.col("q") - F.col("r")).alias("s"),
        rnd(F.col("q")).alias("rq"),
        rnd(F.col("r")).alias("rr"),
        rnd(-F.col("q") - F.col("r")).alias("rs"),
    )
    resid = cube.select(
        "x", "rq", "rr", "rs",
        F.abs(F.col("rq") - F.col("q")).alias("dq"),
        F.abs(F.col("rr") - F.col("r")).alias("dr"),
        F.abs(F.col("rs") - F.col("s")).alias("ds"),
    )
    dq, dr, ds = F.col("dq"), F.col("dr"), F.col("ds")
    rq, rr, rs = F.col("rq"), F.col("rr"), F.col("rs")
    hq = F.when((dq > dr) & (dq > ds), -rr - rs).otherwise(rq)
    hr = F.when(
        (dr > dq) & (dr >= ds) & ~((dq > dr) & (dq > ds)), -rq - rs
    ).otherwise(rr)
    return (
        resid.select(
            "x", hq.cast("int").alias("hex_q"), hr.cast("int").alias("hex_r")
        )
        .groupBy("hex_q", "hex_r")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("x"), 4).alias("sum_value"),
        )
    )
