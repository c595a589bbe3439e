"""Round-7 operators — SURVEY.md §2.27.

Training-data curation additions past the r6 surface. Exactness
discipline follows the house rules: cross-engine doubles only through
identical single correctly-rounded IEEE ops (sqrt/mul/div — hazard
#6), fixed-point integer staging instead of double→DECIMAL casts
(hazard #8), DuckDB HUGEINT sums cast back (hazard #1), and the
shared floor-based half-away rounding tree (hazard #14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.json_fast import with_json_field
from ..registry import query
from ..tables import load

_MIX_BUDGET = 10_000  # total documents the resampled mix should hold


@query(
    "llm_temperature_mixture",
    oracle=f"""
    WITH per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5)
                  AS BIGINT) AS w_fixed
      FROM documents GROUP BY lang
    ), tot AS (SELECT SUM(w_fixed) AS tw FROM per)
    SELECT lang, n_docs, w_fixed,
           ROUND(CAST(w_fixed AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS share,
           CAST(floor((CAST(w_fixed AS DOUBLE) / CAST(tw AS DOUBLE))
                      * {_MIX_BUDGET} + 0.5) AS BIGINT) AS target_docs
    FROM per, tot
    """,
)
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling plan (α = 0.5): the
    multilingual-corpus balancing technique ([P high] — sampling
    languages proportional to n^α flattens the head so low-resource
    languages are not drowned; the α=0.5 square-root form is the
    standard published choice). Per-language doc counts → weight
    n^0.5 → normalized share → integer target at a fixed budget.

    Cross-engine exactness: sqrt is a correctly-rounded IEEE op
    (hazard #6) so both engines produce the identical double; the
    weight is then staged to FIXED POINT (floor(sqrt·10⁶ + 0.5) — the
    shared half-away tree, hazard #14) so the normalizing sum is an
    exact integer sum (never a double accumulation whose order could
    differ, and never a double→DECIMAL cast, hazard #8); share and
    target are single correctly-rounded div/mul on identical inputs.
    Plan: one documents scan with a map-side-combinable count agg
    (the exchange carries ~one row per language), a 1-row total
    attached by broadcast cross-join — the same shape at 100 TB."""
    per = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang",
            "n_docs",
            F.floor(
                F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w_fixed"),
        )
    )
    tot = per.agg(F.sum("w_fixed").alias("tw"))
    share = F.col("w_fixed").cast("double") / F.col("tw").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "w_fixed",
            F.round(share, 6).alias("share"),
            F.floor(share * F.lit(float(_MIX_BUDGET)) + F.lit(0.5))
            .cast("long")
            .alias("target_docs"),
        )
    )


# ---------------------------------------------------------------------------
# geo_trip_quality_flags — per-user breadcrumb-leg validation screen
# ---------------------------------------------------------------------------

_TELEPORT_DIST = 200.0  # units; ~p99 of the leg distribution
_GAP_BREAK_US = 172_800_000_000  # 48 h in µs — route-continuity break
_SPEED_MAX = 0.02  # units/second; fast tail of dist/dt


@query(
    "geo_trip_quality_flags",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, ts, event_id, value AS x,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS y
      FROM events
    ), legs AS (
      SELECT user_id,
             sqrt(power(x - LAG(x) OVER w, 2)
                  + power(y - LAG(y) OVER w, 2)) AS dist,
             epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS dt_us
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(dist) AS BIGINT) AS n_legs,
           CAST(SUM(CASE WHEN dist > {_TELEPORT_DIST}e0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_teleport,
           CAST(SUM(CASE WHEN dt_us > {_GAP_BREAK_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_breaks,
           CAST(SUM(CASE WHEN dt_us > 0 AND
                              dist / (CAST(dt_us AS DOUBLE) / 1000000e0)
                                > {_SPEED_MAX}e0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_speeding
    FROM legs
    WHERE dist IS NOT NULL
    GROUP BY user_id
    """,
)
def geo_trip_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user breadcrumb-leg VALIDATION screen — the reference's
    trip-sanity step ([P high]: provider trip feeds carry GPS jumps,
    stale timestamps, and physically impossible speeds that must be
    flagged before publication): per consecutive leg on the declared
    (value, props.k) coordinate plane, flag teleports (dist >
    threshold), route-continuity breaks (Δt > 48 h), and speeding
    (dist/Δt above the max) — counted per user.

    Cross-engine exactness: dist is the geo_trip_length sqrt/pow
    tree (identical doubles); Δt is an exact BIGINT in µs
    (unix_micros / epoch_us — never a double subtraction, hazard
    #10's epoch rule); the speed compare divides identical doubles
    by identical positive doubles (single correctly-rounded ops) and
    is GUARDED by dt_us > 0 on BOTH engines — an unguarded zero-Δt
    leg would be NULL-comparison false on Spark but inf > max = true
    on DuckDB (hazard #3). Plan: one user_id window exchange (both
    lags share the sort), flags map-side, combinable agg on the same
    key — geo_trip_length's exact plan family, so its measured
    1.10× ×100 row prices this shape too."""
    ev = with_json_field(
        load(spark, sf_dir, "events"), "y", "props", "k", "int"
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("x"),
        "y",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dist = F.sqrt(
        F.pow(F.col("x") - F.lag("x").over(w), 2)
        + F.pow(F.col("y") - F.lag("y").over(w), 2)
    )
    dt_us = F.col("t_us") - F.lag("t_us").over(w)
    legs = ev.select(
        "user_id", dist.alias("dist"), dt_us.alias("dt_us")
    ).where(F.col("dist").isNotNull())
    speed_bad = (F.col("dt_us") > 0) & (
        F.col("dist") / (F.col("dt_us").cast("double") / F.lit(1000000.0))
        > F.lit(_SPEED_MAX)
    )
    return legs.groupBy("user_id").agg(
        F.count("dist").alias("n_legs"),
        F.sum(
            F.when(F.col("dist") > F.lit(_TELEPORT_DIST), 1).otherwise(0)
        ).alias("n_teleport"),
        F.sum(
            F.when(F.col("dt_us") > F.lit(_GAP_BREAK_US), 1).otherwise(0)
        ).alias("n_gap_breaks"),
        F.sum(F.when(speed_bad, 1).otherwise(0)).alias("n_speeding"),
    )
