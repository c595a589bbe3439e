"""Round-7 operators — SURVEY.md §2.27.

Training-data curation additions past the r6 surface. Exactness
discipline follows the house rules: cross-engine doubles only through
identical single correctly-rounded IEEE ops (sqrt/mul/div — hazard
#6), fixed-point integer staging instead of double→DECIMAL casts
(hazard #8), DuckDB HUGEINT sums cast back (hazard #1), and the
shared floor-based half-away rounding tree (hazard #14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
