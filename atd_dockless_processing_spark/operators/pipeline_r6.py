"""Round-6 extensions — SURVEY.md §2.20.

Operators closing the round-5 verdict's two remaining capability gaps
(reference parity per SURVEY §0: the checkout was empty, so each row
cites the public capability it generalizes):

- ``evt_state_intervals`` — the MDS *status_changes* / availability
  surface ([P high]): the reference processes vehicle availability
  events beside trips — each status event opens a state interval that
  holds until the device's next event, and the published product is
  time-in-state (availability-hours) per (state, day). Derived with
  lag/lead per device, split exactly at UTC day boundaries, summed as
  exact integer microseconds.
- ``etl_publish_funnel`` — the reference's whole cron-orchestrated
  lifecycle (ingest → validate → dedup → local-tz derive → grid-bin →
  k-anonymity suppress → publish) composed as ONE keyed Spark plan
  with no driver round-trips ([P high], SURVEY §3.1): proves the
  engine's stages compose the way the reference's shell pipeline
  chains its scripts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# ---------------------------------------------------------------------------
# evt_state_intervals — MDS availability: time-in-state per (state, day)
# ---------------------------------------------------------------------------


@query(
    "evt_state_intervals",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type AS state,
             epoch_us(ts) AS t0,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS t1,
             CAST(ts AS DATE) AS d0,
             CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS DATE) AS d1
      FROM events
    ), days AS (
      SELECT user_id, state, t0, t1, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM iv WHERE t1 IS NOT NULL
    ), clipped AS (
      SELECT state, CAST(day AS DATE) AS day, user_id,
             LEAST(t1, epoch_us(CAST(day AS TIMESTAMP) + INTERVAL 1 DAY))
               - GREATEST(t0, epoch_us(CAST(day AS TIMESTAMP))) AS overlap_us
      FROM days
    )
    SELECT state, day,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_devices,
           CAST(SUM(overlap_us) AS BIGINT) AS state_us,
           ROUND(SUM(overlap_us) / 3600000000.0, 4) AS state_hours
    FROM clipped
    WHERE overlap_us > 0
    GROUP BY state, day
    """,
)
def evt_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDS availability rollup ([P high]: the status_changes half of
    the MDS spec the reference consumes beside trips): each event puts
    its device (user_id) into a state (event_type) that holds until
    the device's next event; the published product is exact
    time-in-state per (state, UTC day), with intervals SPLIT at day
    boundaries so a state held across midnight is attributed to both
    days pro-rata — where a naive "attribute to start day" rollup is
    wrong for exactly the long-idle intervals that dominate
    availability.

    Plan shape: one window exchange on user_id (lead), then a
    map-side day-sequence explode (bounded: span-days per interval,
    no corpus-wide explode), then one combinable agg exchange on
    (state, day) — the distinct-device count rides the same exchange
    via Spark's 2-phase distinct expansion. All durations are exact
    integer microseconds (unix_micros both engines; BIGINT sums
    HUGEINT-cast per the house rule); hours divide the SAME exact
    integer by the same literal on both engines, so the rounded
    double is bit-identical. At 100 TB: devices shard the window,
    (state, day) is low-cardinality with map-side partial agg — no
    skew (states are a handful, days are bounded)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("t0"),
        F.lead(F.unix_micros("ts")).over(w).alias("t1"),
        F.to_date("ts").alias("d0"),
        F.lead(F.to_date("ts")).over(w).alias("d1"),
    ).where(F.col("t1").isNotNull())
    days = iv.select(
        "user_id",
        "state",
        "t0",
        "t1",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    day_start = F.unix_micros(F.col("day").cast("timestamp"))
    day_end = F.unix_micros(F.date_add("day", 1).cast("timestamp"))
    overlap = F.least("t1", day_end) - F.greatest("t0", day_start)
    return (
        days.select("state", "day", "user_id", overlap.alias("overlap_us"))
        .where(F.col("overlap_us") > 0)
        .groupBy("state", "day")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.countDistinct("user_id").alias("n_devices"),
            F.sum("overlap_us").alias("state_us"),
            F.round(F.sum("overlap_us") / 3600000000.0, 4).alias("state_hours"),
        )
    )


# ---------------------------------------------------------------------------
# etl_publish_funnel — the dockless publication lifecycle as ONE plan
# ---------------------------------------------------------------------------

_FUNNEL_K = 5  # k-anonymity floor, same as geo_od_matrix


@query(
    "etl_publish_funnel",
    oracle=f"""
    WITH validated AS (
      SELECT *
      FROM events
      WHERE ts IS NOT NULL AND value >= 0 AND value < 10000
        AND json_extract_string(props, '$.k') IS NOT NULL
    ), deduped AS (
      SELECT * FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type, date_trunc('minute', ts)
                 ORDER BY ts, event_id) AS rn
        FROM validated
      ) WHERE rn = 1
    ), derived AS (
      SELECT timezone('America/Chicago',
                      timezone('UTC', CAST(ts AS TIMESTAMP))) AS lts,
             CONCAT(CAST(CAST(FLOOR(value / 50) AS BIGINT) AS VARCHAR), '_',
                    CAST(CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 25.0) AS BIGINT) AS VARCHAR)) AS cell_id,
             value
      FROM deduped
    )
    SELECT CAST(lts AS DATE) AS local_date, cell_id,
           CAST(COUNT(*) AS BIGINT) AS n_trips,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS sum_value
    FROM derived
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_FUNNEL_K}
    """,
)
def etl_publish_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full publication lifecycle as ONE Spark plan
    ([P high], SURVEY §3.1: the cron pipeline is ingest → validate →
    dedupe re-delivered records → derive local-time calendar fields →
    bin to coarse geography → suppress sparse cells → publish):

      1. validate  — range/null screens (``flt_range`` shape; also
         enforces props.$.k non-null, the ADVICE r5 precondition);
      2. dedup     — provider re-delivery dedup: first record per
         (device, type, minute) by ROW_NUMBER (``llm_dedup_exact``
         keep-first shape on a composite business key);
      3. tz-derive — America/Chicago local date
         (``fn_date_derive_tz`` semantics);
      4. grid-bin  — the ``geo_grid_bin`` floor-cell formula;
      5. suppress  — k-anonymity HAVING floor (``geo_od_matrix``);
      6. publish   — (local_date, cell, n, exact DECIMAL value sum).

    Proves the stages compose without a driver round-trip: the whole
    funnel is validate-filter (scan-pushed) → ONE window exchange on
    the dedup key → map-side derive → ONE combinable agg exchange,
    i.e. 2 shuffles total at any scale. The dedup window partitions
    by (device, type, minute) — high-cardinality, skew-free; the agg
    key (day, cell) is low-cardinality with map-side partial agg."""
    ev = load(spark, sf_dir, "events")
    # project the JSON field once (validate null-screen + cell derive
    # both use it; Catalyst only de-duplicates cheap expressions)
    ev = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").alias("k"),
    )
    k = F.col("k")
    validated = ev.where(
        F.col("ts").isNotNull()
        & (F.col("value") >= 0)
        & (F.col("value") < 10000)
        & k.isNotNull()
    )
    dw = Window.partitionBy(
        "user_id", "event_type", F.date_trunc("minute", "ts")
    ).orderBy("ts", "event_id")
    deduped = validated.withColumn("rn", F.row_number().over(dw)).where(
        F.col("rn") == 1
    )
    lts = F.from_utc_timestamp("ts", "America/Chicago")
    cell = F.concat_ws(
        "_",
        F.floor(F.col("value") / 50).cast("string"),
        F.floor(k.cast("int") / 25.0).cast("string"),
    )
    return (
        deduped.select(
            lts.cast("date").alias("local_date"),
            cell.alias("cell_id"),
            "value",
        )
        .groupBy("local_date", "cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .where(F.col("n_trips") >= _FUNNEL_K)
    )
