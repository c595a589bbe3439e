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

from ..functions.json_fast import with_json_field
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
    ev = with_json_field(ev, "k", "props", "k", "string").select(
        "event_id", "ts", "user_id", "event_type", "value", "k"
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


# ---------------------------------------------------------------------------
# agg_quantile_sketch — deterministic mergeable quantile sketch
# ---------------------------------------------------------------------------

_QSK_W = 215.0  # bucket width; 512 buckets cover [0, 110080) ⊇ price range
_QSK_NB = 512
_QSK_QS = (0.5, 0.9, 0.99, 0.999)


@query(
    "agg_quantile_sketch",
    oracle=f"""
    WITH buckets AS (
      SELECT CAST(LEAST(FLOOR(l_extendedprice / {_QSK_W}e0), {_QSK_NB - 1}) AS INTEGER) AS b,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM lineitem
      GROUP BY 1
    ), cum AS (
      SELECT b, cnt,
             CAST(SUM(cnt) OVER (ORDER BY b) AS DOUBLE) AS cum,
             CAST(SUM(cnt) OVER () AS DOUBLE) AS n
      FROM buckets
    ), qs(q) AS (VALUES {', '.join(f'({q}e0)' for q in _QSK_QS)})
    SELECT q,
           ROUND(b * {_QSK_W}e0 + (q * n - (cum - cnt)) / cnt * {_QSK_W}e0, 4)
             AS est_value,
           CAST(n AS BIGINT) AS n_rows
    FROM cum CROSS JOIN qs
    WHERE cum >= q * n AND (cum - cnt) < q * n
    """,
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MERGEABLE quantile sketch (the third member of
    the sketch family beside agg_hll_deterministic and
    agg_cms_heavy_hitters): fixed 512-bucket equi-width histogram
    over l_extendedprice, quantile estimates by linear interpolation
    inside the straddling bucket — the histogram-sketch design
    production systems use when percentile_approx's engine-specific
    sketch (cf. rows-only agg_approx_distinct) can't be
    cross-checked. Bucket counts are pure integer state that
    SUM-combines across partitions/shards/days; estimate error is
    bounded by the bucket width.

    Equi-width (not DDSketch log-buckets) on purpose: the bucket
    index is floor(x/w) — an identical IEEE expression tree on both
    engines, bit-identical everywhere — while log-bucketing's
    floor(ln x/ln γ) inherits the cross-engine ln() last-ulp hazard
    (the dq_psi_drift precedent). At 100 TB: ONE combinable agg
    exchange carrying ≤512·n_partitions slim rows; the cumsum/
    interpolation windows touch ≤512 rows (the single-partition
    window is bounded state, not corpus state). All interpolation
    arithmetic is DOUBLE on both engines (DuckDB SUM(BIGINT) would
    be HUGEINT — the house cast rule)."""
    li = load(spark, sf_dir, "lineitem")
    b = F.least(
        F.floor(F.col("l_extendedprice") / F.lit(_QSK_W)), F.lit(_QSK_NB - 1)
    ).cast("int")
    buckets = li.groupBy(b.alias("b")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "b",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    qs = spark.createDataFrame([(q,) for q in _QSK_QS], "q double")
    rank = F.col("q") * F.col("n")
    prev = F.col("cum") - F.col("cnt")
    return (
        cum.crossJoin(F.broadcast(qs))
        .where((F.col("cum") >= rank) & (prev < rank))
        .select(
            "q",
            F.round(
                F.col("b") * F.lit(_QSK_W) + (rank - prev) / F.col("cnt") * F.lit(_QSK_W),
                4,
            ).alias("est_value"),
            F.col("n").cast("bigint").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# llm_semdedup — cluster-blocked semantic (embedding) dedup
# ---------------------------------------------------------------------------

_SEM_T = 0.3  # cosine threshold; synthetic embeddings are near-random
# unit vectors (within-cluster cos: p50 0.001, p99 0.295, max 0.475 at
# sf0.01), so 0.3 marks the "suspiciously similar" tail — 176/500
# vectors removed at sf0.01, comfortably non-vacuous at every SF


@query(
    "llm_semdedup",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ), c0 AS (
      SELECT label AS cid, array_agg(cv ORDER BY i) AS cvec FROM (
        SELECT label, i, AVG(ve[i]) AS cv FROM v, range(1, 65) t(i) GROUP BY label, i
      ) GROUP BY label
    ), asg AS (
      SELECT vec_id, ve, cid FROM (
        SELECT v.vec_id, v.ve, c0.cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
                 list_dot_product(ve, ve) + list_dot_product(cvec, cvec)
                   - 2 * list_dot_product(ve, cvec), cid) AS rn
        FROM v CROSS JOIN c0
      ) WHERE rn = 1
    ), removed AS (
      SELECT DISTINCT b.vec_id, b.cid
      FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.ve, b.ve)
            / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve)))
            >= {_SEM_T}
    )
    SELECT CAST(asg.cid AS INTEGER) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(removed.vec_id) AS BIGINT) AS n_removed,
           CAST(COUNT(*) - COUNT(removed.vec_id) AS BIGINT) AS n_kept
    FROM asg LEFT JOIN removed
      ON asg.vec_id = removed.vec_id AND asg.cid = removed.cid
    GROUP BY 1
    """,
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public
    method): cluster the embeddings, then WITHIN each cluster drop
    every vector that has a lower-id neighbor above a cosine
    threshold — the representative-keeping rule made deterministic
    (keep-min-id, the same convention as llm_dedup_exact). Cluster
    assignment is the deterministic per-label-centroid argmin step
    shared with llm_kmeans_step.

    The whole point at 100 TB: candidate pairs are generated per
    CLUSTER (a self-join on cid), never corpus-wide — with k sized
    ~n/1000 the within-cluster quadratic is bounded, which is exactly
    how the published method scales, and the blocking key is an
    equi-join column so Spark shuffles each cluster to one place
    (skew-safe: cluster sizes are centroid-balanced). Plan shape
    (audited): the argmin assignment is MAP-SIDE — all k centroids
    ride one broadcast row and the nearest cid is an ``array_min``
    over a per-row (d2, cid) struct array, the ``geo_nearest_hub``
    pattern — so the corpus is never shuffled for assignment (the
    obvious crossJoin + row_number window would shuffle n·k rows);
    the removed-count groupBy rides the self-join's cid partitioning
    (no extra exchange). Reports per-cluster corpus/removed/kept
    counts; cosine/d2 values come from identical IEEE expression
    trees on both engines so the threshold compare cannot diverge."""
    from .dedup_ann import _EMB_DIM
    from .llm import _as_double, _dot

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("ve")
    )
    c0 = (
        v.groupBy(F.col("label").alias("cid"))
        .agg(*[F.avg(F.col("ve")[i]).alias(f"c{i}") for i in range(_EMB_DIM)])
        .select("cid", F.array(*[F.col(f"c{i}") for i in range(_EMB_DIM)]).alias("cvec"))
    )
    # all k centroids as ONE broadcast row; argmin by (d2, cid) struct
    # ordering == the oracle's ROW_NUMBER(ORDER BY d2, cid)
    cents = c0.agg(F.collect_list(F.struct("cid", "cvec")).alias("cents"))

    def d2_of(c):
        return (
            _dot(F.col("ve"), F.col("ve"))
            + _dot(c["cvec"], c["cvec"])
            - 2 * _dot(F.col("ve"), c["cvec"])
        )

    nearest = F.array_min(
        F.transform(
            "cents", lambda c: F.struct(d2_of(c).alias("d2"), c["cid"].alias("cid"))
        )
    )["cid"]
    asg = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "ve", nearest.alias("cid")
    )
    a = asg.alias("a")
    b = asg.alias("b")
    cos = _dot(F.col("a.ve"), F.col("b.ve")) / (
        F.sqrt(_dot(F.col("a.ve"), F.col("a.ve")))
        * F.sqrt(_dot(F.col("b.ve"), F.col("b.ve")))
    )
    # count REMOVED vectors per cluster directly from the pair stream:
    # count_distinct(b.vec_id) per cid rides the join's cid
    # partitioning — no standalone distinct exchange, no re-join
    # against the corpus (b is removed iff ANY lower-id a matches)
    flagged = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= _SEM_T)
        .groupBy(F.col("a.cid").alias("cid"))
        .agg(F.count_distinct(F.col("b.vec_id")).alias("n_removed"))
    )
    return (
        asg.groupBy(F.col("cid").cast("int").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .join(
            flagged.select(F.col("cid").cast("int").alias("cluster_id"), "n_removed"),
            "cluster_id",
            "left",
        )
        .select(
            "cluster_id",
            "n_vecs",
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            (F.col("n_vecs") - F.coalesce("n_removed", F.lit(0))).alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# agg_bloom_membership — deterministic mergeable Bloom membership sketch
# ---------------------------------------------------------------------------

_BLM_M = 262144  # bits (2^18); kn/m ≈ 0.23 at sf0.1 → FP ≈ 0.2%
_BLM_K = 4  # hash functions

# shared md5 bit-position fragment (house pattern: md5 of the string
# key is byte-identical across engines; the 15-hex-digit prefix is a
# 60-bit non-negative int on both)
_BLM_POS_SQL = (
    "CAST('0x' || substr(md5(CAST({key} AS VARCHAR) || ':' || CAST({i} AS VARCHAR)), 1, 15)"
    f" AS BIGINT) % {_BLM_M}"
)


@query(
    "agg_bloom_membership",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
    ), bits AS (
      SELECT DISTINCT {_BLM_POS_SQL.format(key="k", i="i")} AS pos
      FROM keys, range(0, {_BLM_K}) t(i)
    ), bounds AS (
      SELECT MIN(o_custkey) AS mn, MAX(o_custkey) AS mx FROM orders
    ), probes AS (
      SELECT probe_label, probe_key, actual FROM bounds, LATERAL (VALUES
        ('present_min', mn, 1), ('present_max', mx, 1),
        ('absent_below', mn - 1, 0), ('absent_above', mx + 1, 0),
        ('absent_neg7', CAST(-7 AS BIGINT), 0), ('absent_neg13', CAST(-13 AS BIGINT), 0)
      ) v(probe_label, probe_key, actual)
    ), probe_bits AS (
      SELECT probe_label, probe_key, actual,
             {_BLM_POS_SQL.format(key="probe_key", i="i")} AS pos
      FROM probes, range(0, {_BLM_K}) t(i)
    ), hits AS (
      SELECT probe_label, probe_key, actual,
             COUNT(bits.pos) AS n_hit
      FROM probe_bits LEFT JOIN bits USING (pos)
      GROUP BY 1, 2, 3
    )
    SELECT probe_label, probe_key,
           CAST(actual AS INTEGER) AS actual,
           CAST(CASE WHEN n_hit = {_BLM_K} THEN 1 ELSE 0 END AS INTEGER) AS claimed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_set_bits
    FROM hits
    """,
)
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable BLOOM membership sketch — the fourth
    sketch-family member (HLL = distinct, CMS = frequency, histogram
    = quantiles, Bloom = membership): every o_custkey sets K=4 bit
    positions derived from md5 (the cross-engine-deterministic house
    hash); a probe is CLAIMED present iff all its K positions are
    set. Probes are constructed so ground truth is analytic (min/max
    exist by definition; min-1, max+1 and negatives cannot), letting
    the report show claimed-vs-actual — the one-sided Bloom error
    (false positives possible, false negatives impossible).

    Scale shape: the bit set is bounded state (≤m = 262144 slim
    rows, reached after ONE map-side-combinable distinct exchange);
    it OR-merges across partitions/shards/days like the other
    sketches (union + distinct ≡ bitwise OR). Probe evaluation
    touches K·n_probes = 24 rows. The 100 TB use is the classic
    pre-join/existence filter: ship the ≤32 KB bitmap, not the key
    set."""
    orders = load(spark, sf_dir, "orders")

    def pos(key_col, i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key_col.cast("string"), F.lit(f":{i}"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % _BLM_M
        )

    keys = orders.select(F.col("o_custkey").alias("k")).distinct()
    bits = (
        keys.select(
            F.explode(F.array(*[pos(F.col("k"), i) for i in range(_BLM_K)])).alias(
                "pos"
            )
        )
        .distinct()
    )
    bounds = orders.agg(
        F.min("o_custkey").alias("mn"), F.max("o_custkey").alias("mx")
    )
    probes = bounds.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("present_min").alias("probe_label"),
                    F.col("mn").alias("probe_key"),
                    F.lit(1).alias("actual"),
                ),
                F.struct(
                    F.lit("present_max").alias("probe_label"),
                    F.col("mx").alias("probe_key"),
                    F.lit(1).alias("actual"),
                ),
                F.struct(
                    F.lit("absent_below").alias("probe_label"),
                    (F.col("mn") - 1).alias("probe_key"),
                    F.lit(0).alias("actual"),
                ),
                F.struct(
                    F.lit("absent_above").alias("probe_label"),
                    (F.col("mx") + 1).alias("probe_key"),
                    F.lit(0).alias("actual"),
                ),
                F.struct(
                    F.lit("absent_neg7").alias("probe_label"),
                    F.lit(-7).cast("long").alias("probe_key"),
                    F.lit(0).alias("actual"),
                ),
                F.struct(
                    F.lit("absent_neg13").alias("probe_label"),
                    F.lit(-13).cast("long").alias("probe_key"),
                    F.lit(0).alias("actual"),
                ),
            )
        ).alias("p")
    ).select("p.probe_label", "p.probe_key", "p.actual")
    probe_bits = probes.select(
        "probe_label",
        "probe_key",
        "actual",
        F.explode(
            F.array(*[pos(F.col("probe_key"), i) for i in range(_BLM_K)])
        ).alias("pos"),
    )
    # broadcast the RIGHT side of the left join (a left-side hint is
    # ignored for outer joins): the bit set is ≤m slim rows
    hits = (
        probe_bits.join(F.broadcast(bits), "pos", "left")
        .groupBy("probe_label", "probe_key", "actual")
        .agg(F.count(bits["pos"]).alias("n_hit"))
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_set_bits"))
    return (
        hits.crossJoin(F.broadcast(n_bits))
        .select(
            "probe_label",
            "probe_key",
            F.col("actual").cast("int").alias("actual"),
            F.when(F.col("n_hit") == _BLM_K, 1).otherwise(0).cast("int").alias("claimed"),
            "n_set_bits",
        )
    )


# ---------------------------------------------------------------------------
# snk_zorder_layout — Z-order clustered layout for 2-D data skipping
# ---------------------------------------------------------------------------

_ZO_BITS = 7  # 7 bits per dimension -> 14-bit z-values
# query window (a selective 2-D box: each dimension alone is ~20% of
# its range, the combined box ~4% of rows — the shape where Z-order
# beats single-column sort layouts)
_ZO_X = (40, 65)
_ZO_Y = (30, 55)

# xi is a shared textual fragment; yi's JSON accessor differs per
# engine (get_json_object vs json_extract_string) so each engine
# derives the INTEGER yi column first and the interleave fragment
# below is shared over the derived column names
_ZO_XI = "CAST(LEAST(FLOOR(value / 80e0), 127) AS BIGINT)"
_ZO_YI_SPARK = "CAST(LEAST(CAST(get_json_object(props, '$.k') AS INT), 127) AS BIGINT)"
_ZO_YI_DUCK = "CAST(LEAST(CAST(json_extract_string(props, '$.k') AS INTEGER), 127) AS BIGINT)"


def _zo_interleave_sql(xi: str, yi: str) -> str:
    """Bit-interleave SQL shared textually by both engines: z =
    Σ_b  x_b<<(2b+1) | y_b<<(2b) — pure integer shifts/masks."""
    terms = []
    for b in range(_ZO_BITS):
        terms.append(f"((({xi} >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"((({yi} >> {b}) & 1) << {2 * b})")
    return " + ".join(terms)


@query(
    "snk_zorder_layout",
    oracle=f"""
    WITH derived AS (
      SELECT value, {_ZO_XI} AS xi, {_ZO_YI_DUCK} AS yi FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value,
           CAST(MIN({_zo_interleave_sql("xi", "yi")}) AS BIGINT) AS min_z,
           CAST(MAX({_zo_interleave_sql("xi", "yi")}) AS BIGINT) AS max_z
    FROM derived
    WHERE xi BETWEEN {_ZO_X[0]} AND {_ZO_X[1]}
      AND yi BETWEEN {_ZO_Y[0]} AND {_ZO_Y[1]}
    """,
)
def snk_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustered table layout — the data-skipping OPTIMIZE
    step lakehouse formats run, expressed in pure Spark: derive a
    14-bit Morton code interleaving two query dimensions (value-bin
    xi, props.$.k yi), `repartitionByRange` + `sortWithinPartitions`
    on z, and write parquet — so every FILE and ROW GROUP covers a
    small z-range, and therefore a small (xi, yi) RECTANGLE. A 2-D
    box predicate then prunes most files via parquet min/max stats
    on the stored xi/yi columns, where a single-column sort layout
    only prunes one dimension. The query half reads the staged
    layout back with the box filter (pushed to the scan) and
    aggregates; the oracle recomputes from the RAW table — layout
    must never change semantics.

    Locality is ASSERTED in tests (per-file xi/yi spans via parquet
    footers, vs the unclustered source). At 100 TB this is the
    maintenance job that turns a full-scan geo/time query into a
    bounded-file read; z derivation is pure integer shifts (identical
    on both engines), the range partitioner is the only exchange,
    and the sort is within partitions (no global sort)."""
    xi = F.expr(_ZO_XI)
    yi = F.expr(_ZO_YI_SPARK)
    z = F.expr(_zo_interleave_sql("xi", "yi"))

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("event_id", "value", xi.alias("xi"), yi.alias("yi"))
            .withColumn("z", z)
            .repartitionByRange(8, "z")
            .sortWithinPartitions("z")
            .write.mode("overwrite")
            .parquet(indir)
        )

    from ..tables import stage_scratch

    staged = stage_scratch("snk_zorder", sf_dir, "events", build)
    t = spark.read.parquet(staged).where(
        F.col("xi").between(*_ZO_X) & F.col("yi").between(*_ZO_Y)
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
            "sum_value"
        ),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )
