"""Round-6 breadth extensions, fourth batch — SURVEY.md §2.23.

Widens after §2.22 with the warehouse/curation shapes a reference
user still reaches for daily: CDC log application (the change-feed
half of upsert — I/U/D ops folded last-writer-wins into a published
snapshot), navigation-path top-k (the product question behind the
Markov-transition matrix), hex-neighborhood smoothing (the ring
aggregation H3 users run right after binning), a data-freshness
audit (the dq gate beside PK uniqueness), an exact rolling median
(robust windowed smoother — the windowed sibling of evt_outlier_mad),
deterministic train/val/test splitting (the corpus-side contract
beside shard assignment), scene-cut detection over real decoded
video frames (the temporal multimodal feature beside frame
sampling), and an exact weighted average (ratio-of-decimal-sums).
Reference parity per SURVEY §0: the checkout was empty, so each
operator cites the public capability it generalizes ([P] tags).

House exactness rules throughout (scripts/selfcheck.py +
memory/oracle-parity-hazards): integer cores wherever possible;
BIGINT casts over DuckDB HUGEINT sums; DECIMAL(18,4) internal
accumulation with one double cast + ROUND at the output boundary;
epoch arithmetic only as within-engine DIFFERENCES (timezone
offsets cancel, so the keys hold under the driver's un-pinned
session); md5 60-bit prefix as the portable deterministic hash.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, scratch_dir
from .geo import _HEX_SIZE, geo_hex_bin
from .multimodal import _FRAME_MAGIC, _stage_videos

# ---------------------------------------------------------------------------
# agg_weighted_avg — exact weighted mean as a ratio of DECIMAL sums
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS DOUBLE)
                 / (100.0 * CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT))
                                 AS DOUBLE)), 4)
             AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the exact
    ratio-of-sums form ([P med]: weighted KPIs are the first thing a
    fleet dashboard derives from trip aggregates; AVG() over a
    pre-joined fact double-counts unless weighted).

    Exactness via the INTEGER core (not decimal×decimal — the ×100
    rehearsal measured the per-row decimal multiply form at 2.3×
    DuckDB; this form is the fix): price lifts to integer cents and
    the integral quantity to long through shared floor(x+0.5) trees
    (testdata precondition: qty integral, price 2-decimal — asserted
    in tests), the per-row product stays in LONG codegen (≤5e8),
    and only the numerator ACCUMULATOR is DECIMAL(38) — order-free
    exact and overflow-proof at 100 TB row counts, where Σ p·q ~
    2e20 exceeds int64. One shared double division + ROUND at the
    boundary. Plan shape: single combinable groupBy over a 3-value
    flag domain; scan-bound at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") + 0.5).cast("long")
    pc2 = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    num = F.sum((pc2 * qty).cast("decimal(38,0)"))
    den = F.sum(qty)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        den.alias("sum_qty"),
        F.round(
            num.cast("double") / (100.0 * den.cast("double")), 4
        ).alias("w_avg_price"),
    )


# ---------------------------------------------------------------------------
# snk_cdc_apply — change-data-capture log folded into a published snapshot
# ---------------------------------------------------------------------------


@query(
    "snk_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
             o_orderstatus AS status, o_totalprice AS price
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', 'U', o_totalprice + 100.0
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 5 = 0
    ), last AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM log
    ), snap AS (
      SELECT k, status, price FROM last WHERE rn = 1 AND op <> 'D'
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS sum_price
    FROM snap GROUP BY status
    """,
)
def snk_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application — the change-feed half of upsert ([P
    high]: provider pulls arrive as insert/update/delete events; the
    published dataset is the FOLD of that log, exactly what a
    Delta/Iceberg MERGE or a Debezium consumer materializes). A
    deterministic I/U/D log is derived from orders (every key
    INSERTs at seq 1; keys %3 UPDATE at seq 2; keys %5 DELETE at
    seq 3), folded last-writer-wins per key via row_number over seq,
    deletes dropped, and the applied snapshot WRITTEN to parquet —
    the verified figures are read back from the files, so a wrong
    fold order, surviving delete, or lost update flips the hash.

    Plan shape: one window exchange on key folds the log; the write
    is an append-free overwrite (idempotent re-runs). At 100 TB the
    identical query runs per partition-of-keys; the window is the
    engine-neutral MERGE kernel, and the log:snapshot ratio — not
    table size — governs cost. DECIMAL sum at the boundary (hazard
    rules 1/2)."""
    orders = load(spark, sf_dir, "orders")
    ins = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    upd = (
        orders.where(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(2).alias("seq"),
            F.lit("U").alias("op"),
            F.lit("U").alias("status"),
            (F.col("o_totalprice") + 100.0).alias("price"),
        )
    )
    dele = (
        orders.where(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit(3).alias("seq"),
            F.lit("D").alias("op"),
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("double").alias("price"),
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    snap = (
        ins.unionByName(upd)
        .unionByName(dele)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", "status", "price")
    )
    path = scratch_dir("snk_cdc_apply", sf_dir.strip("/").replace("/", "_"))
    snap.write.mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("price").cast("decimal(18,4)")).cast("double"), 4
            ).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# evt_path_topk — top navigation paths (first-5 event types per session)
# ---------------------------------------------------------------------------


@query(
    "evt_path_topk",
    oracle="""
    WITH r AS (
      SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               ORDER BY ts, event_id) AS rk
      FROM events
    ), p AS (
      SELECT user_id, day,
             string_agg(event_type, '>' ORDER BY rk) AS path
      FROM r WHERE rk <= 5 GROUP BY user_id, day
    ), c AS (
      SELECT path, COUNT(*) AS n FROM p GROUP BY path
    ), t AS (
      SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rk
      FROM c
    )
    SELECT path, CAST(n AS BIGINT) AS n_sessions, CAST(rk AS BIGINT) AS rk
    FROM t WHERE rk <= 10
    """,
)
def evt_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 navigation paths — the ordered-prefix product question
    ("which journeys happen most?") behind the Markov transition
    matrix ([P med]: evt_markov_transitions gives edge rates; this
    ranks whole paths). Session = (user, day); path = the first 5
    event types in (ts, event_id) order joined with '>'.

    Determinism: the within-session order is total (event_id breaks
    ts ties), the path string is assembled from rank-sorted structs
    (array_sort on (rk, type) = order by rk), and the top-10 is
    tie-broken by path. Plan shape: one window exchange on
    (user, day) → path strings, one combinable path count, then a
    single-partition top-10 over the tiny path summary (the
    srt_topk_global shape). At 100 TB the path summary is bounded by
    the type-alphabet^5, not the event count."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    r = ev.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
    paths = r.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    top = counts.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("path")))
    ).where(F.col("rk") <= 10)
    return top.select("path", F.col("n").alias("n_sessions"), F.col("rk").cast("long").alias("rk"))


# ---------------------------------------------------------------------------
# geo_hex_ring_smooth — 7-cell hex-neighborhood density smoothing
# ---------------------------------------------------------------------------

_HEX_CELLS_SQL = f"""
      SELECT CAST(hq AS INTEGER) AS hex_q, CAST(hr AS INTEGER) AS hex_r,
             CAST(COUNT(*) AS BIGINT) AS n_points
      FROM (
        SELECT CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END AS hq,
               CASE WHEN dr > dq AND dr >= ds AND NOT (dq > dr AND dq > ds)
                    THEN -rq - rs ELSE rr END AS hr
        FROM (
          SELECT rq, rr, rs,
                 abs(rq - q) AS dq, abs(rr - r) AS dr, abs(rs - s) AS ds
          FROM (
            SELECT q, r, -q - r AS s,
                   CASE WHEN q >= 0 THEN floor(q + 0.5)
                        ELSE -floor(0.5 - q) END AS rq,
                   CASE WHEN r >= 0 THEN floor(r + 0.5)
                        ELSE -floor(0.5 - r) END AS rr,
                   CASE WHEN -q - r >= 0 THEN floor(-q - r + 0.5)
                        ELSE -floor(0.5 - (-q - r)) END AS rs
            FROM (
              SELECT (sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / {_HEX_SIZE} AS q,
                     (2.0 / 3.0 * y) / {_HEX_SIZE} AS r
              FROM (
                SELECT value AS x,
                       CAST(json_extract_string(props, '$.k') AS INTEGER) AS y
                FROM events
              )
            )
          )
        )
      )
      GROUP BY 1, 2
"""


@query(
    "geo_hex_ring_smooth",
    oracle=f"""
    WITH cells AS ({_HEX_CELLS_SQL}),
    contrib AS (
      SELECT c.hex_q + o.dq AS tq, c.hex_r + o.dr AS tr, c.n_points
      FROM cells c
      CROSS JOIN (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                         (1, -1), (-1, 1)) o(dq, dr)
    ), ring AS (
      SELECT tq, tr,
             CAST(SUM(n_points) AS BIGINT) AS hood_n,
             CAST(COUNT(*) AS BIGINT) AS n_hood_cells
      FROM contrib GROUP BY tq, tr
    )
    SELECT c.hex_q, c.hex_r, c.n_points, r.hood_n, r.n_hood_cells,
           CAST((1000 * r.hood_n) // r.n_hood_cells AS BIGINT)
             AS density_milli
    FROM cells c JOIN ring r ON r.tq = c.hex_q AND r.tr = c.hex_r
    """,
)
def geo_hex_ring_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-neighborhood (k-ring, k=1) density smoothing — the ring
    aggregation H3 users run right after binning ([P med]: the
    reference's public hex maps smooth single-cell noise before
    display; k-anonymity screens use the same 7-cell neighborhood).
    Each cell's smoothed density = mean points over itself + its 6
    axial neighbors, restricted to neighborhoods' EXISTING cells
    (integer milli-density via 1000·sum div cells — order-free
    exact).

    Plan shape: the per-cell summary is ONE combinable aggregation
    over events (the geo_hex_bin plan — its unused sum column is
    pruned by Catalyst); the ×7 offset explode and ring re-group act
    on the tiny CELL SUMMARY, never raw points. The ring step is
    expressed as a SINGLE re-group over the offset contributions —
    each contribution carries an is-center flag, so the target's own
    n_points and its cell-existence filter fall out of the same
    aggregate and the naive join-back of cells (which re-evaluates
    the whole events subtree — a DataFrame self-join has no DAG
    reuse without caching; the ×100 rehearsal measured the 2-pass
    join form at 2× scan cost) is not needed. At 100 TB: one events
    exchange + one summary-sized exchange, no join."""
    cells = geo_hex_bin(spark, sf_dir).select("hex_q", "hex_r", "n_points")
    offsets = F.array(
        *[
            F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
            for dq, dr in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]
        ]
    )
    contrib = cells.select(
        F.explode(offsets).alias("o"), "hex_q", "hex_r", "n_points"
    ).select(
        (F.col("hex_q") + F.col("o.dq")).alias("tq"),
        (F.col("hex_r") + F.col("o.dr")).alias("tr"),
        "n_points",
        ((F.col("o.dq") == 0) & (F.col("o.dr") == 0)).alias("is_center"),
    )
    ring = contrib.groupBy("tq", "tr").agg(
        F.sum("n_points").alias("hood_n"),
        F.count(F.lit(1)).alias("n_hood_cells"),
        F.sum(F.when(F.col("is_center"), F.col("n_points"))).alias("n_points_c"),
    )
    return (
        ring.where(F.col("n_points_c").isNotNull())
        .select(
            F.col("tq").alias("hex_q"),
            F.col("tr").alias("hex_r"),
            F.col("n_points_c").alias("n_points"),
            "hood_n",
            "n_hood_cells",
            F.expr("(1000 * hood_n) div n_hood_cells").alias("density_milli"),
        )
    )


# ---------------------------------------------------------------------------
# dq_freshness — per-type data-freshness audit (lag vs corpus head)
# ---------------------------------------------------------------------------


@query(
    "dq_freshness",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS eu FROM events
    ), g AS (
      SELECT MAX(eu) AS gmax FROM e
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST((g.gmax - MAX(eu)) // 60000000 AS BIGINT) AS lag_min,
           CAST(SUM(CASE WHEN eu > g.gmax - 86400000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_last24h
    FROM e, g
    GROUP BY event_type, g.gmax
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit — the dq gate beside PK uniqueness ([P
    high]: the reference's cron ETL must detect a provider whose
    feed has silently stalled; "how far behind the corpus head is
    each source?" is that alarm). Per event type: row count, minutes
    of lag behind the GLOBAL max timestamp, and rows within the 24 h
    before that head.

    Timezone-immune by construction: all timestamp math is a
    within-engine DIFFERENCE of epoch-µs integers (session-offset
    terms cancel), with integer div to minutes (hazard rule 10) —
    the key holds under the driver's un-pinned session. Plan shape:
    one tiny global-max agg broadcast into one combinable per-type
    agg; two scans today, one with a pre-known head at 100 TB."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("eu")
    )
    gmax = ev.agg(F.max("eu").alias("gmax"))
    return (
        ev.crossJoin(F.broadcast(gmax))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("(first(gmax) - max(eu)) div 60000000").alias("lag_min"),
            F.sum(
                F.when(F.col("eu") > F.col("gmax") - 86400000000, 1).otherwise(0)
            ).alias("n_last24h"),
        )
    )


# ---------------------------------------------------------------------------
# win_rolling_median — exact rolling median over a trailing row frame
# ---------------------------------------------------------------------------


@query(
    "win_rolling_median",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id,
             list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS l
      FROM events WHERE user_id % 20 = 0
    )
    SELECT user_id, event_id,
           CAST(len(l) AS INT) AS frame_n,
           (l[((len(l) - 1) // 2) + 1] + l[(len(l) // 2) + 1]) / 2.0 AS rmed
    FROM f
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of `value` over the trailing 5 events
    per user — the robust windowed smoother ([P med]: the windowed
    sibling of evt_outlier_mad; telemetry dashboards prefer it to
    the mean precisely where spikes exist). Spark has no native
    percentile window over a row frame, so the frame is materialized
    as a sorted array (collect_list over ROWS BETWEEN 4 PRECEDING)
    and the median read by index — DuckDB builds the IDENTICAL list
    window, so both engines pick the same two order statistics and
    share one (a+b)/2 IEEE expression (exact, no rounding needed).

    Plan shape: one window exchange on user; O(frame) state per row.
    At 100 TB frame materialization is O(k log k) per row with k=5 —
    constant — and the user filter (%20) is pushed to the scan
    (PushedFilters); a quantile-sketch frame is only needed for
    k in the thousands."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 20 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sort_array(F.collect_list("value").over(w)).alias("l"),
        )
        .withColumn("frame_n", F.size("l"))
        .select(
            "user_id",
            "event_id",
            "frame_n",
            F.expr("(l[(frame_n - 1) div 2] + l[frame_n div 2]) / 2.0").alias("rmed"),
        )
    )


# ---------------------------------------------------------------------------
# llm_train_val_split — deterministic stratified corpus splitting
# ---------------------------------------------------------------------------


@query(
    "llm_train_val_split",
    oracle="""
    WITH h AS (
      SELECT lang, n_chars,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 100 AS bucket
      FROM documents
    ), s AS (
      SELECT lang,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM h
    ), g AS (
      SELECT lang, split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM s GROUP BY lang, split
    )
    SELECT lang, split, n_docs, n_chars,
           CAST((1000000 * n_chars) // SUM(n_chars) OVER (PARTITION BY lang)
                AS BIGINT) AS ppm_of_lang
    FROM g
    """,
)
def llm_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split audit — the corpus-side
    contract beside shard assignment ([P high]: a training corpus
    split must be a PURE FUNCTION of the document id, reproducible
    across reruns, engines, and partitionings — rand()-based splits
    are none of those, and leakage between re-materialized splits is
    a real eval bug). Split = md5 60-bit prefix mod 100 → 80/10/10;
    per (lang, split): docs, chars, and the split's ppm share of the
    language's chars (integer div — exact).

    Plan shape: codegen hash + ONE combinable (lang, split) agg +
    a window over the ≤|langs|×3 summary. The ppm numerator
    (1e6·chars) stays within int64 up to ~9e12 chars per language;
    the 100 TB form lifts to DECIMAL(38,0) — same query. The hash is
    hazard-rule-9 portable (hex prefix → engine-local int)."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    g = docs.select("lang", split.alias("split"), "n_chars").groupBy(
        "lang", "split"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    return g.withColumn(
        "ppm_of_lang",
        F.expr("(1000000 * n_chars) div sum(n_chars) over (partition by lang)"),
    )


# ---------------------------------------------------------------------------
# mm_video_scene_cut — frame-difference scene-cut detection
# ---------------------------------------------------------------------------


@query(
    "mm_video_scene_cut",
    oracle="""
    WITH vids AS (
      SELECT doc_id FROM documents WHERE doc_id % 5 = 0
    ), dims AS (
      SELECT doc_id, 8 + doc_id % 24 AS n, 8 + (doc_id % 3) * 4 AS w, 8 AS h
      FROM vids
    ), fr AS (
      SELECT d.doc_id, d.n, d.w, d.h, f.k AS f
      FROM dims d CROSS JOIN range(32) f(k)
      WHERE f.k >= 1 AND f.k < d.n
    ), dif AS (
      SELECT fr.doc_id, fr.n, fr.f, fr.w, fr.h,
             7 * (fr.w * fr.h)
             + 242 * SUM(CASE WHEN (fr.doc_id * 31 + (fr.f - 1) * 7
                                    + p.i * 13) % 256 >= 249
                              THEN 1 ELSE 0 END) AS d
      FROM fr CROSS JOIN range(128) p(i)
      WHERE p.i < fr.w * fr.h
      GROUP BY fr.doc_id, fr.n, fr.f, fr.w, fr.h
    )
    SELECT doc_id,
           CAST(MAX(n) AS INT) AS n_frames,
           CAST(SUM(CASE WHEN d > 15 * w * h THEN 1 ELSE 0 END) AS INT)
             AS n_cuts,
           CAST(SUM(d) AS BIGINT) AS total_diff,
           CAST(MAX(d) AS BIGINT) AS max_diff,
           CAST(COALESCE(MIN(CASE WHEN d > 15 * w * h THEN f END), -1) AS INT)
             AS first_cut
    FROM dif GROUP BY doc_id
    """,
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL decoded video frames — the
    temporal multimodal feature beside frame sampling ([P med]: cut
    density / shot length is a standard video-curation signal, and
    frame-difference thresholding is its codec-free core). The
    staged RVID container carries only (doc_id, video BINARY); this
    decodes every gray8 frame, computes each adjacent-frame sum of
    absolute pixel differences with one vectorized np.diff, and
    declares a cut where the difference exceeds 15·w·h (per-pixel
    mean > 15 — scale-free across the three staged widths). Output
    per video: frames, cuts, total/max difference, first cut index.

    The oracle re-derives every figure from the pre-encode closed
    form px(f,i) = (doc_id·31 + f·7 + i·13) % 256: the +7 step wraps
    exactly where px(f−1,i) ≥ 249, so |diff| is 7·(wh−k) + 249·k
    with k the wrap count — a wrong frame offset, stride, or
    boundary flips the hash. All integers, no FP anywhere.

    Plan shape: stateless Arrow mapInPandas over the staged table —
    zero shuffle, O(videos) output; at 100 TB it is scan-bound and
    embarrassingly parallel, the decode-adjacent shape every video
    pipeline starts with."""
    staged = spark.read.parquet(_stage_videos(spark, sf_dir))

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["video"]):
                b = bytes(blob)
                if b[:4] != _FRAME_MAGIC:
                    raise ValueError(f"bad container magic for doc {did}")
                n, w, h = struct.unpack_from("<III", b, 4)
                px = (
                    np.frombuffer(b, np.uint8, n * w * h, 16)
                    .reshape(n, w * h)
                    .astype(np.int16)
                )
                d = np.abs(np.diff(px, axis=0)).sum(axis=1, dtype=np.int64)
                cut = d > 15 * w * h
                rows.append(
                    (
                        int(did),
                        int(n),
                        int(cut.sum()),
                        int(d.sum()),
                        int(d.max()),
                        int(np.argmax(cut)) + 1 if cut.any() else -1,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_cuts",
                    "total_diff",
                    "max_diff",
                    "first_cut",
                ],
            )

    return staged.mapInPandas(
        cuts,
        schema=(
            "doc_id long, n_frames int, n_cuts int, "
            "total_diff long, max_diff long, first_cut int"
        ),
    )
