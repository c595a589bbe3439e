"""Round-6 breadth extensions, third batch — SURVEY.md §2.22.

Continues widening after §2.21: deterministic categorical statistics
(mode), reproducible per-stratum sampling, network/IP enrichment,
readability scoring, two RECURSIVE per-entity state machines (fixed-
point EWMA smoothing and CUSUM changepoint detection — the canonical
"Spark has no fold-window" operators, expressed as applyInPandas
state passes with recursive-CTE oracles), multi-touch attribution,
BFS reachability over the co-purchase graph (4th graph-family
member), windowed audio features and image histograms over REAL
decoded payloads (multimodal analysis beyond decode), Spark 4's
native XML datasource round-trip, and a PK-uniqueness audit (dq
family). Reference parity per SURVEY §0: the checkout was empty, so
each operator cites the public capability it generalizes ([P] tags).

House exactness rules throughout (scripts/selfcheck.py): integer
cores wherever a recursion or accumulation exists; divisions only as
single correctly-rounded IEEE expressions shared verbatim between
engines; BIGINT casts over DuckDB HUGEINT sums; floor-then-cast for
double->int fixed-point (CAST alone rounds in DuckDB, truncates in
Spark).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load, scratch_dir
from .multimodal import _bmp_payload
from .pipeline_r5 import _stage_wavs
from .pipeline_r6b import _COPART_SQL, _copart_edges

# ---------------------------------------------------------------------------
# agg_mode — deterministic per-group mode
# ---------------------------------------------------------------------------


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority
        ORDER BY n DESC, o_orderstatus) AS rk
      FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status,
           CAST(n AS BIGINT) AS mode_n
    FROM r WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC mode (most frequent value) per group — the
    categorical summary statistic ([P med]: modal vehicle type /
    status per region is a standard fleet report). Both engines have
    a native mode() whose TIE-BREAK IS ENGINE-DEFINED, so the house
    form makes the tie-break part of the declared semantics:
    rank by (count DESC, value ASC) and keep rank 1 — bit-identical
    everywhere, retry-stable.

    Plan shape: combinable (group, value) count (map-side partials
    absorb the categorical head), then a window over the tiny
    (group, value) summary — the second exchange moves |groups| ×
    |domain| rows, thousands at any input scale, never raw data.
    At 100 TB this is the only safe mode shape: a native mode() over
    a skewed group would still need the same pair count underneath."""
    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), F.col("o_orderstatus")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("n").alias("mode_n"),
        )
    )


# ---------------------------------------------------------------------------
# llm_doc_sample_per_source — reproducible per-stratum top-k-by-hash sample
# ---------------------------------------------------------------------------


@query(
    "llm_doc_sample_per_source",
    oracle="""
    WITH h AS (
      SELECT source, doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hk
      FROM documents
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY hk, doc_id) AS rk
      FROM h
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, hk
    FROM r WHERE rk <= 3
    """,
)
def llm_doc_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-source document sample: the k smallest
    md5-hash documents of each source stratum ([P med]: eyeball /
    audit samples of a training corpus must be STABLE across reruns,
    partitionings, and engines — TABLESAMPLE and rand() are none of
    those). The hash rank IS the sample: k=3 per source, tie-broken
    by doc_id (unreachable for md5 but declared).

    The 60-bit hash-prefix integer is the house portable hash
    (hazard rule 9: hex via md5 on identical bytes, engine-local
    hex->int). Plan shape: one window exchange on source; the window
    state is the running top-k only in principle — Spark's
    row_number materializes the partition, so the 100 TB form swaps
    row_number for the rank-filter pushdown (groupBy(source) +
    min_by(struct, k)) when strata are huge; for audit-sample k and
    realistic per-source volumes the window is the simpler plan."""
    h = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hk"),
    )
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        h.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "hk")
    )


# ---------------------------------------------------------------------------
# fn_ip_cidr — IPv4 derivation, octet split, RFC-1918/CIDR classification
# ---------------------------------------------------------------------------

_IP_SQL = """
      SELECT (user_id * 2654435761) % 4294967296 AS ip
      FROM events
"""


@query(
    "fn_ip_cidr",
    oracle=f"""
    WITH ips AS ({_IP_SQL}),
    o AS (
      SELECT ip,
             ip // 16777216 AS o1,
             (ip // 65536) % 256 AS o2,
             (ip // 256) % 256 AS o3,
             ip % 256 AS o4
      FROM ips
    ), c AS (
      SELECT ip,
             CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
               || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS ip_str,
             CASE WHEN o1 = 10 THEN 'rfc1918-10/8'
                  WHEN o1 = 172 AND o2 BETWEEN 16 AND 31 THEN 'rfc1918-172.16/12'
                  WHEN o1 = 192 AND o2 = 168 THEN 'rfc1918-192.168/16'
                  WHEN o1 = 127 THEN 'loopback/8'
                  ELSE 'public' END AS net_class
      FROM o
    )
    SELECT net_class,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT ip) AS BIGINT) AS n_ips,
           MIN(ip_str) AS min_ip,
           MAX(ip_str) AS max_ip
    FROM c GROUP BY net_class
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parse + CIDR classification — the network-enrichment
    scalar family ([P med]: provider feeds carry client IPs; the
    first pipeline pass splits octets and buckets RFC-1918/loopback
    vs public before any geo/abuse joins). The IP is derived from
    user_id by a Knuth multiplicative hash mod 2^32 (closed form
    shared with the oracle) so the classification logic — integer
    octet splits, dotted-quad assembly, prefix CASE — is exercised
    on real spread without external fixtures.

    Exactness: pure integer div/mod on positives (hazard rule 10)
    and VARCHAR min/max under binary collation on both engines.
    Plan shape: codegen scalars + ONE combinable agg; the distinct-ip
    count is Spark's standard 2-phase distinct expansion riding the
    same exchange. At 100 TB this is a map-heavy scan with a
    few-row output — nothing to optimize."""
    ip = F.col("ip")
    o = load(spark, sf_dir, "events").select(
        ((F.col("user_id") * 2654435761) % 4294967296).alias("ip")
    )
    c = o.select(
        "ip",
        F.concat_ws(
            ".",
            (ip / 16777216).cast("long"),
            ((ip / 65536).cast("long") % 256),
            ((ip / 256).cast("long") % 256),
            ip % 256,
        ).alias("ip_str"),
        F.when(F.expr("ip div 16777216") == 10, "rfc1918-10/8")
        .when(
            (F.expr("ip div 16777216") == 172)
            & F.expr("(ip div 65536) % 256").between(16, 31),
            "rfc1918-172.16/12",
        )
        .when(
            (F.expr("ip div 16777216") == 192)
            & (F.expr("(ip div 65536) % 256") == 168),
            "rfc1918-192.168/16",
        )
        .when(F.expr("ip div 16777216") == 127, "loopback/8")
        .otherwise("public")
        .alias("net_class"),
    )
    return c.groupBy("net_class").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("ip").alias("n_ips"),
        F.min("ip_str").alias("min_ip"),
        F.max("ip_str").alias("max_ip"),
    )


# ---------------------------------------------------------------------------
# txt_readability — Flesch reading-ease over integer text statistics
# ---------------------------------------------------------------------------


@query(
    "txt_readability",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             LENGTH(string_split_regex(TRIM(text), '\s+')) AS n_words,
             GREATEST(LENGTH(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
             LENGTH(regexp_extract_all(LOWER(text), '[aeiou]+'))
               AS n_syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / NULLIF(n_words, 0))
             AS flesch
    FROM t
    """,
)
def txt_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring per document — the classic
    text-quality feature beside length/stopword ratios ([P med]:
    readability is a standard training-corpus quality dimension).
    Components are INTEGER text statistics (regex word split,
    sentence-terminator runs, vowel-group syllable proxy — the
    codec-free syllable estimator), and the score is ONE shared
    IEEE expression tree (two divisions, two multiplies, two
    subtractions — all correctly rounded, no ROUND needed; hazard
    rule 6). NULLIF guards the empty-text division on both engines.

    Plan shape: pure map-side codegen over the documents scan, zero
    shuffle, per-doc output. At 100 TB this runs at scan speed —
    regexp_extract_all is the only non-trivial cost and stays in the
    JVM."""
    txt = F.col("text")
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(txt), r"\s+")).cast("long").alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]+"), 0)), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
        F.size(F.regexp_extract_all(F.lower(txt), F.lit(r"[aeiou]+"), 0))
        .cast("long")
        .alias("n_syllables"),
    )
    return t.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0))
            )
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# evt_ewma / evt_cusum_changepoint — per-entity integer state recursions
# ---------------------------------------------------------------------------

# Both keys share the same staging: per-user event series in total
# (ts, event_id) order with the value lifted to FIXED-POINT integers
# x = CAST(FLOOR(value*1000) AS BIGINT). floor-then-cast is mandatory:
# a bare CAST(double AS BIGINT) truncates in Spark but ROUNDS in
# DuckDB (hazard rule set). events.value is positive (verified
# precondition below), so truncating div (Spark/Python) and floor div
# (DuckDB //) agree on every intermediate.

_SEQ_SQL = """
      SELECT user_id,
             CAST(FLOOR(value * 1000) AS BIGINT) AS x,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
"""


def _user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000).cast("long").alias("x"),
    )


@query(
    "evt_ewma",
    oracle=f"""
    WITH RECURSIVE seq AS ({_SEQ_SQL}),
    walk AS (
      SELECT user_id, rn, x, x AS e FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, s.x, (3 * w.e + s.x) // 4
      FROM walk w JOIN seq s
        ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT user_id,
           CAST(MAX(rn) AS BIGINT) AS n_events,
           MAX_BY(e, rn) AS ewma_fix,
           CAST(MAX(e) AS BIGINT) AS max_ewma_fix
    FROM walk GROUP BY user_id
    """,
)
def evt_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per entity in FIXED-
    POINT integer arithmetic (alpha = 1/4): e' = (3*e + x) div 4 —
    the smoothing primitive every telemetry pipeline runs, made
    bit-identical across engines/partitionings/retries by keeping
    the whole recursion in integers (a float EWMA cannot give this;
    the llm/gph fixed-point posture). Truncation loss < 1 fixed-
    point unit per step, bounded and monotone.

    An EWMA is a LEFT FOLD over time order — the operator Spark's
    window frames genuinely cannot express (no fold-window; a
    prefix-list HOF would be O(n²) per entity). The house route is
    the sanctioned custom-stateful one: applyInPandas per entity,
    O(1) state per group, one shuffle on user_id — identical shape
    to applyInPandasWithState in streaming. The oracle walks the
    SAME recursion as a recursive CTE, so this is a genuine
    cross-formulation check (imperative fold vs fixpoint SQL).

    At 100 TB: per-entity series arrive pre-bucketed by entity key;
    the fold is a single pass per group with constant state — the
    textbook applyInPandas shape (SURVEY §2.12)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        e = None
        mx = 0
        for x in pdf["x"]:
            x = int(x)
            e = x if e is None else (3 * e + x) // 4
            mx = e if e > mx else mx
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "ewma_fix": [e],
                "max_ewma_fix": [mx],
            }
        )

    return (
        _user_series(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandas(
            fold,
            "user_id long, n_events long, ewma_fix long, max_ewma_fix long",
        )
    )


_CUSUM_K = 250_000  # drift allowance (fixed-point units)
_CUSUM_H = 1_000_000  # alarm threshold


@query(
    "evt_cusum_changepoint",
    oracle=f"""
    WITH RECURSIVE seq AS ({_SEQ_SQL}),
    walk AS (
      SELECT user_id, rn, GREATEST(0, x - {_CUSUM_K}) AS s
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, GREATEST(0, w.s + s.x - {_CUSUM_K})
      FROM walk w JOIN seq s
        ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT user_id,
           CAST(MAX(s) AS BIGINT) AS max_cusum,
           CAST(SUM(CASE WHEN s > {_CUSUM_H} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms
    FROM walk GROUP BY user_id
    """,
)
def evt_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint/drift detector per entity — the sequential
    mean-shift screen ([P med]: sustained upward drift in a metric
    that a z-score-per-point misses): S' = max(0, S + x - K) with
    alarm when S crosses H, in the same fixed-point integers and the
    same applyInPandas-fold / recursive-CTE-oracle machinery as
    evt_ewma (one shared staging, two declared semantics). K and H
    are shared literals; every comparison is integer-exact, so the
    alarm count is bit-stable — the property a production alerting
    pipeline needs to be idempotent across retries.

    Plan/scale shape: identical to evt_ewma (one user_id shuffle,
    O(1) per-group state, single pass)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = 0
        mx = 0
        alarms = 0
        for x in pdf["x"]:
            s = s + int(x) - _CUSUM_K
            s = 0 if s < 0 else s
            mx = s if s > mx else mx
            alarms += 1 if s > _CUSUM_H else 0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "max_cusum": [mx],
                "n_alarms": [alarms],
            }
        )

    return (
        _user_series(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandas(fold, "user_id long, max_cusum long, n_alarms long")
    )


# ---------------------------------------------------------------------------
# evt_attribution_linear — multi-touch linear attribution
# ---------------------------------------------------------------------------


@query(
    "evt_attribution_linear",
    oracle="""
    WITH conv AS (
      SELECT event_id AS cid, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'
    ), pairs AS (
      SELECT c.cid, t.event_type AS touch_type
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.ts < c.ts
       AND t.ts >= c.ts - INTERVAL 7 DAY
    ), sized AS (
      SELECT cid, touch_type,
             COUNT(*) OVER (PARTITION BY cid) AS n
      FROM pairs
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(1000000 // n) AS BIGINT) AS credit_micro
    FROM sized GROUP BY touch_type
    """,
)
def evt_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution — the equal-credit complement
    of evt_attribution_last_touch ([P med]: the other standard
    attribution model): every non-purchase touch in the 7 days
    before a conversion shares the conversion's credit equally.
    The per-touch credit is the SCALED INTEGER 1000000 div n (n =
    touches for that conversion) — summing exact micro-credits
    instead of accumulating 1.0/n doubles removes the summation-
    order hazard entirely (each conversion distributes n*(10^6 div
    n) micro-units; the div remainder is the declared rounding, not
    FP noise).

    Plan shape: the conv-touch pairing is an EQUI-join on user_id
    with the 7-day range as a residual predicate (never a theta-only
    join); per-conversion size is a window riding the pair shuffle's
    partitioning hash? — no: the window re-partitions on cid, then
    ONE combinable agg on touch_type. At 100 TB the user_id equi-key
    bounds candidates to within-entity pairs and the 7-day window
    caps them per conversion; skewed power users salt like any hot
    join key."""
    ev = load(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "ts", F.col("event_type").alias("touch_type")
    )
    pairs = conv.join(
        touch,
        (touch.user_id == conv.cuser)
        & (touch.ts < conv.cts)
        & (touch.ts >= conv.cts - F.expr("INTERVAL 7 DAYS")),
    ).select("cid", "touch_type")
    sized = pairs.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("cid"))
    )
    return sized.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.expr("1000000 div n")).alias("credit_micro"),
    )


# ---------------------------------------------------------------------------
# gph_bfs_reachability — bounded-hop BFS over the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "gph_bfs_reachability",
    oracle=f"""
    WITH e AS MATERIALIZED ({_COPART_SQL}),
    sym AS MATERIALIZED (
      SELECT u AS a, v AS b FROM e
      UNION ALL
      SELECT v AS a, u AS b FROM e
    ),
    d0 AS MATERIALIZED (SELECT MIN(u) AS node FROM e),
    f1 AS MATERIALIZED (
      SELECT DISTINCT s.b AS node FROM sym s JOIN d0 ON s.a = d0.node
      WHERE s.b NOT IN (SELECT node FROM d0)
    ),
    f2 AS MATERIALIZED (
      SELECT DISTINCT s.b AS node FROM sym s JOIN f1 ON s.a = f1.node
      WHERE s.b NOT IN (SELECT node FROM f1)
        AND s.b NOT IN (SELECT node FROM d0)
    ),
    f3 AS MATERIALIZED (
      SELECT DISTINCT s.b AS node FROM sym s JOIN f2 ON s.a = f2.node
      WHERE s.b NOT IN (SELECT node FROM f2)
        AND s.b NOT IN (SELECT node FROM f1)
        AND s.b NOT IN (SELECT node FROM d0)
    )
    SELECT 0 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM d0
    UNION ALL
    SELECT 1 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM f1
    UNION ALL
    SELECT 2 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM f2
    UNION ALL
    SELECT 3 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM f3
    """,
)
def gph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS reachability from a canonical source (the
    minimum node id) over the undirected co-purchase graph — the 4th
    graph-family member beside degree / triangles / PageRank ([P
    med]: "how much of the graph is within k hops of X" is the
    standard blast-radius / influence screen). THREE supersteps
    unrolled (the gph_pagerank_scaled posture): frontier_{k+1} =
    distinct neighbors of frontier_k minus all previous levels,
    output = the level-size histogram.

    Exactness: node ids and counts are integers end to end.

    Plan shape: the edge frame is the cached §2.21 co-purchase list;
    each superstep is ONE equi-join (frontier broadcast — frontiers
    are tiny vs the edge list) + distinct + anti-joins against
    previous levels (also broadcast), and each frontier is
    localCheckpoint'ed (the llm_dedup_clusters lineage-cut pattern):
    without the cut, f3's plan re-embeds f2's subtree three times and
    f1's nine — the audit showed 252 exchanges before the cut, 4
    after. The SAME blowup exists on the oracle side — DuckDB inlines
    plain CTEs, so each level is declared AS MATERIALIZED (the SQL
    spelling of the lineage cut; without it the ×100 oracle ran past
    10 minutes, with it seconds). At 100 TB the same unrolled shape holds while frontiers
    stay ≪ edges (real blast-radius queries); the general unbounded
    BFS is the same pattern in a driver loop with a convergence
    count per superstep."""
    e = _copart_edges(spark, sf_dir)
    sym = e.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionAll(e.select(F.col("v").alias("a"), F.col("u").alias("b")))
    d0 = e.agg(F.min("u").alias("node"))

    def step(frontier: DataFrame, *visited: DataFrame) -> DataFrame:
        nxt = (
            sym.join(
                F.broadcast(frontier.withColumnRenamed("node", "fnode")),
                F.col("a") == F.col("fnode"),
            )
            .select(F.col("b").alias("node"))
            .distinct()
        )
        for v in visited:
            nxt = nxt.join(F.broadcast(v), "node", "left_anti")
        # lineage cut: each frontier is consumed by 2-4 downstream
        # plans (the next superstep + the anti-joins of later ones);
        # without the cut the plan tree grows exponentially per hop.
        return nxt.localCheckpoint()

    f1 = step(d0, d0)
    f2 = step(f1, f1, d0)
    f3 = step(f2, f2, f1, d0)
    levels = [d0, f1, f2, f3]
    out = None
    for hop, lvl in enumerate(levels):
        row = lvl.agg(F.count(F.lit(1)).alias("n_nodes")).select(
            F.lit(hop).alias("hop"), "n_nodes"
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# mm_audio_features — windowed RMS / zero-crossing / peak over decoded PCM
# ---------------------------------------------------------------------------


@query(
    "mm_audio_features",
    oracle="""
    WITH clips AS (
      SELECT DISTINCT user_id % 200 AS clip_id FROM events
    ), params AS (
      SELECT clip_id,
             400 + (clip_id % 7) * 160 AS n,
             8000 * (1 + clip_id % 3) AS rate
      FROM clips
    ), s AS (
      SELECT p.clip_id, p.n, t.k,
             ((p.clip_id * 7919 + t.k * 104729) % 20001) - 10000 AS amp,
             ((p.clip_id * 7919 + (t.k - 1) * 104729) % 20001) - 10000
               AS amp_prev,
             (4 * t.k) // p.n AS w
      FROM params p CROSS JOIN range(1360) t(k)
      WHERE t.k < p.n
    )
    SELECT clip_id,
           CAST(w AS BIGINT) AS win,
           CAST(n // 4 AS BIGINT) AS seg_len,
           CAST(SUM(amp * amp) AS BIGINT) AS ss,
           CAST(SUM(CASE WHEN k > 0 AND (4 * (k - 1)) // n = w
                          AND amp_prev * amp < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zc,
           CAST(MAX(ABS(amp)) AS BIGINT) AS peak,
           SQRT(CAST(SUM(amp * amp) AS BIGINT) / (n // 4)) AS rms
    FROM s GROUP BY clip_id, w, n
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio FEATURE EXTRACTION over real decoded PCM — the
    analysis step after mm_decode_wav's parse ([P med]: energy /
    zero-crossing profiles are the first features of any audio
    curation pipeline — silence trimming, speech/music screens).
    Each staged RIFF/WAVE clip (real bytes, struct.unpack header
    validation) is split into 4 equal windows (sample counts are
    divisible by 4 by construction) and per window the decode emits
    sum-of-squares, ZERO CROSSINGS (adjacent within-window pairs
    with opposite signs — integer product test, no FP), and peak;
    RMS = sqrt(ss/len) is left to the SQL layer as the single shared
    IEEE tree (hazard rule 6).

    The oracle re-derives every sample from the pre-encode closed
    form and windows by (4k) div n — one wrong byte offset, stride,
    or window boundary in the decoder flips the hash.

    Scale shape: stateless Arrow mapInPandas decode (zero shuffle —
    a clip's 4 windows come out of one decode call); binary stays
    columnar. The real-codec seam is identical to mm_decode_wav:
    swap the loop body for librosa and the plumbing stands."""
    import struct

    import numpy as np

    wavs = spark.read.parquet(_stage_wavs(spark, sf_dir))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, buf in zip(pdf["clip_id"], pdf["wav"]):
                buf = bytes(buf)
                if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    raise ValueError(f"clip {cid}: not a RIFF/WAVE file")
                (data_size,) = struct.unpack("<I", buf[40:44])
                amps = np.frombuffer(
                    buf[44 : 44 + data_size], dtype="<i2"
                ).astype(np.int64)
                n = len(amps)
                q = n // 4
                for w in range(4):
                    seg = amps[w * q : (w + 1) * q]
                    rows.append(
                        (
                            int(cid),
                            w,
                            q,
                            int((seg * seg).sum()),
                            int(((seg[1:] * seg[:-1]) < 0).sum()),
                            int(np.abs(seg).max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["clip_id", "win", "seg_len", "ss", "zc", "peak"]
            )

    out = wavs.mapInPandas(
        feats,
        "clip_id long, win long, seg_len long, ss long, zc long, peak long",
    )
    return out.withColumn(
        "rms", F.sqrt(F.col("ss") / F.col("seg_len"))
    )


# ---------------------------------------------------------------------------
# mm_image_histogram — luminance histogram over decoded BMP pixels
# ---------------------------------------------------------------------------


@query(
    "mm_image_histogram",
    oracle="""
    WITH g AS (
      SELECT doc_id, text, n_chars AS L,
             (n_chars % 64) + 1 AS w,
             (n_chars % 48) + 1 AS h,
             ((3 * ((n_chars % 64) + 1) + 3) // 4) * 4 AS stride
      FROM documents
    ), px AS (
      SELECT g.doc_id,
             ascii(substr(g.text,
                          CAST((r.k * g.stride + c.k) % g.L AS INTEGER) + 1,
                          1)) AS b
      FROM g CROSS JOIN range(48) r(k) CROSS JOIN range(192) c(k)
      WHERE r.k < g.h AND c.k < 3 * g.w
    )
    SELECT doc_id,
           CAST(b // 32 AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM px GROUP BY doc_id, b // 32
    """,
)
def mm_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 8-bin intensity HISTOGRAM over real decoded BMP
    pixel arrays — the statistics step after decode/resize ([P med]:
    histograms drive exposure screens, near-black frame filters, and
    perceptual dedup prefilters). The decode parses the actual
    headers, trims the stride padding, and bincounts the pixel bytes
    into 8 intensity bins (b div 32); only non-empty bins are
    emitted, matching the oracle's group-by-present semantics.

    The oracle reconstructs every TRIMMED pixel byte from the encode
    closed form (byte at buffer position p cycles the ASCII text:
    ascii(text[p mod L]); the §2.21 ASCII precondition test makes
    the char/byte identification sound) over a bounded 48×192
    lateral grid — a decoder that miscounts stride or forgets to
    trim padding flips the hash.

    Scale shape: stateless Arrow mapInPandas, zero shuffle, O(bins)
    output per image — histogram extraction at 100 TB is scan-bound
    and embarrassingly parallel."""
    import struct

    import numpy as np

    payload = _bmp_payload(load(spark, sf_dir, "documents"))

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(buf)
                if buf[:2] != b"BM":
                    raise ValueError(f"doc {did}: not a BMP")
                offset = struct.unpack_from("<I", buf, 10)[0]
                _sz, w, h, _pl, bpp = struct.unpack_from("<IiiHH", buf, 14)
                stride = ((bpp // 8) * w + 3) & ~3
                px = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * abs(h), offset=offset
                )
                trimmed = px.reshape(abs(h), stride)[:, : (bpp // 8) * w]
                counts = np.bincount(trimmed.ravel() >> 5, minlength=8)
                for b in range(8):
                    if counts[b]:
                        rows.append((int(did), b, int(counts[b])))
            yield pd.DataFrame(rows, columns=["doc_id", "bin", "n_px"])

    return payload.mapInPandas(hist, "doc_id long, bin int, n_px long")


# ---------------------------------------------------------------------------
# src_xml_roundtrip — Spark 4 native XML datasource
# ---------------------------------------------------------------------------

_XML_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


@query(
    "src_xml_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def src_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML write → explicit-schema read → aggregate, on Spark 4's
    NATIVE XML datasource (no spark-xml jar — the format graduated
    into core) — the last ingest format beside CSV/JSON/ORC/parquet/
    text/binary ([P med]: municipal/GTFS-era feeds still ship XML).
    The oracle is the same aggregate straight from orders: the
    round-trip must be LOSSLESS, including double round-tripping
    through decimal text (Spark writes shortest-repr doubles and
    re-parses them exactly). Sum-of-price uses the house
    DECIMAL(18,4) exact-summation pattern (snk_parquet precedent);
    key/count sums are integer.

    Scale shape: XML parse cost is per-row and stays in the JVM
    (StaxXmlParser inside the scan stage); one combinable agg after.
    At 100 TB you'd land XML once into parquet (this exact query
    shape) and never re-scan the XML."""
    subset = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = scratch_dir("src_xml_roundtrip", sf_dir.strip("/").replace("/", "_"))
    (
        subset.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .save(path)
    )
    back = (
        spark.read.schema(_XML_SCHEMA)
        .format("xml")
        .option("rowTag", "order")
        .load(path)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").alias("sum_key"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# dq_pk_uniqueness — primary-key uniqueness audit across the catalog
# ---------------------------------------------------------------------------

_PK_TABLES = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
]


def _pk_audit_sql(tbl: str, keys: list[str]) -> str:
    kexpr = ", ".join(keys)
    return f"""
    SELECT '{tbl}' AS tbl,
           CAST(SUM(m) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_keys,
           CAST(MAX(m) AS BIGINT) AS max_mult
    FROM (SELECT COUNT(*) AS m FROM {tbl} GROUP BY {kexpr})
    """


@query(
    "dq_pk_uniqueness",
    oracle=" UNION ALL ".join(
        _pk_audit_sql(t, ks) for t, ks in _PK_TABLES
    ),
)
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the catalog — the first
    dq gate of any warehouse load ([P high]: the reference's intake
    dedups on trip id before anything else; this is the report that
    says whether it must). Per declared PK (including lineitem's
    COMPOSITE key): row count, distinct-key count, duplicated-key
    count, max multiplicity — all integers, one row per table.

    Plan shape: per table ONE combinable groupBy on the key (map-
    side partials collapse unique keys immediately) + a second agg
    over the per-key counts; the five audits are independent subtrees
    under one union (they run as parallel stages). At 100 TB each
    audit is the same single exchange its table's dedup would need
    anyway — this is the cheapest possible form of the question.

    r14 optimization round (guide §2.3 narrower types / shuffle
    fewer bytes): lineitem — the one COMPOSITE key, and the heaviest
    audit since a PK groupBy cannot map-side combine (every row is
    its own group, all rows ship) — groups on ONE packed long,
    ``l_orderkey*8 + l_linenumber``, instead of (bigint, int). The
    packing is injective on any TPC-H-shaped corpus: the spec fixes
    l_linenumber ∈ 1..7 at EVERY scale factor, and ×8 cannot
    overflow bigint below orderkey 2^60 (100 TB ≈ 2^39). The key
    never appears in the output (only per-key counts do), so the
    result is bit-identical — pinned against the composite-key twin
    in tests, and a corpus that ever violated the line-number bound
    would fail the declared composite-GROUP-BY oracle's hash gate
    VISIBLY, not silently. Isolated-process ×100 A/B (fresh process
    per form, 5 hot runs, 2 epochs): packed 6.792/5.480 s vs
    composite 13.281/7.271 s — the UnsafeRow the exchange carries
    drops from two 8-byte-aligned fields to one."""
    return _pk_audit(spark, sf_dir, pack_lineitem=True)


def _pk_uniqueness_composite_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pre-r14 form: lineitem groups on the raw composite
    (l_orderkey, l_linenumber) pair. Kept as the cross-form equality
    witness for the registered packed-long form (isolated ×100
    epochs: composite 13.281/7.271 s vs packed 6.792/5.480 s)."""
    return _pk_audit(spark, sf_dir, pack_lineitem=False)


def _pk_audit(
    spark: SparkSession, sf_dir: str, pack_lineitem: bool
) -> DataFrame:
    out = None
    for tbl, keys in _PK_TABLES:
        t = load(spark, sf_dir, tbl)
        if pack_lineitem and tbl == "lineitem":
            g = t.groupBy(
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias(
                    "packed_key"
                )
            )
        else:
            g = t.groupBy(*keys)
        m = g.agg(F.count(F.lit(1)).alias("m"))
        row = m.agg(
            F.sum("m").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("m") > 1, 1).otherwise(0)).alias("n_dup_keys"),
            F.max("m").alias("max_mult"),
        ).select(
            F.lit(tbl).alias("tbl"),
            "n_rows",
            "n_keys",
            "n_dup_keys",
            "max_mult",
        )
        out = row if out is None else out.unionAll(row)
    return out
