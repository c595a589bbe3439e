"""Round-6 breadth extensions, fifth batch — SURVEY.md §2.24.

Continues after §2.23 with the remaining operational surfaces a
reference user runs weekly: referential-integrity auditing (the FK
half of the PK audit), manifest-verified publication (the atomic-
swap publish contract), inter-arrival-time distributions (the
telemetry cadence histogram), base64 transport round-trips, token-
budgeted curriculum ordering (the corpus-side scheduling contract
beside split/shard), silence trimming over real decoded PCM, and
the Gini concentration coefficient (exact, decimal-cored).
Reference parity per SURVEY §0: the checkout was empty, so each
operator cites the public capability it generalizes ([P] tags).

House exactness rules (scripts/selfcheck.py + memory/oracle-parity-
hazards): integer cores; BIGINT casts over DuckDB HUGEINT; DECIMAL
accumulation with ONE double cast + shared IEEE tail at the output
boundary; epoch math only as within-engine differences; floor-then-
cast for double→int fixed-point lifts.
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
from .pipeline_r5 import _stage_wavs

# ---------------------------------------------------------------------------
# dq_fk_orphans — referential-integrity (foreign-key orphan) audit
# ---------------------------------------------------------------------------

# (label, child table, child key, parent table, parent key)
_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
]


def _fk_oracle() -> str:
    parts = []
    for label, ct, ck, pt, pk in _FK_EDGES:
        parts.append(f"""
        SELECT '{label}' AS fk,
               CAST((SELECT COUNT(*) FROM {ct}) AS BIGINT) AS n_child,
               CAST((SELECT COUNT(*) FROM {ct}
                     WHERE {ck} NOT IN (SELECT {pk} FROM {pt})) AS BIGINT)
                 AS n_orphan_rows,
               CAST((SELECT COUNT(DISTINCT {ck}) FROM {ct}
                     WHERE {ck} NOT IN (SELECT {pk} FROM {pt})) AS BIGINT)
                 AS n_orphan_keys""")
    return " UNION ALL ".join(parts)


@query("dq_fk_orphans", oracle=_fk_oracle())
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the declared FK graph —
    the other half of the intake dq gate beside `dq_pk_uniqueness`
    ([P high]: a provider feed referencing unknown devices/zones is
    the classic silent join-loss bug; the reference joins trips to
    census tracts and device registries, and rows that match nothing
    simply vanish from an inner join). Per FK edge: child rows,
    orphan rows (no parent), distinct orphan keys. The audited edges
    include one EXPECTED-dirty edge (events.user_id → customer) so
    the report demonstrably distinguishes clean from violated.

    Plan shape: per edge one LEFT ANTI join on the key + a 1-row
    count agg — at 100 TB each anti join is the same exchange the
    downstream equi-join needs anyway (or a broadcast when the
    parent's key column is dim-sized), and the six audits are
    independent parallel subtrees under one union. No FK key column
    beyond the join key is read (column pruning to 1-2 columns per
    scan)."""
    out = None
    for label, ct, ck, pt, pk in _FK_EDGES:
        child = load(spark, sf_dir, ct).select(F.col(ck).alias("k"))
        parent = load(spark, sf_dir, pt).select(F.col(pk).alias("k")).distinct()
        orphans = child.join(parent, "k", "left_anti")
        row = (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).alias("n_orphan_rows"),
                    F.count_distinct("k").alias("n_orphan_keys"),
                )
            )
            .select(
                F.lit(label).alias("fk"),
                "n_child",
                "n_orphan_rows",
                "n_orphan_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# snk_manifest_publish — manifest-verified partitioned publication
# ---------------------------------------------------------------------------


@query(
    "snk_manifest_publish",
    oracle="""
    WITH pub AS (
      SELECT month(CAST(o_orderdate AS TIMESTAMP)) AS m,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS n_files,
           CAST(COUNT(DISTINCT m) AS BIGINT) AS n_months,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(0 AS BIGINT) AS n_mismatch
    FROM pub
    """,
)
def snk_manifest_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-verified publication — the atomic-swap publish
    contract ([P high]: the reference publishes public datasets on a
    schedule; production lakehouse publishes pair the data files
    with a MANIFEST of per-file row counts/checksums so consumers
    can verify completeness and readers can swap atomically). The
    month-partitioned snapshot (one file per month: repartition by
    the partition column means each month lands in exactly one
    task) is written, a manifest derived from the FILES THEMSELVES
    (input_file_name + per-file totals) is written beside it, and
    the verification re-aggregates the data per month AGAINST the
    manifest — n_mismatch counts months whose manifest row/cents
    totals disagree with the files, so a dropped file, double write,
    or stale manifest flips the hash (and the totals themselves are
    cross-checked against the source closed-form by the oracle).

    Plan shape: one repartition exchange for the 1-file-per-month
    layout (the publish-layout cost, same as snk_partitioned), one
    file-granular agg for the manifest, one month agg + broadcast
    join for verification. Integer cents via the shared
    floor(x*100+0.5) lift (hazard: bare CAST rounds vs truncates).

    r12 decomposition (BASELINE.md round-12 section; was the 2.66x
    INCLUSIVE row): at x100 the phases split write 3.86 s (3.07x —
    scan+project+repartition 1.99 s noop-measured, parquet writer
    proper ~1.87 s ≈ 125 ns/row), manifest 0.71 s, verify 0.52 s
    (dispatch-floor absolutes). Writer-knob ledger all measured, none
    beats default snappy (zstd 4.45 s, lz4 4.40 s, uncompressed
    4.69 s, dictionary-off 4.09 s, dict-off+8MB-pages 4.25 s);
    maxRecordsPerFile is moot — n_files=12 is hash-checked, so the
    repartition stands. CLOSED-AS-CONSTANT-FACTOR with the constant
    named: the InternalRow→Parquet per-row writer path vs DuckDB's
    vectorized native writer; executor-parallel at 100 TB."""
    data_dir = scratch_dir(
        "snk_manifest_pub", sf_dir.strip("/").replace("/", "_"), "data"
    )
    man_dir = scratch_dir(
        "snk_manifest_pub", sf_dir.strip("/").replace("/", "_"), "manifest"
    )
    pub = load(spark, sf_dir, "orders").select(
        F.month(F.col("o_orderdate").cast("timestamp")).alias("m"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    (
        pub.repartition(12, "m")
        .write.mode("overwrite")
        .partitionBy("m")
        .parquet(data_dir)
    )
    back = spark.read.parquet(data_dir)
    manifest = (
        back.groupBy(F.input_file_name().alias("file"), "m")
        .agg(F.count(F.lit(1)).alias("m_rows"), F.sum("cents").alias("m_cents"))
    )
    manifest.write.mode("overwrite").parquet(man_dir)
    man = spark.read.parquet(man_dir)
    man_by_month = man.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("m_rows").alias("man_rows"),
        F.sum("m_cents").alias("man_cents"),
    )
    data_by_month = back.groupBy("m").agg(
        F.count(F.lit(1)).alias("d_rows"), F.sum("cents").alias("d_cents")
    )
    v = data_by_month.join(F.broadcast(man_by_month), "m")
    return v.agg(
        F.sum("n_files").alias("n_files"),
        F.count(F.lit(1)).alias("n_months"),
        F.sum("d_rows").alias("total_rows"),
        F.sum("d_cents").alias("total_cents"),
        F.sum(
            F.when(
                (F.col("d_rows") != F.col("man_rows"))
                | (F.col("d_cents") != F.col("man_cents")),
                1,
            ).otherwise(0)
        ).alias("n_mismatch"),
    )


# ---------------------------------------------------------------------------
# evt_interarrival_hist — inter-event gap distribution
# ---------------------------------------------------------------------------


@query(
    "evt_interarrival_hist",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT CAST(LEAST(gap_us // 60000000, 60) AS BIGINT) AS gap_min_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
)
def evt_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time histogram — the telemetry cadence
    distribution ([P med]: "how often do devices report?" drives
    both the reference's availability math and anomaly thresholds;
    the histogram of per-entity consecutive gaps is its standard
    answer). Gap = within-user consecutive epoch-µs difference
    (lag over (ts, event_id) total order), binned to minutes and
    capped at a 60+ tail bucket — all integer, TZ-immune (offsets
    cancel in the difference, hazard rule 10).

    Plan shape: one window exchange on user (shared with every other
    per-user sequence operator — at 100 TB this partitioning is
    produced once and reused), then ONE combinable ≤61-cell agg.
    The distinct-user count per bucket is Spark's inherent 2-phase
    distinct expansion over the already-small (bucket, user)
    stream."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("eu"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn("gap_us", F.col("eu") - F.lag("eu").over(w)).where(
        F.col("gap_us").isNotNull()
    )
    return (
        g.select(
            "user_id",
            F.least(F.expr("gap_us div 60000000"), F.lit(60)).alias(
                "gap_min_bucket"
            ),
        )
        .groupBy("gap_min_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# fn_base64_roundtrip — base64 transport encode/decode
# ---------------------------------------------------------------------------


@query(
    "fn_base64_roundtrip",
    oracle="""
    WITH b AS (
      SELECT lang, text, to_base64(encode(text)) AS b64 FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(b64)) AS BIGINT) AS sum_b64_len,
           CAST(SUM(CASE WHEN decode(from_base64(b64)) = text
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
           MIN(substr(b64, 1, 8)) AS min_prefix
    FROM b GROUP BY lang
    """,
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 transport round-trip — the wire-encoding scalar family
    member ([P med]: provider APIs ship payloads base64-wrapped;
    binary columns cross JSON boundaries the same way). Per lang:
    docs, RFC-4648 encoded length (no line wrapping on either
    engine), round-trip-exact count (decode(encode(x)) == x must
    hold for EVERY row), and the binary-collation min of the first 8
    encoded chars (pins the actual alphabet, not just lengths).

    Plan shape: pure codegen scalars + ONE combinable agg —
    scan-bound at 100 TB. The encoded length also cross-checks the
    closed form 4*ceil(n/3) against the engine's real output via
    the oracle's independent implementation.

    Engine note (measured here): Spark's `base64` is the RFC-2045
    MIME encoder — it wraps at 76 chars with CRLF — while DuckDB's
    to_base64 is unwrapped RFC 4648. The declared semantics is the
    TRANSPORT-NORMALIZED (unwrapped) form, so the engine strips the
    soft line breaks; `unbase64` accepts both."""
    b = load(spark, sf_dir, "documents").select(
        "lang",
        "text",
        # CRLF strip A/B at x100 (BASELINE.md): replace() 0.54 s <
        # regexp_replace 0.78 s < translate 1.22 s — single-pass
        # literal replace wins; the pairs only ever occur together.
        F.expr(r"replace(base64(cast(text as binary)), '\r\n', '')").alias("b64"),
    )
    return b.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("b64")).alias("sum_b64_len"),
        F.sum(
            F.when(F.unbase64("b64").cast("string") == F.col("text"), 1).otherwise(0)
        ).alias("n_roundtrip_ok"),
        F.min(F.substring("b64", 1, 8)).alias("min_prefix"),
    )


# ---------------------------------------------------------------------------
# llm_curriculum_order — token-budgeted curriculum prefix
# ---------------------------------------------------------------------------


@query(
    "llm_curriculum_order",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS tokens,
             (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
               // length(text) AS score_milli
      FROM documents
    ), ordered AS (
      SELECT *,
             SUM(tokens) OVER (ORDER BY score_milli DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens,
             SUM(tokens) OVER () AS total_tokens
      FROM scored
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(tokens) AS BIGINT) AS tokens_kept,
           CAST(MIN(score_milli) AS BIGINT) AS min_score_milli
    FROM ordered
    WHERE 2 * cum_tokens <= total_tokens
    GROUP BY lang
    """,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted curriculum prefix — the corpus scheduling
    contract beside split and shard assignment ([P med]: curriculum
    training consumes the HIGHEST-QUALITY half (or epoch budget) of
    the corpus first; the cut must be deterministic and total-order
    stable or two runs train on different data). Quality = integer
    milli-ratio of alphabetic chars (the quality-score family's
    integer core); the curriculum keeps documents in (score DESC,
    doc_id) order while twice the running token sum stays within the
    corpus total — an exact integer prefix predicate, no FP
    anywhere.

    Plan shape: codegen scoring map-side, then a single-partition
    running-sum window over the GLOBAL order — inherent to a total
    order over the whole corpus, but the windowed rows are the slim
    (id, lang, 2 ints) projection, not text. At 100 TB the
    production form buckets by score band first (band totals give
    each band's cumulative offset — the same two-pass trick as
    srt_topk_global) and runs this window within the boundary band
    only; declared semantics identical."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("tokens"),
        F.expr(
            "(1000 * length(regexp_replace(text, '[^A-Za-z]', ''))) "
            "div length(text)"
        ).alias("score_milli"),
    )
    w = (
        Window.orderBy(F.col("score_milli").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = docs.select(
        "doc_id",
        "lang",
        "tokens",
        "score_milli",
        F.sum("tokens").over(w).alias("cum_tokens"),
        F.sum("tokens").over(
            Window.partitionBy()
        ).alias("total_tokens"),
    )
    return (
        ordered.where(2 * F.col("cum_tokens") <= F.col("total_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("tokens").alias("tokens_kept"),
            F.min("score_milli").alias("min_score_milli"),
        )
    )


# ---------------------------------------------------------------------------
# mm_audio_silence_trim — silence-trim bounds over real decoded PCM
# ---------------------------------------------------------------------------

_SILENCE_T = 9000


@query(
    "mm_audio_silence_trim",
    oracle=f"""
    WITH clips AS (
      SELECT DISTINCT user_id % 200 AS clip_id FROM events
    ), dims AS (
      SELECT clip_id, 400 + (clip_id % 7) * 160 AS n FROM clips
    ), s AS (
      SELECT d.clip_id, d.n, p.k,
             (d.clip_id * 7919 + p.k * 104729) % 20001 - 10000 AS amp
      FROM dims d CROSS JOIN range(1360) p(k)
      WHERE p.k < d.n
    ), loud AS (
      SELECT clip_id, n,
             MIN(CASE WHEN abs(amp) >= {_SILENCE_T} THEN k END) AS first_loud,
             MAX(CASE WHEN abs(amp) >= {_SILENCE_T} THEN k END) AS last_loud,
             SUM(CASE WHEN abs(amp) >= {_SILENCE_T} THEN 1 ELSE 0 END) AS n_loud
      FROM s GROUP BY clip_id, n
    )
    SELECT clip_id,
           CAST(n AS INT) AS n_samples,
           CAST(COALESCE(first_loud, -1) AS INT) AS first_loud,
           CAST(COALESCE(last_loud, -1) AS INT) AS last_loud,
           CAST(n_loud AS BIGINT) AS n_loud,
           CAST(CASE WHEN first_loud IS NULL THEN 0
                     ELSE last_loud - first_loud + 1 END AS INT) AS trimmed_len
    FROM loud
    """,
)
def mm_audio_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence trimming over REAL decoded PCM — the third audio
    operator (decode → features → TRIM; [P med]: leading/trailing
    silence removal is the first edit every speech-corpus pipeline
    applies, and its byte-exact bounds decide what downstream
    features see). Per clip: the first/last sample whose |amplitude|
    ≥ 9000, the above-threshold sample count, and the trimmed
    length. The staged table carries (clip_id, wav BINARY) only —
    bounds come from struct-unpacking the actual RIFF header and
    one vectorized np.nonzero over the int16 samples; the oracle
    re-derives every bound from the pre-encode closed form
    amp(k) = (clip_id·7919 + k·104729) % 20001 − 10000, so a wrong
    header offset, endianness, or off-by-one bound flips the hash.

    Plan shape: stateless Arrow mapInPandas, zero shuffle,
    O(clips) output — scan-bound and embarrassingly parallel at
    100 TB, identical to the decode/feature siblings."""
    staged = spark.read.parquet(_stage_wavs(spark, sf_dir))

    def trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, blob in zip(pdf["clip_id"], pdf["wav"]):
                b = bytes(blob)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError(f"bad wav container for clip {cid}")
                (data_len,) = struct.unpack_from("<I", b, 40)
                amps = np.frombuffer(b, "<i2", data_len // 2, 44)
                loud = np.nonzero(np.abs(amps.astype(np.int32)) >= _SILENCE_T)[0]
                if len(loud):
                    first, last = int(loud[0]), int(loud[-1])
                    tlen = last - first + 1
                else:
                    first = last = -1
                    tlen = 0
                rows.append(
                    (int(cid), len(amps), first, last, int(len(loud)), tlen)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id",
                    "n_samples",
                    "first_loud",
                    "last_loud",
                    "n_loud",
                    "trimmed_len",
                ],
            )

    return staged.mapInPandas(
        trim,
        schema=(
            "clip_id long, n_samples int, first_loud int, last_loud int, "
            "n_loud long, trimmed_len int"
        ),
    )


# ---------------------------------------------------------------------------
# agg_gini — exact Gini concentration coefficient
# ---------------------------------------------------------------------------


@query(
    "agg_gini",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                        o_orderkey) AS i
      FROM orders
    ), s AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sum_cents,
             SUM(i * cents) AS s2
      FROM c GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n, sum_cents,
           ROUND((2.0 * CAST(s2 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sum_cents AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
    FROM s
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini concentration coefficient of order value per
    priority class — the inequality summary ([P med]: "is fleet
    revenue concentrated in few trips/devices?" is a standard ops
    question; Gini is its canonical statistic). Computed by the
    rank formula G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over ascending
    values — Σ i·xᵢ is invariant under tie permutations (equal x
    share the rank-block sum regardless of assignment), which is
    exactly what makes the HISTOGRAM form below legal.

    r14 registered plan — rank-block histogram, no per-row rank:
    the pre-r14 form ranked every row with a window partitioned by
    the 5 priority classes (parallelism 5, a full per-group sort of
    the whole fact — the evt_outlier_mad disease). But the value
    domain ≪ rows (~150k distinct cents vs 3M rows/group at ×100),
    so the same Σ i·xᵢ falls out of the (priority, cents) histogram:
    a tie block of c rows at cumulative offset C occupies ranks
    C+1..C+c, whose exact rank sum is c·C + c(c+1)/2, giving
    Σ i·xᵢ = Σ_cells cents·(c·C + c(c+1)/2). The map-side-combinable
    histogram groupBy replaces the row shuffle, and the only sort
    left is over cells (~20× fewer rows per group). Isolated-process
    ×100 A/B (fresh process per form, 5 hot runs, 2 epochs):
    hist 2.444/2.433 s vs rank 10.758/9.681 s vs DuckDB
    8.054/7.231 s — ~4× faster, 0.30–0.34× vs the oracle. The rank
    form stays as ``_gini_rank_twin``, equality-pinned (driver
    corpus + synthetic tie-block corpus).

    Exactness: values lift to integer cents via the shared
    floor(x·100+0.5) tree (hazard: bare double→int CAST rounds in
    DuckDB, truncates in Spark); the block rank sum c·C + c(c+1)/2
    is long-exact (c, C ≤ rowcount; products ≤ n² ≈ 2.3e14 at ×100,
    far under 2^63, and c(c+1) is always even so ``div 2`` is
    exact), lifted to DECIMAL(38) BEFORE the ×cents product exactly
    as the twin lifts i — identical integer s2, identical 6-op
    shared IEEE tail + ROUND 6."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    cells = o.groupBy("o_orderpriority", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    # cumulative rows BEFORE this cell in (cents asc) order — cells
    # are unique per (priority, cents) so no tie-frame ambiguity
    wc = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cells.withColumn("cbefore", F.coalesce(F.sum("c").over(wc), F.lit(0)))
    block = (
        F.col("c") * F.col("cbefore") + F.expr("(c * (c + 1)) div 2")
    ).cast("decimal(38,0)")
    s = cum.groupBy("o_orderpriority").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("cents")).alias("sum_cents"),
        F.sum(block * F.col("cents")).alias("s2"),
    )
    return _gini_tail(s)


def _gini_rank_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r14 per-row window-rank form, kept as the cross-form
    equality witness for the registered histogram plan (isolated
    ×100 epochs: rank 10.758/9.681 s vs hist 2.444/2.433 s). The
    declared (cents, orderkey) order makes the per-row ranking fully
    deterministic, and Σ i·xᵢ is tie-permutation invariant, so both
    forms compute the same exact DECIMAL s2."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    c = o.withColumn("i", F.row_number().over(w))
    s = c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
    )
    return _gini_tail(s)


def _gini_tail(s: DataFrame) -> DataFrame:
    """Shared output tail: the ONE exact→double cast + 6-op IEEE
    Gini expression + ROUND 6, identical across both forms and the
    DuckDB oracle."""
    nd = F.col("n").cast("double")
    return s.select(
        "o_orderpriority",
        "n",
        "sum_cents",
        F.round(
            (2.0 * F.col("s2").cast("double")) / (nd * F.col("sum_cents").cast("double"))
            - (nd + 1.0) / nd,
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# dq_skew_report — join/group key skew diagnostics
# ---------------------------------------------------------------------------

# (label, table, key column)
_SKEW_COLS = [
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
]


def _skew_oracle() -> str:
    parts = []
    for label, tbl, col in _SKEW_COLS:
        parts.append(f"""
        SELECT '{label}' AS key_col, n_rows, n_keys, max_mult,
               CAST((1000000 * top10) // n_rows AS BIGINT) AS top10_share_ppm,
               CAST((1000 * max_mult * n_keys) // n_rows AS BIGINT) AS skew_milli
        FROM (
          SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(MAX(c) AS BIGINT) AS max_mult,
                 CAST(SUM(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS BIGINT)
                   AS top10
          FROM (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC) AS rk
            FROM (SELECT COUNT(*) AS c FROM {tbl} GROUP BY {col})
          )
        )""")
    return " UNION ALL ".join(parts)


@query("dq_skew_report", oracle=_skew_oracle())
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/group-key SKEW diagnostics — the pre-flight report behind
    every 100 TB shuffle decision ([P high] for the scale story: a
    key whose hottest value holds a material share of the table
    makes the plain hash-shuffle join a straggler; whether to salt,
    broadcast, or rely on AQE's skew-join split is decided from
    EXACTLY these figures, and flying blind is how 1000-executor
    jobs stall on one task). Per audited key column: rows, distinct
    keys, max multiplicity, the top-10 keys' ppm share of rows, and
    skew_milli = hottest/average in milli units (1000 = perfectly
    uniform).

    All integers (top-10 share is tie-safe: the sum of the 10
    largest COUNTS is invariant under which tied keys rank 10th).
    Plan shape: per column ONE combinable key-groupBy (the same
    exchange the real join would pay) + a window/agg over the
    per-key count summary; five independent parallel subtrees under
    a union. At 100 TB this runs on the key columns only (1-column
    scans) or rides a sample."""
    out = None
    for label, tbl, col in _SKEW_COLS:
        counts = (
            load(spark, sf_dir, tbl)
            .groupBy(F.col(col))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        ranked = counts.select(
            "c", F.row_number().over(Window.orderBy(F.col("c").desc())).alias("rk")
        )
        row = ranked.agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_mult"),
            F.sum(F.when(F.col("rk") <= 10, F.col("c")).otherwise(0)).alias("top10"),
        ).select(
            F.lit(label).alias("key_col"),
            "n_rows",
            "n_keys",
            "max_mult",
            F.expr("(1000000 * top10) div n_rows").alias("top10_share_ppm"),
            F.expr("(1000 * max_mult * n_keys) div n_rows").alias("skew_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out
