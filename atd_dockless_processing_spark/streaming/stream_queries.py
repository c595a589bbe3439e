"""Structured Streaming operators — SURVEY.md §2.10 (stm_*).

The reference runs scheduled batch pulls from provider APIs ([P
high], SURVEY §3.1); the Spark-native equivalent is micro-batch
Structured Streaming with ``trigger(availableNow=True)`` — drain
everything available, maintain state (windows / dedup) exactly as a
24/7 stream would, then stop. Results land in a memory sink and are
returned as a batch DataFrame (driver contract requires DataFrame
returns).

Determinism: availableNow + a single input snapshot = one
deterministic batch sequence, so windowed/dedup results equal their
batch twins and are hash-checkable (SURVEY §7 hard-part #3). The
late-data demo forces multi-batch processing with
maxFilesPerTrigger=1 and is declared rows-only.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.pipeline_r5 import (
    _HLL_EST,
    _HLL_RHO,
    _HLL_TERM_DUCK,
    _HLL_TERM_SPARK,
)
from ..registry import query
from ..tables import events_ts_to_timestamp, load, scratch_dir

# The file stream source requires an explicit schema. events.ts has
# shipped as both TIMESTAMP(NANOS) (long under nanosAsLong) and
# TIMESTAMP(MICROS) (NTZ) — so the schema is taken from a batch
# footer read of the actual file (cheap, cached per staged dir) and
# the ts dtype is normalized post-read by events_ts_to_timestamp,
# exactly like the batch loader. A hard-coded schema here cost round
# 2 three streaming keys when the testdata encoding flipped.
_RAW_SCHEMA_CACHE: dict = {}  # path -> (mtime_ns, schema)


def _events_raw_schema(spark: SparkSession, path: str) -> T.StructType:
    # one entry per path, overwritten on mtime change: an in-place
    # rewrite of the source file (same inode, so the hard-linked
    # staging sees the new bytes immediately) invalidates the cached
    # schema without accumulating stale entries across regenerations
    mtime = os.stat(path).st_mtime_ns
    hit = _RAW_SCHEMA_CACHE.get(path)
    if hit is None or hit[0] != mtime:
        hit = (mtime, spark.read.parquet(path).schema)
        _RAW_SCHEMA_CACHE[path] = hit
    return hit[1]


class _stream_partitions:
    """Run a streaming query with few state partitions at test scale.

    A stateful micro-batch pays a fixed per-partition cost (state
    store open/commit + task launch) every batch; with the session's
    batch setting of 32 that fixed cost dominates sub-second streams
    at sf<=0.1. The state-partition count is baked into each query's
    NEW checkpoint at first batch, so narrowing it here only affects
    these self-contained drains. At 100 TB you'd raise it (state
    partitioning, like shuffle partitioning, scales with executors) —
    this is a test-latency knob, not a semantics change: windowed/
    dedup results are partitioning-invariant.
    """

    N = "8"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.N)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _run_to_memory(sdf, name: str, output_mode: str) -> None:
    with _stream_partitions(sdf.sparkSession):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. The file source needs
    a directory, so the single parquet file is staged (hard-linked or
    copied) into a scratch dir once per scale factor."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = scratch_dir("stream_events", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "events.parquet")
    src = f"{sf_dir}/events.parquet"
    # re-stage when the source file changed underneath the scratch
    # copy (testdata regeneration) — a stale staged file silently
    # serves old data/encoding otherwise
    s = os.stat(src)
    if os.path.exists(dst):
        d = os.stat(dst)
        fresh = d.st_ino == s.st_ino or (d.st_size, d.st_mtime) == (s.st_size, s.st_mtime)
        if not fresh:
            os.remove(dst)
    if not os.path.exists(dst):
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
            shutil.copystat(src, dst)
    raw = spark.readStream.schema(_events_raw_schema(spark, dst)).parquet(stage)
    return events_ts_to_timestamp(raw)


@query(
    "stm_tumbling_availablenow",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stm_tumbling_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of evt_tumbling_hour: readStream -> hourly
    window agg -> memory sink, availableNow. Same result as the batch
    query — micro-batch is just incremental planning over the same
    logical plan ([P high]: scheduled pulls -> micro-batch)."""
    name = f"stm_tumbling_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )
    _run_to_memory(agg, name, "complete")
    return spark.table(name)


@query(
    "stm_watermark_dedup",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events
    GROUP BY event_type
    """,
)
def stm_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: withWatermark(1h) + dropDuplicates(event_id),
    then count per type. Idempotent re-ingest semantics ([P high]:
    overlapping provider re-pulls). The watermark bounds dedup state
    at 100 TB — old keys are evicted after the lateness horizon."""
    name = f"stm_dedup_{uuid.uuid4().hex[:8]}"
    deduped = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    _run_to_memory(deduped, name, "complete")
    return spark.table(name)


@query(
    "stm_rate_source_window",
    oracle="""
    SELECT CAST(v // 2000 AS BIGINT) AS minute_idx,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS BIGINT) AS sum_value
    FROM generate_series(0, 9999) t(v)
    GROUP BY 1
    """,
)
def stm_rate_source_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL (non-file) streaming source with exactly-once restart
    semantics: Spark's built-in deterministic ``rate-micro-batch``
    source (each batch is exactly ``rowsPerBatch`` rows; ``value`` is
    the global row index; every row in batch b carries timestamp
    startTimestamp + b·advanceMillisPerBatch). The query is run as
    FIVE SEPARATE availableNow drains sharing one checkpoint — each
    drain processes exactly one batch and stops, the next restart
    resumes from the committed offset, and the windowed-aggregate
    state store recovers across every restart — so the final complete-
    mode output is the exact 5-batch aggregate with no duplicates and
    no gaps. This is the offset-log/state-recovery demo the file-based
    stm_* keys can't express (their sources re-list files), and the
    closest sandbox-honest stand-in for a Kafka replay (VERDICT r6
    "What's missing" #4).

    Determinism: value and timestamp are pure functions of the batch
    index, so the oracle is closed-form over generate_series; the
    window start is emitted as an INTEGER minute index via
    unix_millis (instant-based — immune to the driver session's local
    timezone, unlike a raw timestamp column from a non-parquet
    source). All-integer outputs; DuckDB's HUGEINT sum is cast back
    to BIGINT (hazard #1). The per-call uuid checkpoint keeps reruns
    idempotent (a reused checkpoint would CONTINUE past batch 5);
    it is removed after the final drain."""
    ckpt = os.path.join(
        scratch_dir("stm_rate_ckpt", uuid.uuid4().hex[:8]), "ckpt"
    )
    try:
        for b in range(5):
            src = (
                spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", 2000)
                .option("numPartitions", 4)
                .option("startTimestamp", 0)
                .option("advanceMillisPerBatch", 60000)
                .load()
            )
            agg = (
                src.groupBy(F.window("timestamp", "1 minute").alias("w"))
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("value").alias("sum_value"),
                )
                .select(
                    (F.unix_millis(F.col("w.start")) / F.lit(60000))
                    .cast("long")
                    .alias("minute_idx"),
                    "n_rows",
                    "sum_value",
                )
            )
            name = f"stm_rate_{uuid.uuid4().hex[:8]}"
            with _stream_partitions(spark):
                q = (
                    agg.writeStream.format("memory")
                    .queryName(name)
                    .outputMode("complete")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
        # decouple the returned frame from the about-to-be-removed
        # checkpoint (memory-sink rows live on the driver already)
        return spark.createDataFrame(
            spark.table(name).collect(), spark.table(name).schema
        )
    finally:
        shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)


@query(
    "stm_state_store_read",
    oracle="""
    SELECT CAST(v // 2000 AS BIGINT) AS minute_idx,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM generate_series(0, 5999) t(v)
    GROUP BY 1
    """,
)
def stm_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATE STORE READER (Spark 4 `statestore` data source): a
    checkpointed streaming aggregation's internal state inspected
    OFFLINE as a DataFrame — the ops/debugging surface for a 24/7
    pipeline (what is my watermark holding? which window's count is
    wrong?) that file-sink outputs can't show. A 3-restart
    deterministic rate-micro-batch windowed count builds the
    checkpoint (same exactly-once machinery as
    stm_rate_source_window), then `spark.read.format("statestore")
    .load(ckpt)` reads the LAST committed state: key = the window
    struct, value = the running count. The minute index is emitted
    via unix_millis (tz-immune) and the state counts are
    closed-form, so the read is hash-checkable — a dropped batch,
    double-applied batch, or state-schema drift flips it."""
    ckpt = os.path.join(
        scratch_dir("stm_ssr_ckpt", uuid.uuid4().hex[:8]), "ckpt"
    )
    try:
        for _ in range(3):
            src = (
                spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", 2000)
                .option("numPartitions", 4)
                .option("startTimestamp", 0)
                .option("advanceMillisPerBatch", 60000)
                .load()
            )
            agg = src.groupBy(
                F.window("timestamp", "1 minute").alias("w")
            ).agg(F.count(F.lit(1)).alias("n_rows"))
            with _stream_partitions(spark):
                q = (
                    agg.writeStream.format("memory")
                    .queryName(f"stm_ssr_{uuid.uuid4().hex[:8]}")
                    .outputMode("complete")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                (F.unix_millis(F.col("key.window.start")) / F.lit(60000))
                .cast("long")
                .alias("minute_idx"),
                # the state schema names the field after the PHYSICAL
                # aggregate (count), not the DataFrame alias
                F.col("value.count").cast("long").alias("n_rows"),
            )
        )
        # materialize BEFORE the checkpoint (the reader's backing
        # files) is removed
        return spark.createDataFrame(state.collect(), state.schema)
    finally:
        shutil.rmtree(os.path.dirname(ckpt), ignore_errors=True)


@query("stm_late_data_drop")  # rows-only: engine-specific watermark semantics
def stm_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics demo (rows-only). Two files —
    recent events, then events >2h older — processed as separate
    micro-batches (maxFilesPerTrigger=1). The watermark advances
    after batch 1, so batch 2's late rows are dropped from the
    append-mode windowed aggregate ([P med]: late provider data)."""
    base = scratch_dir("stm_late_data", sf_dir.strip("/").replace("/", "_"))
    indir = f"{base}/in"
    staged = [os.path.join(indir, f"f{i}.parquet") for i in range(2)]
    # freshness marker: staged files derive from the source snapshot;
    # re-stage if the source changed (testdata regeneration)
    marker = f"{base}/src_mtime"
    src_sig = str(os.stat(f"{sf_dir}/events.parquet").st_mtime_ns)
    stale = True
    if all(os.path.exists(p) for p in staged) and os.path.exists(marker):
        with open(marker) as fh:
            stale = fh.read().strip() != src_sig
    if stale:
        # stage once per sf_dir (the two files are a pure function of
        # the input snapshot — repeated selfcheck runs reuse them
        # instead of paying two coalesce(1) write jobs per run)
        shutil.rmtree(indir, ignore_errors=True)
        os.makedirs(indir)
        ev = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props",
        )
        recent = ev.where(F.col("ts") >= "2024-01-10")
        late = ev.where(F.col("ts") < "2024-01-08")
        for i, part in enumerate([recent, late]):
            tmp = f"{base}/tmp{i}"
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = next(
                p for p in os.listdir(tmp) if p.startswith("part-") and p.endswith(".parquet")
            )
            dst = staged[i]
            shutil.move(os.path.join(tmp, src), dst)
            # file source orders batches by modification time: force it
            os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
            shutil.rmtree(tmp, ignore_errors=True)
        with open(marker, "w") as fh:
            fh.write(src_sig)

    name = f"stm_late_{uuid.uuid4().hex[:8]}"
    ts_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(ts_schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", False)
        .parquet(indir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour_start"), "n_events")
    )
    ckpt = f"{base}/ckpt_{uuid.uuid4().hex[:8]}"
    with _stream_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # fresh checkpoints are required per run (file-source offsets live
    # there; reusing one would skip all input) — so drop it after the
    # drain instead of leaking one dir per invocation
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# NB: the oracle's "> 1800" gap rule must stay in lockstep with Spark's
# merge-at-exactly-gap session semantics; the same rule appears in the
# sessionization oracles in events.py, stream_queries.py and pipeline_r3.py —
# change all or none (oracle SQL is newline-collapsed, so no -- comments).
@query(
    "stm_stateful_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sess AS (
      SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), sized AS (
      SELECT user_id, sid, COUNT(*) AS n FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n) AS BIGINT) AS max_session_events
    FROM sized GROUP BY user_id
    """,
)
def stm_stateful_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator via applyInPandasWithState:
    per-user 30-minute-gap sessionization with explicit GroupState
    (last event time + running session count carried across
    micro-batches). The arbitrary-state API is the Spark-native
    answer to operators the built-in windowed aggs can't express —
    the micro-batch generalization of the reference's scheduled
    stateless pulls.

    Determinism/hash-check: availableNow over the single staged
    snapshot yields one micro-batch containing every event, and the
    UDF sorts each group by (ts, event_id), so the emitted session
    stats equal the batch lag-based sessionization SQL. State is
    still exercised (written, then read back on the final emit)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    name = f"stm_sess_{uuid.uuid4().hex[:8]}"
    ev = _stream_events(spark, sf_dir).select("user_id", "ts", "event_id")

    def sessionize(key, pdfs, state: GroupState):
        gap_s = 1800
        if state.exists:
            last_ts, n_sessions, cur_len, max_len = state.get
        else:
            last_ts, n_sessions, cur_len, max_len = None, 0, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                t = t.timestamp()
                if last_ts is None or t - last_ts > gap_s:
                    n_sessions += 1
                    max_len = max(max_len, cur_len)
                    cur_len = 1
                else:
                    cur_len += 1
                last_ts = t
        max_len = max(max_len, cur_len)
        state.update((last_ts, n_sessions, cur_len, max_len))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "max_session_events": [max_len],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType="user_id long, n_sessions long, max_session_events long",
        stateStructType="last_ts double, n_sessions long, cur_len long, max_len long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    _run_to_memory(out, name, "update")
    return spark.table(name)


@query(
    "stm_stateful_running",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stm_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming running totals per event type in complete output
    mode — the stateful-aggregation surface without custom state
    ([P low]: running totals). Hash-checked since round 4: the
    availableNow drain's FINAL complete-mode snapshot equals the
    batch aggregate exactly. Counts are arrival-order independent;
    IEEE double sums are NOT (micro-batch vs DuckDB accumulation
    order can flip the 4th decimal), so the value is cast to
    DECIMAL(18,4) inside SUM on BOTH sides — exact, order-free
    addition, same pattern as snk_parquet/src_schema_merge."""
    name = f"stm_running_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
        )
    )
    _run_to_memory(agg, name, "complete")
    return spark.table(name)


@query(
    "stm_join_stream_static",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stm_join_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the
    static customer dimension inside the micro-batch plan, then
    aggregated — the canonical streaming-enrichment pattern (each
    micro-batch joins against the CURRENT dim snapshot; no state is
    kept for the static side, and at 100 TB the dim side is a
    broadcast per micro-batch or a Delta/lake table picked up fresh
    on every trigger)."""
    name = f"stm_enrich_{uuid.uuid4().hex[:8]}"
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = (
        _stream_events(spark, sf_dir)
        .join(cust, F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
        )
    )
    _run_to_memory(enriched, name, "complete")
    return spark.table(name)


@query(
    "stm_foreachbatch_sink",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stm_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: the streaming escape hatch for sinks Spark
    has no native writer for (the reference's Socrata/Postgres upsert
    targets, [P high] — each micro-batch would be one idempotent
    upsert call). Here each micro-batch appends to parquet; after the
    availableNow drain the sink directory is read back and aggregated
    — content is batching-invariant, so the result hash-matches the
    batch oracle."""
    # fixed sink path per sf_dir, cleared up front: foreachBatch
    # APPENDS per micro-batch, so a stale directory would double-count
    # — and uuid-per-run names would leak one dir per invocation
    out = scratch_dir(
        "stm_foreachbatch", sf_dir.strip("/").replace("/", "_"), "out"
    )
    shutil.rmtree(out, ignore_errors=True)

    def _write_batch(bdf: DataFrame, _batch_id: int) -> None:
        bdf.select("event_id", "event_type", "value").write.mode("append").parquet(out)

    ckpt = scratch_dir("stm_foreachbatch", f"ckpt_{uuid.uuid4().hex[:8]}")
    q = (
        _stream_events(spark, sf_dir)
        .writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
    )


@query(
    "stm_sliding_watermark",
    oracle="""
    WITH offs AS (SELECT UNNEST([0, 1800]) AS off)
    SELECT make_timestamp(
             ((FLOOR((epoch(CAST(ts AS TIMESTAMP)) - off) / 3600) * 3600 + off) * 1000000)::BIGINT
           ) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events CROSS JOIN offs
    GROUP BY 1, 2
    """,
)
def stm_sliding_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of evt_sliding_window: 1-hour windows sliding
    every 30 minutes (each event lands in 2 windows) with a 1-hour
    watermark, drained under availableNow. The watermark bounds
    window state at 100 TB — closed windows are evicted from the
    state store once the event-time horizon passes, so state size
    follows the lateness bound, not the stream length. Complete mode
    + one input snapshot keeps the result equal to the batch twin
    (hash-checkable)."""
    name = f"stm_sliding_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    _run_to_memory(agg, name, "complete")
    return spark.table(name)


# NB: the oracle's "> 1800" gap rule must stay in lockstep with Spark's
# merge-at-exactly-gap session semantics; the same rule appears in the
# sessionization oracles in events.py, stream_queries.py and pipeline_r3.py —
# change all or none (oracle SQL is newline-collapsed, so no -- comments).
@query(
    "stm_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stm_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING native session windows: the same
    ``session_window('ts', '30 minutes')`` aggregate as the batch twin
    (evt_session_window_native), but running inside a micro-batch
    stream with a watermark — the state store merges/extends open
    sessions across events and evicts sessions older than the
    watermark horizon (the 100 TB story: session state is bounded by
    the lateness bound, not the stream length). availableNow over one
    snapshot + complete mode keeps the result equal to the batch
    lag/cumsum sessionization, so the key is hash-checked — the
    strongest check the driver supports for a stateful stream.

    Emits (user_id, session_start, n_events, sum_value); session_end
    is omitted because complete-mode merge timing makes end = max ts
    + gap the only engine-defined column — start/count/sum are
    engine-invariant."""
    name = f"stm_sesswin_{uuid.uuid4().hex[:8]}"
    agg = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
    _run_to_memory(agg, name, "complete")
    return spark.table(name)


@query(
    "stm_join_stream_stream",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS c_ts, value AS c_val
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(p_ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(c_val AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_click_value
    FROM p JOIN c ON p.user_id = c.user_id
               AND c_ts >= p_ts - INTERVAL 30 MINUTE
               AND c_ts <= p_ts
    GROUP BY 1
    """,
)
def stm_join_stream_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join — the one streaming join shape the
    static-side twin (stm_join_stream_static) cannot express: clicks
    and purchases arrive as two independent streams; each purchase
    joins the same user's clicks from its trailing 30-minute window.
    Both sides carry watermarks, so at 100 TB the join STATE is
    bounded: a buffered click is evicted once the purchase-side
    watermark passes its 30-minute join horizon — without the time
    bound in the join condition, stream-stream state grows forever
    (the canonical unbounded-state bug). Inner join emits in append
    mode as matches become possible; the availableNow drain then
    batch-aggregates the emitted pairs per purchase day.

    The oracle is the same interval join + aggregate in plain SQL —
    micro-batch join vs batch join must agree exactly (inner join
    output is arrival-order-independent)."""
    name = f"stm_ssj_{uuid.uuid4().hex[:8]}"
    clicks = (
        _stream_events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_val"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("p_ts", "c_val")
    _run_to_memory(joined, name, "append")
    return (
        spark.table(name)
        .groupBy(F.to_date("p_ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("c_val").cast("decimal(18,4)")).cast("double"), 4).alias("sum_click_value"),
        )
    )


# ---------------------------------------------------------------------------
# stm_sketch_hll_merge — mergeable HLL registers maintained as stream state
# ---------------------------------------------------------------------------


def _stage_events_user_files(spark: SparkSession, sf_dir: str) -> str:
    """Stage events.user_id as FOUR parquet files so
    ``maxFilesPerTrigger=1`` forces a 4-micro-batch drain — the
    register state must merge across batches, not inside one."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("user_id")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(indir)
        )

    return stage_scratch("stm_hll_users", sf_dir, "events", build)


@query(
    "stm_sketch_hll_merge",
    oracle="""
    WITH h AS (
      SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events
    ), parts AS (
      SELECT CAST('0x' || substr(h, 1, 2) AS BIGINT) AS reg,
             substr(h, 3, 15) AS tail
      FROM h
    ), rho AS (
      SELECT reg, {rho} AS rho FROM parts
    ), regs AS (
      SELECT s.reg, COALESCE(MAX(r.rho), 0) AS m
      FROM range(256) s(reg) LEFT JOIN rho r ON r.reg = s.reg
      GROUP BY s.reg
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m_regs,
             CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_empty,
             MAX(m) AS r_max,
             CAST(SUM({term}) AS DOUBLE) AS s_scaled
      FROM regs
    )
    SELECT m_regs, v_empty, r_max, s_scaled, {est} AS est_r4 FROM agg
    """.format(
        rho=_HLL_RHO.format(t="tail"),
        est=_HLL_EST,
        term=_HLL_TERM_DUCK,
    ),
)
def stm_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct sketch maintained as STREAMING STATE —
    the operational proof of the sketch family's central claim: the
    (register, max-rho) state max-combines across micro-batches
    exactly as it does across partitions/shards/days, so a 24/7
    ingest keeps a live distinct-user estimate with <=256 rows of
    state and NO distinct exchange ever ([P med]: live cardinality
    dashboards over event streams are the canonical streaming-sketch
    deployment).

    Mechanics: events.user_id staged as 4 files, drained with
    maxFilesPerTrigger=1 under availableNow — FOUR micro-batches, so
    the `groupBy(reg).max(rho)` streaming aggregate genuinely merges
    register state batch-over-batch (complete mode publishes the
    merged registers after the final batch). The batch tail (256-row
    spine, exact shiftleft harmonic terms in DECIMAL(38,0), one
    double division) and the closed-form DuckDB oracle are the
    agg_hll_deterministic machinery verbatim — the stream must land
    on the IDENTICAL registers or the hash flips.

    Scale shape: per-batch map-side (reg, rho) derivation, one
    <=256-row stateful aggregate; state is bounded by m=256 forever.
    At 100 TB/day the same query runs unchanged with a real
    checkpoint and a kafka source."""
    indir = _stage_events_user_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    parts = raw.select(
        F.md5(F.col("user_id").cast("string")).alias("h")
    ).select(
        F.conv(F.substring("h", 1, 2), 16, 10).cast("bigint").alias("reg"),
        F.substring("h", 3, 15).alias("tail"),
    )
    rho = parts.select("reg", F.expr(_HLL_RHO.format(t="tail")).alias("rho"))
    regs = rho.groupBy("reg").agg(F.max("rho").alias("m_raw"))
    name = f"stm_hll_{uuid.uuid4().hex[:8]}"
    _run_to_memory(regs, name, "complete")
    sink = spark.table(name)
    spine = spark.range(256).select(F.col("id").alias("reg"))
    full = spine.join(sink, "reg", "left").select(
        F.coalesce("m_raw", F.lit(0)).alias("m")
    )
    return full.agg(
        F.count(F.lit(1)).alias("m_regs"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v_empty"),
        F.max("m").alias("r_max"),
        F.sum(F.expr(_HLL_TERM_SPARK)).cast("double").alias("s_scaled"),
    ).select(
        "m_regs", "v_empty", "r_max", "s_scaled", F.expr(_HLL_EST).alias("est_r4")
    )


# ---------------------------------------------------------------------------
# stm_join_stream_left — LEFT OUTER stream-stream join with watermark flush
# ---------------------------------------------------------------------------


def _stage_events_with_sentinel(spark: SparkSession, sf_dir: str) -> str:
    """Stage events plus ONE far-future sentinel row per joined type.

    Why (measured in this round's probe): an outer stream-stream join
    emits its UNMATCHED left rows only when the global watermark
    passes their join horizon. availableNow runs the trailing
    no-data batch, which flushes everything EXCEPT rows inside the
    final watermark gap — the probe withheld exactly the purchases
    newer than max(event_ts) − watermark. The sentinel (+30 days,
    user_id = −1, one 'click' and one 'purchase' so BOTH sides'
    watermark operators see it) pushes the final watermark beyond
    every real row's horizon; the tail filters user_id = −1 back
    out. This is the streaming analogue of the batch world's "close
    the books" record, and it is exactly what a production feed's
    heartbeat/punctuation message does at 100 TB."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = raw.schema["ts"].dataType
        mx = raw.agg(F.max("ts").alias("m")).first()["m"]
        if isinstance(ts_type, T.LongType):  # legacy nanos
            p_ts, c_ts = mx + 30 * 86400 * 10**9, mx + 31 * 86400 * 10**9
        else:
            import datetime as _dt

            p_ts = mx + _dt.timedelta(days=30)
            c_ts = mx + _dt.timedelta(days=31)
        # click AFTER purchase -> the sentinels cannot pair with each
        # other (c_ts > p_ts fails the trailing-window condition)
        sent = spark.createDataFrame(
            [(-1, p_ts, -1, "purchase", 0.0, "{}"), (-2, c_ts, -1, "click", 0.0, "{}")],
            schema=raw.schema,
        )
        raw.unionByName(sent).write.mode("overwrite").parquet(indir)

    return stage_scratch("stm_louter_events", sf_dir, "events", build)


@query(
    "stm_join_stream_left",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS c_ts, value AS c_val
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id AS p_user, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(p_ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN c_val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unmatched,
           ROUND(CAST(SUM(CASE WHEN c_val IS NOT NULL
                               THEN CAST(c_val AS DECIMAL(18,4))
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 4)
             AS sum_matched_value
    FROM p LEFT JOIN c ON p.p_user = c.user_id
               AND c_ts >= p_ts - INTERVAL 30 MINUTE
               AND c_ts <= p_ts
    GROUP BY 1
    """,
)
def stm_join_stream_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the outer-emission
    semantics the inner twin (stm_join_stream_stream) cannot
    express: every purchase emits, WITH its trailing-30-minute
    clicks when they exist and exactly once with NULLs when they do
    not — but an unmatched purchase can only be emitted once the
    watermark PROVES no qualifying click can still arrive. That
    proof is the whole operator: state for both sides is bounded by
    the watermark + join horizon, and the unmatched-row flush rides
    watermark passage (this round's probe measured availableNow's
    trailing no-data batch flushing all but the final-horizon rows;
    the staged sentinel row closes that gap — see
    _stage_events_with_sentinel). At 100 TB the same query runs on
    kafka with the provider's heartbeat as the sentinel.

    The oracle is the batch LEFT JOIN + aggregate: outer stream
    output (pairs + exactly-one NULL row per unmatched purchase) is
    arrival-order-independent once fully flushed, so the engines
    must agree row-for-row — a duplicate or withheld unmatched
    emission flips n_rows/n_unmatched."""
    stage = _stage_events_with_sentinel(spark, sf_dir)
    raw = spark.readStream.schema(_events_raw_schema(spark, stage)).parquet(stage)
    ev = events_ts_to_timestamp(raw)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_val"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("p_user", "p_ts", "c_val")
    name = f"stm_lsj_{uuid.uuid4().hex[:8]}"
    _run_to_memory(joined, name, "append")
    dec = "decimal(18,4)"
    return (
        spark.table(name)
        .where(F.col("p_user") != -1)
        .groupBy(F.to_date("p_ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("c_val").isNull(), 1).otherwise(0)).alias(
                "n_unmatched"
            ),
            F.round(
                F.sum(
                    F.when(
                        F.col("c_val").isNotNull(), F.col("c_val").cast(dec)
                    ).otherwise(F.lit(0).cast(dec))
                ).cast("double"),
                4,
            ).alias("sum_matched_value"),
        )
    )


# ---------------------------------------------------------------------------
# stm_transform_with_state — Spark 4 arbitrary-state API (transformWithState)
# ---------------------------------------------------------------------------

_PROTOBUF_SDK_SRC = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
)
# the protobuf minor version pyspark 4.1's StateMessage_pb2 gencode
# requires (runtime must be >= gencode within the same major)
_PB_TARGET_MINOR = "6.33"


def _ensure_protobuf_runtime() -> str | None:
    """Unblock ``transformWithStateInPandas`` on this container (r8,
    verdict item 7): the TWS Python runner needs the ``google.protobuf``
    runtime for its state-server protocol (StateMessage_pb2), which is
    not installed and pip is unavailable. A pure-Python protobuf
    runtime DOES ship on the box inside the google-cloud-sdk
    (appengine platform copy, v6.32). This stages it once as a
    pyfiles zip with ONE patch: runtime_version OSS_MINOR 32 -> 33 /
    SUFFIX '' so the gencode check (pyspark's StateMessage_pb2 is
    generated by protobuf 6.33; the runtime refuses to load newer
    gencode) accepts it — a minor-version gap is inside protobuf's
    own cross-version wire/API guarantee, and the end-to-end key is
    hash-checked against a closed-form oracle anyway.

    Risk scope (r8 ADVICE #2) — the patch DELIBERATELY defeats
    protobuf's gencode-newer-than-runtime safety check, so if
    pyspark's StateMessage_pb2 ever uses a 6.33-only runtime feature
    the failure surfaces as a confusing AttributeError/behavior error
    at run time instead of the clear version error the check exists
    to give; and the spoofed version claim applies to ANY gencode
    loaded in the same interpreter. Both are bounded here: the zip
    rides only the TWS driver-worker's PYTHONPATH (sc.environment),
    never this interpreter or sys.path, and a REAL ``google.protobuf``
    is always preferred — this fallback stages nothing when one is
    importable. If a TWS key ever dies with an AttributeError inside
    ``google.protobuf``, suspect the spoof first and install a real
    protobuf wheel.

    Returns None when a real ``google.protobuf`` is already
    importable (nothing to stage); raises a documented RuntimeError
    when neither a runtime nor the SDK copy exists (a genuinely
    protobuf-less container)."""
    import importlib.util
    import zipfile
    from pathlib import Path

    try:
        # raises ModuleNotFoundError when even the parent 'google'
        # namespace is absent (this container)
        if importlib.util.find_spec("google.protobuf") is not None:
            return None
    except ModuleNotFoundError:
        pass
    src = Path(_PROTOBUF_SDK_SRC)
    # the target gencode minor is part of the zip NAME, so a future
    # pyspark that generates with a newer protobuf gets a FRESH
    # staging (with updated constants below) instead of silently
    # reusing a stale zip and failing the gencode check (r8 review
    # finding #5)
    zpath = (
        Path(scratch_dir("pyfiles"))
        / f"protobuf_runtime_{_PB_TARGET_MINOR.replace('.', '_')}.zip"
    )
    if zpath.exists():
        return str(zpath)
    if not src.exists():
        raise RuntimeError(
            "transformWithStateInPandas needs a google.protobuf runtime: "
            "none installed, and the google-cloud-sdk fallback copy is "
            f"absent ({src}). Container constraint — see SURVEY §7.6."
        )
    rv = (src / "runtime_version.py").read_text()
    patched = rv.replace("OSS_MINOR = 32", f"OSS_MINOR = {_PB_TARGET_MINOR.split('.')[1]}").replace(
        "OSS_SUFFIX = '-dev'", "OSS_SUFFIX = ''"
    )
    if patched == rv:
        # the SDK copy's constants moved/reformatted: fail LOUDLY at
        # staging instead of shipping an unpatched runtime that later
        # rejects pyspark's gencode with a confusing version error
        raise RuntimeError(
            f"protobuf runtime staging: version-constant patch did not "
            f"apply to {src}/runtime_version.py (expected 'OSS_MINOR = 32' "
            f"and \"OSS_SUFFIX = '-dev'\"); update _ensure_protobuf_runtime "
            f"for this SDK copy."
        )
    rv = patched
    tmp = zpath.with_suffix(".tmp")
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("google/__init__.py", "")
        for p in src.rglob("*.py"):
            rel = p.relative_to(src.parent.parent)
            if "blaze-out" in str(rel):
                continue
            z.writestr(
                str(rel),
                rv if p.name == "runtime_version.py" and p.parent == src else p.read_text(),
            )
    os.replace(tmp, zpath)
    return str(zpath)


def _stage_events_two_files(spark: SparkSession, sf_dir: str) -> str:
    """events (user_id, value) as TWO parquet files so
    ``maxFilesPerTrigger=1`` forces a 2-micro-batch drain — the
    ValueState must carry batch 1's running totals into batch 2."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("user_id", "value")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(indir)
        )

    return stage_scratch("stm_tws_events", sf_dir, "events", build)


def _tws_runtime_env(spark: SparkSession) -> None:
    """Route the staged protobuf runtime to the TWS driver worker (one
    definition for the whole TWS family — r9 review finding #7; the
    semantics are documented at ``_ensure_protobuf_runtime``):
    pyspark keys its Python-worker factories by (exec, envVars), so
    mutating ``sc.environment`` BEFORE building the plan spawns a
    correctly-pathed worker even on an already-running session."""
    zip_path = _ensure_protobuf_runtime()
    if zip_path is not None:
        env = spark.sparkContext.environment
        cur = env.get("PYTHONPATH", "")
        if zip_path not in cur.split(":"):
            env["PYTHONPATH"] = zip_path + (":" + cur if cur else "")


class _rocksdb_provider:
    """Context manager: RocksDB state-store provider for the block;
    the prior conf value (or unset state) is restored on exit — one
    definition of the save/set/restore ritual for every stateful key
    (r9 review finding #7)."""

    _KEY = "spark.sql.streaming.stateStore.providerClass"

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark

    def __enter__(self) -> "_rocksdb_provider":
        self._prev = self._spark.conf.get(self._KEY, None)
        self._spark.conf.set(
            self._KEY,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        return self

    def __exit__(self, *exc) -> bool:
        if self._prev is None:
            self._spark.conf.unset(self._KEY)
        else:
            self._spark.conf.set(self._KEY, self._prev)
        return False


def _drain_to_target(
    spark: SparkSession, q, name: str, target: int, timeout_s: float = 120.0
) -> None:
    """Bounded memory-sink drain for streams availableNow cannot
    terminate (the ProcessingTime+TTL maintenance-batch spin —
    see stm_tws_value_ttl): poll until ``target`` rows landed,
    re-raise the query's own exception immediately (the
    stm_python_stream_source discipline), stop the query on exit."""
    import time as _time

    deadline = _time.time() + timeout_s
    try:
        while spark.table(name).count() < target:
            if q.exception() is not None:
                raise q.exception()
            if not q.isActive:
                # clean termination under target (a Spark version where
                # availableNow does terminate, or an under-emitting
                # batch): fail FAST with the observed count instead of
                # burning the whole timeout (r9 ADVICE #2); one final
                # recheck since rows may have landed after the poll —
                # and re-check the query's OWN exception first, so a
                # failure that landed between the exception poll and
                # the isActive check surfaces as itself, not as a
                # generic under-target error (r10 review finding #3)
                if q.exception() is not None:
                    raise q.exception()
                final = spark.table(name).count()
                if final >= target:
                    break
                raise RuntimeError(
                    f"drain: stream terminated with {final} of {target} rows"
                )
            if _time.time() > deadline:
                raise TimeoutError(
                    f"drain: {spark.table(name).count()} of {target} "
                    f"rows after {timeout_s:.0f} s"
                )
            _time.sleep(0.5)
    finally:
        q.stop()


@query(
    "stm_transform_with_state",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stm_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ARBITRARY-STATE streaming (``transformWithStateInPandas``
    + RocksDB state store + ValueState): per-user running (count, sum)
    carried across micro-batches — the modern successor to
    ``applyInPandasWithState`` (`stm_stateful_session`), unblocked in
    r8 by staging the container's own pure-Python protobuf runtime
    (see ``_ensure_protobuf_runtime``; the runner's state-server
    protocol needs StateMessage_pb2). The zip reaches the TWS driver
    worker via ``sc.environment['PYTHONPATH']`` — pyspark keys its
    Python-worker factories by (exec, envVars), so mutating the
    environment BEFORE building the plan spawns a correctly-pathed
    worker even on an already-running plain driver session (the
    driver-sweep condition; probed from /tmp).

    Determinism/hash-check: events staged as 2 files, drained with
    ``maxFilesPerTrigger=1`` under availableNow — TWO micro-batches,
    so batch 2's emission equals batch-1-state + batch-2-input ONLY
    if the RocksDB ValueState survived the batch boundary. Update
    mode emits one row per (user, batch-with-input); the readback
    takes each user's max-``n_events`` struct (n strictly grows per
    emission, so the max is the FINAL state = the all-events totals,
    independent of how repartition(2) split the rows) and rounds the
    sum JVM-side (F.round HALF_UP, rounding-mode parity). State is
    genuinely exercised: a lost state would leave batch-2-only
    counts, which cannot equal the groupBy oracle.

    Scale shape: per-batch map-side pandas fold, state = one
    (long, double) row per user in RocksDB — bounded, incremental,
    24/7-capable; the same query runs unchanged against a kafka
    source with a real checkpoint at production scale."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _tws_runtime_env(spark)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState(
                "tot",
                T.StructType(
                    [
                        T.StructField("c", T.LongType()),
                        T.StructField("s", T.DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            c, s = 0, 0.0
            for pdf in rows:
                c += len(pdf)
                s += float(pdf["value"].sum())
            prev = self._tot.get()
            if prev is not None:
                c, s = c + prev[0], s + prev[1]
            self._tot.update((c, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [c], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    indir = _stage_events_two_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    name = f"stm_tws_{uuid.uuid4().hex[:8]}"
    with _rocksdb_provider(spark):
        out = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, n_events long, sum_value double",
            outputMode="Update",
            timeMode="None",
        )
        _run_to_memory(out, name, "update")
    final = F.max(F.struct("n_events", "sum_value")).alias("m")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.round(F.col("m.sum_value"), 4).alias("sum_value"),
        )
    )


def tws_bucketed_totals_form(
    spark: SparkSession, sf_dir: str, n_buckets: int = 1024
) -> DataFrame:
    """Production-posture twin of ``stm_transform_with_state`` (r10,
    VERDICT r9 item 5): the TWS protocol's cost is per-(grouping key,
    batch) state-server round-trips, so COARSEN THE KEY — group by
    ``pmod(user_id, n_buckets)`` and keep each bucket's user→totals
    dict as ONE pickled-bytes ValueState row. Round-trips drop from
    2×users to 2×buckets per batch (~150× fewer at the ×100 corpus);
    measured same-session A/B at ×100 (.scratch/r10_tws_ab.log):
    registered per-user 137.1 s → bucketed 15.6 s = **8.8× shrink**,
    outputs identical to the batch groupBy truth. The residual 15 s is
    the per-batch pandas fold + protocol floor. Trade-offs priced: the
    bucket dict is opaque to TTL/timers (per-USER expiry needs
    per-user keys) and each update rewrites the whole bucket blob —
    right for totals-shaped state, wrong for per-entity timers; the
    registered key keeps the declared per-user API surface."""
    import pickle

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _tws_runtime_env(spark)

    class BucketTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState(
                "tot", T.StructType([T.StructField("blob", T.BinaryType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._tot.get()
            acc = pickle.loads(bytes(prev[0])) if prev is not None else {}
            for pdf in rows:
                g = pdf.groupby("user_id")["value"].agg(["count", "sum"])
                for uid, (c, s) in g.iterrows():
                    pc, ps = acc.get(uid, (0, 0.0))
                    acc[uid] = (pc + int(c), ps + float(s))
            self._tot.update((pickle.dumps(acc),))
            yield pd.DataFrame(
                {
                    "user_id": list(acc.keys()),
                    "n_events": [v[0] for v in acc.values()],
                    "sum_value": [v[1] for v in acc.values()],
                }
            )

        def close(self) -> None:
            pass

    indir = _stage_events_two_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .withColumn("bucket", F.pmod("user_id", F.lit(n_buckets)))
    )
    name = f"stm_tws_bkt_{uuid.uuid4().hex[:8]}"
    with _rocksdb_provider(spark):
        out = raw.groupBy("bucket").transformWithStateInPandas(
            statefulProcessor=BucketTotals(),
            outputStructType="user_id long, n_events long, sum_value double",
            outputMode="Update",
            timeMode="None",
        )
        _run_to_memory(out, name, "update")
    final = F.max(F.struct("n_events", "sum_value")).alias("m")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.round(F.col("m.sum_value"), 4).alias("sum_value"),
        )
    )


def _stage_events_type_files(spark: SparkSession, sf_dir: str) -> str:
    """events (user_id, event_type) as TWO parquet files for the
    MapState drain (own stage name — schema differs from the
    ValueState key's stage)."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(indir)
        )

    return stage_scratch("stm_tws_types", sf_dir, "events", build)


@query(
    "stm_tws_map_state",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id, event_type
    """,
)
def stm_tws_map_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 arbitrary-state MAP STATE (`handle.getMapState`):
    per-user map event_type → running count in RocksDB, maintained
    across the same 2-micro-batch drain as `stm_transform_with_state`
    (which exercises ValueState; together they cover the TWS state
    family the container previously blocked — see §7.6). Each batch
    folds its pandas chunk counts into the map with
    getValue/updateValue and emits the FULL map via iterator(), so a
    (user, type) whose events all arrived in batch 1 is re-emitted
    in batch 2 with its state-carried count — the readback's per-
    (user, type) max is the all-events total ONLY if the map
    survived the batch boundary AND iterator() returns keys written
    in earlier batches. Integer counts, no float hazard.

    Scale shape: state = one RocksDB row per (user, type) — the
    arbitrary-dimension generalization a built-in windowed agg can't
    express when the map keys are dynamic; per-batch work is
    map-side pandas folding."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _tws_runtime_env(spark)

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._m = handle.getMapState(
                "type_counts", "event_type string", "c long"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch: dict[str, int] = {}
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    batch[et] = batch.get(et, 0) + int(n)
            for et, n in batch.items():
                prev = self._m.getValue((et,))
                self._m.updateValue((et,), ((prev[0] if prev else 0) + n,))
            types, counts = [], []
            for (et,), (c,) in self._m.iterator():
                types.append(et)
                counts.append(c)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "n_events": counts,
                }
            )

        def close(self) -> None:
            pass

    indir = _stage_events_type_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    name = f"stm_twsm_{uuid.uuid4().hex[:8]}"
    with _rocksdb_provider(spark):
        out = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=TypeCounts(),
            outputStructType="user_id long, event_type string, n_events long",
            outputMode="Update",
            timeMode="None",
        )
        _run_to_memory(out, name, "update")
    return (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.max("n_events").alias("n_events"))
    )


_TWS_TOPK = 3


@query(
    "stm_tws_list_state",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
      FROM events
    )
    SELECT user_id, event_id FROM ranked WHERE rn <= {_TWS_TOPK}
    """,
)
def stm_tws_list_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 arbitrary-state LIST STATE (`handle.getListState`):
    per-user bounded top-k list (the k smallest event_ids) maintained
    in RocksDB across the 2-micro-batch drain — a streaming bounded
    leaderboard, the list-shaped state a built-in agg can't hold
    incrementally. Completes the TWS state-variable family
    (ValueState `stm_transform_with_state`, MapState
    `stm_tws_map_state`, ListState here; see §7.6 for the protobuf
    unblock). Each batch merges its ids into the stored list via
    get()/put() and emits (user, seen_total, id×k); seen_total
    strictly grows, so the readback filters each user's FINAL
    emission (max seen_total) and explodes it — equal to the batch
    top-k oracle ONLY if batch 1's survivors were still in the list
    when batch 2 merged (a lost list leaves batch-2-only ids).
    Integer ids, rank ties impossible (event_id unique per user at
    generation)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _tws_runtime_env(spark)

    class TopKIds(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ids = handle.getListState("topk_ids", "event_id long")
            self._seen = handle.getValueState("seen", "n long")

        def handleInputRows(self, key, rows, timerValues):
            ids: list[int] = []
            n_batch = 0
            for pdf in rows:
                n_batch += len(pdf)
                ids.extend(int(x) for x in pdf["event_id"])
            prev = [int(t[0]) for t in self._ids.get()] if self._ids.exists() else []
            kept = sorted(prev + ids)[:_TWS_TOPK]
            self._ids.put([(i,) for i in kept])
            sv = self._seen.get()
            seen = (sv[0] if sv else 0) + n_batch
            self._seen.update((seen,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(kept),
                    "seen_total": [seen] * len(kept),
                    "event_id": kept,
                }
            )

        def close(self) -> None:
            pass

    indir = _stage_events_id_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    name = f"stm_twsl_{uuid.uuid4().hex[:8]}"
    with _rocksdb_provider(spark):
        out = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=TopKIds(),
            outputStructType="user_id long, seen_total long, event_id long",
            outputMode="Update",
            timeMode="None",
        )
        _run_to_memory(out, name, "update")
    t = spark.table(name)
    w = Window.partitionBy("user_id")
    return (
        t.withColumn("max_seen", F.max("seen_total").over(w))
        .where(F.col("seen_total") == F.col("max_seen"))
        .select("user_id", "event_id")
    )


def _stage_events_id_files(spark: SparkSession, sf_dir: str) -> str:
    """events (user_id, event_id) as TWO parquet files for the
    ListState drain."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("user_id", "event_id")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(indir)
        )

    return stage_scratch("stm_tws_ids", sf_dir, "events", build)


def _stage_events_ts_files(spark: SparkSession, sf_dir: str) -> str:
    """events (user_id, ts) as TWO parquet files for the event-time
    timer drain (the watermark column rides along)."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("user_id", "ts")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(indir)
        )

    return stage_scratch("stm_tws_ts", sf_dir, "events", build)


@query(
    "stm_tws_timers",
    oracle="""
    SELECT user_id, CAST(1000 + user_id AS BIGINT) AS fired_at_ms
    FROM events GROUP BY user_id
    """,
)
def stm_tws_timers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 arbitrary-state EVENT-TIME TIMERS
    (`handle.registerTimer` + `handleExpiredTimer`, timeMode=
    EventTime): on first sight each user registers a timer at the
    FAR-PAST unique expiry 1000+user_id ms; the timer fires as soon
    as the event-time watermark first advances past it (batch 2 for
    users first seen in batch 1, the availableNow trailing no-data
    batch otherwise — either way EXACTLY ONCE per user, so the
    emission set is split-agnostic and hash-checkable). The emitted
    row echoes `expiredTimerInfo.getExpiryTimeInMs()`, pinning the
    expiry's round-trip through RocksDB timer state and the
    state-server protocol, not just that \"something fired\".
    Completes the TWS surface: ValueState / MapState / ListState /
    timers (§7.6 for the protobuf unblock).

    Scale shape: one registered timer per user (RocksDB timer
    column family, bounded), watermark-driven expiry scans — the
    session-timeout / TTL-callback machinery a 24/7 deployment uses
    for inactivity logic."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _tws_runtime_env(spark)

    class FirstSightTimer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "s int")
            self._h = handle

        def handleInputRows(self, key, rows, timerValues):
            for _ in rows:
                pass
            if not self._seen.get():
                self._seen.update((1,))
                self._h.registerTimer(1000 + int(key[0]))
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "fired_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

        def close(self) -> None:
            pass

    indir = _stage_events_ts_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .withWatermark("ts", "1 hour")
    )
    name = f"stm_twst_{uuid.uuid4().hex[:8]}"
    with _rocksdb_provider(spark):
        out = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=FirstSightTimer(),
            outputStructType="user_id long, fired_at_ms long",
            outputMode="Update",
            timeMode="EventTime",
        )
        _run_to_memory(out, name, "update")
    # exactly-once is part of the contract: a duplicate fire would
    # double a row and flip the hash via the distinct here being absent
    return spark.table(name).select("user_id", "fired_at_ms")


@query(
    "stm_rocksdb_changelog",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stm_rocksdb_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RocksDB state store WITH CHANGELOG CHECKPOINTING (r9, VERDICT
    r8 item 6 — state-store breadth beyond the HDFS-backed default):
    a stateful per-type running aggregate drained in two forced
    micro-batches (2 staged files x maxFilesPerTrigger=1), with
    ``spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.
    enabled`` on. Instead of uploading a full RocksDB snapshot per
    batch, each commit persists only the delta as a
    ``<version>.changelog`` under the checkpoint's state dir, and
    recovery replays changelogs onto the last snapshot — the 100 TB
    posture for large state: per-batch checkpoint cost scales with
    the UPDATE rate, not the state size. The key ASSERTS the
    changelog files actually exist in the checkpoint (the layout is
    the feature's observable contract) before returning the
    aggregate, which equals the batch groupBy — so correctness is
    hash-checked and the changelog mechanics are structurally
    verified in one sweep.
    """
    import shutil as _shutil
    from pathlib import Path as _Path

    from ..tables import stage_scratch

    def build(indir: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select("event_type", "value")
            .repartition(2)
            .write.mode("overwrite")
            .parquet(indir)
        )

    indir = stage_scratch("stm_rkcl_events", sf_dir, "events", build)
    schema = spark.read.parquet(indir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    agg = raw.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_value"),
    )
    confs = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    name = f"stm_rkcl_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(
        scratch_dir("stm_rkcl_ckpt"), f"run_{uuid.uuid4().hex[:8]}"
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        with _stream_partitions(spark):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        batches = int(q.lastProgress["batchId"]) + 1 if q.lastProgress else 0
        if batches < 2:
            raise RuntimeError(
                f"changelog demo needs >=2 micro-batches, got {batches} "
                f"(maxFilesPerTrigger staging broke?)"
            )
        changelogs = sorted(_Path(ckpt).glob("state/**/*.changelog"))
        if not changelogs:
            layout = sorted(
                str(p.relative_to(ckpt)) for p in _Path(ckpt).rglob("*")
            )[:40]
            raise RuntimeError(
                "changelog checkpointing produced no *.changelog files — "
                f"state dir layout: {layout}"
            )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
        _shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


# ---------------------------------------------------------------------------
# stm_tws_value_ttl — TWS ValueState with TTL (state expiry between batches)
# ---------------------------------------------------------------------------


def _stage_events_parity_files(spark: SparkSession, sf_dir: str) -> str:
    """events (user_id, value) as exactly TWO parquet files split by
    event_id PARITY — a DETERMINISTIC split (unlike repartition(2)),
    so a batch's per-user slice totals are oracle-expressible. Two
    separate single-file writes (not partitionBy) keep the listing
    order stable: f0=even, f1=odd."""
    import shutil as _sh
    from pathlib import Path as _Path

    from ..tables import stage_scratch

    def build(indir: str) -> None:
        ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
        n_src = ev.count()
        n_staged = 0
        for tag, parity in (("f0", 0), ("f1", 1)):
            tmp = f"{indir}_{tag}_tmp"
            # pmod + null-bucketing: Spark's % keeps the dividend's
            # sign (-3 % 2 == -1) and NULL matches neither parity —
            # either would silently drop rows from BOTH slices and
            # undercount the oracle (r9 review finding; the NANOS/
            # MICROS precedent says corpus encodings do change)
            sliced = ev.where(
                F.coalesce(F.pmod("event_id", F.lit(2)), F.lit(0)) == parity
            ).select("user_id", "value")
            n_staged += sliced.count()
            (
                sliced.coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = next(
                p for p in sorted(_Path(tmp).iterdir())
                if p.name.endswith(".parquet")
            )
            _Path(indir).mkdir(parents=True, exist_ok=True)
            _sh.move(str(part), f"{indir}/{tag}.parquet")
            _sh.rmtree(tmp, ignore_errors=True)
        if n_staged != n_src:
            raise RuntimeError(
                f"parity staging lost rows: {n_staged} staged != {n_src} "
                "source (event_id domain changed?)"
            )

    return stage_scratch("stm_tws_parity_events", sf_dir, "events", build)


@query(
    "stm_tws_value_ttl",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           FALSE AS state_carried
    FROM events GROUP BY user_id
    """,
)
def stm_tws_value_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWS ValueState with TTL (``ttlDurationMs``, Spark 4): the state
    written in micro-batch 1 EXPIRES before micro-batch 2 reads it
    (ttl = 1 ms; a batch boundary is always orders of magnitude
    longer), so each batch folds ONLY its own slice — completing the
    TWS family (value/map/list/timers/+TTL; timeMode must be
    ProcessingTime for TTL, vs the ValueState key's "None").

    The hash check works BECAUSE expiry is total: with per-batch
    emissions of (slice_count, slice_sum, had_prior_state), the
    per-user SUM over emissions equals the full-table totals IFF no
    batch double-counted carried state, and ``state_carried`` (OR
    over batches) is FALSE iff every get() after the first batch saw
    expired state. A failed expiry breaks BOTH (batch 2 would fold
    batch 1 again → sum(n) > total; carried → true). The even/odd
    event_id staging (``_stage_events_parity_files``) makes each
    slice deterministic, and the sum-readback is symmetric in batch
    ORDER, so file-listing order cannot matter either. The
    1-hour-TTL control (state survives, identical plan) lives in
    tests beside the cross-key consistency suite.

    Termination quirk (measured, Spark 4.1): under
    timeMode=ProcessingTime with TTL'd state, ``availableNow`` does
    NOT terminate after the data batches — the engine keeps
    scheduling EMPTY maintenance micro-batches (batch 290+ observed
    for a 2-file source) while TTL'd state exists. Empty batches
    emit nothing in Update mode, so the sink is complete once every
    data batch's emissions have landed: the drain polls the memory
    sink for the precomputed target row count (one row per
    (user, nonempty slice), from the staged files) and then stops
    the query — the stm_python_stream_source bounded-drain
    discipline, q.exception() re-raised inside the loop.

    Scale shape: same bounded per-user RocksDB row as
    stm_transform_with_state, plus TTL's secondary index — the
    production knob that keeps 24/7 session state from growing
    without bound (abandoned keys expire instead of accumulating)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _tws_runtime_env(spark)

    class TtlTotals(StatefulProcessor):
        def __init__(self, ttl_ms: int) -> None:
            self._ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState(
                "tot",
                T.StructType(
                    [
                        T.StructField("c", T.LongType()),
                        T.StructField("s", T.DoubleType()),
                    ]
                ),
                ttlDurationMs=self._ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            c, s = 0, 0.0
            for pdf in rows:
                c += len(pdf)
                s += float(pdf["value"].sum())
            prev = self._tot.get()  # None once the TTL lapsed
            carried = prev is not None
            if carried:
                c, s = c + prev[0], s + prev[1]
            self._tot.update((c, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [c],
                    "sum_value": [s],
                    "state_carried": [carried],
                }
            )

        def close(self) -> None:
            pass

    indir = _stage_events_parity_files(spark, sf_dir)
    raw = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    name = f"stm_tws_ttl_{uuid.uuid4().hex[:8]}"
    # one emission per (user, nonempty slice): the drain's completion
    # target, computed from the staged files themselves
    target = sum(
        spark.read.parquet(f"{indir}/{f}.parquet")
        .select("user_id")
        .distinct()
        .count()
        for f in ("f0", "f1")
    )
    with _rocksdb_provider(spark):
        out = raw.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=TtlTotals(1),
            outputStructType=(
                "user_id long, n_events long, sum_value double, "
                "state_carried boolean"
            ),
            outputMode="Update",
            timeMode="ProcessingTime",
        )
        with _stream_partitions(spark):
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            _drain_to_target(spark, q, name, target)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("sum_value"),
            F.max("state_carried").alias("state_carried"),
        )
    )


# ---------------------------------------------------------------------------
# stm_dedup_within_watermark — dropDuplicatesWithinWatermark (Spark 3.5)
# ---------------------------------------------------------------------------


@query(
    "stm_dedup_within_watermark",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
    FROM events
    GROUP BY event_type
    """,
)
def stm_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup via ``dropDuplicatesWithinWatermark`` (Spark
    3.5): unlike plain ``dropDuplicates`` (stm_watermark_dedup, one
    state row per key FOREVER unless the key carries the event-time
    column), WithinWatermark keeps a key's state only for the
    watermark delay AFTER ITS LAST SIGHTING and — the semantic
    difference — dedups two records whose event times differ, as long
    as they arrive within the delay (the at-least-once-sink replay
    case, where the replayed record may carry a regenerated
    timestamp). State is bounded by keys-per-lateness-window, not
    total key cardinality — the 24/7 form of idempotent re-ingest.

    Determinism: the corpus has no duplicate event_ids and the whole
    batch drain completes far inside the 1 h delay, so the result
    equals DISTINCT-per-type exactly and hash-checks; the
    behavioral DIFFERENCE vs plain dropDuplicates (replayed record
    with a shifted timestamp IS dropped here, kept there) is pinned
    in tests with a crafted 2-batch replay."""
    name = f"stm_ddww_{uuid.uuid4().hex[:8]}"
    deduped = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    _run_to_memory(deduped, name, "complete")
    return spark.table(name)
