"""Round-10 operators — SURVEY.md §2.31.

Two user-facing surfaces the 270-key inventory did not yet pin:
``GROUP BY ALL`` (the SQL:2023-adjacent shorthand both engines
resolve — the key checks the two resolutions AGREE) and column-level
AES encryption round-tripping (PII-at-rest, the reference's
privacy-handling family generalized to cryptographic masking). Both
compile to already-measured Catalyst plan families (single-exchange
hash aggregate), so the scale posture is inherited from the plan,
not the syntax.

The reference checkout (/root/reference) was empty at survey time
(SURVEY.md §0); these generalize the public capability surface per
the §2.31 rows ([P] tags).
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


# ---------------------------------------------------------------------------
# sql_group_by_all — GROUP BY ALL resolution (Spark 3.4+)
# ---------------------------------------------------------------------------

_GBA_SQL_T = """
    SELECT o_orderstatus,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM {orders}
    GROUP BY ALL
"""


@query("sql_group_by_all", oracle=_GBA_SQL_T.format(orders="orders"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` through the SQL entry point: the analyzer
    derives the grouping set from every non-aggregate select item —
    here a plain column AND a computed expression (YEAR), pinning
    that expression items group by their expression, not their alias.
    The oracle runs the IDENTICAL text on DuckDB, so the key also
    pins that the two engines' ALL-resolution rules agree on this
    shape (a resolution divergence flips the row count, not just
    values). SUM in integer cents: at scale a grouped double SUM is
    association-order FP noise across engines' partition orders,
    well above the hash compare's exactness (the agg_grouping_flags
    rationale; r10 second-review finding #2). Plan: the same
    single-exchange partial+final hash aggregate as agg_groupby_q1 —
    pure analyzer surface, measured plan family. Views are
    uuid-scoped (sql_tpch_q6 pattern)."""
    v = f"orders_gba_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(v)
    out = spark.sql(_GBA_SQL_T.format(orders=v))
    spark.catalog.dropTempView(v)
    return out


# ---------------------------------------------------------------------------
# fn_aes_roundtrip — column-level AES encryption (PII at rest)
# ---------------------------------------------------------------------------

_AES_KEY = "0123456789abcdef"  # 16-byte AES-128 demo key (fixed: determinism)


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_rt_exact,
           CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_cipher,
           CAST(SUM(LENGTH(c_name)) AS BIGINT) AS sum_name_len,
           MIN(c_name) AS min_name,
           MAX(c_name) AS max_name
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level AES encryption round-trip over customer PII
    (``aes_encrypt``/``aes_decrypt``, AES-128 ECB — the DETERMINISTIC
    mode, chosen so ciphertexts are stable across runs and the
    distinct-count check below is meaningful; production randomized
    encryption uses GCM, same plan shape). Every aggregate is
    computed from the DECRYPTED column, so the oracle (plaintext
    arithmetic in DuckDB, which has no AES) hash-checks the full
    encrypt→decrypt identity per row:

    - ``n_rt_exact`` counts rows whose round-trip equals the
      original — the oracle says COUNT(*), so ONE broken row flips
      the hash;
    - ``n_distinct_cipher`` counts distinct CIPHERTEXTS — equal to
      distinct plaintexts iff deterministic encryption is injective
      on this corpus (padding/key-reuse bugs collide or split it);
    - min/max/length aggregates pin exact decrypted content.

    Plan: one scan, per-row JVM crypto expressions (codegen'd Spark
    built-ins, no Python), one distinct-expand + final agg exchange —
    the agg_distinct_count family."""
    key = F.lit(_AES_KEY)
    c = load(spark, sf_dir, "customer").select("c_mktsegment", "c_name")
    enc = c.select(
        "c_mktsegment",
        "c_name",
        F.aes_encrypt(F.col("c_name").cast("binary"), key, F.lit("ECB")).alias(
            "cipher"
        ),
    )
    dec = enc.select(
        "c_mktsegment",
        "c_name",
        "cipher",
        F.aes_decrypt(F.col("cipher"), key, F.lit("ECB")).cast("string").alias("rt"),
    )
    return dec.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("rt") == F.col("c_name")).alias("n_rt_exact"),
        F.countDistinct("cipher").alias("n_distinct_cipher"),
        F.sum(F.length("rt")).alias("sum_name_len"),
        F.min("rt").alias("min_name"),
        F.max("rt").alias("max_name"),
    )


# ---------------------------------------------------------------------------
# dq_table_checksum — cross-engine table checksum (migration validation)
# ---------------------------------------------------------------------------


@query(
    "dq_table_checksum",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(
                 COALESCE(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' ||
                 COALESCE(CAST(o_custkey  AS VARCHAR), '<NULL>') || '|' ||
                 COALESCE(o_orderstatus, '<NULL>') || '|' ||
                 COALESCE(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), '<NULL>') || '|' ||
                 COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '<NULL>')
               ), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-group TABLE CHECKSUM — the
    migration/replication validation step: after copying a table
    between systems, both sides compute SUM(md5-prefix of a
    canonicalized row rendering) per group and compare (a checksum,
    unlike COUNT, catches value corruption; per-status grouping
    localizes a mismatch). The canonical rendering pins the
    cross-engine hazards explicitly: integers via plain casts,
    DOUBLES as integer cents (float->string rendering is not
    portable), DATES through an explicit format (neither engine's
    default timestamp rendering is), NULLS via an explicit
    ``<NULL>`` sentinel per field (Spark's concat_ws silently DROPS
    null fields and their separators — 'a'|NULL|'b' would collide
    with a genuine 'a|b' — while DuckDB's ``||`` nulls the whole
    rendering and drops the row from the SUM; the sentinel makes
    both engines render the same unambiguous bytes, r10
    second-review finding #3), '|' field separator, md5 (both
    engines) with the first 8 hex chars as the summed word — the
    identical bytes hash on both engines by construction, verified
    value-equal here against DuckDB's independent implementation.

    Plan: one scan, per-row JVM md5 (codegen), one combinable
    SUM/COUNT exchange — embarrassingly parallel at any scale, the
    agg_groupby_q1 family."""
    o = load(spark, sf_dir, "orders")
    sent = F.lit("<NULL>")
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), sent),
        F.coalesce(F.col("o_custkey").cast("string"), sent),
        F.coalesce(F.col("o_orderstatus"), sent),
        F.coalesce(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), sent
        ),
        F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), sent),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    return (
        o.select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# agg_grouping_flags — CUBE subtotal disambiguation via GROUPING()
# ---------------------------------------------------------------------------


@query(
    "agg_grouping_flags",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus)   = 1 THEN 'ALL' ELSE o_orderstatus   END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
           CAST(GROUPING(o_orderstatus)   AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with ``grouping()`` flags — the subtotal-row
    disambiguator the bare cube lacks: a NULL key cell can mean
    'subtotal over this column' OR 'the data was NULL', and only the
    GROUPING flag tells them apart (pinned here by rendering
    subtotal cells as a non-NULL 'ALL' sentinel keyed off the flag,
    which would collide with data NULLs if the flag lied). SUMs in
    integer cents: the four grouping sets accumulate floats in
    different orders, so a double SUM would be association-order
    FP-noise across engines; cents are exact. Plan: PAIRS-FIRST (the
    agg_cube rewrite, exact for COUNT/integer-SUM): the stream is
    reduced to the ≤|statuses|x|priorities| pair summary by one
    combinable exchange, and the CUBE's Expand x4 runs over that tiny
    summary instead of every row — measured 2.87x naive-cube vs 1.3x
    family after the rewrite at x100 (same A/B as agg_cube's
    2.92x -> 1.32x)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pairs = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
    )
    g_s = F.grouping("o_orderstatus").cast("int")
    g_p = F.grouping("o_orderpriority").cast("int")
    return (
        pairs.cube("o_orderstatus", "o_orderpriority")
        .agg(
            g_s.alias("g_status"),
            g_p.alias("g_priority"),
            F.sum("n").alias("n_orders"),
            F.sum("c").alias("total_cents"),
        )
        .select(
            F.when(F.col("g_status") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("g_priority") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_cents",
        )
    )


# ---------------------------------------------------------------------------
# win_fill_forward — LOCF via IGNORE NULLS window (gap fill surface)
# ---------------------------------------------------------------------------


@query(
    "win_fill_forward",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN event_id % 5 = 0 THEN value END AS v
      FROM events
    ), f AS (
      SELECT user_id,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(fv) AS BIGINT) AS n_filled,
           CAST(SUM(CAST(ROUND(fv * 10000, 0) AS BIGINT)) AS BIGINT)
             AS sum_filled_e4
    FROM f
    GROUP BY user_id
    """,
)
def win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF) through the WINDOW IGNORE-NULLS surface:
    ``last(v, ignorenulls=True)`` over an ordered per-user frame
    carries the latest observed value across the NULL gaps — the
    standard sparse-sensor densification, and the surface itself
    (`IGNORE NULLS`, distinct from a join- or interpolation-based
    fill: evt_ts_interpolate covers linear interpolation,
    evt_time_weighted_avg the duration-weighted LOCF aggregate).
    Sparsity is manufactured deterministically (value visible only
    when event_id % 5 == 0) so both engines fill the identical gap
    pattern; (ts, event_id) ordering makes the carried value unique
    under ts ties. Rows BEFORE a user's first observation stay NULL —
    COUNT(fv) < COUNT(*) pins that IGNORE NULLS does not invent a
    value. The checked sum is FP-EXACT: each filled value is scaled
    and rounded to an e4 integer PER ROW (deterministic — fv is a
    carried member of the column, not an accumulated float), then
    summed as BIGINT, so per-engine accumulation order cannot move
    the hash (r10 ADVICE #2; the sql_group_by_all integer-cents
    pattern). Plan: ONE user_id exchange, in-partition sort + running
    window + re-agg on the same key (no second exchange) — the
    win_topk_per_group family."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.select(
        "user_id", F.last("v", ignorenulls=True).over(w).alias("fv")
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("fv").alias("n_filled"),
        F.sum(F.round(F.col("fv") * 10000, 0).cast("bigint")).alias(
            "sum_filled_e4"
        ),
    )


# ---------------------------------------------------------------------------
# src_csv_multiline — RFC 4180 CSV with embedded newlines/quotes/delimiters
# ---------------------------------------------------------------------------


@query(
    "src_csv_multiline",
    oracle="""
    WITH d AS (
      SELECT lang,
             'line1' || chr(10) || lang || ',comma "quoted" ' ||
               CAST(doc_id AS VARCHAR) AS tricky
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(LENGTH(tricky)) AS BIGINT) AS sum_len,
           CAST(SUM(CASE WHEN tricky LIKE '%' || chr(10) || '%' THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline
    FROM d
    GROUP BY lang
    """,
)
def src_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 4180 CSV hard mode: fields containing EMBEDDED NEWLINES,
    the delimiter, and double quotes, written with
    quote-doubling (``escape='"'`` — Spark's DEFAULT escape is
    backslash, which no RFC 4180 reader understands; the option is
    the key's point) and re-read with ``multiLine=True`` (without it
    the reader splits records at the embedded newlines and row
    counts explode). The tricky field is built deterministically
    from (lang, doc_id), and the oracle recomputes the expected
    aggregate from the SOURCE table — any mis-parse (split rows,
    swallowed quotes, truncated fields) changes n_rows/sum_len/
    n_multiline. A unit test additionally feeds the staged files to
    an independent RFC 4180 reader (DuckDB read_csv) and requires
    the identical parse.

    Scale note: multiLine=True makes a CSV file NON-SPLITTABLE (a
    record boundary cannot be found mid-file) — one task per file,
    so the staging writes many files; at 100 TB the guidance is the
    same (many medium files, or parquet as soon as possible)."""
    from ..tables import stage_scratch

    def build(indir: str) -> None:
        src = load(spark, sf_dir, "documents").select(
            "lang",
            F.concat(
                F.lit("line1\n"),
                F.col("lang"),
                F.lit(',comma "quoted" '),
                F.col("doc_id").cast("string"),
            ).alias("tricky"),
        )
        (
            src.repartition(4)
            .write.mode("overwrite")
            .option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .csv(indir)
        )

    indir = stage_scratch("src_csv_multiline", sf_dir, "documents", build)
    back = (
        spark.read.schema("lang string, tricky string")
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(indir)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("tricky")).alias("sum_len"),
        F.sum(
            F.when(F.col("tricky").contains("\n"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_multiline"),
    )


# ---------------------------------------------------------------------------
# set_union_by_name — schema-evolution union (unionByName, missing cols)
# ---------------------------------------------------------------------------


@query(
    "set_union_by_name",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL BY NAME
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
             o_orderkey, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(cents) AS BIGINT) AS n_with_cents,
           CAST(COUNT(order_year) AS BIGINT) AS n_with_year,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(order_year) AS BIGINT) AS sum_year
    FROM u
    GROUP BY o_orderstatus
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — ``unionByName(allowMissingColumns=
    True)`` (DuckDB: ``UNION ALL BY NAME``): the two branches project
    DIFFERENT column sets in DIFFERENT orders (old extract has cents
    but no year, new extract has year but no cents, key columns
    swapped), and the union must align by NAME and NULL-fill each
    side's missing column — the positional UNION ALL (set_union_all)
    would mis-zip the swapped columns or reject the width mismatch.
    The disjoint pmod split makes every source row appear exactly
    once; COUNT(col) vs COUNT(*) pins the NULL-fill pattern per
    branch, the SUMs pin value survival. Plan: two scans of the same
    parquet (each with its parity filter pushed) + one combinable agg
    exchange."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    old_extract = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", cents
    )
    new_extract = o.where(F.col("o_orderkey") % 2 == 1).select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderkey",
        "o_orderstatus",
    )
    u = old_extract.unionByName(new_extract, allowMissingColumns=True)
    return u.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("cents").alias("n_with_cents"),
        F.count("order_year").alias("n_with_year"),
        F.sum("cents").alias("sum_cents"),
        F.sum("order_year").cast("long").alias("sum_year"),
    )


# ---------------------------------------------------------------------------
# fn_luhn_check — Luhn validation (Spark 3.5 built-in vs SQL reimplementation)
# ---------------------------------------------------------------------------


@query(
    "fn_luhn_check",
    oracle="""
    WITH t AS (
      SELECT o_orderstatus,
             lpad(CAST(o_orderkey AS VARCHAR), 16, '0') AS card
      FROM orders
    ), d AS (
      SELECT o_orderstatus,
             list_sum(list_transform(
               list_reverse(list_transform(string_split(card, ''), c -> CAST(c AS INT))),
               (x, i) -> CASE WHEN i % 2 = 0
                              THEN (2 * x // 10) + ((2 * x) % 10)
                              ELSE x END)) % 10 = 0 AS ok
      FROM t
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE ok) AS BIGINT) AS n_valid
    FROM d
    GROUP BY o_orderstatus
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation (``luhn_check``, Spark 3.5 — the
    card-number/IMEI data-quality gate) over 16-digit strings
    synthesized deterministically from o_orderkey. Spark runs the
    BUILT-IN; the oracle REIMPLEMENTS the algorithm from its
    definition in DuckDB SQL (reverse digits, double every second,
    casting-out-nines, sum % 10) — so the key pins the built-in
    against an independent first-principles implementation, per
    status group. Plan: per-row JVM check inside the scan stage, one
    combinable agg exchange."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.lpad(F.col("o_orderkey").cast("string"), 16, "0").alias("card"),
    )
    return (
        o.select("o_orderstatus", F.expr("luhn_check(card)").alias("ok"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("ok")).alias("n_valid"),
        )
    )
