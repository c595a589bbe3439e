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

from pyspark.sql import DataFrame, SparkSession
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
           ROUND(SUM(o_totalprice), 4) AS total_price
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
    values). Plan: the same single-exchange partial+final hash
    aggregate as agg_groupby_q1 — pure analyzer surface, measured
    plan family. Views are uuid-scoped (sql_tpch_q6 pattern)."""
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
