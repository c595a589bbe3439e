"""Round-9 operators, part 2 — SURVEY.md §2.30.

Spark 4.x SQL-surface breadth the inventory did not yet touch: SQL
pipe syntax (`|>`), ordered LISTAGG, collation-aware grouping
(UTF8_LCASE), EXECUTE IMMEDIATE parameterized SQL, and the
Arrow-optimized Python UDTF (`@udtf(useArrow=True)`) under a LATERAL
correlation. Each key pins the ENTRY SURFACE — the relational work
behind it compiles to the same Catalyst plan families already
measured at ×100 (SCALE.md), so the scale posture is inherited from
the plan, not the syntax.

The reference checkout (/root/reference) was empty at survey time
(SURVEY.md §0); these generalize the public capability surface per
the §2.30 rows ([P] tags).
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


# ---------------------------------------------------------------------------
# sql_pipe_syntax — Spark 4.0 SQL pipe operators
# ---------------------------------------------------------------------------


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE SYNTAX (Spark 4.0, SQL pipe operators): the Q1
    pricing-summary shape authored as a linear `FROM … |> WHERE …
    |> AGGREGATE … GROUP BY …` chain instead of nested clauses.
    Pipe stages are pure syntax — the parser folds them into the
    SAME logical plan as the clause form (one pushed filter, one
    partial+final hash aggregate; plan identity with agg_groupby_q1's
    DataFrame form is pinned in tests), so this key certifies the
    entry surface: stage ordering, `AGGREGATE … GROUP BY` aliasing,
    and that computed aggregate aliases survive to the result schema.
    View name is uuid-scoped so concurrent runs never collide
    (sql_tpch_q6 pattern); ROUND(…, 4) for FP-sum parity with the
    DuckDB oracle as in Q1."""
    view = f"lineitem_pipe_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    out = spark.sql(f"""
        FROM {view}
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> AGGREGATE ROUND(SUM(l_quantity), 4) AS sum_qty,
                     ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)
                       AS sum_disc_price,
                     CAST(COUNT(*) AS BIGINT) AS n_items
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, sum_qty, sum_disc_price,
                  n_items
    """)
    spark.catalog.dropTempView(view)
    return out


# ---------------------------------------------------------------------------
# agg_listagg — ordered LISTAGG ... WITHIN GROUP (Spark 4.0)
# ---------------------------------------------------------------------------


@query(
    "agg_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — `LISTAGG(x, d) WITHIN GROUP
    (ORDER BY x)` (Spark 4.0; DuckDB spells it string_agg … ORDER
    BY): the canonical "render the group as a delimited list"
    reporting operator. WITHIN GROUP makes the concatenation order
    part of the SEMANTICS (an unordered listagg would be
    partitioning-dependent and could never hash-check) — the key
    pins exactly that determinism guarantee cross-engine.

    Scale posture: holistic in the group's OWN content (the state is
    the concatenated string), so it belongs on bounded-cardinality
    groups — here nations-per-region (≤25 rows each) after a
    broadcast-sized dim join. For unbounded groups the right form is
    the capped collect (agg_collect_sorted's slice) — the operator's
    documented misuse is listagg over raw fact rows."""
    view = f"nr_listagg_{_uuid.uuid4().hex[:8]}"
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).createOrReplaceTempView(view)
    out = spark.sql(f"""
        SELECT r_name,
               LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM {view}
        GROUP BY r_name
    """)
    spark.catalog.dropTempView(view)
    return out


# ---------------------------------------------------------------------------
# fn_collation_group — UTF8_LCASE collation-aware grouping (Spark 4.0)
# ---------------------------------------------------------------------------


@query(
    "fn_collation_group",
    oracle="""
    SELECT lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END)
             AS lang_ci,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-AWARE grouping (Spark 4.0 collations): group keys
    compared under UTF8_LCASE so case variants of a language tag
    land in one group — the engine-level answer to the
    `GROUP BY lower(x)` rewrite (which is exactly how the DuckDB
    oracle expresses it; DuckDB's NOCASE collation exists but the
    lower() form is the portable spelling). A deterministic CASE
    derivation (upper() on even doc_ids) manufactures the mixed-case
    input from the all-lowercase corpus so the collation has real
    work to do.

    Two cross-engine hazards pinned: (1) the group REPRESENTATIVE
    under a collation is first-seen (partitioning-dependent), so the
    projected key is lower(k) — identical for every member by
    construction — never the raw representative; (2) the collated
    STRING TYPE must not leak into the result schema (it would
    diff against the oracle's plain VARCHAR), hence the final CAST
    back to binary-collation STRING. Collation comparison runs in
    the JVM's collation-aware hash (ICU UTF8_LCASE) — same exchange
    count as any single-key hash aggregate."""
    d = load(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("k"),
        "n_chars",
    )
    grouped = d.groupBy(F.expr("k COLLATE UTF8_LCASE").alias("k")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return grouped.select(
        F.expr("CAST(lower(k) AS STRING COLLATE UTF8_BINARY)").alias("lang_ci"),
        "n_docs",
        "total_chars",
    )


# ---------------------------------------------------------------------------
# sql_exec_immediate — EXECUTE IMMEDIATE parameterized SQL (Spark 4.0)
# ---------------------------------------------------------------------------


@query(
    "sql_exec_immediate",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY o_orderpriority
    """,
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4.0): SQL-from-a-string with `?`
    positional parameters bound via USING — the dynamic-SQL entry
    surface (metadata-driven reporting, multi-tenant templates)
    beside sql_scripting's procedural one. The parameters are BOUND,
    not interpolated: the date literals travel as typed values
    through the parameter channel, which is the injection-safe
    contract this key certifies (plus that the inner statement's
    aliases survive to the result schema).

    The inner statement is a quarter-window priority count over
    orders (TPC-H Q4's shape minus the EXISTS) — one pushed range
    filter, one hash aggregate; scale posture inherited from that
    plan family."""
    view = f"orders_exec_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    inner = (
        f"SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        f"ROUND(SUM(o_totalprice), 4) AS total_price "
        f"FROM {view} WHERE o_orderdate >= ? AND o_orderdate < ? "
        f"GROUP BY o_orderpriority"
    )
    out = spark.sql(
        "EXECUTE IMMEDIATE :stmt USING TIMESTAMP '1996-01-01', "
        "TIMESTAMP '1996-04-01'",
        args={"stmt": inner},
    )
    spark.catalog.dropTempView(view)
    return out


# ---------------------------------------------------------------------------
# udtf_arrow_lateral — Arrow-optimized Python UDTF under LATERAL (4.1)
# ---------------------------------------------------------------------------

try:  # pyspark >= 3.5 (useArrow kwarg: 4.0+)
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="token string", useArrow=True)
    class _PartTokenUDTF:
        """Yield each whitespace token of a part name. Arrow-optimized:
        eval() rows batch through the Arrow channel instead of pickle
        (`useArrow=True` — the explicit per-function opt-in, not the
        session-wide conf)."""

        def eval(self, name: str):
            for t in name.split(" "):
                yield (t,)

    _HAVE_ARROW_UDTF = True
except (ImportError, TypeError):  # pragma: no cover - pyspark < 4.0
    _HAVE_ARROW_UDTF = False


@query(
    "udtf_arrow_lateral",
    oracle="""
    SELECT u.token, CAST(COUNT(*) AS BIGINT) AS n
    FROM part, unnest(string_split(p_name, ' ')) AS u(token)
    GROUP BY 1
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def udtf_arrow_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED Python UDTF (`@udtf(useArrow=True)`, Spark
    4.0/4.1) applied with a LATERAL correlation, feeding a top-k
    token-frequency aggregate — the Arrow rung of the UDTF ladder
    (udtf_posexplode = built-in JVM, udtf_python_custom = pickled
    generator, this key = Arrow-batched generator). Output rows
    leave the Python worker as Arrow record batches, so per-row cost
    is amortized to the batch like a pandas UDF's.

    Scale posture: same as udtf_python_custom — the generator is the
    SURFACE; the production twin of this exact transform is
    explode(split(p_name, ' ')) (pure JVM, same two-exchange
    top-k plan). Ordered (n DESC, token) with LIMIT 20 keeps the
    result deterministic under ties; uuid-scoped function and view
    names keep re-runs from colliding."""
    if not _HAVE_ARROW_UDTF:  # pragma: no cover
        raise NotImplementedError(
            "@udtf(useArrow=True) requires pyspark >= 4.0"
        )
    tag = _uuid.uuid4().hex[:8]
    fname, vname = f"part_tokens_{tag}", f"part_{tag}"
    spark.udtf.register(fname, _PartTokenUDTF)
    load(spark, sf_dir, "part").select("p_name").createOrReplaceTempView(vname)
    out = spark.sql(f"""
        SELECT t.token, CAST(COUNT(*) AS BIGINT) AS n
        FROM {vname} p, LATERAL {fname}(p.p_name) t
        GROUP BY t.token
        ORDER BY n DESC, token
        LIMIT 20
    """)
    spark.catalog.dropTempView(vname)
    return out


# ---------------------------------------------------------------------------
# udtf_table_argument — polymorphic table function: TABLE(...) PARTITION BY
# ---------------------------------------------------------------------------

if _HAVE_ARROW_UDTF:

    @_udtf(returnType="lang string, n_docs bigint, n_up bigint, max_chars bigint")
    class _LangRunStatsUDTF:
        """Per-partition streaming reduction over an ORDERED TABLE
        argument: rows of one lang arrive in doc_id order through
        eval(); terminate() emits one summary row. State is O(1) per
        partition — the streamed-aggregation contract the TABLE
        argument surface exists for."""

        def __init__(self) -> None:
            self._lang = None
            self._n = 0
            self._n_up = 0
            self._max = None
            self._prev = None

        def eval(self, row):
            self._lang = row["lang"]
            c = row["n_chars"]
            self._n += 1
            if self._prev is not None and c > self._prev:
                self._n_up += 1
            self._max = c if self._max is None else max(self._max, c)
            self._prev = c

        def terminate(self):
            if self._lang is not None:
                yield self._lang, self._n, self._n_up, self._max


@query(
    "udtf_table_argument",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE n_chars > prev) AS BIGINT) AS n_up,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM (SELECT lang, n_chars,
                 lag(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS prev
          FROM documents)
    GROUP BY lang
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC TABLE FUNCTION — a Python UDTF invoked with a
    TABLE(...) argument plus `PARTITION BY lang ORDER BY doc_id`
    (Spark 3.5+/4.x): the engine repartitions and per-partition-sorts
    the input, then STREAMS each language's rows through eval() in
    doc_id order; terminate() emits one summary row per partition
    (count, ascending-step count — an order-SENSITIVE stat that
    would silently corrupt if the ORDER BY contract broke — and max).
    This is the table-in/table-out UDF surface (SQL:2016 PTF);
    DuckDB's equivalent spelling is the lag() window + group-by the
    oracle uses.

    Scale posture: the plan is exchange-equivalent to a window over
    (lang, doc_id) — one hash exchange + in-partition sort — with the
    reduction in Python instead of JVM window state; O(1) state per
    partition, rows never buffered. The production twin of THIS stat
    is the lag()+count_if window form (win_lag_lead family); the key
    pins the PTF contract, and cross-form equality is pinned in
    tests."""
    if not _HAVE_ARROW_UDTF:  # pragma: no cover
        raise NotImplementedError("TABLE-argument @udtf requires pyspark >= 3.5")
    tag = _uuid.uuid4().hex[:8]
    fname, vname = f"lang_run_stats_{tag}", f"docs_ptf_{tag}"
    spark.udtf.register(fname, _LangRunStatsUDTF)
    load(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    ).createOrReplaceTempView(vname)
    out = spark.sql(f"""
        SELECT * FROM {fname}(
          TABLE({vname}) PARTITION BY lang ORDER BY doc_id
        )
    """)
    spark.catalog.dropTempView(vname)
    return out


# ---------------------------------------------------------------------------
# sql_identifier_clause — IDENTIFIER(:param) safe dynamic identifiers
# ---------------------------------------------------------------------------


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT o_orderpriority AS group_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY 1
    """,
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER clause (Spark 3.4+): the TABLE and the GROUP-BY
    COLUMN both arrive as bound parameters through `IDENTIFIER(:p)` —
    the injection-safe way to template identifiers (the complement of
    sql_exec_immediate, which parameterizes VALUES; identifiers can
    never be value parameters, and string-concatenated SQL is the
    anti-pattern this clause retires). IDENTIFIER resolves the
    parameter AS an identifier at parse time — a malformed or
    multi-part-smuggling string fails resolution rather than
    rewriting the query.

    The templated statement is a single-key hash aggregate; scale
    posture inherited from that family (binding is driver-side
    only). Parameter LIVENESS (a different column parameter changes
    the grouping) is pinned in tests."""
    view = f"orders_ident_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(view)
    out = spark.sql(
        """
        SELECT IDENTIFIER(:col) AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:col)
        """,
        args={"tbl": view, "col": "o_orderpriority"},
    )
    spark.catalog.dropTempView(view)
    return out


# ---------------------------------------------------------------------------
# sql_create_function — SQL-defined scalar UDF (CREATE FUNCTION ... RETURN)
# ---------------------------------------------------------------------------


@query(
    "sql_create_function",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS disc_total,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-DEFINED FUNCTION (`CREATE TEMPORARY FUNCTION … RETURNS …
    RETURN expr`, Spark 3.4+/4.x SQL UDFs): the discounted-price
    expression captured once as a catalog object and reused in an
    aggregate — the SQL-native rung of the UDF ladder, and the ONLY
    rung with zero runtime tax: Catalyst INLINES the body at analysis
    time — no function node survives to the optimized plan, no Python
    worker, no serialization (the production answer to 'wrap shared
    business logic'; inlining goes through an alias-introducing
    Project, so the plan is expression-EQUIVALENT to the in-place
    arithmetic, pinned in tests). The oracle inlines the same
    expression; a drift in inlining semantics (argument substitution,
    null handling) flips the hash.

    Function name is uuid-scoped (temporary functions are
    session-global — the sql_tpch_q6 concurrency discipline applies
    to the function catalog too). Scale posture: identical to
    agg_groupby_q1's scan+hash-agg family, by construction."""
    tag = _uuid.uuid4().hex[:8]
    fname, view = f"disc_price_{tag}", f"li_fn_{tag}"
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}(p DOUBLE, d DOUBLE) "
        f"RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    out = spark.sql(f"""
        SELECT l_returnflag,
               ROUND(SUM({fname}(l_extendedprice, l_discount)), 4)
                 AS disc_total,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM {view}
        GROUP BY l_returnflag
    """)
    spark.catalog.dropTempView(view)
    return out


# ---------------------------------------------------------------------------
# sql_session_variable — DECLARE VARIABLE / SET VAR cross-statement state
# ---------------------------------------------------------------------------


@query(
    "sql_session_variable",
    oracle="""
    WITH cut AS (SELECT FLOOR(AVG(l_quantity)) AS c FROM lineitem)
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           ROUND(SUM(l_extendedprice), 4) AS price_above
    FROM lineitem, cut
    WHERE l_quantity > c
    GROUP BY l_linestatus
    """,
)
def sql_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SESSION VARIABLES (Spark 4.0 `DECLARE VARIABLE` / `SET VAR`):
    a data-derived scalar (FLOOR of the mean quantity — floored so
    the cross-statement compare is INTEGER-exact, immune to the two
    engines' AVG association order) is computed in one statement,
    parked in a session variable, and consumed as a filter bound in a
    later statement — the cross-STATEMENT state surface beside
    sql_scripting's intra-script variables and sql_exec_immediate's
    per-call parameters. The oracle folds the same bound as a CTE.

    Variable and view names are uuid-scoped (variables are
    session-global) and the variable is DROPped on exit. Scale
    posture: two plans from the scan+agg family; the variable is
    driver-side state, zero executor cost."""
    tag = _uuid.uuid4().hex[:8]
    vname, view = f"qty_cut_{tag}", f"li_var_{tag}"
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    spark.sql(f"DECLARE OR REPLACE VARIABLE {vname} DOUBLE DEFAULT 0.0")
    try:
        spark.sql(
            f"SET VAR {vname} = (SELECT FLOOR(AVG(l_quantity)) FROM {view})"
        )
        out = spark.sql(f"""
            SELECT l_linestatus,
                   CAST(COUNT(*) AS BIGINT) AS n_above,
                   ROUND(SUM(l_extendedprice), 4) AS price_above
            FROM {view}
            WHERE l_quantity > {vname}
            GROUP BY l_linestatus
        """)
        # materialization must happen while the variable exists? No —
        # the bound is substituted at ANALYSIS time into the plan; the
        # DROP below cannot un-resolve an analyzed DataFrame. Pinned in
        # tests (drop-then-collect).
        return out
    finally:
        spark.sql(f"DROP TEMPORARY VARIABLE IF EXISTS {vname}")
        spark.catalog.dropTempView(view)


# ---------------------------------------------------------------------------
# snk_python_datasource_write — PySpark 4 Python DataSource WRITER
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _JsonlCommit(WriterCommitMessage):
        """Per-task commit message: the file this task produced and
        its row count (must be picklable driver<-worker)."""

        def __init__(self, filename: str, n_rows: int) -> None:
            self.filename = filename
            self.n_rows = n_rows

    class JsonlSinkDataSource(DataSource):
        """Custom BATCH SINK via the PySpark 4 Python DataSource API —
        the writer half of the V2 surface whose reader half is
        ``SyntheticFeedDataSource`` (src_python_datasource) and whose
        streaming-reader half is ``SyntheticCounterStream``
        (stm_python_stream_source). Each task writes its partition as
        one JSON-lines file and returns a commit message; the DRIVER
        commit publishes a manifest naming exactly the committed
        files — the two-phase all-or-nothing contract (a failed task's
        orphan file is never manifested)."""

        @classmethod
        def name(cls) -> str:
            return "jsonl_sink"

        def writer(self, schema, overwrite):  # noqa: ANN001 - pyspark API
            return _JsonlSinkWriter(self.options["path"])

    class _JsonlSinkWriter(DataSourceWriter):
        def __init__(self, path: str) -> None:
            self.path = path

        def write(self, iterator):  # noqa: ANN001 - per-task, on workers
            import json
            import os
            import uuid

            fname = f"part-{uuid.uuid4().hex}.jsonl"
            full = os.path.join(self.path, fname)
            n = 0
            with open(full, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _JsonlCommit(fname, n)

        def commit(self, messages):  # noqa: ANN001 - on the driver
            import json
            import os

            manifest = {
                "files": sorted(m.filename for m in messages if m is not None),
                "rows": sum(m.n_rows for m in messages if m is not None),
            }
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
                json.dump(manifest, fh)

        def abort(self, messages):  # noqa: ANN001
            pass  # no manifest -> nothing published; files are scratch

    _HAVE_PY_DS_WRITER = True
except ImportError:  # pragma: no cover - pyspark < 4
    _HAVE_PY_DS_WRITER = False

# Most-recent invocation's uuid-scoped sink dir (introspection hook
# for tests; each run gets a fresh dir — see the key's docstring).
_LAST_PYDS_DIR: str | None = None


@query(
    "snk_python_datasource_write",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE o_orderkey % 100 = 0
    GROUP BY o_orderpriority
    """,
)
def snk_python_datasource_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE through a CUSTOM Python DataSource (PySpark 4 V2 writer
    API), then read the MANIFESTED files back and aggregate — closing
    the V2 triangle (batch read / stream read / batch WRITE). Pins
    the two-phase commit contract: per-task ``write(iterator)`` →
    picklable commit message, driver-side ``commit(messages)``
    publishing a manifest of exactly the committed files; the
    readback consumes ONLY manifested files, so an aborted task's
    orphan output can never leak into the result (the exactly-once
    discipline snk_manifest_publish pins for parquet, here for a
    user-defined sink).

    Scale posture: SURFACE demo of the writer contract — each row
    crosses the Python worker and lands as text JSON; the production
    twin of this write is the JVM parquet sink (snk_parquet). Local
    FS paths work because local[*] workers share the driver's disk;
    a cluster deployment points the same writer at an object store.
    Integer-only measures (count / key sum, DuckDB HUGEINT hazard).

    The output dir is uuid-scoped per invocation (stm_rocksdb_
    changelog's run_{uuid} discipline, r9 review finding #2): a fixed
    shared path would let a concurrent run's cleanup delete files
    this run's lazily-evaluated readback still references — and NO
    in-key pruning of older run dirs either, for the same reason
    (.scratch is disposable by contract; the dirs are a few KB)."""
    if not _HAVE_PY_DS_WRITER:  # pragma: no cover
        raise NotImplementedError(
            "Python DataSource writer API requires pyspark >= 4.0"
        )
    import json
    import os

    from ..tables import scratch_dir

    global _LAST_PYDS_DIR
    out_dir = scratch_dir("pyds_sink", f"run_{_uuid.uuid4().hex[:12]}")
    os.makedirs(out_dir, exist_ok=True)
    _LAST_PYDS_DIR = out_dir
    # re-registration of a session-scoped name is a silent overwrite in
    # this API (probed: no error on duplicate register), so a raise here
    # is a REAL failure that must surface — not be swallowed as
    # "already registered" (r9 ADVICE #3)
    spark.dataSource.register(JsonlSinkDataSource)
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_orderpriority")
    )
    src.write.format("jsonl_sink").option("path", out_dir).mode(
        "append"
    ).save()
    with open(os.path.join(out_dir, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    files = [os.path.join(out_dir, f) for f in manifest["files"]]
    back = spark.read.schema("o_orderkey long, o_orderpriority string").json(
        files
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").alias("sum_key"),
    )


# ---------------------------------------------------------------------------
# agg_regression — OLS regression aggregates (regr_slope/intercept/r2/count)
# ---------------------------------------------------------------------------


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-REGRESSION aggregates (SQL:2016 `REGR_*`, Spark 3.4+;
    DuckDB spells them identically): per return flag, the OLS slope /
    intercept / R² / pair count of price-on-quantity — the built-in
    single-pass regression family beside agg_corr_cov's corr/covar
    (same moment sums underneath: slope = cov/var, all combinable
    map-side, ONE agg exchange at any scale).

    FP posture: the statistics are RATIOS of large moment sums, so
    cross-engine association-order error is relative (~1e-12) —
    slope/intercept round at 4, R² at 6 (values here ~1e-5, far from
    the rounding boundary). regr_count excludes NULL pairs by
    definition on both engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# agg_bitmap_distinct — exact distinct via bitmap aggregates (Spark 3.5)
# ---------------------------------------------------------------------------


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-count via BITMAP aggregates (Spark 3.5
    `bitmap_bucket_number` / `bitmap_bit_position` /
    `bitmap_construct_agg` / `bitmap_count`): customers per order
    priority, computed as per-(group, bucket) bitmaps summed per
    group — the engine-native form of the distributed exact-distinct
    bitmap pattern (Roaring-style bucketing: each key maps to a
    32768-bit bucket bitmap; bucket bitmaps OR map-side, so the
    exchange carries AT MOST one 4 KB bitmap per (group, bucket),
    never one row per distinct value). The DuckDB oracle is the
    semantic definition (COUNT(DISTINCT)); the hash check pins the
    bucket/position arithmetic exactly.

    Scale posture vs the WIRED exact-distinct key: agg_distinct_count
    has been a 64-BIT bucket-bitmap since r7 (``div 64`` + ``bit_or``
    masks — NOT Spark's Expand-based countDistinct, which it replaced
    by measurement). Both forms bound the exchange by KEY-SPACE /
    bucket-width rather than distinct cardinality; the bucket size is
    the tradeoff — 32768-bit buckets (this key) waste up to ~32 Kbit
    per sparsely-hit bucket where 64-bit buckets waste at most 63
    bits, so on the replica-offset (maximally sparse) rehearsal
    corpus the 64-bit form wins (1.26x vs 2.59x same-session at
    ×100), while truly DENSE key ranges amortize the bigger bucket's
    fixed cost across more set bits. For unbounded/non-integral keys
    the sketch family (agg_hll_deterministic) takes over. This key
    pins Spark's BUILT-IN bitmap-aggregate surface; the 64-bit form
    stays the wired general default."""
    o = load(spark, sf_dir, "orders")
    per_bucket = (
        o.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("cnt"))
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("n_custs")
    )


# ---------------------------------------------------------------------------
# sql_lateral_column_alias — reference a SELECT alias in the same list
# ---------------------------------------------------------------------------


@query(
    "sql_lateral_column_alias",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(net), 4) AS net_total,
           ROUND(SUM(gross), 4) AS gross_total,
           ROUND(SUM(gross - net), 4) AS tax_total
    FROM (
      SELECT l_returnflag,
             l_extendedprice * (1 - l_discount) AS net,
             net * (1 + l_tax) AS gross
      FROM lineitem
    )
    GROUP BY l_returnflag
    """,
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL COLUMN ALIASES (Spark 3.4+; DuckDB supports the same
    reference style): a SELECT item referencing an alias defined
    EARLIER IN THE SAME LIST (`net` → `gross = net * (1+tax)`),
    killing the nest-a-subquery-per-derivation pattern. The analyzer
    rewrites the chain into nested Projects, so the optimized plan
    is identical to the hand-nested form — a pure resolution-surface
    key; the chain crossing ROW level into the aggregate (SUM(net),
    SUM(gross - net)) exercises both resolution scopes.

    Exactness: the same expression TREE evaluates on both engines
    (the oracle writes the identical chain), sums round at 4. Plan:
    one scan + one hash agg — agg_groupby_q1's family."""
    view = f"li_lca_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    out = spark.sql(f"""
        SELECT l_returnflag,
               ROUND(SUM(net), 4) AS net_total,
               ROUND(SUM(gross), 4) AS gross_total,
               ROUND(SUM(gross - net), 4) AS tax_total
        FROM (
          SELECT l_returnflag,
                 l_extendedprice * (1 - l_discount) AS net,
                 net * (1 + l_tax) AS gross
          FROM {view}
        )
        GROUP BY l_returnflag
    """)
    spark.catalog.dropTempView(view)
    return out
