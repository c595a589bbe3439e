"""Round-1 extension operators (SURVEY.md §2.15): the remaining
training-data-pipeline surface — dedup-cluster resolution (connected
components), random-hyperplane LSH ANN, deterministic stratified
sampling, document chunking — plus relational breadth (unpivot,
first/last/nth window frame, correlated scalar subquery via the SQL
entry point).

Reference parity: the reference checkout was empty at survey time
(SURVEY.md §0); each operator cites the public capability it
generalizes with the SURVEY [P]/ext tags.

Scale design notes (100 TB):
- connected components: per-superstep min-label propagation =
  join(edges, labels) + groupBy(min) — two shuffles per iteration on
  the edge key, O(diameter) iterations. At trillion-edge scale you
  switch to the large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) which
  converges in O(log n) supersteps with the same join+agg primitive;
  each iteration is localCheckpoint()-ed here exactly as it would be
  checkpointed there to cut lineage.
- hyperplane LSH: signatures are a pure map (no shuffle); the
  candidate join is signature-hamming-banded, so probe cost follows
  bucket sizes, not corpus size.
- stratified sampling by deterministic hash: a pure filter — no
  sampleBy() nondeterminism, re-runs are idempotent (the property
  the reference gets from idempotent upserts, [P high]).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60, portable_hash60_sql
from ..registry import query
from ..tables import load

# ---------------------------------------------------------------------------
# Dedup-cluster resolution: connected components over near-dup pairs
# ---------------------------------------------------------------------------

_NGRAM_N = 3
_CLUSTER_T = 0.70  # lower than the pair op's 0.8: clusters, not merges

_PAIR_SQL = f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(length(text) - {_NGRAM_N - 1}, 1)),
               i -> substr(text, CAST(i AS INTEGER), {_NGRAM_N}))) AS grams
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
            >= {_CLUSTER_T}
    )
"""


def _ngram_pairs(
    spark: SparkSession, sf_dir: str, threshold: float,
    rows_per_band: int | None = None,
) -> DataFrame:
    """Char-3-gram Jaccard >= threshold near-dup pairs, lang-blocked.

    r9: candidates now come from the SHARED hybrid plan
    (``dedup_ann.ngram_candidate_pairs`` — small blocks brute-force,
    large blocks MinHash banding with canonical-band emission; the
    registered band shape is the production 8x2 since r13, see the
    shared plan's docstring).
    Through r8 this ran the brute-force slim self-join at EVERY block
    size, which is quadratic per lang block — fine on the sweep
    corpora, a scale-killer at 100k-doc blocks (the r9 low-density
    rehearsal measures both forms; equality pinned in
    tests/test_engine_units.py). Gram arrays re-attach by an unhinted
    doc_id join — auto-broadcast at test SF, shuffle at scale."""
    from .dedup_ann import _NGRAM_MH_R, ngram_candidate_pairs, ngram_verified_pairs

    d, pairs = ngram_candidate_pairs(
        spark, sf_dir, threshold,
        rows_per_band=_NGRAM_MH_R if rows_per_band is None else rows_per_band,
    )
    return ngram_verified_pairs(d, pairs, threshold).select("doc_a", "doc_b")


def min_label_components(pairs: DataFrame) -> DataFrame:
    """Connected components over an undirected (doc_a, doc_b) pair
    frame via iterative min-label propagation; returns (node, label)
    with label = min doc_id in the component. ``localCheckpoint`` per
    superstep cuts lineage; the only driver-side work is one bounded
    convergence count per iteration (the canonical iterative-graph
    shape — at 100 TB swap in large-star/small-star, SoCC'14, same
    join+agg primitive, O(log n) supersteps)."""
    edges = pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t")).unionByName(
        pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("t"))
    )
    edges = edges.localCheckpoint(eager=True)  # pairs computed once, not per superstep
    labels = (
        edges.select(F.col("s").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(32):  # >= diameter of any plausible dup cluster
        msgs = edges.join(labels, edges["s"] == labels["node"]).select(
            F.col("t").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)  # cut lineage per superstep
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


@query(
    "llm_dedup_clusters",
    oracle=_PAIR_SQL
    + """,
    edges AS (
      SELECT doc_a AS s, doc_b AS t FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(n, r) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.t, reach.r FROM reach JOIN edges e ON e.s = reach.n
    ),
    comp AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n)
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           array_to_string(list_sort(list(doc_id)), ',') AS member_ids
    FROM comp GROUP BY cluster_id
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster resolution: connected components over the
    near-dup pair graph (char-3-gram Jaccard >= 0.7, lang-blocked) via
    iterative min-label propagation; cluster id = min doc_id in the
    component. This is the step after any pairwise near-dup op — a
    training-data pipeline keeps one doc per CLUSTER, not per pair
    (A~B, B~C must collapse A,B,C together even when A!~C).

    Oracle is DuckDB's recursive-CTE transitive closure — a genuinely
    different algorithm computing the same fixpoint."""
    pairs = _ngram_pairs(spark, sf_dir, _CLUSTER_T)
    labels = min_label_components(pairs)
    # member_ids serialized with array_join (mirrored by the oracle's
    # array_to_string): pandas-based comparison harnesses cannot hash
    # array cells (numpy arrays are unhashable)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.sort_array(F.collect_list("node")), ",").alias("member_ids"),
    ).select(F.col("label").alias("cluster_id"), "n_docs", "member_ids")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN (sign-of-dot-product signatures)
# ---------------------------------------------------------------------------

_N_PLANES = 16
_EMB_DIM = 64
_HAM_T = 4  # candidate gate: signature hamming distance <= 4 of 16
_N_QUERIES = 5


def _rademacher(i: int, j: int) -> float:
    """Deterministic ±1 hyperplane entry from md5 — no RNG anywhere,
    so Spark and the oracle share the exact same planes as literals."""
    h = hashlib.md5(f"hp_{i}_{j}".encode()).hexdigest()
    return 1.0 if int(h[0], 16) % 2 == 0 else -1.0


_PLANES = [[_rademacher(i, j) for j in range(_EMB_DIM)] for i in range(_N_PLANES)]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def _sig_expr():
    """16-bit signature column: bit i = (v . plane_i >= 0)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(_PLANES):
        lit_arr = F.array(*[F.lit(v) for v in plane])
        sig = sig + F.when(_dot(F.col("ve"), lit_arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def _sig_sql() -> str:
    terms = []
    for i, plane in enumerate(_PLANES):
        arr = "[" + ", ".join(str(v) for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(ve, {arr}) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "llm_ann_hyperplane",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ),
    s AS (SELECT vec_id, ve, {_sig_sql()} AS sig FROM v),
    q AS (
      SELECT vec_id AS query_id, ve AS qv, sig AS qsig
      FROM s WHERE vec_id < {_N_QUERIES}
    ),
    cand AS (
      SELECT query_id, s.vec_id AS neighbor_id,
             ROUND(list_dot_product(s.ve, qv)
                   / (sqrt(list_dot_product(s.ve, s.ve)) * sqrt(list_dot_product(qv, qv))),
                   4) AS cos_sim
      FROM s JOIN q
        ON s.vec_id <> q.query_id
       AND bit_count(xor(s.sig, q.qsig)) <= {_HAM_T}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM cand
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, cos_sim
    FROM ranked WHERE rnk <= 3
    """,
)
def llm_ann_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH (Charikar'02): 16-bit
    sign-of-dot-product signature per vector (±1 hyperplanes derived
    from md5 — deterministic, shared with the oracle as literals),
    candidates gated on signature hamming <= 4, exact-cosine rerank
    top-3 per query. Complements llm_ann_ivf (coarse-quantizer cells)
    with the other classic ANN family (binary sketches). Approximate
    by design — the oracle replicates the same approximation, so
    results hash-match exactly.

    ADAPTIVE (round-6 legacy sweep; same switch as llm_cosine_topk):
    the 16 signature dots are HOF folds — 32M lambda-driven dots at
    ×100 measured 15.3× DuckDB's native list_dot_product — so at or
    above the Arrow threshold a mapInArrow path computes signatures
    via ONE BLAS dgemm guarded by a rigorous forward-error
    certificate (r7; see the in-body comment): any row whose |dot|
    falls inside the provable BLAS-vs-fold divergence bound reruns
    the bit-exact sequential fold, so the sign gate remains EXACTLY
    the HOF gate while the bulk runs at matmul speed (the r6 form ran
    the exact fold for EVERY row — 64 vectorized passes, 3.12× at
    ×100). Gated candidates rerank with the exact fold; only
    batch-local top-3 per query cross back."""
    from .llm import _COSINE_ARROW_MIN_ROWS, _embeddings_nrows

    if _embeddings_nrows(sf_dir) >= _COSINE_ARROW_MIN_ROWS:
        return _ann_hyperplane_arrow(spark, sf_dir)
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ve")
    )
    s = v.select("vec_id", "ve", _sig_expr().alias("sig"))
    q = s.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("ve").alias("qv"),
        F.col("sig").alias("qsig"),
    )
    cand = s.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id"))
        & (F.expr(f"bit_count(sig ^ qsig) <= {_HAM_T}")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("ve"), F.col("qv")) / (_norm(F.col("ve")) * _norm(F.col("qv"))), 4
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"), "cos_sim")
    )


def _fold_dot(mat, vec):
    """Sequential-fold dot products of every row of ``mat`` (n, dim)
    with ``vec`` — the same per-element products and the same
    addition ORDER as the JVM HOF fold aggregate(zip_with(a,b,x*y),
    0.0, s+v), so results are bit-identical doubles (a BLAS matmul
    reorders the sums)."""
    import numpy as np

    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for d in range(mat.shape[1]):
        acc += mat[:, d] * vec[d]
    return acc


def _ann_hyperplane_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batch numpy path of ``llm_ann_hyperplane`` (large
    corpora). Signatures, norms, and rerank dots all use the exact
    sequential fold (see _fold_dot) so the sign gate and the rounded
    cosines are bit-identical to the HOF path; the hamming gate is a
    16-bit popcount table lookup."""
    import numpy as np
    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planes = np.asarray(_PLANES, dtype=np.float64)  # (16, dim)
    weights = (1 << np.arange(_N_PLANES, dtype=np.int64))
    pop = np.asarray([bin(x).count("1") for x in range(1 << _N_PLANES)], dtype=np.int64)

    q_rows = sorted(
        emb.where(F.col("vec_id") < _N_QUERIES).collect(), key=lambda r: r[0]
    )
    qids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.asarray([r[1] for r in q_rows], dtype=np.float64)  # (m, dim)
    qsig = np.asarray(
        [
            int(sum(w for w, p in zip(weights, planes) if _fold_dot(qv[None, :], p)[0] >= 0))
            for qv in qmat
        ],
        dtype=np.int64,
    )
    qnrm = np.sqrt([_fold_dot((qv * qv)[None, :], np.ones(len(qv)))[0] for qv in qmat])

    out_schema = "query_id bigint, neighbor_id bigint, cos_sim double"

    def score(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            col = b.column(b.schema.get_field_index("embedding"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = np.asarray(col.flatten(), dtype=np.float64).reshape(n, -1)
            ids = np.asarray(
                b.column(b.schema.get_field_index("vec_id")), dtype=np.int64
            )
            # signature dots via ONE BLAS dgemm plus a RIGOROUS
            # error-bound gate (r7, replaces the 64-pass exact d-loop
            # at 3.12×): for ANY summation order the computed dot
            # satisfies |comp - true| <= gamma * sum|a_i b_i| with
            # gamma = dim*u/(1-dim*u), u = 2^-53 (Higham 3.5) — both
            # the BLAS product and the HOF fold individually. So when
            # |blas| > 2*gamma*(|mat|@|planes|) the TRUE dot (hence
            # the fold) provably shares its sign; only rows failing
            # that certificate — none in the synthetic corpus, a
            # measure-zero sliver in general — rerun the bit-exact
            # sequential fold. The sign gate stays EXACTLY the HOF
            # gate, now at dgemm speed.
            pt = planes.T  # (dim, 16)
            dim = mat.shape[1]
            sacc = mat @ pt  # (n, 16) BLAS
            u = 2.0 ** -53
            gamma = dim * u / (1 - dim * u)
            absb = np.abs(mat) @ np.abs(pt)
            unsafe = np.flatnonzero(
                (np.abs(sacc) <= 2 * gamma * absb).any(axis=1)
            )
            for r in unsafe:
                sacc[r] = _fold_dot(
                    np.ascontiguousarray(planes), mat[r]
                )
            sig = ((sacc >= 0) * weights).sum(axis=1)
            # norms feed only the 4dp-ROUNDED cosine (no gate):
            # einsum's reordered sum differs from the fold by ~1 ulp,
            # tie at the rounding boundary is measure-zero — the
            # llm_cosine_topk precedent, pinned by the cross-path test
            nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            oq, on, oc = [], [], []
            for j in range(len(qids)):
                ham = pop[np.bitwise_xor(sig, qsig[j])]
                cand = np.flatnonzero((ham <= _HAM_T) & (ids != qids[j]))
                if cand.size == 0:
                    continue
                dots = _fold_dot(mat[cand], qmat[j])
                cos = np.round(dots / (nrm[cand] * qnrm[j]), 4)
                order = np.lexsort((ids[cand], -cos))[:3]
                sel = cand[order]
                oq.extend([qids[j]] * len(sel))
                on.extend(ids[sel].tolist())
                oc.extend(cos[order].tolist())
            if oq:
                yield pa.record_batch(
                    [
                        pa.array(oq, type=pa.int64()),
                        pa.array(on, type=pa.int64()),
                        pa.array(oc, type=pa.float64()),
                    ],
                    names=["query_id", "neighbor_id", "cos_sim"],
                )

    cand = emb.mapInArrow(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"), "cos_sim")
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


@query(
    "llm_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MIN(doc_id) AS min_id,
           MAX(doc_id) AS max_id
    FROM documents
    WHERE {portable_hash60_sql("'smp_' || CAST(doc_id AS VARCHAR)")} % 10 < 2
    GROUP BY lang
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% per-stratum sample: keep rows whose
    md5-derived key hash lands in 2 of 10 buckets; per-lang survivor
    stats. Unlike df.sample()/sampleBy() (seeded RNG over partition
    layout → changes when partitioning changes), a content-hash gate
    is layout-independent and idempotent across re-runs — the
    training-data analogue of the reference's idempotent upserts
    ([P high]). Pure filter: no shuffle beyond the final tiny agg."""
    d = load(spark, sf_dir, "documents")
    keep = (
        portable_hash60(F.concat(F.lit("smp_"), F.col("doc_id").cast("string"))) % 10 < 2
    )
    return d.where(keep).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Document chunking (context-window preparation)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24
_CHUNK_DOCS = 20


@query(
    "txt_chunk_docs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < {_CHUNK_DOCS}
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), {_CHUNK_STRIDE})) AS st
      FROM d
    ),
    chunks AS (
      SELECT doc_id, CAST(st AS BIGINT) AS chunk_start,
             list_slice(toks, st + 1, st + {_CHUNK_SIZE}) AS chunk
      FROM starts
    )
    SELECT doc_id, chunk_start,
           CAST(len(chunk) AS INTEGER) AS n_tokens,
           chunk[1] AS first_tok,
           chunk[-1] AS last_tok
    FROM chunks
    """,
)
def txt_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (size 32 tokens, stride 24 —
    8-token overlap), the standard context-window preparation step in
    LLM training pipelines. One row in, ceil(n/stride) chunk rows out,
    entirely via JVM-side higher-order functions (sequence + explode +
    slice) — no Python in the loop; at 100 TB this is a pure map-side
    fan-out that pipelines inside the scan stage."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < _CHUNK_DOCS)
    d = d.select("doc_id", F.split("text", " ").alias("toks"))
    starts = d.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - 1, F.lit(0)),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("st"),
    )
    chunk = F.expr(f"slice(toks, st + 1, {_CHUNK_SIZE})")
    return starts.select(
        "doc_id",
        F.col("st").cast("long").alias("chunk_start"),
        F.size(chunk).alias("n_tokens"),
        F.element_at(chunk, 1).alias("first_tok"),
        F.element_at(chunk, -1).alias("last_tok"),
    )


# ---------------------------------------------------------------------------
# Relational breadth: unpivot, first/last/nth window, correlated subquery
# ---------------------------------------------------------------------------


@query(
    "prj_unpivot",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 4) AS sum_qty,
             ROUND(SUM(l_extendedprice), 4) AS sum_price,
             ROUND(SUM(l_discount), 4) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM w
    """,
)
def prj_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of a per-flag aggregate into
    (key, metric, value) rows — the inverse of agg_pivot, used to
    normalize wide report tables back into EAV form. Spark's native
    ``DataFrame.unpivot`` expands rows map-side (an Expand node, no
    shuffle); the oracle is the equivalent UNION ALL."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 4) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER w, 4) AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 4) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value(2) over the full partition
    frame (customer's order history by date): first order's price,
    latest order's price, second order's price per row. The explicit
    unbounded-following frame matters — the default frame would make
    last_value = current row. nth_value is NULL for 1-order customers
    on both engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 4).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 4).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 4).alias("second_price"),
    )


_CORR_SQL_T = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_max_orders
    FROM {orders} o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
                          FROM {orders} o2
                          WHERE o2.o_custkey = o.o_custkey)
    GROUP BY o_orderpriority
"""


@query("sql_correlated_subquery", oracle=_CORR_SQL_T.format(orders="orders"))
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders that are their customer's maximum, counted per priority
    — the correlated-scalar-subquery semantics, registered as the
    PRODUCTION single-exchange plan (r10, VERDICT r9 item 6, the
    agg_distinct_count bitmap-swap policy): window max over custkey
    with an unbounded frame, filter, small re-agg. MAX (not AVG)
    keeps the comparison FP-exact — the compared value is an actual
    member of the group, so equality is bitwise on both engines.

    Measured at ×100 (r7 rehearsal): window form 1.37 s = 1.08× vs
    DuckDB 1.27 s; the correlated-SQL surface (Catalyst decorrelates
    via RewriteCorrelatedScalarSubquery into agg + self-join, two
    orders scans) measured 2.38 s = 1.87×, and collect_list+HOF was
    REJECTED at 3.45 s (struct-array materialization tax). The SQL
    surface itself — the decorrelation demo — is preserved as the
    test-pinned twin ``corr_decorrelated_sql_form`` (equality pinned
    in test_corr_subquery_window_rewrite_equality; the registered/
    demo arrangement is the REVERSE of r7-r9)."""
    return _corr_max_window_form(spark, sf_dir)


def corr_decorrelated_sql_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated scalar-subquery SQL surface (the registered key
    through r9): Catalyst decorrelates it into an aggregate + join —
    no per-row subquery execution in the plan. Kept as the test-pinned
    decorrelation demo after the r10 promotion of the window form to
    the registered plan.

    The temp view is uuid-scoped (like sql_tpch_q6) so a concurrent
    session's view named 'orders' is never clobbered; spark.sql
    resolves the view eagerly at analysis, so the immediate drop
    keeps the returned DataFrame valid."""
    import uuid as _uuid

    v = f"orders_corr_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(v)
    out = spark.sql(_CORR_SQL_T.format(orders=v))
    spark.catalog.dropTempView(v)
    return out


@query(
    "sql_scripting",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(6084 AS BIGINT) AS cube_sum
    FROM orders GROUP BY 1
    """,
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 / SQL:2023 PSM): a BEGIN…END compound
    with DECLAREd variables and a WHILE loop (Σ i³ for i=1..12 =
    (12·13/2)² = 6084 — the loop result is verifiable in closed
    form), whose final statement projects the loop accumulator
    alongside a real aggregate over orders. Pins the procedural SQL
    entry surface: variable scoping, iteration, and that the script
    returns its LAST statement's DataFrame. The oracle folds the
    closed form as a constant — any drift in loop semantics
    (off-by-one, variable shadowing) flips the hash. The scripting
    conf is runtime-settable; the uuid-scoped view keeps concurrent
    sessions from clobbering each other (sql_tpch_q6 pattern)."""
    import uuid as _uuid

    spark.conf.set("spark.sql.scripting.enabled", "true")
    v = f"orders_script_{_uuid.uuid4().hex[:8]}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(v)
    out = spark.sql(
        f"""
        BEGIN
          DECLARE i INT DEFAULT 1;
          DECLARE acc BIGINT DEFAULT 0;
          WHILE i <= 12 DO
            SET acc = acc + i * i * i;
            SET i = i + 1;
          END WHILE;
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 acc AS cube_sum
          FROM {v} GROUP BY o_orderpriority;
        END
        """
    )
    spark.catalog.dropTempView(v)
    return out


def _corr_max_window_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production rewrite of sql_correlated_subquery: 'rows equal to
    their group's max' as ONE exchange — window max over custkey,
    filter, small re-agg. Exact: the compared value is a member of
    the group (bitwise equality, no FP arithmetic)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("mx", F.max("o_totalprice").over(w))
        .where(F.col("o_totalprice") == F.col("mx"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_max_orders"))
    )


_LATERAL_SQL_T = """
    SELECT n.n_name, l.c_custkey, l.c_acctbal
    FROM {nation} n,
    LATERAL (
      SELECT c_custkey, c_acctbal FROM {customer} c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) l
"""


@query(
    "sql_lateral_topn",
    oracle=_LATERAL_SQL_T.format(nation="nation", customer="customer"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join through the SQL entry point: per
    nation, the top-2 customers by account balance (custkey
    tie-break). Catalyst decorrelates the ORDER BY + LIMIT lateral
    subquery (DecorrelateInnerQuery) into a partitioned rank — the
    same single-shuffle window shape as win_topk_per_group, with no
    per-outer-row re-execution; identical SQL runs on both engines.
    Views are uuid-scoped to avoid clobbering same-named views in a
    shared session (see sql_correlated_subquery)."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    vn, vc = f"nation_lat_{tag}", f"customer_lat_{tag}"
    load(spark, sf_dir, "nation").createOrReplaceTempView(vn)
    load(spark, sf_dir, "customer").createOrReplaceTempView(vc)
    out = spark.sql(_LATERAL_SQL_T.format(nation=vn, customer=vc))
    spark.catalog.dropTempView(vn)
    spark.catalog.dropTempView(vc)
    return out
