"""LLM-data-pipeline operators — SURVEY.md §2.11 (north-star
extensions: dedup, similarity search, text analysis, vector columns).

Scale design notes (the point of these at 100 TB):
- exact dedup: hash-groupBy / window-keep-first — one shuffle on the
  dedup key (here the text hash), map-side combinable.
- near-dup (MinHash-LSH): shingle -> K minhashes via xxhash64 with
  fixed seeds -> band signatures -> self-join on (band, signature)
  buckets -> exact-Jaccard verify on candidates only. The self-join
  is on bucket keys, so cost is sum of bucket sizes squared, not
  O(n^2) over the corpus. Deterministic: no random seeds anywhere.
- ANN/cosine: brute-force top-k against a broadcast query vector
  (baseline); kNN-join prunes via LSH/IVF in a real deployment — the
  candidate-pair pattern is identical to MinHash banding.
- vectors are plain array<float> columns next to relational columns —
  "multimodal" columns ride the same DataFrame machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .dedup_ann import first_eq_band


@query(
    "llm_dedup_exact",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1
    GROUP BY lang
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate text removal (keep min doc_id), survivors per
    lang. Generalizes the reference's dedup-by-trip-id ([P high]).

    Implemented as groupBy(text) + min_by(lang, doc_id) rather than a
    window row_number: the aggregate gets map-side partial combine
    (the shuffle carries one row per distinct text, not every row)
    and skips the per-partition sort — the right shape at 100 TB,
    where you'd additionally pre-hash: group on xxhash64(text) and
    compare full text only within colliding hashes."""
    d = load(spark, sf_dir, "documents")
    survivors = d.groupBy("text").agg(F.min_by("lang", "doc_id").alias("lang"))
    return survivors.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "llm_token_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc count / avg token count / avg chars (ext:
    text-quality scoring input)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "llm_term_topk",
    oracle="""
    WITH tf AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS term
      FROM documents
    ), counted AS (
      SELECT lang, term, COUNT(*) AS freq
      FROM tf GROUP BY lang, term
    ), ranked AS (
      SELECT lang, term, freq,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, term) AS rn
      FROM counted
    )
    SELECT lang, term, CAST(freq AS BIGINT) AS freq, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 5
    """,
)
def llm_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language (explode -> count -> window rank,
    ties broken by term; ext)."""
    d = load(spark, sf_dir, "documents")
    counted = (
        d.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), "term")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "term", "freq", "rn")
    )


@query(
    "llm_text_classify",
    oracle="""
    SELECT CASE WHEN contains(text, 'join') OR contains(text, 'merge') THEN 'relational'
                WHEN contains(text, 'stream') OR contains(text, 'window') THEN 'streaming'
                WHEN contains(text, 'scan') THEN 'storage'
                ELSE 'other' END AS doc_class,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def llm_text_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-rule text classifier (CASE over contains) -> class
    counts (ext: text analysis; the deterministic stand-in for a
    model-based classifier UDF)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    cls = (
        F.when(t.contains("join") | t.contains("merge"), "relational")
        .when(t.contains("stream") | t.contains("window"), "streaming")
        .when(t.contains("scan"), "storage")
        .otherwise("other")
    )
    return d.groupBy(cls.alias("doc_class")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _dot(a, b):
    """Dot product via zip_with + aggregate HOFs — measured the best
    JVM-side strategy (BASELINE.md round-5 A/B at x1 and x100):
    an unrolled 64-term scalar chain generates one huge codegen
    method the JIT refuses to compile (2x SLOWER than the HOF at
    x100), and an Arrow-vectorized numpy pandas_udf wins only at
    x100 scale (0.41 s vs 0.61 s) while losing 2x at bench scale.
    Brute-force scoring is the declared BASELINE op anyway — at
    100 TB similarity search runs the IVF/LSH keys (llm_ann_ivf,
    llm_ann_hyperplane), where this dot evaluates only the pruned
    candidate set."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


@query(
    "llm_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT vec_id, label,
             ROUND(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
               / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                        list_transform(embedding, x -> CAST(x AS DOUBLE))))
                  * sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
      FROM embeddings, q
      WHERE vec_id <> 0
    )
    SELECT vec_id, label, cos_sim
    FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against query vector vec_id=0
    (similarity-search baseline, ext). ADAPTIVE scoring strategy
    (round-6 de-weak, BASELINE.md dot-product A/B):

    - below ``_COSINE_ARROW_MIN_ROWS`` (bench/driver scale): the
      zip_with/aggregate HOF — best JVM-side strategy, no Python in
      the plan, wins when per-batch Arrow transfer would dominate;
    - at/above it (the ×100 / production regime): ``mapInArrow``
      numpy scoring — the embedding column's Arrow list buffer is
      reshaped (-1, dim) WITHOUT per-row boxing, one float64 BLAS
      matrix-vector product scores the whole batch, and only each
      batch's local top-10 crosses back to the JVM (a row in the
      global top-10 is necessarily in its batch's top-10), so the
      global TakeOrderedAndProject sorts ≤10 rows per batch.

    The corpus size comes from the parquet footers (metadata-only,
    no job). Both paths produce identical rounded scores (asserted
    cross-path in tests); at 100 TB the same scoring runs after an
    LSH/IVF candidate prune (llm_ann_*)."""
    if _embeddings_nrows(sf_dir) >= _COSINE_ARROW_MIN_ROWS:
        return _cosine_topk_arrow(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    qv = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            F.round(_dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 4).alias(
                "cos_sim"
            ),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)


_COSINE_ARROW_MIN_ROWS = 100_000


def _embeddings_nrows(sf_dir: str) -> int:
    """Exact embeddings row count via :func:`tables.parquet_nrows`
    (footer metadata, file or dir). 0 — i.e. route to the HOF path,
    correct for any small/unknown corpus — when the path isn't local
    plain parquet; the helper WARNS on that fallback so a production
    object-store corpus never lands on the slow path silently
    (round-6 ADVICE)."""
    from ..tables import parquet_nrows

    return parquet_nrows(sf_dir, "embeddings") or 0


def _cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batch numpy scoring path of ``llm_cosine_topk`` (large
    corpora). float32→float64 cast matches the JVM/oracle CAST; the
    float64 matrix product and norms agree with the sequential HOF
    fold after ROUND(..,4) (asserted in tests on the full sf
    corpus)."""
    import numpy as np
    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    q_rows = emb.where(F.col("vec_id") == 0).select("embedding").collect()
    out_schema = "vec_id bigint, label int, cos_sim double"
    if not q_rows:
        # vec_id=0 absent: the HOF path broadcasts an empty query
        # side and yields zero rows — match it instead of raising
        # IndexError (round-6 ADVICE cross-path divergence)
        return spark.createDataFrame([], out_schema)
    q = np.asarray(q_rows[0][0], dtype=np.float64)
    qn = np.sqrt(q @ q)

    def score(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            col = b.column(b.schema.get_field_index("embedding"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # contiguous values buffer -> (n, dim) without row boxing
            flat = np.asarray(col.flatten(), dtype=np.float64)
            mat = flat.reshape(n, -1)
            dots = mat @ q
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            cos = np.round(dots / (norms * qn), 4)
            ids = np.asarray(
                b.column(b.schema.get_field_index("vec_id")), dtype=np.int64
            )
            keep = ids != 0
            idx = np.flatnonzero(keep)
            # batch-local top-10 under the global order (cos desc,
            # vec_id asc): lexsort on (-cos, vec_id)
            order = np.lexsort((ids[idx], -cos[idx]))[:10]
            sel = idx[order]
            labels = np.asarray(
                b.column(b.schema.get_field_index("label")), dtype=np.int32
            )
            yield pa.record_batch(
                [
                    pa.array(ids[sel], type=pa.int64()),
                    pa.array(labels[sel], type=pa.int32()),
                    pa.array(cos[sel], type=pa.float64()),
                ],
                names=["vec_id", "label", "cos_sim"],
            )

    scored = emb.mapInArrow(score, out_schema)
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)


@query(
    "llm_knn_join",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id % 25 = 0 AND vec_id < 500
    ), pairs AS (
      SELECT query_id, v.vec_id AS neighbor_id,
             ROUND(list_dot_product(ve, qv)
                   / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qv, qv))), 4) AS cos_sim
      FROM v JOIN q ON v.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join: for 20 fixed query vectors (vec_id % 25 == 0, < 500),
    top-3 cosine neighbors (ext). Query side broadcast; candidate
    scoring is a broadcast nested-loop, ranked per query. At 100 TB
    the candidate set comes from LSH bucketing instead of the full
    corpus — the rank/verify tail is identical.

    ADAPTIVE like llm_cosine_topk (round-6 legacy sweep): below the
    Arrow threshold, the staged HOF form — both norms staged BEFORE
    the join so they evaluate once per vector, not once per pair
    (the un-staged form re-derived _norm(ve) 20x per vector); at or
    above it, mapInArrow numpy — each Arrow batch scores (n,dim) @
    (dim,20) as ONE BLAS matrix product and emits only batch-local
    top-3 per query (<=60 rows/batch), so the per-query rank window
    sorts a metadata-sized stream instead of 20 corpus-size
    partitions."""
    if _embeddings_nrows(sf_dir) >= _COSINE_ARROW_MIN_ROWS:
        return _knn_join_arrow(spark, sf_dir)
    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("ve"))
        .select("vec_id", "ve", _norm(F.col("ve")).alias("nrm"))
    )
    q = emb.where((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 500)).select(
        F.col("vec_id").alias("query_id"),
        F.col("ve").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = emb.join(F.broadcast(q), emb.vec_id != q.query_id).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("ve"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")), 4).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def _knn_join_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batch numpy path of ``llm_knn_join`` (large corpora).
    One float64 (n,dim)@(dim,m) BLAS product per batch; batch-local
    top-3 per query under the global order (rounded cos desc,
    neighbor_id asc) necessarily contains each query's global top-3,
    so the final window ranks <=3*m rows per batch."""
    import numpy as np
    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q_rows = (
        emb.where((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 500))
        .select("vec_id", "embedding")
        .collect()
    )
    out_schema = "query_id bigint, neighbor_id bigint, cos_sim double"
    if not q_rows:
        # empty query set: HOF-path parity (empty join result), not
        # a reshape error on a zero-row matrix (round-6 ADVICE)
        return spark.createDataFrame(
            [], out_schema + ", rnk int"
        )
    q_rows.sort(key=lambda r: r[0])
    qids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.asarray([r[1] for r in q_rows], dtype=np.float64).T  # (dim, m)
    qn = np.sqrt(np.einsum("ij,ij->j", qmat, qmat))

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
            nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            cos = np.round((mat @ qmat) / (nrm[:, None] * qn[None, :]), 4)
            oq, on, oc = [], [], []
            for j in range(len(qids)):
                valid = np.flatnonzero(ids != qids[j])
                order = np.lexsort((ids[valid], -cos[valid, j]))[:3]
                sel = valid[order]
                oq.extend([qids[j]] * len(sel))
                on.extend(ids[sel].tolist())
                oc.extend(cos[sel, j].tolist())
            yield pa.record_batch(
                [
                    pa.array(oq, type=pa.int64()),
                    pa.array(on, type=pa.int64()),
                    pa.array(oc, type=pa.float64()),
                ],
                names=["query_id", "neighbor_id", "cos_sim"],
            )

    pairs = emb.mapInArrow(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@query(
    "llm_centroid_per_label",
    oracle="""
    SELECT label, CAST(i - 1 AS INTEGER) AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS centroid_val
    FROM embeddings, range(1, 9) t(i)
    GROUP BY label, i
    """,
)
def llm_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (elementwise mean) of the first 8 dims via
    posexplode + two-key agg (ext: multimodal column reduction).
    DuckDB ordinality is 1-based vs posexplode 0-based -> pos-1
    (SURVEY §7 hard-part #2)."""
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "val")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("val").cast("double")), 4).alias("centroid_val"))
    )


@query(
    "llm_vector_norm_filter",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(nrm), 4) AS avg_norm
    FROM (
      SELECT label,
             sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ) t
    WHERE nrm >= 0.5 AND nrm < 1.5
    GROUP BY label
    """,
)
def llm_vector_norm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm per vector, band filter, count per label (ext:
    embedding hygiene filtering — drop zero/denormal/blown-up
    vectors before indexing).

    Band [0.5, 1.5): the synthetic embeddings are unit-normalized
    (norms 1.0 +/- 1e-7), so this keeps the healthy corpus and would
    drop genuinely anomalous vectors; the norm computation itself is
    verified cross-engine through avg_norm at 4 decimals. The
    previous [3.5, 6.0) band matched zero rows at every SF — a
    vacuous 0=0 hash pass (round-2 verdict). The band edges sit far
    from the data so FP summation-order differences between engines
    cannot flip a row across the boundary."""
    emb = load(spark, sf_dir, "embeddings").select(
        "label", _norm(_as_double("embedding")).alias("nrm")
    )
    return (
        emb.where((F.col("nrm") >= 0.5) & (F.col("nrm") < 1.5))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Heavy LLM ops (SURVEY §7 M5)
# ---------------------------------------------------------------------------

_JACCARD_T = 0.8
_MINHASH_K = 16  # 16 bands x 1 row: recall ~1 at the gate threshold
_BANDS = 16
_ROWS_PER_BAND = 1


def _token_set(col):
    return F.array_distinct(F.split(col, " "))


@query(
    "llm_dedup_near_minhash",
    oracle="""
    WITH d AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
    """,
)
def llm_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH over distinct tokens,
    verified by exact Jaccard >= 0.8 (ext; the flagship scale
    operator). Pipeline: distinct tokens -> K=16 deterministic
    minhashes (xxhash64 with per-hash salt column, no randomness) ->
    16 bands x 1 row -> self-join on (band, signature) buckets ->
    exact-Jaccard verification on candidates only.

    The oracle is the O(n^2) exact-Jaccard join (fine at 500 docs).
    Hash-equivalence requires banding recall 1.0 above the threshold:
    with 16 bands of 1 row, P(miss | J>=0.8) = (1-J)^16 <= 6.6e-12
    per pair — zero misses even over millions of qualifying pairs
    (8x2 banding measurably missed a J=0.8 boundary pair on this
    corpus). r=1 trades bucket selectivity for exact-grade recall;
    on a production corpus with a long similarity tail you'd pick
    (b, r) from the target threshold curve instead. At 100 TB the O(n^2) verify disappears: cost is
    sum-of-bucket-sizes^2, and the exact check runs only on bucketed
    candidates.
    """
    pairs, d = _minhash_candidates(spark, sf_dir)
    return _minhash_verify(pairs, d)


def _minhash_candidates(spark: SparkSession, sf_dir: str):
    """Stages 1-4 of llm_dedup_near_minhash: tokens -> signatures ->
    banding -> bucket self-join with canonical-band emission. Returns
    (candidate pairs (doc_a, doc_b) — slim, exactly one row per
    candidate pair — and the (doc_id, toks) token table). Exposed so
    the ×100 rehearsal (scripts/scale_rehearsal_llm.py --sink) can
    compose the verify stage with a distributed parquet sink."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", _token_set("text").alias("toks")
    )
    # K minhash values: for each salt i, min over tokens of xxhash64(token, i)
    salts = F.array(*[F.lit(i) for i in range(_MINHASH_K)])
    sig = F.transform(
        salts,
        lambda i: F.array_min(
            F.transform(F.col("toks"), lambda t: F.xxhash64(t, i))
        ),
    )
    sigs = d.select("doc_id", F.size("toks").alias("n_t"), sig.alias("sig"))
    # band key: hash the r minhashes of each band together.
    # SLIM banding: only (doc_id, n_toks, band, bsig) crosses the
    # quadratic bucket join; token arrays re-attach by broadcast after
    # pair dedup (wide rows through the band join were measured
    # unusable on this dense-similarity corpus — buckets hold a large
    # corpus fraction, so the join output is ~all-pairs-sized).
    band_cols = []
    for b in range(_BANDS):
        parts = [F.col("sig")[b * _ROWS_PER_BAND + r] for r in range(_ROWS_PER_BAND)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*parts).alias("bsig")))
    banded = sigs.select(
        "doc_id", "n_t", "sig", F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        "doc_id", "n_t", "sig",
        F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"),
    )

    a = banded.alias("a")
    b = banded.alias("b")
    # CANONICAL-BAND emission replaces pair dedup: a qualifying pair
    # matches in up to _BANDS bands, and those copies land in
    # DIFFERENT (band, bsig) shuffle partitions — so the former
    # dropDuplicates had no map-side partial effect and shuffled the
    # full x16-redundant candidate stream (measured at the x100
    # rehearsal: the pre-dedup exchange alone exceeded 80 GB of
    # spill disk). Instead each side carries its K-long signature
    # array (128 B — NOT the multi-KB token arrays the slim-row rule
    # bans) and a pair is emitted only from the FIRST band whose
    # signatures truly agree: exactly one copy per pair, no dedup
    # exchange at all. A bucket reached only via xxhash64 collision
    # has no truly-agreeing band and is dropped (it was a false
    # positive the exact-Jaccard verify would discard anyway).
    first_true_band = first_eq_band(
        lambda j: F.col("a.sig")[j] == F.col("b.sig")[j], _MINHASH_K
    )
    assert _ROWS_PER_BAND == 1  # band index == signature index
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size-ratio prune: J >= T implies min/max set size >= T
            & (
                F.least(F.col("a.n_t"), F.col("b.n_t")).cast("double")
                >= _JACCARD_T * F.greatest(F.col("a.n_t"), F.col("b.n_t"))
            ),
        )
        .where(F.col("a.band") == first_true_band)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    return pairs, d


def _minhash_verify(pairs, d, broadcast_b: bool = False):
    """Exact-Jaccard verify of candidate pairs: re-attach token
    arrays by doc_id, keep pairs with J >= T. Token re-attach
    UNHINTED by default: d is corpus-sized (auto-broadcast at test
    SF, shuffled hash join on doc_id at 100 TB over many executors'
    disks). ``broadcast_b=True`` is the SINGLE-BOX ×100 shape
    (--sink rehearsal): the doc_b attach becomes a broadcast hash
    join, so the wide (pair + toks_a) intermediate STREAMS from the
    doc_a join through verify to the sink without ever entering an
    exchange — the one box's ~80 GB shuffle disk sees only the slim
    pair rows, never the ~KB-wide token-attached rows (which at
    ~300M true pairs exceed any single disk by design)."""
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    if broadcast_b:
        db = F.broadcast(db)
    cand = pairs.join(
        d.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")),
        "doc_a",
    ).join(db, "doc_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = (F.size("toks_a") + F.size("toks_b")).cast("double") - inter
    jac = inter / union
    return (
        cand.withColumn("jaccard_raw", jac)
        .where(F.col("jaccard_raw") >= _JACCARD_T)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard"))
    )


@query(
    "llm_tfidf_topk",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), n_docs AS (
      SELECT COUNT(*) AS n FROM corpus
    ), tf AS (
      SELECT doc_id, UNNEST(toks) AS term FROM corpus
    ), tfc AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT t.doc_id, t.term,
             ROUND(t.tf * (LN((n.n + 1.0) / (d.df + 1.0)) + 1.0), 4) AS tfidf
      FROM tfc t JOIN df d USING (term) CROSS JOIN n_docs n
      WHERE t.doc_id IN (0, 1, 2, 3, 5, 8, 13, 21, 34, 55)
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def llm_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smoothed: ln((N+1)/(df+1))+1) top-3 terms for 10 fixed
    doc_ids (ext: document fingerprinting). DF statistics computed
    over the FULL corpus (shuffle on term, map-side combinable), then
    joined to the 10 probe docs — the scale shape for featurizing a
    corpus against global statistics. The corpus size N enters the
    plan as a broadcast single-row aggregate (crossJoin), not a
    driver-side count(): one Spark job, one corpus scan, exactly like
    the oracle's CROSS JOIN n_docs.

    r14 optimization round — DF via per-doc ``array_distinct`` then a
    PLAIN combinable count, replacing ``countDistinct(doc_id)`` after
    the explode (guide §2.3 "aggregate before you shuffle"). The
    countDistinct form shipped every distinct (term, doc_id) pair
    through TWO exchanges (partial-distinct then count); dedup'ing
    terms INSIDE each document first makes (term, doc_id) unique by
    construction, so a plain count partial collapses map-side to
    ~vocabulary size and ONE exchange carries (term, partial_count).
    df(term) = #docs containing term either way — exact, and pinned:
    same-session ×100 A/B, value-identical 30 rows, DuckDB 2.765 s,
    countDistinct form 3.473 s (1.26×), this form **1.160 s (0.42×,
    Spark 2.4× faster)**."""
    probe_ids = [0, 1, 2, 3, 5, 8, 13, 21, 34, 55]
    d = load(spark, sf_dir, "documents")
    tf = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    n_docs = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    tfc = tf.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dt = d.select(
        F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    )
    df = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (
        tfc.where(F.col("doc_id").isin(probe_ids))
        .join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", F.round(F.col("tf") * idf, 4).alias("tfidf")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )
