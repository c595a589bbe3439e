"""Ball-cover gate rehearsal at a PRODUCTION dedup threshold (T=0.9).

llm_dedup_embedding's docstring claims the gate degenerates on the
dense synthetic sf corpus (T=0.45 -> R~1.05) but prunes at production
thresholds on cluster-structured data (T>=0.9 -> R<=0.45, replication
~1). This script MEASURES that claim (round-3 verdict item 7):

1. Build a x10 cluster-structured corpus (20,000 vectors, dim 64):
   64 topic clusters (random unit centers), 2,000 distinct "documents"
   (center + 0.45 jitter, normalized), each with 10 near-dup copies
   (doc + 0.14 jitter, normalized -> copy-to-copy cosine ~0.98).
   This is the geometry real embedding corpora have (semantic
   clusters; near-dups = tight groups) and the one coarse quantizers
   exploit — an ISOTROPIC corpus defeats any metric prune (all
   distances concentrate at sqrt(2) in high dim), which is why the
   sf testdata can't exercise the gate at T=0.9 (its max pairwise
   cosine is ~0.51: zero qualifying pairs, trivial candidates).
   Deterministic: numpy PCG64 seed 7. Cells = the topic label, the
   same label-as-coarse-quantizer convention as the registry operator.

2. Run the SAME engine code path (``ball_cover_stages``, shared with
   the registered llm_dedup_embedding) at T=0.9 and measure:
   probe replication factor, candidate pairs vs all-pairs (the
   pruning factor), verified output pairs, wall time.

3. Validate recall 1.0 empirically: exact truth = cluster-blocked
   brute force (all intra-cluster pairs, cos >= T), PLUS a proof that
   no cross-cluster pair can qualify — for clusters i != j, any pair
   x in i, y in j has d(ci,cj) <= rad_i + d(x,y) + rad_j, so
   min-inter-centroid-distance > rad_i + rad_j + R rules them out
   (checked numerically over all 64x64 centroid pairs).

Usage: python scripts/rehearsal_embedding_gate.py [--mult 10]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from atd_dockless_processing_spark.operators.dedup_ann import (  # noqa: E402
    ball_cover_stages,
)
from atd_dockless_processing_spark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 64
N_DOCS = 2_000
COS_T = 0.9
R_GATE = float(np.sqrt(2.0 - 2.0 * COS_T))  # 0.4472


def build(mult: int) -> tuple[str, int]:
    out = REPO / ".scratch" / f"emb_gate_x{mult}" / "embeddings.parquet"
    copies = mult
    n = N_DOCS * copies
    if not (out.parent / f"built_{n}").exists():
        rng = np.random.default_rng(7)

        def unit(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        centers = unit(rng.standard_normal((N_CLUSTERS, DIM)))
        doc_cluster = rng.integers(0, N_CLUSTERS, N_DOCS)
        docs = unit(
            centers[doc_cluster] + 0.45 * unit(rng.standard_normal((N_DOCS, DIM)))
        )
        vecs = unit(
            np.repeat(docs, copies, axis=0)
            + 0.14 * unit(rng.standard_normal((n, DIM)))
        )
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "label": np.repeat(doc_cluster, copies).astype(np.int64),
                "embedding": list(vecs),
            }
        )
        spark = get_spark("emb-gate-build")
        spark.createDataFrame(pdf).repartition(8).write.mode("overwrite").parquet(
            str(out)
        )
        (out.parent / f"built_{n}").touch()
    return str(out), n


def main() -> None:
    mult = int(sys.argv[sys.argv.index("--mult") + 1]) if "--mult" in sys.argv else 10
    path, n = build(mult)
    spark = get_spark("emb-gate")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    v = spark.read.parquet(path).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("ve"),
    )
    probes, candidates, pairs = ball_cover_stages(v, COS_T, DIM)

    t0 = time.perf_counter()
    n_pairs = pairs.count()
    t_gate = time.perf_counter() - t0
    n_probes = probes.count()
    n_cand = candidates.count()
    all_pairs = n * (n - 1) // 2

    # exact truth: cluster-blocked brute force ...
    a = v.select(
        F.col("vec_id").alias("a_id"), F.col("label").alias("cell"), F.col("ve").alias("a_ve")
    )
    b = v.select(
        F.col("vec_id").alias("b_id"), F.col("label").alias("cell"), F.col("ve").alias("b_ve")
    )
    dot = F.aggregate(
        F.zip_with("a_ve", "b_ve", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    )
    t0 = time.perf_counter()
    n_truth = (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(dot / (nrm(F.col("a_ve")) * nrm(F.col("b_ve"))) >= COS_T)
        .count()
    )
    t_truth = time.perf_counter() - t0

    # ... plus the no-cross-cluster-pair certificate (numeric, 64x64).
    # Materialize the norm as a column first so the per-element divide
    # doesn't re-evaluate the O(dim) norm aggregate dim times per row
    # (the same cheap form ball_cover_stages uses).
    vh = v.withColumn("nrm", nrm(F.col("ve"))).select(
        "label", F.transform("ve", lambda x: x / F.col("nrm")).alias("vh")
    )
    cent_rows = (
        vh.groupBy("label")
        .agg(*[F.avg(F.col("vh")[i]).alias(f"c{i}") for i in range(DIM)])
        .collect()
    )
    cents = {r["label"]: np.array([r[f"c{i}"] for i in range(DIM)]) for r in cent_rows}
    rad_rows = vh.groupBy("label").agg(F.collect_list("vh").alias("vs")).collect()
    radii = {}
    for r in rad_rows:
        c = cents[r["label"]]
        radii[r["label"]] = max(
            float(np.linalg.norm(np.array(m) - c)) for m in r["vs"]
        )
    labels = sorted(cents)
    min_slack = min(
        float(np.linalg.norm(cents[i] - cents[j])) - (radii[i] + radii[j] + R_GATE)
        for ii, i in enumerate(labels)
        for j in labels[ii + 1 :]
    )

    print(f"n={n} all_pairs={all_pairs}")
    print(f"probes={n_probes} replication={n_probes / n:.3f}x")
    print(
        f"candidates={n_cand} pruning={all_pairs / n_cand:.1f}x "
        f"(candidate share {100 * n_cand / all_pairs:.2f}%)"
    )
    # The gate is recall-1.0 UNCONDITIONALLY (triangle inequality, see
    # ball_cover_stages), so gate-output == cluster-blocked truth is
    # definitive: it simultaneously confirms the implementation within
    # clusters and proves no cross-cluster pair exists (gate ⊇ all true
    # pairs; equality with an intra-cluster-only count ⇒ none outside).
    # The a-priori certificate below is a STRICTER sufficient condition
    # (inter-centroid distance > rad_i + rad_j + R for all i<j); it can
    # print False with recall still perfect when the bound is loose.
    print(f"pairs={n_pairs} truth_blocked={n_truth} recall_ok={n_pairs == n_truth}")
    print(
        f"apriori_cross_cluster_certificate={min_slack > 0} "
        f"(min slack {min_slack:.3f}; loose bound, informational only)"
    )
    print(f"t_gate={t_gate:.2f}s t_truth_blocked={t_truth:.2f}s")


if __name__ == "__main__":
    main()
