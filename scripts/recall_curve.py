#!/usr/bin/env python
"""Tuning curves for the approximation knobs (round 8).

The registered evaluation queries measure ONE operating point each
(`ann_recall_eval` at nprobe=4, `dedup_recall_eval` at 8 hashes /
4 bands, the staged `quantized_recall_eval` at m=8). A deployment
tunes by sweeping the knob against exactly these measurements — this
script produces THREE curves in one artifact (`ivf_nprobe`,
`lsh_bands`, `pq_m`):

- **IVF nprobe curve**: mean recall@10 over the 32 held-out queries
  (16 ≤ vec_id < 48) for nprobe ∈ {1, 2, 4, 8, 16} against the exact
  expression kNN — nprobe=16 probes every centroid, so its recall is
  1.0 by construction (a built-in sanity row: the IVF tier restricted
  to ALL partitions IS exact search).
- **MinHash-LSH bands curve**: pair recall vs the exhaustive
  shingle-blocked Jaccard ground truth (τ=0.5) for bands ∈ {1, 2, 4, 8}
  at 8 minhashes (rows/band = 8/bands). More bands → more candidate
  buckets → higher recall at higher candidate volume; precision stays
  1.0 because the banded pipeline re-verifies true Jaccard.
- **PQ subspace-count curve**: mean recall@10 for m ∈ {4, 8, 16}
  (code bytes/vector = m) via the ADC ≡ L2-to-reconstruction identity.

Writes RECALL_CURVE.json at the repo root and prints one JSON line.

Usage: python scripts/recall_curve.py  [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.session import (
    get_spark,
)

BASE_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10


def ivf_curve(spark, sf_dir: str) -> list[dict]:
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
        ivf_search_batch,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.knn import (
        knn_join,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.queries_ann import (
        ANN_EVAL_Q_HI,
        ANN_EVAL_Q_LO,
        _ivf_layout,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.sources.tables import (
        load_table,
    )

    path, centroids = _ivf_layout(spark, sf_dir)
    layout = spark.read.parquet(path)
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(
            (F.col("vec_id") >= ANN_EVAL_Q_LO)
            & (F.col("vec_id") < ANN_EVAL_Q_HI)
        )
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    qdf = spark.createDataFrame(
        queries, "query_id long, embedding array<double>"
    )
    exact = (
        knn_join(emb, qdf, k=K, metric="l2", exclude_self=True)
        .select("query_id", "vec_id")
        .cache()
    )
    n_q = len(queries)
    exact.count()  # materialize once; every nprobe point reuses it

    rows = []
    for nprobe in (1, 2, 4, 8, 16):
        approx = ivf_search_batch(
            layout, centroids, queries, k=K, nprobe=nprobe, exclude_self=True
        ).select("query_id", "vec_id")
        hits = approx.join(exact, ["query_id", "vec_id"]).count()
        rows.append(
            {
                "nprobe": nprobe,
                "mean_recall": round(hits / (n_q * K), 4),
                "scan_fraction": round(nprobe / len(centroids), 4),
            }
        )
        print(f"# ivf nprobe={nprobe}: recall={rows[-1]['mean_recall']}",
              file=sys.stderr)
    exact.unpersist()
    return rows


def pq_m_curve(spark, sf_dir: str) -> list[dict]:
    """Mean recall@10 vs the PQ subspace count m ∈ {4, 8, 16} (16
    codewords per subspace from the same 16 training rows). Uses the
    ADC ≡ L2-to-reconstruction identity: each point is the exact kNN
    join over the reconstructed-vector expression (the staged
    quantized_recall_eval machinery), so no new operator is involved —
    this sweeps the code-size/recall trade the PQ tier ships with
    (bytes/vector = m)."""
    from pyspark.sql import functions as F

    from the_build_project_image_retrieval_with_vector_databases_spark.operators.knn import (
        knn_join,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.pq import (
        _centers_lit,
        pq_encode,
        slice_codebooks,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.queries_ann import (
        ANN_EVAL_Q_HI,
        ANN_EVAL_Q_LO,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    train = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    qrows = (
        emb.filter(
            (F.col("vec_id") >= ANN_EVAL_Q_LO)
            & (F.col("vec_id") < ANN_EVAL_Q_HI)
        )
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    qdf = spark.createDataFrame(
        queries, "query_id long, embedding array<double>"
    )
    exact = (
        knn_join(emb, qdf, k=K, metric="l2", exclude_self=True)
        .select("query_id", "vec_id")
        .cache()
    )
    exact.count()
    n_q = len(queries)

    rows = []
    for m in (4, 8, 16):
        codebooks = slice_codebooks(train, m)
        recon = F.concat(
            *[
                F.element_at(
                    _centers_lit(codebooks[j]), F.col(f"code_{j}") + 1
                )
                for j in range(m)
            ]
        )
        corpus = pq_encode(emb, codebooks).select(
            "vec_id", recon.alias("embedding")
        )
        approx = knn_join(
            corpus, qdf, k=K, metric="l2", exclude_self=True
        ).select("query_id", "vec_id")
        hits = approx.join(exact, ["query_id", "vec_id"]).count()
        rows.append(
            {
                "m": m,
                "code_bytes_per_vector": m,
                "mean_recall": round(hits / (n_q * K), 4),
            }
        )
        print(f"# pq m={m}: recall={rows[-1]['mean_recall']}",
              file=sys.stderr)
    exact.unpersist()
    return rows


def lsh_curve(spark, sf_dir: str) -> list[dict]:
    from the_build_project_image_retrieval_with_vector_databases_spark.operators import (
        dedup as D,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    exact = (
        D.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
        .select("left_id", "right_id")
        .cache()
    )
    n_exact = exact.count()

    rows = []
    for bands in (1, 2, 4, 8):
        handles: list = []
        lsh = D.minhash_lsh_pairs(
            docs, n=3, num_hashes=8, bands=bands, threshold=0.5,
            cache_handles=handles, pinned=D.pins_for(sf_dir),
        ).select("left_id", "right_id")
        n_hit = lsh.join(exact, ["left_id", "right_id"]).count()
        n_lsh = lsh.count()
        for h in handles:
            h.unpersist()
        rows.append(
            {
                "bands": bands,
                "rows_per_band": 8 // bands,
                "n_exact": n_exact,
                "n_candidates_verified": n_lsh,
                "recall": round(n_hit / max(n_exact, 1), 4),
            }
        )
        print(f"# lsh bands={bands}: recall={rows[-1]['recall']}",
              file=sys.stderr)
    exact.unpersist()
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else BASE_DEFAULT
    spark = get_spark(app_name="recall-curve")
    out = {
        "metric": "recall_curves",
        "sf_dir": sf_dir,
        "k": K,
        "ivf_nprobe": ivf_curve(spark, sf_dir),
        "lsh_bands": lsh_curve(spark, sf_dir),
        "pq_m": pq_m_curve(spark, sf_dir),
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "RECALL_CURVE.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
