#!/usr/bin/env python
"""Index-tier storage footprint — measured, not asserted (round 8).

The PQ/SQ docstrings claim the code layouts cut scan bytes ~32×/4× vs
the float32 flat layout; this script WRITES each tier's layout for the
embeddings table at $SPARK_GRAFT_SF_DIR and reports the actual parquet
bytes on disk (sum of data files), plus bytes/vector and the ratio vs
flat. Layouts measured:

- flat: (vec_id, label, embedding float32[64]) — the exact-search scan
- ivf:  flat + centroid partition column (same bytes, pruned reads)
- pq:   (vec_id, label, code_0..7 int) — 8 codes/row ADC scan
- sq:   (vec_id, label, sq_codes int[64] clamped 0..255) — int8-class
        scan (parquet stores small ints efficiently)
- bq:   (vec_id, label, bq_lo, bq_hi BIGINT) — 1 bit/dim in two packed
        32-bit halves, the Hamming-search tier (staged r12)

Writes INDEX_FOOTPRINT.json at the repo root and prints one JSON line.

Usage: python scripts/index_footprint.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.session import (
    get_spark,
)

BASE_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else BASE_DEFAULT
    spark = get_spark(app_name="index-footprint")
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
        assign_centroids,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.pq import (
        pq_encode,
        slice_codebooks,
        sq_encode,
        sq_train_bounds,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    train = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    m = 8
    codebooks = slice_codebooks(train, m)
    bounds = sq_train_bounds(train)

    out_root = tempfile.mkdtemp(prefix="index_footprint_")
    try:
        sizes, n_out = _measure(spark, emb, train, codebooks, bounds, m, out_root)
    finally:
        import shutil

        shutil.rmtree(out_root, ignore_errors=True)

    report = {
        name: {
            "bytes": b,
            "bytes_per_vector": round(b / n, 1),
            "vs_flat": round(b / sizes["flat"], 4),
        }
        for name, b in sizes.items()
    }
    artifact = {
        "metric": "index_footprint",
        "sf_dir": sf_dir,
        "n_vectors": n,
        "dim": 64,
        "pq_m": m,
        "layouts": report,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "INDEX_FOOTPRINT.json"), "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps(artifact))


def _bq_layout(emb, train):
    from pyspark.sql import functions as F

    from the_build_project_image_retrieval_with_vector_databases_spark.operators.pq import (
        bq_encode_cols,
        bq_train_thresholds,
    )

    thr = bq_train_thresholds(train)
    lo, hi = bq_encode_cols(thr, len(train))
    return emb.select(
        "vec_id", "label", lo.alias("bq_lo"), hi.alias("bq_hi")
    )


def _measure(spark, emb, train, codebooks, bounds, m, out_root):
    from pyspark.sql import functions as F

    from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
        assign_centroids,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.pq import (
        pq_encode,
        sq_encode,
    )

    layouts = {
        "flat": emb.select(
            "vec_id", "label", F.col("embedding").cast("array<float>").alias("embedding")
        ),
        "pq": pq_encode(emb, codebooks).select(
            "vec_id", "label", *[f"code_{j}" for j in range(m)]
        ),
        "sq": sq_encode(emb, bounds).select("vec_id", "label", "sq_codes"),
        "bq": _bq_layout(emb, train),
    }
    sizes = {}
    for name, df in layouts.items():
        path = os.path.join(out_root, name)
        df.repartition(1).write.mode("overwrite").parquet(path)
        sizes[name] = dir_bytes(path)
    # ivf: same columns as flat, written into centroid directories
    ivf_path = os.path.join(out_root, "ivf")
    assign_centroids(emb, train).select(
        "vec_id", "label",
        F.col("embedding").cast("array<float>").alias("embedding"),
        "centroid",
    ).repartition(1).write.mode("overwrite").partitionBy("centroid").parquet(
        ivf_path
    )
    sizes["ivf"] = dir_bytes(ivf_path)
    return sizes, None


if __name__ == "__main__":
    main()
