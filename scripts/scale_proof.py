#!/usr/bin/env python
"""Empirical scale spot-proof (round-3 VERDICT item 10).

Runs the three headline dedup queries at bench scale (sf0.1, 5k docs)
and at 10× (50k docs) and reports the time ratios. The 10× table is
DERIVED from the sf0.1 fixture — 10 replicas with every token suffixed
per-replica, so replicas share no shingles and the corpus's internal
near-dup structure repeats exactly 10× (pair volume and component
structure scale linearly, the honest load for a dedup engine; naive
replication would instead make every doc a 10-way dup and square the
pair graph).

Usage: python scripts/scale_proof.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.session import (
    get_spark,
)
from the_build_project_image_retrieval_with_vector_databases_spark import queries as Q

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["ngram_jaccard_dedup", "minhash_lsh_dedup", "dedup_components",
           "decontaminate", "passage_dedup", "incremental_dedup"]
# ANN probes over the 10× embeddings table: partition pruning bounds the
# scan to the probed cells, so growth should be well below data growth
ANN_QUERIES = ["ivf_topk", "ivf_topk_batch", "label_centroids"]
# event-time ops over the 10x events table (disjoint users per replica:
# interval-join pair volume and CMS stream length scale linearly)
EVENT_QUERIES = ["interval_join", "cms_heavy_hitters"]
# round-6 additions (VERDICT r5 #5): the r5/r6 newcomers — the two-phase
# bucketed cumsum (seq_packing), md5-checked corpus rewrite
# (vocab_filter), cohort matrix (retention_cohorts), the decorrelated
# Q2/Q20 shapes over 10x lineitem (min_cost_order, dominant_suppliers),
# the search() facade (ann_search), the gap-fill grid (gap_fill), and
# the truncated-embedding top-k (matryoshka_topk)
NEW_QUERIES = [
    "seq_packing", "vocab_filter", "retention_cohorts",
    "min_cost_order", "dominant_suppliers", "ann_search",
    "gap_fill", "matryoshka_topk",
]
REPLICAS = 10


def build_scaled(spark, out_dir: str) -> None:
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n = docs.count()
    parts = []
    for r in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n))
        if r > 0:
            # suffix every token: replicas share no shingles/terms,
            # within-replica similarity structure is untouched
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{r}")
            )
        parts.append(d)
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionAll(p)
    scaled.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    # embeddings at 10×: replica r keeps the vectors (timing is the
    # target, not result novelty) with offset ids; replica 0 keeps the
    # original ids so the oracle-visible training rows (vec_id < 16)
    # and the flagship query vector are unchanged.
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    m = emb.count()
    eparts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * m))
        for r in range(REPLICAS)
    ]
    scaled_e = eparts[0]
    for p in eparts[1:]:
        scaled_e = scaled_e.unionAll(p)
    scaled_e.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    # events at 10x: per-replica user_id/event_id offsets keep replicas
    # disjoint, so per-user pair volume is unchanged and total volume
    # scales linearly — the honest load for the bucketed interval join
    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    k = ev.count()
    vparts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(r * k))
        .withColumn("user_id", F.col("user_id") + F.lit(r * 100000))
        for r in range(REPLICAS)
    ]
    scaled_v = vparts[0]
    for p_ in vparts[1:]:
        scaled_v = scaled_v.unionAll(p_)
    scaled_v.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    # lineitem at 10x: per-replica order/part offsets keep replicas
    # disjoint (group count scales linearly); suppliers stay shared —
    # 10x rows per supplier is the honest "more orders, same catalog"
    # load for the Q20-shape window
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    ok_max = li.agg(F.max("l_orderkey")).first()[0] + 1
    pk_max = li.agg(F.max("l_partkey")).first()[0] + 1
    lparts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * ok_max))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(r * pk_max))
        for r in range(REPLICAS)
    ]
    scaled_l = lparts[0]
    for p_ in lparts[1:]:
        scaled_l = scaled_l.unionAll(p_)
    scaled_l.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    # dimension tables pass through unchanged
    for dim in ("supplier", "nation"):
        spark.read.parquet(os.path.join(BASE, f"{dim}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{dim}.parquet"))


def timed(spark, fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 2)


def main() -> None:
    spark = get_spark(app_name="scale-proof")
    scaled_dir = os.path.join(tempfile.gettempdir(), "spark_graft_scale10x")
    # staleness check must cover EVERY table build_scaled writes: a
    # cached dir from a round that wrote fewer tables would otherwise
    # skip the build and crash the first query that needs the new one
    if not all(
        os.path.exists(os.path.join(scaled_dir, t, "_SUCCESS"))
        for t in (
            "documents.parquet", "embeddings.parquet", "events.parquet",
            "lineitem.parquet", "supplier.parquet", "nation.parquet",
        )
    ):
        build_scaled(spark, scaled_dir)

    out = {}
    for name in QUERIES + ANN_QUERIES + EVENT_QUERIES + NEW_QUERIES:
        fn = Q.QUERIES[name]
        # warm any one-time index build OUTSIDE the timed runs (the
        # steady state at scale is the probe, not the build)
        fn(spark, BASE).write.format("noop").mode("overwrite").save()
        fn(spark, scaled_dir).write.format("noop").mode("overwrite").save()
        base_s = timed(spark, lambda: fn(spark, BASE))
        scaled_s = timed(spark, lambda: fn(spark, scaled_dir))
        out[name] = {
            "sf0.1_s": base_s,
            "10x_s": scaled_s,
            "ratio": round(scaled_s / base_s, 2),
        }
    print(json.dumps({"replicas": REPLICAS, "queries": out}))


if __name__ == "__main__":
    main()
