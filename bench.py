#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver
collect skew); a warmup pass loads file footers + JIT before timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from the_build_project_image_retrieval_with_vector_databases_spark.session import (
    get_spark,
)
from the_build_project_image_retrieval_with_vector_databases_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "knn_l2_topk",
    "knn_join_topk",
    "cosine_topk",
    "radius_pairs",
    "stratified_sample",
    "pricing_summary",
    "top_revenue_customers",
    "top_terms",
    "salted_term_counts",
    "clean_corpus",
    "suffix_join",
    "suffix_join_equi",
    "exact_dedup",
    "ngram_jaccard_dedup",
    "minhash_lsh_dedup",
    "simhash",
    "simhash_near_dup",
    "tumbling_window",
    "sliding_window",
    "sessionize",
    "views_before_purchase",
    "kmv_distinct_sketch",
    "value_quantiles",
    "json_extract_agg",
    "ivf_topk",
    "pq_topk",
    "ivfpq_topk",
    "sq_topk",
    "lsh_bucket_counts",
    "lsh_near_dup",
    "dedup_components",
    "cosine_dedup",
    "knn_two_phase",
    "regional_volume",
    "part_profit",
    "forecast_revenue",
    "running_revenue",
    "supplier_rollup",
    "asof_join",
    # round-3 additions: bench coverage tracks the registry (VERDICT #9)
    "top_docs_per_lang",
    "bpe_token_counts",
    "tf_idf",
    "streaming_dedup_batch",
    "order_priority_semi",
    "customers_without_orders",
    # round-3 new operators
    "ivf_topk_batch",
    "pq_rerank_topk",
    "gopher_quality",
    "funnel_conversion",
    "image_knn_pipeline",
    "order_count_distribution",
    "bucketed_revenue",
    "decontaminate",
    "label_centroids",
    "interval_join",
    "important_stock",
    "large_orders",
    "ship_mode_counts",
    "revenue_growth",
    "ntile_segments",
    "token_histogram",
    "cms_heavy_hitters",
    "weighted_sample",
    "zorder_keys",
    "passage_dedup",
    "waiting_suppliers",
    "idle_customers",
    "incremental_dedup",
    "mixture_sample",
    "embedding_stats",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed_best_of(spark, fn, runs: int = 2) -> float:
    """Best-of-N steady-state time. The VM shows intermittent multi-second
    CPU-steal stalls; min-of-2 reports the engine's true cost, not the
    noise. Cache is cleared between runs so each run recomputes from
    parquet (operator-internal persists don't carry over)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        materialize(fn())
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best


def main() -> None:
    spark = get_spark(app_name="bench")
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # warmup: JVM/codegen + parquet footers
    materialize(Q.QUERIES["label_counts"](spark, SF_DIR))

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = Q.QUERIES[name]
        times[name] = round(timed_best_of(spark, lambda: fn(spark, SF_DIR)), 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "sum_query_seconds_sf" + str(sf),
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
