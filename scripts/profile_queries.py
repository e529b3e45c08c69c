#!/usr/bin/env python
"""Per-query optimization profiler (round 17).

For each named registry query: run min-of-2 noop-sink timings (the
bench methodology) at $SPARK_GRAFT_SF_DIR and dump
``explain("formatted")`` to plans/r17/<name>_<tag>.txt. Job
descriptions are set per query so the work is attributable.

Usage: python scripts/profile_queries.py <tag> [query ...]
  tag: suffix for the plan files ("before"/"after")
  with no query names: profiles the top-N from BENCH_FULL.json
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from the_build_project_image_retrieval_with_vector_databases_spark.session import (
    get_spark,
)
from the_build_project_image_retrieval_with_vector_databases_spark import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18")
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            bench = json.load(f)
        names = sorted(bench["queries"], key=lambda n: -bench["queries"][n])[:20]
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = get_spark(app_name="profile")
    # same warm set as bench.py so steady-state matches
    for wname in ["pricing_summary", "knn_l2_topk", "gopher_quality"]:
        if wname in Q.QUERIES:
            materialize(Q.QUERIES[wname](spark, SF_DIR))
    spark.catalog.clearCache()
    results = {}
    for name in names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        results[name] = round(best, 3)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"# profile {name} = {best:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
