#!/usr/bin/env python
"""Empirical scale proof — FULL-REGISTRY 10× sweep.

Runs every registry query at bench scale (sf0.1) and at 10× derived
data and reports per-query time ratios. A ratio well below 10 means
the plan's cost is sub-linear in data size on the measured range
(partition pruning, broadcast joins, top-k short-circuits); a ratio
near or above 10 flags a plan whose constant factors or shuffle
volume track raw data — the scale bugs this script exists to find.

The 10× tables are DERIVED from the sf0.1 fixtures so the join graph
stays real and the workload stays honest:

- documents: 10 replicas, every token suffixed per-replica — replicas
  share no shingles/terms, so the corpus's internal near-dup structure
  repeats exactly 10× (pair volume and component structure scale
  linearly; naive replication would square the pair graph).
- embeddings: replica 0 keeps original ids AND vectors (oracle-visible
  training rows and the flagship query vector unchanged); replica r
  circular-shifts each vector by r mod D positions and negates it for
  r >= D. Shifts/negation preserve norms and ALL intra-replica
  distances (the similarity structure repeats exactly), while
  cross-replica pairs fall to background similarity — naive vector
  cloning would give every vector R-1 exact twins and square the
  near-dup pair graph (observed: lsh_near_dup went linear-in-data at
  100x purely from clone pairs).
- events: per-replica user_id/event_id offsets — disjoint users, so
  per-user pair volume is unchanged and total volume scales linearly.
- lineitem + orders: replicated with a COMMON orderkey span (max over
  both tables) so lineitem⋈orders stays a real FK join at 10×;
  l_partkey/p_partkey likewise share a common span with part.
  o_custkey and l_suppkey are NOT offset: customers and suppliers are
  shared dims — "10× more orders against the same catalog", the honest
  load for dim joins, windows, and anti/semi joins.
- customer, supplier, part-independent dims (nation, region): pass
  through unchanged.

Fixture-backed queries (package image/video/manifest fixtures, no
sf_dir tables — see EXCLUDE) are skipped: their input does not scale
with sf_dir, so a "10×" timing would be a no-op measurement.

Usage:
  python scripts/scale_proof.py                 → full sweep, one JSON line
  python scripts/scale_proof.py q1 q2 ...       → only the named queries
  python scripts/scale_proof.py --replicas 100 q1 ...
        → second decade: 100× derived data (builds once per replica
          count; use for the representative-family scale curve)
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
REPLICAS = 10  # overridden by --replicas
# Bump when build_scaled's output changes; stale cached dirs rebuild.
BUILD_VERSION = "v3-shifted-embeddings"

# Queries whose inputs are package fixtures (images/videos/manifest/
# jsonl), not sf_dir tables — input size does not scale with sf_dir.
EXCLUDE = {
    "manifest_scan",
    "image_decode_real",
    "image_decode_jpeg",
    "image_knn_pipeline",
    "frame_sample",
    "jsonl_ingest",
}


def _replicate(df, offsets: dict[str, int]):
    """Union REPLICAS copies, offsetting the named key columns by
    r × span each. Columns absent from ``offsets`` are shared."""
    parts = []
    for r in range(REPLICAS):
        d = df
        for col, span in offsets.items():
            if r > 0:
                d = d.withColumn(col, F.col(col) + F.lit(r * span))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def build_scaled(spark, out_dir: str) -> None:
    def write(df, name):
        df.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    def read(name):
        return spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))

    # documents: offset ids; suffix every token per-replica so replicas
    # share no shingles and near-dup structure repeats exactly 10×
    docs = read("documents")
    n = docs.count()
    parts = []
    for r in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * n))
        if r > 0:
            d = d.withColumn("text", F.regexp_replace("text", r"(\S+)", f"$1x{r}"))
        parts.append(d)
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionAll(p)
    write(scaled, "documents")

    # embeddings: distance-preserving per-replica transform (circular
    # shift by r mod D, negated for r >= D) — intra-replica similarity
    # structure repeats exactly, cross-replica pairs are background
    emb = read("embeddings")
    m = emb.count()
    dim = len(emb.select("embedding").first()[0])
    eparts = []
    for r in range(REPLICAS):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * m))
        s = r % dim
        if s:
            d = d.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", s + 1, dim - s),
                    F.slice("embedding", 1, s),
                ),
            )
        if r >= dim:
            d = d.withColumn(
                "embedding", F.transform("embedding", lambda x: -x)
            )
        eparts.append(d.withColumn("embedding", F.col("embedding").cast("array<float>")))
    scaled_e = eparts[0]
    for p in eparts[1:]:
        scaled_e = scaled_e.unionAll(p)
    write(scaled_e, "embeddings")

    ev = read("events")
    k = ev.count()
    write(_replicate(ev, {"event_id": k, "user_id": 100000}), "events")

    # fact graph: common key spans keep lineitem⋈orders⋈part real FK
    # joins at 10×; custkey/suppkey shared (same catalog, more orders)
    li, od, pt = read("lineitem"), read("orders"), read("part")
    ok_span = (
        max(
            li.agg(F.max("l_orderkey")).first()[0],
            od.agg(F.max("o_orderkey")).first()[0],
        )
        + 1
    )
    pk_span = (
        max(
            li.agg(F.max("l_partkey")).first()[0],
            pt.agg(F.max("p_partkey")).first()[0],
        )
        + 1
    )
    write(_replicate(li, {"l_orderkey": ok_span, "l_partkey": pk_span}), "lineitem")
    write(_replicate(od, {"o_orderkey": ok_span}), "orders")
    write(_replicate(pt, {"p_partkey": pk_span}), "part")

    # shared dims pass through unchanged
    for dim in ("customer", "supplier", "nation", "region"):
        write(read(dim), dim)

    with open(os.path.join(out_dir, "VERSION"), "w") as f:
        f.write(BUILD_VERSION)


def timed(spark, fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 2)


def main() -> None:
    global REPLICAS
    argv = sys.argv[1:]
    if argv and argv[0] == "--replicas":
        REPLICAS = int(argv[1])
        argv = argv[2:]
    spark = get_spark(app_name="scale-proof")
    scaled_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_scale{REPLICAS}x"
    )
    ver_path = os.path.join(scaled_dir, "VERSION")
    fresh = (
        os.path.exists(ver_path) and open(ver_path).read() == BUILD_VERSION
    )
    if not fresh:
        build_scaled(spark, scaled_dir)

    names = argv or [n for n in Q.QUERIES if n not in EXCLUDE]

    def resolve(name):
        """Registry entry, else a staged query function (q_<name>) from
        the query modules — so staged r9 candidates get scale rows
        before they are registered."""
        if name in Q.QUERIES:
            return Q.QUERIES[name]
        from the_build_project_image_retrieval_with_vector_databases_spark import (
            queries_ann, queries_text,
        )

        for mod in (queries_ann, queries_text):
            fn = getattr(mod, f"q_{name}", None)
            if fn is not None:
                return fn
        raise KeyError(f"unknown query {name!r} (registry or staged q_{name})")

    out = {}
    for name in names:
        fn = resolve(name)
        # warm any one-time index build OUTSIDE the timed runs (the
        # steady state at scale is the probe, not the build)
        fn(spark, BASE).write.format("noop").mode("overwrite").save()
        fn(spark, scaled_dir).write.format("noop").mode("overwrite").save()
        base_s = timed(spark, lambda: fn(spark, BASE))
        scaled_s = timed(spark, lambda: fn(spark, scaled_dir))
        ratio = round(scaled_s / base_s, 2) if base_s > 0 else None
        out[name] = {"sf0.1_s": base_s, "10x_s": scaled_s, "ratio": ratio}
        print(
            f"# scale {name}: {base_s:.2f}s -> {scaled_s:.2f}s  (x{ratio})",
            file=sys.stderr,
        )
    ratios = sorted(
        (v["ratio"], k) for k, v in out.items() if v["ratio"] is not None
    )
    summary = {
        "n": len(out),
        "max_ratio": ratios[-1][0] if ratios else None,
        "max_query": ratios[-1][1] if ratios else None,
        "median_ratio": ratios[len(ratios) // 2][0] if ratios else None,
    }
    print(json.dumps({"replicas": REPLICAS, "summary": summary, "queries": out}))


if __name__ == "__main__":
    main()
