#!/usr/bin/env python
"""Scan the REMAINING rounded registry outputs for .5-tie exposure.

Round 6 switched every rational-ratio output (integer ÷ integer) to raw
doubles — those were the real tie hazard (Spark BigDecimal-HALF_UP vs
DuckDB multiply/rint diverge when the double's shortest repr terminates
in '5' exactly at the rounding digit). The outputs that stay rounded
are sqrt/log/interpolation-derived; their shortest reprs carry ~17
significant digits, so a terminating '5' at digit 7 is a measure-zero
event — this script makes that claim EMPIRICAL at sf0.1: it recomputes
the pre-round values of every still-rounded column class and counts
values whose shortest repr is an exact .5 tie at the rounding digit.
Expected output: zero hits everywhere.

Usage: python scripts/tie_scan.py  → one JSON line.
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
from the_build_project_image_retrieval_with_vector_databases_spark.functions.vector import (
    l2_dist,
    truncate_renormalize,
)
from the_build_project_image_retrieval_with_vector_databases_spark.functions.text import (
    tokens,
)
from the_build_project_image_retrieval_with_vector_databases_spark.sources.tables import (
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def boundary_hits(values, digits: int) -> int:
    """Count doubles whose SHORTEST REPR is an exact round-to-``digits``
    tie — value = k·10^-digits ± 5·10^-(digits+1) exactly — the only
    class where Spark's BigDecimal HALF_UP (which rounds the shortest
    repr) and DuckDB's multiply/rint differ. Longer expansions passing
    through ...5000...1 or ...4999... round the same way in both
    engines. Decimal arithmetic, NOT a repr regex: Python repr switches
    to scientific notation below 1e-4, which a digit-pattern silently
    misses (round-6 review finding — 5e-07 IS a round-6 tie)."""
    from decimal import Decimal

    half = Decimal("0.5")
    n = 0
    for v in values:
        if v is None:
            continue
        d = Decimal(repr(float(v))).scaleb(digits)
        n += int(abs(d - d.to_integral_value()) == half)
    return n


def _selfcheck() -> None:
    """The scan is only as good as its tie predicate — pin it on knowns."""
    assert boundary_hits([0.0078125], 6) == 1          # true round-6 tie
    assert boundary_hits([0.1234565], 6) == 1          # true round-6 tie
    assert boundary_hits([5e-07], 6) == 1              # sci-notation tie
    assert boundary_hits([6.45e-05], 6) == 1           # sci-notation tie
    assert boundary_hits([-0.1234565], 6) == 1         # negative tie
    assert boundary_hits([0.123455], 6) == 0           # 6 decimals: not a tie
    assert boundary_hits([5e-08], 6) == 0              # tie one digit deeper? no:
    # 5e-08 scaled by 1e6 = 0.05 — not a half — rounds to 0 both engines
    assert boundary_hits([0.12345650000000001], 6) == 0  # above-half, agrees
    assert boundary_hits([1.4142135623730951], 6) == 0   # sqrt-class repr


def main() -> None:
    _selfcheck()
    spark = get_spark(app_name="tie-scan")
    out = {}

    # class 1: tf·ln ratios (tf_idf keeps round(...,6); ln output)
    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select(
        F.col("doc_id"), F.explode_outer(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isNotNull())
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df")).filter(F.col("df") >= 2)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    raw = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            (
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
            ).alias("v")
        )
    )
    vals = [r.v for r in raw.collect()]
    out["tf_idf_ln"] = {"n": len(vals), "hits6": boundary_hits(vals, 6)}

    # class 2: sqrt distances (every knn/ann dist column keeps round 6)
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    d = (
        emb.crossJoin(F.broadcast(q))
        .select(l2_dist("embedding", "qe").alias("v"))
    )
    vals = [r.v for r in d.collect()]
    t = emb.select("vec_id", truncate_renormalize("embedding", 32).alias("t"))
    qt = t.filter(F.col("vec_id") == 0).select(F.col("t").alias("qt"))
    t = t.select("t")
    vals += [r.v for r in t.crossJoin(F.broadcast(qt)).select(
        l2_dist("t", "qt").alias("v")).collect()]
    out["sqrt_dists"] = {"n": len(vals), "hits6": boundary_hits(vals, 6)}

    # class 3: percentile interpolation (value_quantiles keeps round 6)
    ev = load_table(spark, SF_DIR, "events")
    qs = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("a"),
        F.expr("percentile(value, 0.95)").alias("b"),
        F.expr("percentile(value, 0.99)").alias("c"),
    )
    vals = []
    for r in qs.collect():
        vals += [r.a, r.b, r.c]
    out["quantile_interp"] = {"n": len(vals), "hits6": boundary_hits(vals, 6)}

    # class 4: BM25 pre-round scores (staged bm25 keeps round 6 — the
    # ln-derived idf makes it the tf_idf class, not the ratio class)
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.textops import bm25
    from the_build_project_image_retrieval_with_vector_databases_spark.queries_text import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
    )

    full = bm25(
        docs, BM25_TERMS, k=1 << 30, k1=BM25_K1, b=BM25_B, round_score=False
    )
    vals = [r.score for r in full.collect()]
    out["bm25_scores"] = {"n": len(vals), "hits6": boundary_hits(vals, 6)}

    total = sum(v["hits6"] for v in out.values())
    print(json.dumps({"sf_dir": SF_DIR, "classes": out, "total_hits": total}))
    if total:
        sys.exit(1)


if __name__ == "__main__":
    main()
