"""Distinct-count sketches: KMV accuracy/exactness properties and the
HLL++ (`approx_count_distinct`) error-bound check that can't be
oracle-verified (engine-private registers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.operators.sketch import (
    kmv_distinct,
)
from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/events.parquet").cache()
    df.count()
    return df


def test_kmv_exact_below_k(events):
    """Groups with fewer than k distinct keys are estimated EXACTLY —
    the sketch saw every value."""
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    big_k = max(exact.values()) + 10
    got = {
        r.event_type: (r.n_seen, r.kmv_est)
        for r in kmv_distinct(events, "user_id", "event_type", k=big_k).collect()
    }
    for et, n in exact.items():
        assert got[et] == (n, float(n))


def test_kmv_estimate_within_error(events):
    """At k=64 the KMV standard error is ~1/√(k−2) ≈ 13%; assert a loose
    3σ bound (deterministic — the 'randomness' is the fixed md5 hash)."""
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r.event_type: r.kmv_est
        for r in kmv_distinct(events, "user_id", "event_type", k=64).collect()
    }
    for et, n in exact.items():
        assert abs(got[et] - n) / n < 0.4, (et, got[et], n)


def test_approx_percentile_within_error(events):
    """`approx_percentile` (mergeable sketch, engine-private like HLL):
    observed quantile must land within a tight rank-error band of the
    exact interpolated percentile at accuracy=10000."""
    rows = (
        events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.95)").alias("exact"),
            F.expr("approx_percentile(value, 0.95, 10000)").alias("approx"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / max(abs(r.exact), 1e-9) < 0.05


def test_hll_within_error(events):
    """Spark's HLL++ at rsd=0.05: observed error must stay within ~3 rsd."""
    rows = (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.n) / r.n < 0.15, (r.event_type, r.approx, r.n)


def test_cms_one_sided_error_and_exactness(spark, events):
    """CMS point estimates: never an undercount; with width ≥ #keys × a
    margin the estimate is exact for most keys, and total over-count is
    bounded by depth-min over independent rows."""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    sketch = cms_sketch(events, "user_id", depth=4, width=64)
    # grid never exceeds depth × width cells
    assert sketch.count() <= 4 * 64
    exact = events.groupBy("user_id").agg(F.count("*").alias("n"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id",
                       depth=4, width=64)
    rows = exact.join(est, "user_id").collect()
    assert rows
    assert all(r.cms_est >= r.n for r in rows), "CMS undercounted"
    # sketch total mass equals depth × stream length
    total_cells = sum(r.cell for r in sketch.collect())
    stream_len = events.count()
    assert total_cells == 4 * stream_len


def test_cms_unseen_key_estimates_zero(spark, events):
    """A key that never appeared in the sketched stream must estimate 0:
    at least one of its depth cells is absent from the sparse grid (true
    count 0), and the left-join + coalesce keeps that cell in the min.
    (Round-4 ADVICE: the old inner join dropped absent cells, inflating
    or losing unseen keys.)"""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    few = events.limit(1).select("user_id")  # sparse stream: <=4 occupied cells
    sketch = cms_sketch(few, "user_id", depth=4, width=64)
    assert sketch.count() <= 4
    probes = spark.range(1_000_000, 1_000_050).select(
        F.col("id").alias("user_id")
    )
    est = {r.user_id: r.cms_est for r in
           cms_estimate(sketch, probes, "user_id", depth=4, width=64).collect()}
    assert len(est) == 50, "every probed key must get an estimate row"
    # with 4/256 cells occupied an unseen key collides on ALL 4 of its
    # cells with probability (4/64)^4 ~ 1.5e-5 — all 50 estimate 0
    assert set(est.values()) == {0}, f"unseen keys over-counted: {est}"


def test_weighted_sample_probes_and_proportionality(spark):
    """Every probe resolves to exactly one document, and with many probes
    the empirical pick distribution tracks the weights (chi-square-ish
    loose bound)."""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.sample import (
        weighted_multinomial_sample,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = weighted_multinomial_sample(
        docs, id_col="doc_id", weight_col="n_chars", n_probes=200
    ).collect()
    assert len(out) == 200, "each probe must land in exactly one interval"
    assert len({r.probe for r in out}) == 200
    # heavier docs should be picked more often in aggregate: correlation
    # between weight mass of picked docs and uniform is positive
    picked_w = sum(r.weight for r in out) / 200.0
    avg_w = docs.agg(F.avg("n_chars")).first()[0]
    assert picked_w > avg_w, "weighted picks must skew above uniform mean"


def test_cms_sketches_merge_linearly(spark, events):
    """CMS grids are mergeable by cell-wise addition — the property that
    lets shards/days build sketches independently and combine them
    (sketch(A ∪ B) = sketch(A) + sketch(B), exactly)."""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.sketch import (
        cms_sketch,
    )

    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    whole = {(r.r, r.c): r.cell for r in cms_sketch(events, "user_id").collect()}
    merged: dict = {}
    for part in (a, b):
        for r in cms_sketch(part, "user_id").collect():
            merged[(r.r, r.c)] = merged.get((r.r, r.c), 0) + r.cell
    assert merged == whole
