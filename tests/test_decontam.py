"""Unit tests for the decontamination operator and the label-centroid
query (round-4 additions to the LLM-pipeline family)."""

from __future__ import annotations

import collections

import numpy as np

import __spark_entry__ as entrymod
from the_build_project_image_retrieval_with_vector_databases_spark.operators.decontam import (
    ngram_overlap,
)

from .conftest import SF_SMOKE

import pytest


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark



def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verbatim_leak_flagged_severe(spark):
    bench = _docs(spark, [(0, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "completely different words here nothing shared at all okay"),
        ],
    )
    out = {r.doc_id: r for r in ngram_overlap(corpus, bench, n=4).collect()}
    assert set(out) == {10}, "only the verbatim copy may be flagged"
    assert out[10].overlap_frac == 1.0
    assert out[10].severe


def test_partial_overlap_counts_one_gram(spark):
    bench = _docs(spark, [(0, "a b c d e")])
    # exactly one shared 4-gram ("a b c d") among 7 distinct corpus grams
    corpus = _docs(spark, [(10, "x x x a b c d y z w")])
    rows = ngram_overlap(corpus, bench, n=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_grams, r.n_shared, r.n_bench_docs) == (7, 1, 1)
    assert not r.severe


def test_shuffle_mode_matches_broadcast_mode(spark):
    """broadcast_bench=False (benchmark too big to broadcast) must give
    identical results through the hash-partitioned join path."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bench = docs.filter("doc_id < 20")
    corpus = docs.filter("doc_id >= 20")
    a = sorted(
        map(tuple, ngram_overlap(corpus, bench, n=4, broadcast_bench=True).collect())
    )
    b = sorted(
        map(tuple, ngram_overlap(corpus, bench, n=4, broadcast_bench=False).collect())
    )
    assert a == b and a


def test_label_centroids_numpy_parity(spark):
    """The quantized-sum centroid must match a NumPy reimplementation and
    come out unit-norm after the renormalize step."""
    from the_build_project_image_retrieval_with_vector_databases_spark.queries_ann import (
        q_label_centroids,
    )

    # registry row retired r7 (sibling: kmeans_train_assign); numeric
    # contract stays pinned here
    rows = q_label_centroids(spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    by_label = collections.defaultdict(list)
    for r in emb:
        by_label[r.label].append(np.array(r.embedding, dtype=np.float64))
    # exploded (label, n_vectors, dim, centroid_val) rows — reassemble
    got_by_label: dict = collections.defaultdict(dict)
    n_by_label: dict = {}
    for r in rows:
        got_by_label[r.label][r.dim] = r.centroid_val
        n_by_label[r.label] = r.n_vectors
    assert set(got_by_label) == set(by_label)
    for label, dims in got_by_label.items():
        X = np.stack(by_label[label])
        q = np.round(X * 1e6)  # banker's vs half-up ties absorbed by atol
        m = q.sum(axis=0) / (len(X) * 1e6)
        u = m / np.sqrt((m * m).sum())
        assert sorted(dims) == list(range(X.shape[1])), "dims must be dense"
        got = np.array([dims[d] for d in range(X.shape[1])], dtype=np.float64)
        assert n_by_label[label] == len(X)
        assert np.allclose(got, u, atol=1e-6)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-6


from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st

from the_build_project_image_retrieval_with_vector_databases_spark.operators.windows import (
    interval_join,
)

_event = st.tuples(
    st.integers(min_value=0, max_value=3),      # user
    st.integers(min_value=0, max_value=7200),   # epoch offset (2 bucket widths)
)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    views=st.lists(_event, min_size=0, max_size=12),
    purchases=st.lists(_event, min_size=0, max_size=12),
)
def test_interval_join_matches_bruteforce(spark_global, views, purchases):
    """Bucket-blocked interval join ≡ O(n²) brute force on random event
    sets — pairs strictly-after within 3600 s, each counted exactly once."""
    spark = spark_global
    base = 1_600_000_000

    def mk(rows, idc):
        data = [
            (i, u, datetime.fromtimestamp(base + ep, tz=timezone.utc).replace(tzinfo=None))
            for i, (u, ep) in enumerate(rows)
        ]
        return spark.createDataFrame(data, f"{idc} long, user_id long, ts timestamp")

    vdf = mk(views, "view_id").withColumnRenamed("ts", "v_ts")
    pdf = mk(purchases, "purchase_id").withColumnRenamed("ts", "p_ts")
    got = sorted(
        (r.view_id, r.purchase_id)
        for r in interval_join(
            vdf, pdf, key="user_id", left_ts="v_ts", right_ts="p_ts",
            within_s=3600,
        ).collect()
    )
    want = sorted(
        (vi, pi)
        for vi, (vu, vep) in enumerate(views)
        for pi, (pu, pep) in enumerate(purchases)
        if vu == pu and pep > vep and pep <= vep + 3600
    )
    assert got == want
