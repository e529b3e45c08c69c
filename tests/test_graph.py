"""Connected components (operators.graph): chain/clique/singleton-edge
topologies, fixpoint determinism, and the non-convergence guard."""

from __future__ import annotations

import pytest

from the_build_project_image_retrieval_with_vector_databases_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "left_id long, right_id long")


def test_chain_merges_into_one_component(spark):
    """A~B, B~C, C~D: transitive closure pulls the whole chain to min id
    even though the ends never share an edge (diameter > 1 ⇒ needs >1
    round)."""
    cc = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
    got = {r.node: r.comp for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_component_summary(spark):
    out = dedup_components(_edges(spark, [(5, 9), (9, 7), (20, 21)]))
    got = {r.component: (r.n_docs, r.id_checksum) for r in out.collect()}
    assert got == {5: (3, 21), 20: (2, 41)}


def test_max_iter_guard(spark):
    with pytest.raises(RuntimeError, match="converge"):
        # a 5-chain needs ~4 propagation rounds; 1 is not enough
        connected_components(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), max_iter=1
        )


def test_path_graph_converges_logarithmically(spark):
    """The adversarial topology for plain propagation: a 10,000-node path
    needs ~10,000 propagate-only rounds, but pointer jumping must land the
    fixpoint within 30 — and every node must still label to the global
    min."""
    n = 10_000
    edges = (
        spark.range(1, n)
        .selectExpr("id AS left_id", "id + 1 AS right_id")
        .coalesce(8)
    )
    cc = connected_components(edges, max_iter=30)
    agg = cc.groupBy("comp").count().collect()
    cc.unpersist()
    assert len(agg) == 1 and agg[0].comp == 1 and agg[0]["count"] == n


def test_dedup_components_releases_all_cached_blocks(spark):
    """dedup_components owns its caching: after the result materializes,
    the executor storage pool holds nothing new (the iteration's persisted
    labels/edges are all released; the fixpoint lives in a temp parquet
    spill)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = dedup_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (7, 8)]))
    assert {r.component for r in out.collect()} == {1, 7}
    assert jsc.getPersistentRDDs().size() == before
