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
