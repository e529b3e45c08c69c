"""Structural plan lint (fast subset) — the broad complement of the
deep pins in test_plans.py. `scripts/plan_lint.py` checks ALL 100
registry queries per round (PLAN_LINT.json, r8: zero violations); this
test keeps the same two never-acceptable-at-100-TB gates on a
mechanism-diverse subset so a regression fails the suite immediately:

- ``CartesianProduct``: an unkeyed cross product (a broadcast
  nested-loop of a one-row literal side is legitimate and asserted
  separately by the deep pins).
- ``BatchEvalPython``: a row-at-a-time Python UDF — the engine's
  Python surface is Arrow-only (MapInPandas / FlatMapGroupsInPandas).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_SMOKE

# one representative per plan mechanism: scan-agg, window, broadcast
# join, shuffle join, explode, banded dedup join, IVF partition prune,
# Arrow mapInPandas, applyInPandas greedy, streaming batch twin,
# bucketed layout, two-phase rank, skew salting, sketch grid
_SUBSET = [
    "pricing_summary",
    "running_revenue",
    "label_category_join",
    "suffix_join_equi",
    "token_stats",
    "minhash_lsh_dedup",
    "ivf_topk",
    "search_batch",
    "mmr_rerank",
    "streaming_dedup_batch",
    "bucketed_revenue",
    "knn_two_phase",
    "salted_term_counts",
    "cms_heavy_hitters",
    "dedup_recall_eval",
]


@pytest.mark.parametrize("name", _SUBSET)
def test_no_cartesian_no_row_python(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: unkeyed cross product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
