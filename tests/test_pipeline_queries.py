"""P8/T3 display-projection tests.

The knn_display registry row was retired in r12 (covered by
search_batch's top-k surface); the display projection itself —
``queries_pipeline.score_grid`` — stays pinned here against the
reference's Python formatting (``utils/__init__.py:130-152``:
``f"{score:.4f}"`` score strings, 5-per-row grid chunking).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from the_build_project_image_retrieval_with_vector_databases_spark.queries_pipeline import (
    score_grid,
)


def test_score_grid_matches_python_formatter(spark):
    """format_number must agree with f"{:.4f}" (half-up at the 4th
    decimal) and the grid arithmetic must chunk 5-per-row in rank
    order, for ranks spanning three grid rows."""
    dists = [0.12344999, 0.12345001, 1.0, 2.5, 3.14159265, 10.00005,
             0.0, 7.77777, 99.99995, 123.4, 0.00004, 0.5]
    rows = [(i + 1, i, float(d)) for i, d in enumerate(dists)]
    df = spark.createDataFrame(rows, "vec_id long, rk long, dist_exact double")
    ranked = df.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("rk").asc()))
    )
    got = {
        r.vec_id: (r.dist_str, r.grid_row, r.grid_col)
        for r in score_grid(ranked).collect()
    }
    assert len(got) == len(dists)
    for i, d in enumerate(dists):
        dist_str, grid_row, grid_col = got[i + 1]
        # format_number uses HALF_EVEN on the decimal repr of the
        # double; Python's format() does the same (round-half-even on
        # the binary value) — the fixture avoids exact .xxxx5 midpoints
        # (unrepresentable in binary anyway) so both agree.
        assert dist_str == f"{d:,.4f}", (d, dist_str)
        assert grid_row == i // 5
        assert grid_col == i % 5


def test_score_grid_composes_on_search_output_without_shuffle(spark):
    """The projection must add ZERO plan cost on top of a ranked
    result: no exchange beyond what the input already has."""
    df = spark.createDataFrame(
        [(1, 1, 0.5), (2, 2, 0.7)], "vec_id long, rank long, dist_exact double"
    )
    out = score_grid(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert set(out.columns) == {"vec_id", "dist_str", "grid_row", "grid_col"}
