"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the package
``the_build_project_image_retrieval_with_vector_databases_spark``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from the_build_project_image_retrieval_with_vector_databases_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's interactive kNN, SURVEY §3.1) on sf0.001."""
    return _q.q_knn_l2_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omissions → rows-only check)."""
    return dict(_q.ORACLES)
