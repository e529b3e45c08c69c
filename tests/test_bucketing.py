"""Bucketed co-located join (plans.bucketing): both fact tables written
bucketBy(8, orderkey) ⇒ the join plans with ZERO Exchange — the
repeated-join path at 100 TB. Result equivalence is asserted against the
plain (shuffled) join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.plans.bucketing import (
    write_bucketed,
)
from .conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force the merge path so the assertion is about bucket co-location,
    not broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange(spark, tmp_path, no_broadcast):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, str(tmp_path / "li"))
    write_bucketed(orders, "b_orders", "o_orderkey", 8, str(tmp_path / "ord"))
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself sees NO exchange on either side (the final agg
        # still shuffles its |groups| rows — that one is unavoidable)
        assert "SortMergeJoin" in plan
        before_join = plan[plan.index("SortMergeJoin") :]
        assert "Exchange hashpartitioning" not in before_join
        # same rows as the plain shuffled join
        want = sorted(
            (r.o_orderpriority, r.n)
            for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        got = sorted((r.o_orderpriority, r.n) for r in joined.collect())
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
