"""applyInPandasWithState stateful operator: the state store genuinely
executes (multi-batch accumulation), and the final counters converge to
the batch twin's totals."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.streaming.stateful import (
    batch_user_counters,
    running_user_counters,
)
from .conftest import SF_SMOKE


def _load_events(spark, path):
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def test_stateful_counters_accumulate_across_batches(spark, tmp_path):
    src = tmp_path / "ev_in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-000.parquet")

    batch_schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(batch_schema).parquet(str(src))
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    q = (
        running_user_counters(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second identical file → state must ACCUMULATE (n doubles)
        shutil.copy(f"{SF_SMOKE}/events.parquet", src / "part-001.parquet")
        q.processAllAvailable()
        got = {
            r.user_id: r
            for r in spark.sql(
                """SELECT user_id, n_events, sum_value, last_ep FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY n_events DESC) AS rn FROM t_state
                   ) WHERE rn = 1"""
            ).collect()
        }
    finally:
        q.stop()

    events = _load_events(spark, str(src / "part-000.parquet"))
    want = {r.user_id: r for r in batch_user_counters(events).collect()}
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g.n_events == 2 * w.n_events  # two identical files
        assert abs(g.sum_value - 2 * w.sum_value) < 1e-6
        assert g.last_ep == w.last_ep
