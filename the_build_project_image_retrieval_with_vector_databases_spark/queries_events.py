"""Event-table queries: tumbling/sliding windows, sessionization,
streaming-dedup (batch twin), JSON extraction — with DuckDB oracles.

Window boundaries are emitted as epoch-second bigints (pure integer
arithmetic → engine-portable); event values sum via decimal(14,2)
(fixture values carry 2 decimals)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import windows as W
from .sources.tables import load_table


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(14,2)")
    return (
        ev.groupBy(F.window("ts", "600 seconds").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(val).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ORACLE_TUMBLING = """
SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.sliding_counts(ev, width_s=600, slide_s=300)


# width = 2×slide ⇒ every event belongs to exactly the two windows starting
# at floor(e/300)*300 and floor(e/300)*300 - 300.
ORACLE_SLIDING = """
WITH w AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 300) * 300 - j * 300 AS BIGINT) AS window_start
  FROM events, (SELECT unnest([0, 1]) AS j) t
)
SELECT window_start, event_type, count(*) AS n
FROM w GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.sessionize(ev, gap_s=1800)


ORACLE_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, ts
  FROM events
),
lagged AS (
  SELECT user_id, event_id, ep,
         ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           AS gap,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           AS rn
  FROM e
),
flagged AS (
  SELECT user_id, event_id, ep, rn,
         CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
sess AS (
  SELECT user_id, ep,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY rn ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ep) AS session_start, max(ep) AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_idx
"""


def q_streaming_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming dropDuplicates-with-watermark: first event
    per (user_id, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.dedup_latest(ev, ["user_id", "event_type"])
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("epoch_s"),
    )


ORACLE_STREAM_DEDUP = """
SELECT event_id, user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the props column (S2-adjacent
    semi-structured path)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_JSON = """
SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events)
GROUP BY event_type
"""


EVENT_QUERIES = {
    "tumbling_window": q_tumbling_window,
    "sliding_window": q_sliding_window,
    "sessionize": q_sessionize,
    "streaming_dedup_batch": q_streaming_dedup_batch,
    "json_extract_agg": q_json_extract,
}

EVENT_ORACLES = {
    "tumbling_window": ORACLE_TUMBLING,
    "sliding_window": ORACLE_SLIDING,
    "sessionize": ORACLE_SESSIONIZE,
    "streaming_dedup_batch": ORACLE_STREAM_DEDUP,
    "json_extract_agg": ORACLE_JSON,
}
