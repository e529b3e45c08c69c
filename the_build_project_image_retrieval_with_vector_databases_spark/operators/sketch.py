"""Distinct-count sketches.

Spark ships HyperLogLog++ (``approx_count_distinct``) — the right tool in
production, but its register layout is engine-private, so no cross-engine
oracle can check it. The engine therefore also provides a **KMV
(k-minimum-values) sketch** built on the md5-derived portable hash: keep
the k smallest distinct hash values of the key; with the hash normalized
to (0, 1], the classic estimator is

    n̂ = (k − 1) / u_k        (u_k = k-th smallest normalized hash)

Fully deterministic → the DuckDB oracle reproduces the estimate
bit-for-bit, which makes the *sketch itself* testable, not just its
error bound. Scale shape: one shuffle keyed by (group, hash) for the
distinct, and the per-group k-smallest runs as a rank window on the same
key layout — the sketch state is k longs per group (mergeable by
min-union, same as production KMV).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long

HASH_SPACE = float(1 << 60)  # md5_long(digits=15) ∈ [0, 16^15) = [0, 2^60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate: (group, n_seen, kmv_est).

    ``n_seen`` = number of sketch slots filled (= exact distinct count
    when the group has < k distinct keys — the estimator is exact there
    by construction)."""
    h = md5_long(F.col(key_col).cast("string"), digits=15)
    hashes = df.select(F.col(group_col), h.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    sk = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(F.max("h").alias("hk"), F.count("*").alias("n_seen"))
    )
    u_k = F.col("hk").cast("double") / F.lit(HASH_SPACE)
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)
    return sk.select(
        F.col(group_col),
        F.col("n_seen"),
        # raw double: (k-1)/(hk/HASH_SPACE) is two IEEE divisions of
        # exact integers — bit-identical cross-engine; rounding is the
        # .5-tie hazard (min_cost_order class, CHANGES_r05)
        est.alias("kmv_est"),
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of a key stream: a fixed ``depth × width`` grid of
    counters — the O(1)-size frequency summary (Cormode & Muthukrishnan
    2005) that answers point queries with one-sided error (estimate ≥
    truth, over-count bounded by 2n/width w.h.p. per row).

    Scale shape: each input row fans out to ``depth`` (row, col) cells,
    but the cell aggregate is map-side partial — every map task emits at
    most depth × width partial counters into the shuffle no matter how
    many rows it scanned. The merged sketch is
    depth × width counters TOTAL regardless of input size or key
    cardinality — the whole point at 100 TB: a frequency summary you
    can broadcast, diff across days, or serve lookups from, without
    materializing the full key dictionary.

    Hashing is md5-prefix integer arithmetic (portable), so a DuckDB
    oracle rebuilds the identical grid."""
    c = F.col(key_col).cast("string")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        (md5_long(c, salt=f"{salt}{i}") % width).alias("c"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.r", "rc.c")
    return cells.groupBy("r", "c").agg(F.count("*").alias("cell"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate counts for ``keys`` from a CMS grid: min over the
    key's ``depth`` cells. The sketch side is depth × width rows —
    always broadcast. The sketch stores only cells some stream element
    hashed into, so a probe cell absent from it has true count 0: the
    join is a LEFT join with missing cells coalesced to 0, making a
    never-seen key correctly estimate 0 instead of min-ing over only its
    populated (inflated) cells."""
    c = F.col(key_col).cast("string")
    probed = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        (md5_long(c, salt=f"{salt}{i}") % width).alias("c"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, "rc.r", "rc.c")
    return (
        probed.join(F.broadcast(sketch), ["r", "c"], "left")
        .withColumn("cell", F.coalesce(F.col("cell"), F.lit(0).cast("long")))
        .groupBy(key_col)
        .agg(F.min("cell").alias("cms_est"))
    )
