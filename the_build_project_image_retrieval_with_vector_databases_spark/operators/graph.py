"""Iterative graph operators — dedup clustering.

Near-dup PAIRS (MinHash-LSH, SimHash, cosine) are only half the dedup
story: production dedup keeps one representative per *connected
component* of the pair graph (A~B, B~C ⇒ {A,B,C} is one cluster even if
A≁C directly). Components need iteration — the one operator family in
this engine that is not a single declarative plan.

Spark-first shape: label propagation to fixpoint. Each round is a fully
distributed join + min-aggregate keyed by node id; the *driver* only
runs the (bounded) loop and the convergence check — the legitimate use
of driver control flow, O(diameter) rounds, and near-dup clusters are
almost-cliques so diameter is tiny. Each round's labels are persisted
and the previous round unpersisted, so lineage stays O(1) deep (the
classic iterative-algorithm trap is an O(rounds)-deep lazy plan).

The DuckDB oracle computes the same components via a recursive-CTE
transitive closure — exact cross-engine agreement on an iterative
algorithm's fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = min node id reachable (including self). Converges in
    O(graph diameter) rounds; raises if ``max_iter`` is hit without a
    fixpoint (deterministic result only AT the fixpoint)."""
    sym = edges.select(
        F.col(left_col).cast("long").alias("a"),
        F.col(right_col).cast("long").alias("b"),
    )
    sym = sym.unionAll(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )

    def _checksum(lb: DataFrame) -> int:
        # labels only ever DECREASE elementwise, so the label sum is
        # strictly monotone until the fixpoint — an unchanged sum IS
        # convergence. One tiny aggregate per round instead of a
        # join-diff-count (halves the per-round job count).
        return lb.agg(F.sum("comp")).first()[0]

    prev_sum = _checksum(labels)
    try:
        for _ in range(max_iter):
            nbr = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("comp").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr, labels["node"] == nbr["a"], "left")
                .select(
                    labels["node"],
                    F.least(
                        F.col("comp"), F.coalesce("nbr_min", F.col("comp"))
                    ).alias("comp"),
                )
                .persist()
            )
            new_sum = _checksum(new_labels)
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                return labels
            prev_sum = new_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()


def dedup_components(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Cluster summary per component: representative (min id), member
    count, id checksum — the keep/drop manifest of a dedup run."""
    cc = connected_components(pairs, left_col, right_col)
    return cc.groupBy(F.col("comp").alias("component")).agg(
        F.count("*").alias("n_docs"),
        F.sum("node").alias("id_checksum"),
    )
