"""Iterative graph operators — dedup clustering.

Near-dup PAIRS (MinHash-LSH, SimHash, cosine) are only half the dedup
story: production dedup keeps one representative per *connected
component* of the pair graph (A~B, B~C ⇒ {A,B,C} is one cluster even if
A≁C directly). Components need iteration — the one operator family in
this engine that is not a single declarative plan.

Spark-first shape: min-label propagation with **pointer jumping**
(label-doubling, the shortcutting step of Shiloach–Vishkin / the
star-contraction family). Each round is two fully distributed keyed
joins: (1) every node takes the min label over its neighborhood, (2)
every node then jumps to its label's label (``comp ← comp(comp)``).
Step 2 at-least-doubles the shortcut distance every round, so
convergence is O(log n) rounds on ANY topology — a 10k-node path
converges in ~14 rounds, not 10k — while near-dup almost-cliques still
finish in 2-3.

Iterative-lineage discipline: each round **checkpoints the label table
to parquet** (two alternating spill dirs, overwritten in turn), so the
next round's plan is a constant-size file scan. Persisting alone is NOT
enough — a persisted DataFrame keeps its full logical plan, and a loop
that references the previous round's frame twice per round (propagate
join + jump join) grows the plan tree 4× per round until the driver
OOMs just *printing* it. The disk checkpoint is the classic fix (what
GraphFrames' checkpointInterval does), and it doubles as the caching
contract: the returned labels are a plain file scan — ZERO cached
blocks outlive the call, repeated calls leak nothing into the executor
storage pool. Spill dirs are process-temp and removed at exit.

The *driver* runs only the bounded loop + an O(1) convergence check
(labels decrease monotonically, so an unchanged label SUM is the
fixpoint).

The DuckDB oracle computes the same components via a recursive-CTE
transitive closure — exact cross-engine agreement on an iterative
algorithm's fixpoint.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .spill import spill_dir as _spill_dir


def connected_components(
    edges: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` = min node id reachable (including self).

    Converges in O(log n) rounds via pointer jumping (see module doc);
    raises if ``max_iter`` is hit without a fixpoint (deterministic
    result only AT the fixpoint). Returns a parquet-backed file-scan
    DataFrame (process-temp spill, removed at exit); no cached blocks
    remain after the call.
    """
    spark = edges.sparkSession
    root = _spill_dir("cc-labels-")

    def _slot(i: int) -> str:
        return os.path.join(root, f"r{i}")

    sym = edges.select(
        F.col(left_col).cast("long").alias("a"),
        F.col(right_col).cast("long").alias("b"),
    )
    sym = sym.unionAll(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist()

    def _write_with_checksum(df: DataFrame, path: str) -> int:
        # labels only ever DECREASE elementwise, so the label sum is
        # strictly monotone until the fixpoint — an unchanged sum IS
        # convergence. The sum rides the write job itself via observe()
        # (one job per round, not write + separate aggregate).
        obs = Observation()
        df.observe(obs, F.sum("comp").alias("s")).write.mode(
            "overwrite"
        ).parquet(path)
        return obs.get["s"]

    try:
        # init = one propagation round for free: label(v) = min(v, N(v)),
        # computed by the same groupBy that enumerates the nodes. Valid
        # starting point for the invariant (every label is a node id of
        # the same component, ≤ v); saves a full join+jump+write round.
        init = (
            sym.groupBy("a")
            .agg(F.min("b").alias("__nbr_min"))
            .select(
                F.col("a").alias("node"),
                F.least(F.col("a"), F.col("__nbr_min")).alias("comp"),
            )
        )
        prev_sum = _write_with_checksum(init, _slot(0))
        labels = spark.read.parquet(_slot(0))
        for rnd in range(max_iter):
            # (1) propagate: min label over the neighborhood (keyed join
            #     on node id + map-side-partial min aggregate)
            nbr = (
                sym.join(labels, sym["b"] == labels["node"])
                .groupBy("a")
                .agg(F.min("comp").alias("nbr_min"))
            )
            prop = labels.join(nbr, labels["node"] == nbr["a"], "left").select(
                labels["node"],
                F.least(F.col("comp"), F.coalesce("nbr_min", F.col("comp"))).alias(
                    "comp"
                ),
            )
            # (2) pointer jump: comp ← comp(comp). Every comp value is
            #     itself a node id (labels start as identity and only take
            #     existing ids), so the inner self-join is total.
            hop = prop.select(
                F.col("node").alias("__jnode"), F.col("comp").alias("__jcomp")
            )
            out = prop.join(hop, prop["comp"] == hop["__jnode"]).select(
                prop["node"], F.col("__jcomp").alias("comp")
            )
            # round r+1 writes a FRESH dir (never the one this round's
            # plan reads), then the dir two rounds back is deleted —
            # disk stays bounded at two label generations
            new_sum = _write_with_checksum(out, _slot(rnd + 1))  # lineage cut
            labels = spark.read.parquet(_slot(rnd + 1))
            if rnd >= 1:
                shutil.rmtree(_slot(rnd - 1), ignore_errors=True)
            if new_sum == prev_sum:
                shutil.rmtree(_slot(rnd), ignore_errors=True)
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
    count, id checksum — the keep/drop manifest of a dedup run. Inherits
    connected_components' zero-cache-footprint contract."""
    cc = connected_components(pairs, left_col, right_col)
    return cc.groupBy(F.col("comp").alias("component")).agg(
        F.count("*").alias("n_docs"),
        F.sum("node").alias("id_checksum"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    left_col: str = "left_id",
    right_col: str = "right_id",
    mod: int = 10,
    train_parts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup-aware train/eval split — the leakage guard a benchmark
    pipeline needs BEFORE holding out an eval set: a naive per-doc
    hash split puts near-duplicate pairs on opposite sides (the eval
    copy "leaks" into training, Lee et al. 2022's core warning), so
    the split unit here is the CONNECTED COMPONENT of the near-dup
    pair graph. Every member of a component shares the component's
    min-id label, the split hashes THAT label (multiplicative hash,
    ``hash % mod < train_parts`` → train), and unpaired docs are their
    own singleton components — by construction no pair, and no
    transitive chain of pairs, can straddle the split. Output one row
    per doc: (id, component, split).

    Scale shape: components via :func:`connected_components`
    (pointer jumping, O(log n) rounds, parquet-checkpointed — zero
    cached blocks after the call); the label table holds only nodes
    that APPEAR in pairs (dup-involved docs, ≪ corpus for real
    crawls), joined back id-keyed in one shuffle; the hash split is a
    codegen'd projection. Integer-exact cross-engine: the hash is the
    engine-portable multiplicative form, components agree with the
    oracle's recursive-CTE closure by the fixpoint argument on
    :func:`connected_components`."""
    from .sample import HASH_MOD, HASH_MULT

    cc = connected_components(pairs, left_col, right_col)
    comp = (
        docs.select(F.col(id_col))
        .join(
            cc.withColumnRenamed("node", id_col), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col))
            .cast("long")
            .alias("component"),
        )
    )
    h = (
        (F.col("component") + F.lit(int(seed))) * F.lit(HASH_MULT)
    ) % F.lit(HASH_MOD)
    return comp.select(
        F.col(id_col),
        F.col("component"),
        F.when(h % F.lit(int(mod)) < F.lit(int(train_parts)), "train")
        .otherwise("eval")
        .alias("split"),
    )


def dedup_cluster_stats(
    components: DataFrame, corpus: DataFrame
) -> DataFrame:
    """Corpus duplication report — staged r16 (r20 ALTERNATE
    registration candidate): the cluster-SIZE histogram of a dedup
    run, the "how duplicated is my corpus" summary every pipeline
    owner reads before committing to a dedup pass (CCNet/RefinedWeb
    publish exactly these removal-rate tables). Per cluster size:
    ``n_clusters``, ``n_docs`` they cover, ``n_removable`` (size − 1
    per cluster — the docs a keep-one policy drops), and
    ``removable_frac`` of the whole corpus. Documents in no near-dup
    pair appear as the ``cluster_size = 1`` row, derived as
    corpus_total − docs_in_clusters — the pair graph never needs to
    materialize singletons.

    Scale shape: runs on the OUTPUT of :func:`dedup_components`
    (≤ one row per cluster — already collapsed from the corpus), so
    the histogram aggregate is cluster-count-sized; the corpus total
    and in-cluster total are two 1-row aggregates BROADCAST back.
    Nothing here re-touches corpus text."""
    total = corpus.agg(F.count(F.lit(1)).alias("__total"))
    in_clusters = components.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("__in")
    )
    hist = components.groupBy(
        F.col("n_docs").cast("bigint").alias("cluster_size")
    ).agg(F.count(F.lit(1)).alias("n_clusters"))
    singles = in_clusters.crossJoin(total).select(
        F.lit(1).cast("bigint").alias("cluster_size"),
        (F.col("__total") - F.col("__in")).alias("n_clusters"),
    )
    return (
        hist.unionByName(singles)
        .filter(F.col("n_clusters") > 0)
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - F.lit(1)) * F.col("n_clusters")).alias(
                "n_removable"
            ),
            (
                ((F.col("cluster_size") - F.lit(1)) * F.col("n_clusters"))
                .cast("double")
                / F.col("__total").cast("double")
            ).alias("removable_frac"),
        )
    )
