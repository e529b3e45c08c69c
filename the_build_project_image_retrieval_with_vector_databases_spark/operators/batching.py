"""Fixed-size batch iteration (SURVEY §2.5 SA3) — the reference's
``DataLoader(batch_size=16, shuffle=True, drop_last=True)``
(``train_model.py:49-50``) as a DataFrame operator.

Shape: deterministic shuffle (multiplicative-hash sort key, same contract
as ``operators.sample``) → ``mapInPandas`` chunking each partition's Arrow
stream into exact ``batch_size`` row groups. ``drop_last`` discards the
trailing partial batch *per partition* (the reference drops one partial
batch globally; per-partition is documented as the distributed analogue —
at 1000 executors a global remainder barrier would serialize the job for
at most one batch of rows).

Batch ids are ``(partition_id, local_batch_index)`` — stable within a run,
and the model-training consumer (gradient step per batch) only needs
batch *membership*, not a global order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sample import shuffle_key


def fixed_batches(
    df: DataFrame,
    batch_size: int = 16,
    drop_last: bool = True,
    shuffle: bool = True,
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Tag every row with (``part_id``, ``batch_id``) of its fixed-size
    batch; rows of a dropped partial batch are filtered out."""
    out_schema = ", ".join(f"{c} {t}" for c, t in df.dtypes)
    out_schema += ", part_id int, batch_id long"

    if shuffle:
        df = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism,
            shuffle_key(id_col, seed),
        ).sortWithinPartitions(shuffle_key(id_col, seed).asc(), F.col(id_col).asc())

    def chunk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyspark

        part = pyspark.TaskContext.get().partitionId()
        buf: list[pd.DataFrame] = []
        have = 0
        emitted = 0

        def emit(pdf: pd.DataFrame, bid: int) -> pd.DataFrame:
            return pdf.assign(part_id=part, batch_id=bid)

        for pdf in it:
            buf.append(pdf)
            have += len(pdf)
            while have >= batch_size:
                cat = pd.concat(buf, ignore_index=True)
                yield emit(cat.iloc[:batch_size], emitted)
                emitted += 1
                rest = cat.iloc[batch_size:]
                buf, have = ([rest] if len(rest) else []), len(rest)
        if have and not drop_last:
            yield emit(pd.concat(buf, ignore_index=True), emitted)

    return df.mapInPandas(chunk, schema=out_schema)


def pack_sequences(
    df: DataFrame,
    n_tokens_col,
    window: int = 512,
    id_col: str = "doc_id",
    bucket_size: int = 10_000,
) -> DataFrame:
    """Concat-and-chunk context-window packing (the GPT-style training
    layout): documents concatenate in ``id_col`` order into one token
    stream chunked every ``window`` tokens; each document is assigned the
    chunk containing its FIRST token. Returns one row per input row:
    ``(id, n_tokens, start_offset, bin)``.

    The global running offset is built TWO-PHASE exactly like
    ``sample.weighted_multinomial_sample``: per-bucket subtotals (one
    row per ``bucket_size`` ids) get prefix offsets through one ordered
    window over #buckets rows, then within-bucket cumsums run
    partition-parallel. No single-task global window ever sees the
    corpus — the only corpus-wide exchange is the bucket hash join.

    ``bucket_size`` sets the phase-1 table to N/bucket_size rows — that
    table IS broadcast and prefix-summed in one task, so size it ~√N:
    the 10k default keeps it ≤100k rows up to a 10⁹-doc corpus. Results
    are invariant to the choice (bucketing only restructures the sum).
    """
    n = n_tokens_col.cast("long")
    bucket = F.floor(F.col(id_col) / bucket_size).cast("long")
    base = df.select(F.col(id_col), n.alias("_n"), bucket.alias("_bkt"))
    offsets = (
        base.groupBy("_bkt")
        .agg(F.sum("_n").alias("_bn"))
        .withColumn(
            "_off",
            F.sum("_bn").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_bkt", F.coalesce("_off", F.lit(0)).alias("_off"))
    )
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_cum",
            F.col("_off")
            + F.sum("_n").over(
                Window.partitionBy("_bkt")
                .orderBy(id_col)
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select(
            id_col,
            F.col("_n").alias("n_tokens"),
            (F.col("_cum") - F.col("_n")).alias("start_offset"),
            F.floor((F.col("_cum") - F.col("_n")) / window)
            .cast("long")
            .alias("bin"),
        )
    )


def batch_assignments(
    df: DataFrame,
    batch_size: int = 16,
    drop_last: bool = True,
    id_col: str = "vec_id",
    seed: int = 42,
    bucket_width: int = 1 << 22,
) -> DataFrame:
    """Globally-CANONICAL fixed-size batches — the oracle-checkable form
    of :func:`fixed_batches` (SURVEY §2.5 SA3, the reference's
    ``DataLoader(batch_size, shuffle=True, drop_last=True)``,
    ``train_model.py:49-50``). Where ``fixed_batches`` tags
    ``(partition_id, local_batch)`` — stable within a run but dependent
    on the physical partitioning — this operator derives batch ids from
    the GLOBAL deterministic-shuffle order, so the assignment is a pure
    function of (ids, seed, batch_size): reproducible across cluster
    sizes, re-runs, and engines. Output one row per surviving input
    row: ``(id_col, batch_id, pos)`` with ``batch_id =
    floor(global_rank / batch_size)`` and ``pos`` the 0-based slot
    inside the batch; ``drop_last`` removes the trailing partial batch
    GLOBALLY (exactly the reference's semantics, unlike the
    per-partition analogue documented on ``fixed_batches``).

    Scale shape (the 100 TB question): a naive global
    ``row_number() OVER (ORDER BY key)`` is a single-task sort. This
    runs the same two-phase scheme as :func:`pack_sequences` /
    ``sample.weighted_multinomial_sample``: the multiplicative-hash
    shuffle key is range-bucketed (``floor(key / bucket_width)`` —
    hash values are uniform on [0, 2^31), so ~2^31/bucket_width ordered
    buckets of ~N·bucket_width/2^31 rows each); per-bucket counts get
    prefix offsets through one ordered window over #buckets rows (512
    buckets at the default — broadcast, never the corpus); within-bucket
    ranks run partition-parallel. The only corpus-wide operations are
    the bucket hash exchange and the broadcast joins of the offsets
    table and the 1-row total (for the global drop-last cut).
    """
    key = shuffle_key(id_col, seed)
    base = df.select(
        F.col(id_col),
        key.alias("_key"),
        F.floor(key / F.lit(bucket_width)).cast("long").alias("_bkt"),
    )
    counts = base.groupBy("_bkt").agg(F.count("*").alias("_bn"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_bn").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bkt", "_off")
    total = counts.agg(F.sum("_bn").alias("_total"))

    ranked = (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_rank",
            F.col("_off")
            + F.row_number().over(
                Window.partitionBy("_bkt").orderBy(
                    F.col("_key").asc(), F.col(id_col).asc()
                )
            )
            - F.lit(1),
        )
    )
    if drop_last:
        ranked = ranked.join(F.broadcast(total)).filter(
            F.col("_rank")
            < F.col("_total") - (F.col("_total") % F.lit(batch_size))
        )
    return ranked.select(
        id_col,
        F.floor(F.col("_rank") / batch_size).cast("long").alias("batch_id"),
        (F.col("_rank") % F.lit(batch_size)).cast("int").alias("pos"),
    )
