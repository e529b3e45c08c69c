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
