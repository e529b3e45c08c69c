"""SA3 fixed-size batch iterator (DataLoader analogue) contract tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.operators.batching import (
    fixed_batches,
)
from .conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_drop_last_exact_batches(spark):
    out = fixed_batches(_emb(spark), batch_size=16, drop_last=True).cache()
    sizes = (
        out.groupBy("part_id", "batch_id").agg(F.count("*").alias("n")).collect()
    )
    assert len(sizes) > 0
    assert all(r.n == 16 for r in sizes)
    # no row appears twice
    assert out.select("vec_id").distinct().count() == out.count()


def test_keep_last_covers_everything(spark):
    df = _emb(spark)
    out = fixed_batches(df, batch_size=16, drop_last=False).cache()
    assert out.count() == df.count()
    sizes = [
        r.n
        for r in out.groupBy("part_id", "batch_id")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert all(n <= 16 for n in sizes)
    # at most one partial batch per partition
    partials = (
        out.groupBy("part_id", "batch_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") < 16)
        .groupBy("part_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in partials)


def test_shuffle_is_deterministic(spark):
    df = _emb(spark)
    a = fixed_batches(df, batch_size=16, seed=1).select(
        "vec_id", "part_id", "batch_id"
    )
    b = fixed_batches(df, batch_size=16, seed=1).select(
        "vec_id", "part_id", "batch_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = fixed_batches(df, batch_size=16, seed=2).select("vec_id", "part_id", "batch_id")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


# ---------------------------------------------------------------------------
# pack_sequences (context-window packing)
# ---------------------------------------------------------------------------


def test_pack_sequences_matches_sequential_scan(spark):
    """The two-phase bucketed cumsum must equal the single-threaded
    reference: concatenate docs in id order, each doc's start offset is
    the sum of all earlier docs' token counts, bin = start // window."""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.batching import (
        pack_sequences,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.functions.text import (
        tokens,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.bin)
        for r in pack_sequences(
            docs, F.size(tokens(F.col("text"))), window=512, id_col="doc_id"
        ).collect()
    }
    rows = sorted(
        (r.doc_id, len(r.text.split()))
        for r in docs.select("doc_id", "text").collect()
    )
    off = 0
    for doc_id, n in rows:
        assert got[doc_id] == (n, off, off // 512), doc_id
        off += n
    assert len(got) == len(rows)


def test_pack_sequences_bins_are_dense_and_bounded(spark):
    """Every bin except possibly the last holds >= 1 doc; a doc's start
    offset always falls inside its bin's [bin*W, (bin+1)*W) range; total
    tokens are preserved."""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.batching import (
        pack_sequences,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.functions.text import (
        tokens,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    W = 256
    packed = pack_sequences(
        docs, F.size(tokens(F.col("text"))), window=W, id_col="doc_id"
    ).collect()
    total = sum(r.n_tokens for r in packed)
    assert total == sum(
        len(r.text.split()) for r in docs.select("text").collect()
    )
    bins = sorted({r.bin for r in packed})
    assert bins == list(range(bins[-1] + 1)), "bins must be contiguous"
    for r in packed:
        assert r.bin * W <= r.start_offset < (r.bin + 1) * W
