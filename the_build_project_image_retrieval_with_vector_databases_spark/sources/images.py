"""Multimodal (image/audio/video) column handling (SURVEY §1.1, §2.1
S1/S3/S4; north-star multimodal extension).

Design: media are opaque ``binary`` columns with typed metadata columns
alongside. The scan is Spark's ``binaryFile`` source (path-glob filtered,
recursive); decode / feature-extraction run as Arrow-batched
``mapInPandas`` so the per-batch Python cost amortizes and model/codec
state loads once per partition iterator — the distributed analogue of the
reference's ``@st.cache_resource`` model caching (``app.py:30``).

The image libraries (PIL/torch) are NOT in this container, so the decode
body is a clearly-marked deterministic stub; the Spark-side plumbing
(schema, batch iteration, error tolerance) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_GLOB = "*.{jpg,jpeg,png}"  # reference upload filter, app.py:78

DECODED_SCHEMA = (
    "path string, length long, category string, "
    "width int, height int, n_channels int, decode_ok boolean"
)


def scan_image_folder(
    spark: SparkSession, root: str, glob: str = "*.jpg"
) -> DataFrame:
    """S1: recursive image-folder scan; folder name ⇒ category (reference
    ``datasets.ImageFolder``, ``train_model.py:40``)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return df.withColumn(
        "category", F.regexp_extract(F.col("path"), r"/([^/]+)/[^/]+$", 1)
    )


def _stub_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder (PIL absent in this container).

    Derives a plausible (width, height, channels) from the payload hash.
    The hash runs over the *hex encoding* of the bytes so a SQL oracle can
    reproduce it (``md5(lower(hex(content)))`` — DuckDB's md5 takes
    VARCHAR only). REAL IMPLEMENTATION: ``img = PIL.Image.open(
    io.BytesIO(payload)).convert("RGB")`` (reference
    ``utils/precompute_features.py:174``), then ``np.asarray(img)`` →
    (H, W, 3).
    """
    if payload is None or len(payload) < 4:
        raise ValueError("truncated payload")  # real codecs fail on short magic
    h = hashlib.md5(bytes(payload).hex().encode()).hexdigest()
    return 64 + int(h[0:2], 16) % 192, 64 + int(h[2:4], 16) % 192, 3


def decode_images(df: DataFrame) -> DataFrame:
    """S3: binary → decoded metadata via Arrow-batched mapInPandas.

    Per-row failures null the row out instead of failing the job
    (F2 error-tolerant map, reference ``utils/precompute_features.py:167-182``).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init goes here (load codec/model ONCE per task)
        for pdf in it:
            out = []
            for path, length, category, content in zip(
                pdf["path"], pdf["length"], pdf["category"], pdf["content"]
            ):
                try:
                    w, hgt, c = _stub_decode(content)
                    out.append((path, length, category, w, hgt, c, True))
                except Exception:
                    out.append((path, length, category, None, None, None, False))
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "length",
                    "category",
                    "width",
                    "height",
                    "n_channels",
                    "decode_ok",
                ],
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def stub_embed_text(df: DataFrame, text_col: str, dim: int = 64) -> DataFrame:
    """P2 stand-in: deterministic pseudo-embedding, L2-normalized — lets
    the full index-build pipeline (sample → embed → normalize → write) run
    end-to-end without torch.

    Exercises the real S9 checkpoint pattern (reference ``torch.load`` at
    ``app.py:41-42`` / ``utils/precompute_features.py:130-131``): the
    "model weights" (a seeded projection matrix standing in for the
    checkpoint state-dict) are **broadcast once** from the driver and
    materialized once per partition iterator — swap the matrix for real
    weights + a torch forward and nothing else changes. Features are
    md5-derived per row, then pushed through the broadcast projection as
    one BLAS matmul per Arrow batch (A7's contiguous-matrix execution)."""
    import numpy as np

    weights = np.random.default_rng(0xC0FFEE).standard_normal((32, dim))
    bweights = df.sparkSession.sparkContext.broadcast(weights)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bweights.value  # per-partition init: "load the checkpoint" once
        for pdf in it:
            feats = np.array(
                [
                    np.frombuffer(
                        hashlib.md5(t.encode()).digest()
                        + hashlib.md5(b"salt:" + t.encode()).digest(),
                        dtype=np.uint8,
                    )
                    for t in pdf[text_col].astype(str)
                ],
                dtype=np.float64,
            )  # (N, 32) batch matrix
            mat = (feats - 127.5) @ w  # one matmul per Arrow batch
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            yield pdf.assign(embedding=list(mat.astype(np.float32)))

    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes)
    return df.mapInPandas(batches, schema=f"{fields}, embedding array<float>")
