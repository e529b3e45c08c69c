"""Multimodal (image/audio/video) column handling (SURVEY §1.1, §2.1
S1/S3/S4; north-star multimodal extension).

Design: media are opaque ``binary`` columns with typed metadata columns
alongside. The scan is Spark's ``binaryFile`` source (path-glob filtered,
recursive); decode / feature-extraction run as Arrow-batched
``mapInPandas`` so the per-batch Python cost amortizes and model/codec
state loads once per partition iterator — the distributed analogue of the
reference's ``@st.cache_resource`` model caching (``app.py:30``).

The image libraries (PIL/torch) are NOT in this container, so the decode
body defaults to a clearly-marked deterministic stub; the Spark-side
plumbing (schema, batch iteration, error tolerance) is real and tested.
The REAL bodies exist behind optional imports: ``decode_images(decoder=
"pil"|"auto")`` and :func:`embed_images_torch` run the reference's actual
codec/model code when PIL/torch are importable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Optional real codecs/models — absent in this container; every consumer
# takes a `decoder=`/loader argument so the stub stays the default for
# oracle-reproducible runs even where PIL/torch ARE installed.
try:  # pragma: no cover - container has no PIL
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except Exception:
    _PILImage = None
    _HAVE_PIL = False

try:  # pragma: no cover - container has no torch
    import torch as _torch

    _HAVE_TORCH = True
except Exception:
    _torch = None
    _HAVE_TORCH = False

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
    """Deterministic fake decoder (the oracle-reproducible default).

    Derives a plausible (width, height, channels) from the payload hash.
    The hash runs over the *hex encoding* of the bytes so a SQL oracle can
    reproduce it (``md5(lower(hex(content)))`` — DuckDB's md5 takes
    VARCHAR only).
    """
    if payload is None or len(payload) < 4:
        raise ValueError("truncated payload")  # real codecs fail on short magic
    h = hashlib.md5(bytes(payload).hex().encode()).hexdigest()
    return 64 + int(h[0:2], 16) % 192, 64 + int(h[2:4], 16) % 192, 3


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real decoder — the reference's body (``utils/precompute_features.py:174``,
    ``app.py:158-160``): open, force RGB, read dimensions. Only reachable
    when PIL is importable."""
    import io

    img = _PILImage.open(io.BytesIO(bytes(payload))).convert("RGB")
    return img.width, img.height, 3


def decode_images(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """S3: binary → decoded metadata via Arrow-batched mapInPandas.

    ``decoder``: ``"stub"`` (default — deterministic, oracle-checkable),
    ``"pil"`` (real codec, requires PIL), or ``"auto"`` (PIL if
    importable, stub otherwise). The stub stays the default so
    correctness runs are reproducible on any container; a user with PIL
    installed flips one argument and the identical distributed plumbing
    (schema, Arrow batching, per-row error tolerance) carries the real
    codec.

    Per-row failures null the row out instead of failing the job
    (F2 error-tolerant map, reference ``utils/precompute_features.py:167-182``).
    """
    if decoder == "pil" and not _HAVE_PIL:
        raise RuntimeError("decoder='pil' requested but PIL is not importable")
    use_pil = decoder == "pil" or (decoder == "auto" and _HAVE_PIL)
    decode = _pil_decode if use_pil else _stub_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init goes here (load codec/model ONCE per task)
        for pdf in it:
            out = []
            for path, length, category, content in zip(
                pdf["path"], pdf["length"], pdf["category"], pdf["content"]
            ):
                try:
                    w, hgt, c = decode(content)
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


def embed_images_torch(
    df: DataFrame,
    model_loader,
    dim: int,
    content_col: str = "content",
    batch_size: int = 64,
) -> DataFrame:
    """P1+P2 real path — decode → preprocess → batched forward → L2
    normalize, the reference's per-image loop (``app.py:158-168``,
    ``utils/__init__.py:28-53``, ``src/model.py:51-58``) re-shaped for
    Spark: ``model_loader()`` (e.g. construct + ``torch.load`` a
    checkpoint, the S9 pattern) runs ONCE per partition iterator — the
    distributed analogue of ``@st.cache_resource`` (``app.py:30``) — and
    images flow through in (batch, 3, 224, 224) tensors instead of the
    reference's batch=1. Requires torch + PIL (importable check at call
    time, so the module loads anywhere)."""
    if not (_HAVE_TORCH and _HAVE_PIL):
        raise RuntimeError("embed_images_torch requires torch and PIL")
    import io

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_loader()  # once per task: the checkpoint load (S9)
        model.eval()
        mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
        std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
        with _torch.no_grad():
            for pdf in it:
                embs = []
                for start in range(0, len(pdf), batch_size):
                    chunk = pdf[content_col].iloc[start : start + batch_size]
                    imgs = []
                    for payload in chunk:
                        img = _PILImage.open(io.BytesIO(bytes(payload)))
                        img = img.convert("RGB").resize((224, 224))
                        arr = np.asarray(img, dtype=np.float32) / 255.0
                        imgs.append(((arr - mean) / std).transpose(2, 0, 1))
                    t = _torch.from_numpy(np.stack(imgs))
                    feats = model.extract_features(t).cpu().numpy()
                    if feats.shape[1] != dim:
                        raise ValueError(
                            f"model emitted {feats.shape[1]}-dim features, "
                            f"caller declared dim={dim}"
                        )
                    feats /= np.maximum(
                        np.linalg.norm(feats, axis=1, keepdims=True), 1e-12
                    )
                    embs.extend(feats.astype(np.float32))
                yield pdf.drop(columns=[content_col]).assign(embedding=embs)

    fields = ", ".join(
        f"{c} {t}" for c, t in df.dtypes if c != content_col
    )
    return df.mapInPandas(batches, schema=f"{fields}, embedding array<float>")


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
