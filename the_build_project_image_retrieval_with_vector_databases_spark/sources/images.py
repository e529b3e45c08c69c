"""Multimodal (image/audio/video) column handling (SURVEY §1.1, §2.1
S1/S3/S4; north-star multimodal extension).

Design: media are opaque ``binary`` columns with typed metadata columns
alongside. The scan is Spark's ``binaryFile`` source (path-glob filtered,
recursive); decode / feature-extraction run as Arrow-batched
``mapInPandas`` so the per-batch Python cost amortizes and model/codec
state loads once per partition iterator — the distributed analogue of the
reference's ``@st.cache_resource`` model caching (``app.py:30``).

The compressed-image libraries (PIL/torch) are NOT in this container, so
``decode_images`` defaults to a clearly-marked deterministic stub for
oracle-reproducible runs — but the REAL decode path is executable here
too: dependency-free pure-numpy codecs for PPM/PGM, 24-bit BMP, and
8-bit PNG — one of the reference's two accepted upload formats,
``app.py:78`` — (``decoder="auto"`` → built-in parsers, then PIL for
JPEG when importable), plus :func:`embed_images_pure` running decode →
resize → pool → projection → L2-normalize on actual pixels.
``decode_images(decoder="pil")`` and :func:`embed_images_torch` carry
the reference's PIL/torch bodies when those libraries are importable.
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


# ---------------------------------------------------------------------------
# Dependency-free REAL codecs: PPM (P5/P6), BMP (24-bit BI_RGB), and PNG
# (8-bit, stdlib zlib + per-scanline unfilter). These parse actual headers
# and pixel rasters with numpy — no PIL — so the real-decode code path
# (header parse → raster validate → RGB array) is executable and tested in
# this container, not only behind a skipif gate. JPEG still requires PIL.
# ---------------------------------------------------------------------------


def _parse_ppm(payload: bytes):
    """Netpbm binary: P6 (RGB) / P5 (gray) → (h, w, 3) uint8 array.

    Header = magic, then width/height/maxval tokens separated by
    whitespace/comments, then exactly one whitespace byte, then the raster.
    """
    import numpy as np
    import re

    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # tokenize the header: strip '#...\n' comments, take 3 ints after magic
    pos, tokens = 2, []
    while len(tokens) < 3:
        m = re.match(rb"(?:\s+|#[^\n]*\n)+(\d+)", payload[pos:])
        if not m:
            raise ValueError("truncated PPM header")
        tokens.append(int(m.group(1)))
        pos += m.end()
    width, height, maxval = tokens
    if not (0 < maxval < 65536 and width > 0 and height > 0):
        raise ValueError("bad PPM header values")
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    pos += 1  # the single whitespace byte before the raster
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    if raster.size < need:
        raise ValueError("truncated PPM raster")
    arr = raster.reshape(height, width, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)  # force RGB like .convert("RGB")
    return arr


def _parse_bmp(payload: bytes):
    """Windows BMP, uncompressed 24-bit BI_RGB → (h, w, 3) uint8 array.

    Handles the standard quirks: little-endian headers, BGR byte order,
    bottom-up row storage, rows padded to 4-byte boundaries, negative
    height = top-down.
    """
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("bad BMP dimensions")
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = row_bytes * height
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=data_offset)
    if raster.size < need:
        raise ValueError("truncated BMP raster")
    rows = raster.reshape(height, row_bytes)[:, : width * 3]
    arr = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        arr = arr[::-1]  # bottom-up storage → top-down array
    return np.ascontiguousarray(arr)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_png(payload: bytes):
    """PNG (one of the reference's two accepted upload formats,
    ``app.py:78``) → (h, w, 3) uint8 RGB array, dependency-free: chunk
    walk, zlib-inflate the IDAT stream, per-scanline unfilter (filter
    types 0–4), then color-type normalization to RGB exactly as PIL's
    ``convert("RGB")`` would (gray replicated, alpha dropped, palette
    looked up).

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced — i.e. what encoders emit
    for photographic/screenshot content. 16-bit, sub-byte depths, and
    Adam7 interlace raise (→ ``decode_ok = false`` rows); JPEG is the
    one reference format that genuinely needs PIL.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bitdepth = colortype = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # chunk header + data + CRC
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if bitdepth != 8:
        raise ValueError(f"{bitdepth}-bit PNG unsupported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if channels is None:
        raise ValueError(f"bad PNG color type {colortype}")
    if width == 0 or height == 0:
        raise ValueError("bad PNG dimensions")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = width * channels
    need = (stride + 1) * height
    if len(raw) < need:
        raise ValueError("truncated PNG raster")
    scan = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(
        height, stride + 1
    )
    # Per-scanline unfilter. Rows depend on the fully reconstructed row
    # above, so the row loop is sequential; filters 1/3/4 additionally
    # recurse on the pixel to the left, so those run per-byte. int32
    # working copies keep the sums exact before the mod-256 fold.
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(height):
        f = scan[y, 0]
        cur = scan[y, 1:].astype(np.int32)
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub
            rec = cur
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:  # Average
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        rec &= 0xFF
        out[y] = rec
        prev = rec
    arr = out.reshape(height, width, channels)
    if colortype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        if int(arr.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        arr = palette[arr[:, :, 0]]
    elif colortype == 0:
        arr = np.repeat(arr, 3, axis=2)
    elif colortype == 4:
        arr = np.repeat(arr[:, :, :1], 3, axis=2)
    elif colortype == 6:
        arr = arr[:, :, :3]
    return np.ascontiguousarray(arr)


def decode_pixels(payload: bytes):
    """Decode a payload to an (h, w, 3) uint8 RGB array.

    Dispatches on magic bytes: PPM/PGM, 24-bit BMP, and 8-bit PNG decode
    with the built-in pure-numpy parsers (no dependencies); anything else
    falls through to PIL when importable, else raises (callers' per-row
    error tolerance turns that into a ``decode_ok = false`` row).
    """
    payload = bytes(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _parse_ppm(payload)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _parse_png(payload)
    if _HAVE_PIL:
        import io

        import numpy as np

        img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    raise ValueError("unsupported image format (PPM/BMP built in; PIL absent)")


def _pure_decode(payload: bytes) -> tuple[int, int, int]:
    """Real-decode body over the dependency-free codecs: parse the actual
    header and raster, return true (width, height, channels)."""
    arr = decode_pixels(payload)
    return arr.shape[1], arr.shape[0], arr.shape[2]


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize via numpy fancy indexing — the dependency-
    free stand-in for PIL's ``Image.resize`` (reference preprocessing
    ``utils/__init__.py:28-33``); exact same (h, w, 3) contract."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[rows[:, None], cols[None, :]]


def decode_images(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """S3: binary → decoded metadata via Arrow-batched mapInPandas.

    ``decoder``: ``"stub"`` (default — deterministic, oracle-checkable),
    ``"pil"`` (PIL only, requires PIL), or ``"auto"`` (real-codec chain:
    built-in pure-numpy PPM/BMP/PNG parsers, then PIL for JPEG when
    importable; unsupported payloads become ``decode_ok = false``
    rows). The stub stays the default so correctness runs are
    reproducible on any container; flipping one argument carries the real
    codecs through the identical distributed plumbing (schema, Arrow
    batching, per-row error tolerance).

    Per-row failures null the row out instead of failing the job
    (F2 error-tolerant map, reference ``utils/precompute_features.py:167-182``).
    """
    if decoder == "pil" and not _HAVE_PIL:
        raise RuntimeError("decoder='pil' requested but PIL is not importable")
    decode = {"pil": _pil_decode, "auto": _pure_decode}.get(decoder, _stub_decode)

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


def embed_images_pure(
    df: DataFrame,
    dim: int = 64,
    content_col: str = "content",
    size: int = 224,
    pool: int = 8,
) -> DataFrame:
    """P1+P2 over the dependency-free codecs: REAL pixel math end-to-end
    in any container — decode (PPM/BMP numpy parsers) → nearest-neighbor
    resize to ``size``² → scale to [0, 1] → ``pool``×``pool`` average-pool
    → seeded random projection → L2 normalize.

    The same pipeline shape as :func:`embed_images_torch` (reference
    ``app.py:158-168`` / ``utils/__init__.py:28-53``) with the torch
    forward replaced by one BLAS matmul per Arrow batch over broadcast
    weights (the S9 checkpoint pattern). Rows that fail decode embed as
    null with ``decode_ok = false`` (F2).
    """
    import numpy as np

    feat_dim = pool * pool * 3
    weights = np.random.default_rng(0xBEEF ^ dim).standard_normal((feat_dim, dim))
    bweights = df.sparkSession.sparkContext.broadcast(weights)
    keep = [c for c, _ in df.dtypes if c != content_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bweights.value  # per-partition init: "load the checkpoint" once
        for pdf in it:
            feats, oks = [], []
            for payload in pdf[content_col]:
                try:
                    arr = resize_nearest(decode_pixels(payload), size, size)
                    arr = arr.astype(np.float64) / 255.0
                    # average-pool to (pool, pool, 3): exact block means
                    arr = arr.reshape(pool, size // pool, pool, size // pool, 3)
                    feats.append(arr.mean(axis=(1, 3)).ravel())
                    oks.append(True)
                except Exception:
                    feats.append(np.zeros(feat_dim))
                    oks.append(False)
            mat = np.stack(feats) @ w  # one matmul per Arrow batch
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            embs = [
                row.astype(np.float32) if ok else None
                for row, ok in zip(mat, oks)
            ]
            yield pdf[keep].assign(embedding=embs, decode_ok=oks)

    fields = ", ".join(f"{c} {t}" for c, t in df.dtypes if c != content_col)
    return df.mapInPandas(
        batches, schema=f"{fields}, embedding array<float>, decode_ok boolean"
    )


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
