"""Multimodal binary-column plumbing (SURVEY §2.1 S1/S3/S4, north-star
multimodal extension): binaryFile folder scan with path-derived category,
Arrow-batched decode with per-row error tolerance, and the stub embed UDF
that drives the end-to-end build pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
    _HAVE_PIL,
    _HAVE_TORCH,
    decode_images,
    embed_images_torch,
    scan_image_folder,
    stub_embed_text,
)
from the_build_project_image_retrieval_with_vector_databases_spark.functions.vector import (
    l2_norm,
)
from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    """ImageFolder-style fixture: root/<category>/<name>.jpg with
    deterministic binary payloads; one empty file to exercise the
    error-tolerant decode path (F2)."""
    root = tmp_path_factory.mktemp("imgs")
    for cat in ("airplanes", "bonsai"):
        d = root / cat
        d.mkdir()
        for i in range(3):
            (d / f"img_{i}.jpg").write_bytes(
                f"{cat}-{i}".encode() * (10 + i)
            )
        (d / "ignored.txt").write_text("not an image")
    # 2 bytes: listed by the scan but fails the decode (binaryFile skips
    # zero-length files entirely, so "broken" must be non-empty)
    (root / "airplanes" / "broken.jpg").write_bytes(b"\xff\xd8")
    return str(root)


def test_scan_image_folder(spark, image_root):
    df = scan_image_folder(spark, image_root, glob="*.jpg")
    rows = df.select("path", "category", "length", "content").collect()
    assert len(rows) == 7  # 3+3 payloads + 1 broken; .txt filtered by glob
    assert {r.category for r in rows} == {"airplanes", "bonsai"}
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert by_name["img_0.jpg"].length == len(b"airplanes-0" * 10) or by_name[
        "img_0.jpg"
    ].category == "bonsai"
    # content round-trips as raw bytes
    some = next(r for r in rows if r.path.endswith("bonsai/img_1.jpg"))
    assert bytes(some.content) == b"bonsai-1" * 11


def test_decode_images_error_tolerant(spark, image_root):
    scanned = scan_image_folder(spark, image_root, glob="*.jpg")
    out = decode_images(scanned).collect()
    assert len(out) == 7
    ok = [r for r in out if r.decode_ok]
    bad = [r for r in out if not r.decode_ok]
    assert len(ok) == 6 and len(bad) == 1
    assert bad[0].path.endswith("broken.jpg")
    assert bad[0].width is None
    for r in ok:
        assert 64 <= r.width < 256 and 64 <= r.height < 256 and r.n_channels == 3
    # determinism: same payload ⇒ same fake dimensions
    again = decode_images(scanned).collect()
    assert sorted((r.path, r.width, r.height) for r in out) == sorted(
        (r.path, r.width, r.height) for r in again
    )


def test_pil_decoder_gating(spark, image_root):
    """decoder='pil' must raise (not silently stub) when PIL is absent;
    decoder='auto' (the real-codec chain) must keep the pipeline green by
    turning unsupported payloads into decode_ok=false rows, not errors."""
    scanned = scan_image_folder(spark, image_root, glob="*.jpg")
    if not _HAVE_PIL:
        with pytest.raises(RuntimeError, match="PIL"):
            decode_images(scanned, decoder="pil")
        # fixture payloads are fake-jpg bytes: no real codec can decode them
        out = decode_images(scanned, decoder="auto").collect()
        assert len(out) == 7 and not any(r.decode_ok for r in out)
    else:
        out = decode_images(scanned, decoder="auto").collect()
        assert len(out) == 7


# ---------------------------------------------------------------------------
# REAL decode path — dependency-free PPM/BMP codecs, generated in-test.
# ---------------------------------------------------------------------------


def _ppm_bytes(width, height, rgb=None, comment=False):
    """Binary P6 writer: header + raw RGB raster (value = deterministic
    function of position unless a constant rgb triple is given)."""
    head = b"P6\n"
    if comment:
        head += b"# in-test fixture\n"
    head += f"{width} {height}\n255\n".encode()
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes(rgb if rgb else ((x * 7) % 256, (y * 11) % 256, (x + y) % 256))
    return head + bytes(px)


def _bmp_bytes(width, height, rgb=(10, 20, 30)):
    """24-bit BI_RGB BMP writer: bottom-up rows padded to 4 bytes, BGR."""
    import struct

    row = bytes(bytes((rgb[2], rgb[1], rgb[0])) * width)
    pad = b"\x00" * ((4 - (width * 3) % 4) % 4)
    raster = (row + pad) * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    file_head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40)
    return file_head + info + raster


def test_pure_decode_real_dimensions(spark, tmp_path):
    """Real-codec path, no PIL: generated PPM/PGM/BMP files decode to
    their TRUE header dimensions (not the stub's hash-derived fakes), and
    a corrupt raster yields an error row instead of a job failure."""
    root = tmp_path / "real" / "cats"
    root.mkdir(parents=True)
    (root / "a.ppm").write_bytes(_ppm_bytes(320, 200, comment=True))
    (root / "b.ppm").write_bytes(_ppm_bytes(64, 48))
    (root / "c.bmp").write_bytes(_bmp_bytes(33, 21))  # odd width → row padding
    (root / "trunc.ppm").write_bytes(_ppm_bytes(50, 50)[:-10])
    scanned = scan_image_folder(spark, str(tmp_path / "real"), glob="*.{ppm,bmp}")
    got = {
        r.path.rsplit("/", 1)[-1]: (r.width, r.height, r.n_channels, r.decode_ok)
        for r in decode_images(scanned, decoder="auto").collect()
    }
    assert got == {
        "a.ppm": (320, 200, 3, True),
        "b.ppm": (64, 48, 3, True),
        "c.bmp": (33, 21, 3, True),
        "trunc.ppm": (None, None, None, False),
    }
    assert all(r[3] or r[:3] == (None, None, None) for r in got.values())


def test_pure_decode_pixel_values():
    """Pixel-exact decode: BMP BGR→RGB conversion, bottom-up flip, and row
    padding all verified against hand-built rasters."""
    import struct

    import numpy as np

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        decode_pixels,
        resize_nearest,
    )

    # 2×2 P6: row0 = red, green; row1 = blue, white
    ppm = b"P6\n2 2\n255\n" + bytes(
        (255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
    )
    arr = decode_pixels(ppm)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0] and arr[1, 1].tolist() == [255, 255, 255]

    # 1×2 BMP: stored bottom-up, so the FIRST stored row is the BOTTOM row
    bottom_bgr = bytes((0, 0, 255)) + b"\x00"  # red pixel + pad-to-4
    top_bgr = bytes((255, 0, 0)) + b"\x00"  # blue pixel + pad-to-4
    info = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, 8, 0, 0, 0, 0)
    bmp = struct.pack("<2sIHHI", b"BM", 62, 0, 0, 54) + info + bottom_bgr + top_bgr
    arr = decode_pixels(bmp)
    assert arr[0, 0].tolist() == [0, 0, 255]  # top row = blue (RGB order)
    assert arr[1, 0].tolist() == [255, 0, 0]  # bottom row = red

    # nearest-neighbor resize: 2×2 checker upsampled 4×4 keeps exact values
    up = resize_nearest(decode_pixels(ppm), 4, 4)
    assert up.shape == (4, 4, 3)
    assert up[0, 0].tolist() == [255, 0, 0] and up[3, 3].tolist() == [255, 255, 255]
    assert np.array_equal(up[:2, :2], np.broadcast_to([255, 0, 0], (2, 2, 3)))


def _png_bytes(arr, colortype=2, filters=None, palette=None, bitdepth=8,
               interlace=0):
    """Minimal PNG writer over stdlib zlib: per-row filter choice (0–4,
    applied FORWARD so the decoder must invert them), any color type.
    ``arr`` is (h, w, channels) uint8."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = arr.shape
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)] if filters else 0
        if f == 0:
            enc = line.copy()
        elif f == 1:  # Sub
            enc = line.copy()
            enc[bpp:] = (line[bpp:] - line[:-bpp]) & 0xFF
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = (line - pred) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette.reshape(-1)))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_png_decode_pixel_exact_all_filters():
    """PNG unfilter correctness: an image round-trips bit-exactly through
    every filter type (0 none, 1 sub, 2 up, 3 average, 4 paeth) — the
    encoder applies the filter forward, the decoder must invert it."""
    import numpy as np

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        decode_pixels,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    for f in range(5):
        got = decode_pixels(_png_bytes(arr, filters=[f]))
        assert np.array_equal(got, arr), f"filter {f} round-trip"
    # mixed filters per row — the realistic encoder output
    got = decode_pixels(_png_bytes(arr, filters=[4, 1, 3, 0, 2]))
    assert np.array_equal(got, arr)


def test_png_decode_color_types():
    """Color-type normalization matches PIL convert('RGB'): gray
    replicates, alpha drops, palette looks up."""
    import numpy as np

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        decode_pixels,
    )

    rng = np.random.default_rng(11)
    # type 0: grayscale
    g = rng.integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    got = decode_pixels(_png_bytes(g, colortype=0, filters=[2]))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # type 6: RGBA → alpha dropped
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    got = decode_pixels(_png_bytes(rgba, colortype=6, filters=[1, 4]))
    assert np.array_equal(got, rgba[:, :, :3])
    # type 4: gray+alpha → gray replicated
    ga = rng.integers(0, 256, size=(3, 6, 2), dtype=np.uint8)
    got = decode_pixels(_png_bytes(ga, colortype=4, filters=[3]))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))
    # type 3: palette
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(7, 5, 1), dtype=np.uint8)
    got = decode_pixels(_png_bytes(idx, colortype=3, filters=[0], palette=pal))
    assert np.array_equal(got, pal[idx[:, :, 0]])


def test_png_decode_rejects_unsupported():
    """Interlaced / 16-bit / truncated PNGs raise (→ decode_ok=false rows
    through the error-tolerant map), never return wrong pixels."""
    import numpy as np
    import pytest as _pytest

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        decode_pixels,
    )

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    with _pytest.raises(ValueError, match="interlaced"):
        decode_pixels(_png_bytes(arr, interlace=1))
    with _pytest.raises(ValueError, match="16-bit"):
        decode_pixels(_png_bytes(arr, bitdepth=16))
    with _pytest.raises(ValueError):
        decode_pixels(_png_bytes(arr)[:-30])  # truncated IDAT


def test_decode_images_auto_handles_png(spark, tmp_path):
    """S3 end-to-end over the Spark plumbing: PNG files scanned from a
    folder decode to their true dimensions alongside PPM/BMP — the
    reference's accepted-format set (app.py:78) minus JPEG now decodes
    for real in-container."""
    import numpy as np

    rng = np.random.default_rng(3)
    root = tmp_path / "real" / "birds"
    root.mkdir(parents=True)
    (root / "a.png").write_bytes(
        _png_bytes(rng.integers(0, 256, (30, 40, 3), dtype=np.uint8),
                   filters=[4, 2, 1])
    )
    (root / "b.ppm").write_bytes(_ppm_bytes(64, 48))
    (root / "bad.png").write_bytes(b"\x89PNG\r\n\x1a\njunk")
    scanned = scan_image_folder(spark, str(tmp_path / "real"),
                                glob="*.{png,ppm}")
    got = {
        r.path.rsplit("/", 1)[-1]: (r.width, r.height, r.n_channels, r.decode_ok)
        for r in decode_images(scanned, decoder="auto").collect()
    }
    assert got == {
        "a.png": (40, 30, 3, True),
        "b.ppm": (64, 48, 3, True),
        "bad.png": (None, None, None, False),
    }


def test_embed_images_pure_real_pixels(spark, tmp_path):
    """Real pixel math end-to-end without torch/PIL: decode → resize →
    pool → projection → L2 norm. Distinct images embed distinctly, the
    same image embeds identically, and failures embed as null rows."""
    import numpy as np

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        embed_images_pure,
    )

    root = tmp_path / "real" / "dogs"
    root.mkdir(parents=True)
    (root / "a.ppm").write_bytes(_ppm_bytes(100, 80))
    (root / "a2.ppm").write_bytes(_ppm_bytes(100, 80))  # identical pixels
    (root / "b.bmp").write_bytes(_bmp_bytes(40, 40, rgb=(200, 10, 10)))
    (root / "bad.ppm").write_bytes(b"P6 garbage")
    scanned = scan_image_folder(spark, str(tmp_path / "real"), glob="*.{ppm,bmp}")
    out = {
        r.path.rsplit("/", 1)[-1]: r
        for r in embed_images_pure(scanned, dim=32).collect()
    }
    assert len(out) == 4
    assert not out["bad.ppm"].decode_ok and out["bad.ppm"].embedding is None
    for name in ("a.ppm", "a2.ppm", "b.bmp"):
        assert out[name].decode_ok
        assert abs(np.linalg.norm(out[name].embedding) - 1.0) < 1e-5
    assert out["a.ppm"].embedding == out["a2.ppm"].embedding  # deterministic
    sim = float(
        np.dot(out["a.ppm"].embedding, out["b.bmp"].embedding)
    )
    assert sim < 0.999  # different pixels ⇒ different embedding


def test_embed_images_torch_gated():
    if not (_HAVE_TORCH and _HAVE_PIL):
        with pytest.raises(RuntimeError, match="torch"):
            embed_images_torch(None, lambda: None, dim=8)


def test_stub_embed_text_shape_and_norm(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    out = stub_embed_text(docs, "text", dim=16)
    assert dict(out.dtypes)["embedding"] == "array<float>"
    rows = out.select(
        "doc_id", l2_norm("embedding").alias("n"), F.size("embedding").alias("d")
    ).collect()
    assert all(r.d == 16 for r in rows)
    assert max(abs(r.n - 1.0) for r in rows) < 1e-3
    # deterministic: same text ⇒ same embedding across runs
    a = {r.doc_id: r.embedding for r in out.collect()}
    b = {r.doc_id: r.embedding for r in stub_embed_text(docs, "text", dim=16).collect()}
    assert a == b


def test_embed_images_int_matches_numpy_reference(spark, tmp_path):
    """The oracle-exact integer embed: Spark output equals a direct
    numpy recompute (decode → nearest-resize → block sums → shared
    quantized weights) bit-for-bit, and the range audit holds."""
    import numpy as np

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        decode_pixels,
        embed_images_int,
        int_projection_weights,
        resize_nearest,
        scan_image_folder,
    )

    root = tmp_path / "ints" / "cats"
    root.mkdir(parents=True)
    (root / "a.ppm").write_bytes(_ppm_bytes(50, 40))
    (root / "b.ppm").write_bytes(_ppm_bytes(33, 77))
    (root / "bad.ppm").write_bytes(b"P6 nope")
    scanned = scan_image_folder(spark, str(tmp_path / "ints"), glob="*.ppm")
    got = {
        r.path.rsplit("/", 1)[-1]: r
        for r in embed_images_int(scanned, dim=16).collect()
    }
    assert not got["bad.ppm"].decode_ok and got["bad.ppm"].embedding is None

    wq = int_projection_weights(192, 16)
    for name in ("a.ppm", "b.ppm"):
        payload = (root / name).read_bytes()
        arr = resize_nearest(decode_pixels(payload), 32, 32).astype(np.int64)
        feats = arr.reshape(8, 4, 8, 4, 3).sum(axis=(1, 3)).ravel()
        want = feats @ wq
        assert list(want) == list(got[name].embedding), name
        assert int(np.abs(want).max()) < 2**31  # far inside the audit bound


def test_png_bomb_and_cap_guards():
    """PNG symmetric hardening (JPEG got this in round 6): a crafted
    header claiming 65535x65535 is rejected by the dimension cap before
    any allocation, and a zip-bomb IDAT (tiny file inflating to far
    more than the promised raster) is stopped at the bounded inflate."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
        _parse_png,
    )

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_bomb = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    bomb = sig + chunk(b"IHDR", ihdr_bomb) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="cap"):
        _parse_png(bomb)

    # 4x4 RGB image whose IDAT inflates to 100 MB of zeros: the bounded
    # inflate stops at the 52-byte raster; the scanlines are valid
    # (filter 0) so the decode SUCCEEDS with the correct 4x4 output
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    raster = (b"\x00" + b"\x11" * 12) * 4  # 4 rows, filter 0, value 0x11
    padded = raster + b"\x00" * (100 * 1024 * 1024)
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(padded)) + chunk(b"IEND", b"")
    assert len(png) < 200_000  # the bomb compresses tiny
    arr = _parse_png(png)
    assert arr.shape == (4, 4, 3) and np.all(arr == 0x11)
