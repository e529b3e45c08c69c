"""Multimodal binary-column plumbing (SURVEY §2.1 S1/S3/S4, north-star
multimodal extension): binaryFile folder scan with path-derived category,
Arrow-batched decode with per-row error tolerance, and the stub embed UDF
that drives the end-to-end build pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.sources.images import (
    decode_images,
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
