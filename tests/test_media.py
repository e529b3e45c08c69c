"""Video/audio binary-column plumbing (sources.media): frame explosion
(1 row → k rows inside the Arrow batch), error tolerance, resize digest
determinism, and audio chunk coverage of the full payload."""

from __future__ import annotations

import pytest

from the_build_project_image_retrieval_with_vector_databases_spark.queries_pipeline import (
    VIDEOS_ROOT,
)
from the_build_project_image_retrieval_with_vector_databases_spark.sources.media import (
    STUB_FRAME_BYTES,
    audio_chunks,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def videos(spark):
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mp4")
        .load(VIDEOS_ROOT)
        .cache()
    )
    df.count()
    return df


def test_sample_frames_explodes_and_tolerates(videos):
    out = sample_frames(videos, stride=2).collect()
    by_file = {}
    for r in out:
        by_file.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
    # broken.mp4 (4 bytes < one frame) -> single error row
    assert len(by_file["broken.mp4"]) == 1
    assert by_file["broken.mp4"][0].decode_ok is False
    assert by_file["broken.mp4"][0].frame_hash is None
    # clip_a.mp4: 4000 bytes -> 15 frames -> indices 0,2,...,14 (8 rows)
    a = sorted(r.frame_idx for r in by_file["clip_a.mp4"])
    assert a == list(range(0, 4000 // STUB_FRAME_BYTES, 2))
    # frame timestamps follow the stub fps contract
    for r in by_file["clip_a.mp4"]:
        assert r.frame_ms == r.frame_idx * 1000.0 / 25.0
    # determinism across runs
    again = sample_frames(videos, stride=2).collect()
    assert sorted((r.path, r.frame_idx, r.frame_hash) for r in out) == sorted(
        (r.path, r.frame_idx, r.frame_hash) for r in again
    )


def test_resize_images_digest(videos):
    out = {r.path: r for r in resize_images(videos, 224, 224).collect()}
    ok = [r for r in out.values() if r.decode_ok]
    assert len(ok) == 4  # every fixture payload is >= 4 bytes
    assert all(r.target_w == 224 and r.target_h == 224 for r in ok)
    # different payloads -> different digests; same payload+size -> stable
    hashes = [r.resized_hash for r in ok]
    assert len(set(hashes)) == len(hashes)
    again = {r.path: r.resized_hash for r in resize_images(videos, 224, 224).collect()}
    assert {p: r.resized_hash for p, r in out.items()} == again
    # digest depends on the target size (resize actually 'happened')
    other = {r.path: r.resized_hash for r in resize_images(videos, 64, 64).collect()}
    assert all(other[p] != r.resized_hash for p, r in out.items() if r.decode_ok)


def test_audio_chunks_cover_payload(videos):
    lengths = {r.path.rsplit("/", 1)[-1]: r.length for r in videos.collect()}
    chunks = audio_chunks(videos, chunk_bytes=512).collect()
    by_file = {}
    for r in chunks:
        by_file.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
    for name, size in lengths.items():
        rows = sorted(by_file[name], key=lambda r: r.chunk_idx)
        assert sum(r.n_bytes for r in rows) == size  # full coverage, no overlap
        assert [r.offset for r in rows] == [i * 512 for i in range(len(rows))]


def test_audio_chunks_error_tolerant(spark, tmp_path):
    """A null/empty payload becomes a single decode_ok=false row (F2) —
    the job survives and nothing silently vanishes."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": ["ok.wav", "empty.wav", "null.wav"],
                "content": [b"\x01" * 700, b"", None],
            }
        )
    )
    rows = audio_chunks(df, chunk_bytes=512).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    assert [r.decode_ok for r in by_path["ok.wav"]] == [True, True]
    assert [(r.decode_ok, r.chunk_idx) for r in by_path["empty.wav"]] == [(False, None)]
    assert [(r.decode_ok, r.chunk_idx) for r in by_path["null.wav"]] == [(False, None)]
