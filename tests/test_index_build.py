"""End-to-end batch index build (SURVEY §3.2 → plans.index_build):
sample → normalize → positional-id assignment → partitioned sink, plus the
IVF layout + partition-pruned probe."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from the_build_project_image_retrieval_with_vector_databases_spark.plans.index_build import (
    build_index,
    write_metadata_json,
    write_vector_map,
)
from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
    ivf_search,
)
from the_build_project_image_retrieval_with_vector_databases_spark.functions.vector import (
    l2_norm,
)
from .conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_build_index_contract(spark):
    out = build_index(_emb(spark), per_class=20).cache()
    n = out.count()
    # exact-k stratified: 10 labels × min(20, 50) = 200 rows
    assert n == 200
    # positional identity: row_id is dense 0..N-1, assigned once
    ids = sorted(r.row_id for r in out.select("row_id").collect())
    assert ids == list(range(n))
    # unit norms after normalize (float32 storage tolerance)
    norms = [r.n for r in out.select(l2_norm("embedding").alias("n")).collect()]
    assert max(abs(x - 1.0) for x in norms) < 1e-3
    # embedding stays float32 (reference dtype contract, utils/__init__.py:74)
    assert dict(out.dtypes)["embedding"] == "array<float>"


def test_build_index_ids_stable_under_repartition(spark):
    a = build_index(_emb(spark), per_class=5)
    b = build_index(_emb(spark).repartition(13), per_class=5)
    ka = sorted((r.vec_id, r.row_id) for r in a.select("vec_id", "row_id").collect())
    kb = sorted((r.vec_id, r.row_id) for r in b.select("vec_id", "row_id").collect())
    assert ka == kb


def test_sidecar_sinks_roundtrip(spark, tmp_path):
    """S7 (JSON metadata) and S8 (key→vector map) sidecar-parity sinks:
    write + re-read preserves rows, keys, and vector payloads exactly."""
    built = build_index(_emb(spark), per_class=5).cache()
    n = built.count()

    jpath = str(tmp_path / "metadata_json")
    write_metadata_json(built, jpath)
    meta = spark.read.json(jpath)
    assert meta.count() == n
    assert "embedding" not in meta.columns  # vectors excluded from S7
    want = {(r.vec_id, r.label, r.row_id) for r in built.collect()}
    got = {(r.vec_id, r.label, r.row_id) for r in meta.collect()}
    assert got == want

    vpath = str(tmp_path / "vector_map")
    write_vector_map(built, vpath)
    vmap = spark.read.parquet(vpath)
    assert vmap.columns == ["row_id", "embedding"]
    assert vmap.count() == n
    a = {r.row_id: list(r.embedding) for r in built.select("row_id", "embedding").collect()}
    b = {r.row_id: list(r.embedding) for r in vmap.collect()}
    assert a == b  # float32 bits survive the parquet roundtrip exactly


def test_ivf_append_maintenance(spark, tmp_path):
    """Appending a new batch into the IVF layout: existing rows intact,
    new rows land in their assigned partitions, probes see both."""
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
        append_to_ivf_index,
        train_centroids,
        write_ivf_index,
    )

    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    cents = train_centroids(base, k=4, seed=42)
    path = str(tmp_path / "ivf_inc")
    write_ivf_index(base, path, cents)
    n_base = spark.read.parquet(path).count()
    append_to_ivf_index(extra, path, cents)
    merged = spark.read.parquet(path)
    assert merged.count() == emb.count()
    assert n_base == 400
    # appended rows are assigned to the same centroid the expression gives
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
        assign_centroids,
    )
    want = {
        r.vec_id: r.centroid
        for r in assign_centroids(extra, cents).select("vec_id", "centroid").collect()
    }
    got = {
        r.vec_id: r.centroid
        for r in merged.filter(F.col("vec_id") >= 400)
        .select("vec_id", "centroid")
        .collect()
    }
    assert got == want
    # a probe over the merged layout can return appended vectors
    qrow = extra.first()
    hits = ivf_search(
        spark, cents, list(map(float, qrow.embedding)), k=3, nprobe=4, path=path
    ).collect()
    assert qrow.vec_id in {r.vec_id for r in hits}


def test_ivf_layout_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ivf_index")
    built = build_index(_emb(spark), out_path=path, per_class=20, ivf_k=4)
    reread = spark.read.parquet(path)
    assert reread.count() == 200
    assert "centroid" in reread.columns
    # partition pruning surface: centroid is a partition column
    assert set(r.centroid for r in reread.select("centroid").distinct().collect()) <= set(
        range(4)
    )
    # probe over the materialized layout returns top-k with metadata intact
    qrow = built.filter(F.col("vec_id") == built.select(F.min("vec_id")).first()[0]).first()
    from the_build_project_image_retrieval_with_vector_databases_spark.operators.ann import (
        train_centroids,
    )
    cents = train_centroids(_emb(spark), k=4, seed=42)
    got = ivf_search(
        spark, cents, list(map(float, qrow.embedding)), k=3, nprobe=4, path=path
    ).collect()
    assert len(got) == 3
    assert {"vec_id", "label", "dist"} <= set(got[0].asDict())
    # full probe (nprobe == k) includes the query row itself at dist 0
    assert got[0].vec_id == qrow.vec_id
    assert abs(got[0].dist) < 1e-6
