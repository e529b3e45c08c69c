"""Cross-engine FUZZ layer (r11): randomized generated tables — not the
fixed fixtures — driven through the registry's real (query, oracle)
pairs and the driver-faithful compare harness.

The fixed-fixture oracle tests prove agreement on ONE dataset; a latent
fixture-overfit (an oracle that happens to match because the fixture
never hits an edge) survives them. Here hypothesis draws corpus shapes
(sizes, duplicate docs, empty/whitespace-only texts, duplicate vectors,
degenerate labels) and every drawn corpus must hash-match across Spark
and DuckDB for a panel of registry queries whose semantics are
input-agnostic (no fixture-specific slices beyond vec_id 0 / label
presence, which the generator guarantees).

Panel selection rule: documents-only and embeddings-only queries with
no corpus-specific constants other than the flagship vec_id=0 query
row. Oracles hardcode the 64-dim embedding width, so generated vectors
are 64-D float32 like the fixtures.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from .oracle_harness import compare
from .test_oracle_parity import _sized_oracles

DOC_QUERIES = [
    "token_stats",
    "top_terms",
    "quality_score",
    "gopher_quality",
    "language_id",
    "doc_fingerprint",
    "exact_dedup",
    "bpe_token_counts",
    "pii_scrub",
    "top_docs_per_lang",
    "salted_term_counts",
    "passage_dedup",
    "simhash",
]
EMB_QUERIES = [
    "vector_norms",
    "embedding_stats",
    "knn_l2_topk",
    "label_counts",
    "distinct_labels",
    "grouped_ids",
    "kmeans_step",
    "semantic_dedup",
]

_WORDS = [
    "the", "cat", "sat", "on", "a", "mat", "dog", "ran", "big", "data",
    "spark", "dedup", "la", "el", "und", "der", "le", "et", "12",
    "x@y.z", "a-b", "...",
]


def _gen_documents(rng: np.random.Generator, n_docs: int) -> pa.Table:
    rows = []
    for i in range(n_docs):
        ln = int(rng.integers(0, 40))
        if ln == 0:
            text = str(rng.choice(["", " ", "\t", "  \n "]))
        else:
            text = " ".join(str(w) for w in rng.choice(_WORDS, size=ln))
            if rng.integers(0, 4) == 0:
                text = "  " + text + "\t"  # leading/trailing whitespace
        rows.append((i, text))
    if n_docs >= 6:
        # exact duplicates (exercise exact_dedup/doc_fingerprint) and a
        # case-only variant (must NOT collapse under md5 of raw text)
        rows[n_docs - 1] = (n_docs - 1, rows[0][1])
        rows[n_docs - 2] = (n_docs - 2, rows[1][1])
        rows[n_docs - 3] = (n_docs - 3, rows[1][1].upper())
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(
                [str(rng.choice(["en", "es", "de", "fr"])) for _ in rows],
                pa.string(),
            ),
            "source": pa.array(
                [f"src{int(rng.integers(0, 3))}" for _ in rows], pa.string()
            ),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def _gen_embeddings(rng: np.random.Generator, n_vecs: int) -> pa.Table:
    d = 64  # the oracles' hardcoded EMB_DIM
    mat = rng.standard_normal((n_vecs, d)).astype(np.float32)
    if n_vecs >= 6:
        mat[n_vecs - 1] = mat[0]       # duplicate vector → exact dist ties
        mat[n_vecs - 2] = 0.0          # degenerate zero vector
    labels = rng.integers(0, max(2, n_vecs // 8), size=n_vecs)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )


def _run_panel(spark, tmpdir: str, names: list[str]) -> None:
    from the_build_project_image_retrieval_with_vector_databases_spark.queries import (
        ORACLES,
        QUERIES,
    )

    # Corpus-sized oracles (semantic_dedup's k here) embed the sf0.01
    # derivation in their REGISTERED strings; at any other corpus size
    # the comparison must re-derive them — the same structural override
    # the SF-sweep parity tests use (tests/test_oracle_parity.py).
    sized = _sized_oracles(tmpdir)
    for name in names:
        ok, msg = compare(
            QUERIES[name](spark, tmpdir),
            sized.get(name, ORACLES[name]),
            tmpdir,
            name,
        )
        assert ok, f"fuzz corpus diverged: {msg}"


@settings(max_examples=4, deadline=None, derandomize=True)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=3, max_value=40),
)
def test_fuzz_documents_panel(spark, tmp_path_factory, seed, n_docs):
    rng = np.random.default_rng(seed)
    tmpdir = str(tmp_path_factory.mktemp(f"fuzz_docs_{seed}_{n_docs}"))
    pq.write_table(
        _gen_documents(rng, n_docs), os.path.join(tmpdir, "documents.parquet")
    )
    _run_panel(spark, tmpdir, DOC_QUERIES)


@settings(max_examples=4, deadline=None, derandomize=True)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_vecs=st.integers(min_value=20, max_value=48),
)
def test_fuzz_embeddings_panel(spark, tmp_path_factory, seed, n_vecs):
    rng = np.random.default_rng(seed)
    tmpdir = str(tmp_path_factory.mktemp(f"fuzz_emb_{seed}_{n_vecs}"))
    pq.write_table(
        _gen_embeddings(rng, n_vecs), os.path.join(tmpdir, "embeddings.parquet")
    )
    _run_panel(spark, tmpdir, EMB_QUERIES)
