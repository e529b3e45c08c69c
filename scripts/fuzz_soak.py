#!/usr/bin/env python
"""Extended cross-engine fuzz soak — the hypothesis panels in
tests/test_fuzz_oracle.py run 2-4 derandomized examples per suite pass;
this driver sweeps MANY seeds over the same generators, panels, and
driver-faithful compare, for use as an idle-box background soak.

Usage:  python scripts/fuzz_soak.py [first_seed] [n_seeds]
Prints one line per (seed, panel) and a final summary; nonzero exit on
any divergence.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from tests.test_fuzz_oracle import (  # noqa: E402
    DOC_QUERIES,
    EMB_QUERIES,
    EMB_SERVE_QUERIES,
    EVENT_FUZZ_QUERIES,
    REL_QUERIES,
    _gen_documents,
    _gen_embeddings,
    _gen_relational,
    _run_panel,
)

from the_build_project_image_retrieval_with_vector_databases_spark.session import (  # noqa: E402
    get_spark,
)

from tests.oracle_harness import compare  # noqa: E402


def _staged_pairs():
    """(name, query_fn, oracle_sql) per panel: the r11 trio (REGISTERED
    r12 but not in the test-side panel lists — kept covered here) plus
    the r12-staged r13 candidates, which face the registry fuzz gate
    once registered."""
    from the_build_project_image_retrieval_with_vector_databases_spark.queries_ann import (
        ORACLE_SEMANTIC_DECONTAMINATE,
        _oracle_bq_hamming_topk,
        q_bq_hamming_topk,
        q_semantic_decontaminate,
    )
    from the_build_project_image_retrieval_with_vector_databases_spark.queries_text import (
        ORACLE_DSIR_IMPORTANCE,
        ORACLE_PERPLEXITY_BUCKETS,
        _oracle_passage_chunking,
        _oracle_temperature_mix,
        q_dsir_importance,
        q_passage_chunking,
        q_perplexity_buckets,
        q_temperature_mix,
    )

    return {
        "docs": [
            ("dsir_importance", q_dsir_importance, ORACLE_DSIR_IMPORTANCE),
            ("perplexity_buckets", q_perplexity_buckets, ORACLE_PERPLEXITY_BUCKETS),
            ("passage_chunking", q_passage_chunking, _oracle_passage_chunking()),
            ("temperature_mix", q_temperature_mix, _oracle_temperature_mix()),
        ],
        "emb": [
            ("semantic_decontaminate", q_semantic_decontaminate,
             ORACLE_SEMANTIC_DECONTAMINATE),
            ("bq_hamming_topk", q_bq_hamming_topk, _oracle_bq_hamming_topk()),
        ],
        "rel": [],
        "serve": [],
    }


def main() -> int:
    first = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="fuzz-soak")
    failures: list[str] = []
    for seed in range(first, first + n):
        rng = np.random.default_rng(seed)
        n_docs = int(rng.integers(3, 61))
        n_vecs = int(rng.integers(20, 49))
        n_cust = int(rng.integers(25, 121))
        n_orders = int(rng.integers(10, 201))
        n_vecs_srv = int(rng.integers(66, 91))
        for panel, names, write in [
            ("docs", DOC_QUERIES,
             lambda d: pq.write_table(_gen_documents(rng, n_docs),
                                      os.path.join(d, "documents.parquet"))),
            ("emb", EMB_QUERIES,
             lambda d: pq.write_table(_gen_embeddings(rng, n_vecs),
                                      os.path.join(d, "embeddings.parquet"))),
            ("serve", EMB_SERVE_QUERIES,
             lambda d: pq.write_table(_gen_embeddings(rng, n_vecs_srv),
                                      os.path.join(d, "embeddings.parquet"))),
            ("rel", REL_QUERIES + EVENT_FUZZ_QUERIES,
             lambda d: [pq.write_table(t, os.path.join(d, f"{k}.parquet"))
                        for k, t in _gen_relational(rng, n_cust, n_orders).items()]),
        ]:
            with tempfile.TemporaryDirectory(prefix=f"soak_{seed}_{panel}_") as d:
                write(d)
                try:
                    _run_panel(spark, d, names)
                    for sname, qfn, osql in _staged_pairs()[panel]:
                        ok, msg = compare(qfn(spark, d), osql, d, sname)
                        assert ok, f"staged {msg}"
                    print(f"seed={seed} panel={panel}: OK", flush=True)
                except AssertionError as exc:
                    failures.append(f"seed={seed} panel={panel}: {exc}")
                    print(failures[-1], flush=True)
    print(f"SOAK DONE: {n} seeds, failures={len(failures)}")
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
