"""Train/test decontamination: flag corpus documents that share word
n-grams with a benchmark (eval) set.

The standard LLM-pipeline hygiene pass (e.g. GPT-3 appendix C / PaLM §7
style n-gram overlap): any training document that contains an n-gram
also present in an evaluation benchmark is flagged (and usually dropped)
so eval scores aren't inflated by memorized test data. The reference app
has no text pipeline at all — this belongs to the north-star
LLM-data-pipeline family (SURVEY §7.2 M4), same tier as the dedup suite.

Scale shape (100 TB corpus, benchmark ≪ corpus):
- Both sides tokenize → distinct n-gram shingles → 60-bit md5-prefix
  ints, so the join carries longs, never shingle strings.
- The benchmark's distinct-gram set is tiny by construction (eval sets
  are MBs, not TBs) → broadcast hash join against the exploded corpus
  grams; the corpus is NEVER shuffled — the only exchange is the final
  per-doc aggregate, keyed by doc_id (map-side partial).
- With ``broadcast_bench=False`` (benchmark too big to broadcast) the
  join falls back to a hash-partitioned equi-join on the gram key —
  still candidate-proportional, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, token_shingles, tokens


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, h) — one row per distinct n-gram hash per document."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(token_shingles(tokens(F.col(text_col)), n=n)).alias("_g"),
        )
        .select("_id", md5_long(F.col("_g"), digits=15).alias("h"))
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_hits: int = 1,
    severe_frac: float = 0.2,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-corpus-document benchmark-overlap report.

    Returns one row per corpus document with ≥ ``min_hits`` shared
    n-grams: ``(doc_id, n_grams, n_shared, n_bench_docs, overlap_frac,
    severe)`` where ``overlap_frac = n_shared / n_grams`` and ``severe``
    flags documents above ``severe_frac`` (likely verbatim leaks rather
    than incidental collisions).
    """
    # ONE full tokenize+shingle pass over the corpus (the dominant cost;
    # profiled round 5: folding size(grams) into the same projection as
    # explode(grams) doubles the generated code for the shingle
    # expression past the codegen limit and runs ~13x slower interpreted
    # — the gram count must NOT ride the explode projection).
    corp = _gram_hashes(corpus, id_col, text_col, n)
    bench = (
        _gram_hashes(benchmark, id_col, text_col, n)
        .select(F.col("_id").alias("_bench_id"), "h")
        .distinct()
    )
    if broadcast_bench:
        bench = F.broadcast(bench)
    hits = (
        corp.join(bench, "h")
        .groupBy("_id")
        .agg(
            F.countDistinct("h").alias("n_shared"),
            F.countDistinct("_bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_shared") >= min_hits)
    )
    # Per-doc gram counts are needed ONLY for flagged docs (contamination
    # is rare by construction — benchmark ≪ corpus), so join the hit set
    # back to the corpus FIRST and tokenize just the survivors: the
    # second shingle evaluation touches hit docs, not the corpus.
    # Round-4 scale-proof follow-up — the old shape ran a second
    # corpus-wide tokenize pass and shuffled an N-row sizes table.
    # The hit-set side is NOT broadcast-hinted: its size tracks the
    # CONTAMINATION RATE, not the benchmark size (a tiny benchmark
    # leaked corpus-wide yields corpus-sized hits), so the runtime
    # decision belongs to AQE — it broadcasts small hit sets from actual
    # stats and falls back to a shuffled hash join when they are not.
    grams = token_shingles(tokens(F.col(text_col)), n=n)
    # raw integer-ratio double: bit-exact cross-engine; rounding is the
    # .5-tie hazard (min_cost_order class, CHANGES_r05)
    frac: Column = F.col("n_shared").cast("double") / F.col("n_grams").cast("double")
    return (
        corpus.select(F.col(id_col).alias("_id"), F.col(text_col))
        .join(hits, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.size(grams).alias("n_grams"),
            "n_shared",
            "n_bench_docs",
        )
        .select(
            id_col,
            "n_grams",
            "n_shared",
            "n_bench_docs",
            frac.alias("overlap_frac"),
            (frac >= F.lit(severe_frac)).alias("severe"),
        )
    )
