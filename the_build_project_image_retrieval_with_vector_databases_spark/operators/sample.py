"""Sampling & splits (SURVEY §2.5).

SA1 — the reference's stratified per-class sample
(``utils/precompute_features.py:152-159``): exactly ``min(k, n_g)`` rows
per label, seeded ``random.sample``. Python-RNG bit-parity is not
reproducible cross-engine (SURVEY §7.4.2), so the engine pins a
**deterministic surrogate order**: a multiplicative-hash of the row id
(Knuth's 2654435761 mod 2^31-1) — pure integer arithmetic both Spark and
DuckDB evaluate identically, pseudo-random w.r.t. any natural ordering,
stable across partitioning/versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_long

HASH_MULT = 2654435761  # Knuth multiplicative hash
HASH_MOD = 2147483647  # 2^31 - 1


def shuffle_key(id_col: str = "vec_id", seed: int = 42):
    """Deterministic pseudo-random sort key: ((id + seed) * 2654435761) % (2^31-1)."""
    return ((F.col(id_col) + F.lit(seed)) * F.lit(HASH_MULT)) % F.lit(HASH_MOD)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly min(k, group size) rows per stratum, deterministic.

    ``sampleBy`` only gives *expected* fractions; the reference requires
    exact-k, so this is the window-rank pattern. One shuffle on the
    stratum key; with many strata the hash partitioning spreads evenly, and
    at scale a salt on the hot stratum bounds skew (AQE skew-join also
    kicks in for the shuffle).
    """
    w = Window.partitionBy(strata_col).orderBy(
        shuffle_key(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def random_split(
    df: DataFrame, weights: list[float], seed: int = 42
) -> list[DataFrame]:
    """SA2 — the reference's 80/20 ``random_split`` (``train_model.py:42-45``)."""
    return df.randomSplit(weights, seed)


def deterministic_split(
    df: DataFrame, frac: float, id_col: str, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Oracle-checkable split: hash(id) mod 100 < frac*100 → left.

    ``randomSplit`` is per-partition RNG (not reproducible in DuckDB);
    this variant is the deterministic contract the correctness gate uses.
    """
    key = shuffle_key(id_col, seed) % F.lit(100)
    left = df.filter(key < F.lit(int(frac * 100)))
    right = df.filter(key >= F.lit(int(frac * 100)))
    return left, right


def weighted_multinomial_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    n_probes: int = 8,
    salt: str = "ws",
    bucket_size: int = 100,
) -> DataFrame:
    """Deterministic weighted (multinomial, with-replacement) sampling by
    integer inverse-CDF: probe j lands at ``md5(salt‖j) mod total_weight``
    and selects the row whose cumulative-weight interval contains it —
    rows are drawn with probability ∝ weight, reproducibly on any engine
    (all arithmetic is bigint; no RNG, no libm).

    Scale shape: the global running sum is built TWO-PHASE, not with a
    single-partition window — per-bucket subtotals (tiny) get prefix
    offsets, then the within-bucket cumsum windows are partitioned by
    bucket and run in parallel. The probes (n_probes rows) broadcast
    against the cumulative table; matching is a broadcast range probe,
    never a shuffle. This is the exact-sampling analogue of SA1/SA2 for
    weight-proportional corpus subsetting (e.g. sampling documents ∝
    token count for a training mix)."""
    w = F.col(weight_col).cast("long")
    bucket = F.floor(F.col(id_col) / bucket_size).cast("long")
    base = df.select(F.col(id_col), w.alias("_w"), bucket.alias("_bkt"))

    offsets = (
        base.groupBy("_bkt")
        .agg(F.sum("_w").alias("_bw"))
        .withColumn(
            "_off",
            F.sum("_bw").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_bkt", F.coalesce("_off", F.lit(0)).alias("_off"))
    )
    cum = (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_hi",
            F.col("_off")
            + F.sum("_w").over(
                Window.partitionBy("_bkt")
                .orderBy(id_col)
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select(id_col, "_w", (F.col("_hi") - F.col("_w")).alias("_lo"), "_hi")
    )
    total = base.agg(F.sum("_w").alias("_total"))
    probes = (
        df.sparkSession.range(n_probes)
        .select(F.col("id").alias("probe"))
        .join(F.broadcast(total))
        .select(
            "probe",
            (md5_long(F.col("probe").cast("string"), salt=salt) % F.col("_total")).alias("_u"),
        )
    )
    return (
        cum.join(
            F.broadcast(probes),
            (F.col("_u") >= F.col("_lo")) & (F.col("_u") < F.col("_hi")),
        )
        .select("probe", id_col, F.col("_w").alias("weight"))
    )


def mixture_sample(
    df: DataFrame,
    mix: dict[str, float],
    budget: int,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Training-mix assembly: draw a deterministic sample with per-source
    quotas ``k_s = round(budget × share_s)`` — the 'data mixing' step of
    corpus construction (e.g. 50% web / 30% books / 20% code), here with
    the same engine-portable surrogate order as SA1 (multiplicative hash
    of the row id; no RNG, identical rank on any engine/partitioning).

    Scale shape: one shuffle on the source key for the per-source rank
    window; sources with share 0 are filtered at the scan (pushed
    predicate), so unmixed data is never read. Exact-k per source, like
    the reference's per-class sampler (SURVEY SA1), not
    expected-fraction."""
    quotas = {s: int(round(budget * share)) for s, share in mix.items()}
    quota_col = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(k))
            for s, k in sorted(quotas.items())
        ],
        F.lit(0),
    )
    w = Window.partitionBy(source_col).orderBy(
        shuffle_key(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(source_col).isin(list(quotas)))
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= quota_col)
        .select(
            F.col(source_col),
            F.col(id_col),
            F.col("__rank").alias("mix_rank"),
        )
    )


def domain_quota_sample(
    df: DataFrame,
    url_col: str = "url",
    max_per_host: int = 10,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-registered-domain document cap — the crawl-balance rule of
    RefinedWeb (Penedo et al. 2023) / Dolma: no single host may
    contribute more than ``max_per_host`` documents, so hot domains
    (forums, link farms) cannot dominate the training mix. Staged r16
    (r19 registration candidate).

    Per input row: the normalized ``host`` (the same pure-Catalyst
    normalization as :func:`..dedup.normalize_url` — URL-level dedup
    and domain quotas run on the same key), the host's total document
    count, the row's deterministic ``rank_in_host`` under the
    multiplicative-hash surrogate order (crawl-order-free: the kept
    subset is a pseudo-random per-host sample, the
    :func:`stratified_sample` contract with a derived stratum), and
    ``is_kept`` = rank ≤ quota.

    Scale shape at 100 TB: ONE exchange keyed by host; the count and
    the rank window share that partitioning (one Exchange, one Sort in
    the plan). Host cardinality at web scale is ~10⁷ registered
    domains with crawl-shaped skew; a pathological single-host corpus
    degrades to one partition — the same bound as any per-key window,
    mitigated the stratified_sample way (salt the hot stratum, AQE
    skew handling on the exchange)."""
    from .dedup import normalize_url

    host, _key = normalize_url(url_col)
    w = Window.partitionBy("host")
    return (
        df.select(F.col(id_col), host.alias("host"))
        .withColumn("n_host_docs", F.count(F.lit(1)).over(w))
        .withColumn(
            "rank_in_host",
            F.row_number().over(
                w.orderBy(shuffle_key(id_col, seed).asc(), F.col(id_col).asc())
            ),
        )
        .withColumn("is_kept", F.col("rank_in_host") <= max_per_host)
    )
