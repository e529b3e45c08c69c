"""Cross-engine Unicode case-folding boundary (found by extending the
r11 fuzz soak toward non-ASCII corpora).

The engine's text semantics are SPARK'S — Java's locale-insensitive
``toLowerCase`` with full, current Unicode tables and context-sensitive
folding. The DuckDB oracle harness agrees on the portable subset below
but KNOWINGLY diverges on three classes it cannot express:

1. U+0130 'İ' (Turkish capital dotted I): Java → 'i' + U+0307
   (combining dot above); DuckDB → plain 'i'.
2. Word-final capital sigma: Java folds 'ΟΔΟΣ' → 'οδος' (context rule,
   final ς); DuckDB maps Σ → σ unconditionally (RE2 has no lookahead,
   so the oracle can't emulate the context rule either).
3. A dozen recent-Unicode additions (U+1C89, U+2C2F, U+A7Cx/A7Dx,
   U+A7F5) whose lowercase mappings DuckDB's older tables lack.

The generated-corpus fuzz layer therefore draws from the PORTABLE
subset (tests/test_fuzz_oracle._WORDS); registered queries over real
corpora containing the divergent codepoints would hash-mismatch the
oracle without being wrong — the oracle is the test harness, not the
semantics. These pins exist so a DuckDB/Spark upgrade that MOVES the
boundary fails loudly here instead of mysteriously in a fuzz panel.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

PORTABLE = [
    "Straße", "ÑOÑO", "中文", "ΣΙΓΜΑ", "ẞ", "I", "ǅungla", "ﬀ", "ᾈ",
    "ОФИС", "ÀÉÎÕÜ", "ışık",  # dotless-ı lowers portably; only İ diverges
    # Σ is portable ONLY in non-final position (followed by a letter) —
    # 'ΣΙΓΜΑΣ x' already diverges: Java's final-ς rule fires at WORD
    # end (before space/digit/punct), not just string end.
]
DIVERGENT = ["İ", "ΟΔΟΣ", "ΣΙΓΜΑΣ x", "Ᲊ", "Ⱟ", "Ꟁ"]


def _pairs(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "t string").select(
        "t", F.lower("t").alias("lo")
    )
    sp = {r.t: r.lo for r in df.collect()}
    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT t, lower(t) FROM (SELECT unnest(?) AS t)", [words]
        ).fetchall()
    finally:
        con.close()
    return sp, dict(rows)


def test_lower_agrees_on_the_portable_subset(spark):
    sp, dk = _pairs(spark, PORTABLE)
    for w in PORTABLE:
        assert sp[w] == dk[w], (w, sp[w], dk[w])


def test_lower_known_divergence_boundary(spark):
    """Every member of the divergent list MUST still diverge — if an
    engine upgrade closes (or widens) the gap, this fails and the fuzz
    word pool / this inventory should be revisited."""
    sp, dk = _pairs(spark, DIVERGENT)
    for w in DIVERGENT:
        assert sp[w] != dk[w], (
            f"{w!r} now folds identically ({sp[w]!r}) — the portability "
            "boundary moved; update the inventory and the fuzz word pool"
        )
