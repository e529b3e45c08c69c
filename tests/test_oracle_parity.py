"""Every queries() entry with an oracle must match it exactly — this is a
local mirror of the driver's correctness gate (run at sf0.001 by default,
sf0.01 via SPARK_GRAFT_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .oracle_harness import compare

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare(df, _ORACLES[name], sf_dir, name)
    assert ok, msg


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "dist" in df.columns
