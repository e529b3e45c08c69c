"""Local mirror of the driver's DuckDB-oracle comparison.

The driver canonicalizes BOTH result sets through pandas: Spark via
``toPandas()``, the oracle via duckdb's ``.df()`` (where HUGEINT — the
result type of ``sum(int)`` — maps to float64), sorts columns by name,
sorts rows via ``DataFrame.sort_values`` over all columns (which dies
with ``TypeError: unhashable type: 'list'`` on array cells), and hashes
values dtype-sensitively (int64 11901 != float64 11901.0).

Round-4 shipped two red driver rows that the previous tuple-based local
harness waved through; this rewrite reproduces both failure modes:

* array/list output columns -> hard failure (same as the driver crash);
* integer-vs-float representation drift -> value mismatch.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon_cell(v):
    """Dtype-sensitive canonical form of one cell, mirroring what survives
    the driver's value hash. Ints and floats canonicalize DIFFERENTLY on
    purpose: DuckDB HUGEINT->float64 vs Spark bigint must mismatch here
    exactly as it does on the driver."""
    if v is None:
        return "<NULL>"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise TypeError("unhashable type: 'list' (array column in result)")
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "<NULL>"
        return ("f", repr(f))
    if v is pd.NaT:
        return "<NULL>"
    if isinstance(v, pd.Timestamp):
        if v.time() == datetime.time(0, 0):
            return ("d", v.date().isoformat())
        return ("d", v.isoformat())
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return ("d", v.date().isoformat())
        return ("d", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("x", bytes(v).hex())
    if isinstance(v, str):
        return ("s", v)
    return ("o", repr(v))


def _canon_frame(pdf: pd.DataFrame, name: str, side: str):
    """Column-sort, row-sort (the driver's pandas path — raises on list
    cells), then canonicalize every cell. Returns (cols, rows)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # Explicit array check first: pandas versions differ in whether a
    # single-column sort_values crashes on lists; the driver's multi-col
    # hashtable path always does, so we always do.
    for c in cols:
        for v in pdf[c].head(50):
            if isinstance(v, (list, tuple, np.ndarray)):
                raise TypeError(
                    f"{name} [{side}] column {c!r}: unhashable type: 'list' "
                    "— array output columns crash the driver's canonicalizer"
                )
    pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    # Canonical cells are homogeneous tuples/strings — re-sort on them so
    # ties broken differently by dtype-specific sort_values can't diverge.
    rows.sort(key=lambda t: tuple(str(x) for x in t))
    return cols, rows


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    """Return (ok, message). Driver-faithful comparison: pandas on both
    sides, dtype-sensitive values, array columns are a hard failure."""
    con = duckdb_conn(sf_dir)
    try:
        o_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()
    s_pdf = spark_df.toPandas()

    if sorted(s_pdf.columns) != sorted(o_pdf.columns):
        return False, (
            f"{name}: column mismatch spark={sorted(s_pdf.columns)} "
            f"oracle={sorted(o_pdf.columns)}"
        )
    if len(s_pdf) != len(o_pdf):
        return False, f"{name}: row count spark={len(s_pdf)} oracle={len(o_pdf)}"

    try:
        _, s_rows = _canon_frame(s_pdf, name, "spark")
        o_names, o_rows = _canon_frame(o_pdf, name, "oracle")
    except (TypeError, ValueError) as e:
        return False, f"{name}: driver-canonicalization failure: {e}"

    bad = []
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            bad.append((i, a, b))
            if len(bad) >= 3:
                break
    if bad:
        msg = f"{name}: value mismatch (cols={o_names}); first diffs: " + "; ".join(
            f"row{i}: spark={a} oracle={b}" for i, a, b in bad
        )
        return False, msg
    return True, f"{name}: OK ({len(s_rows)} rows)"
