"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, sort columns by name, sort
rows, compare values exactly. Catches hash mismatches before the driver
does."""

from __future__ import annotations

import math
import os

import duckdb

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


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    """Return (ok, message). Exact value comparison after col/row sort."""
    con = duckdb_conn(sf_dir)
    try:
        orc = con.execute(oracle_sql)
        o_cols = [d[0] for d in orc.description]
        o_rows = orc.fetchall()
    finally:
        con.close()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(o_cols):
        return False, f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    _, s_norm = _normalize(s_rows, s_cols)
    o_names, o_norm = _normalize(o_rows, o_cols)
    bad = []
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
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
