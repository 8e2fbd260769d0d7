"""Replicates the driver's Spark-vs-DuckDB comparison so every catalog
query is self-checked before the driver ever sees it: row count, column
names, and order-insensitive cell values (exact for ints/strings/dates,
tight tolerance for doubles)."""

from __future__ import annotations

import math

import duckdb

from realtime_gmall_flink_spark.sources.testdata import TABLE_NAMES

REL_TOL = 1e-12


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=REL_TOL, abs_tol=1e-12)
    return a == b


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duck_connection(sf_dir)
    rel = con.sql(oracle_sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    s_sorted = _sorted_rows(s_cols, s_rows)
    d_sorted = _sorted_rows(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if len(sr) != len(dr) or not all(
            _cells_equal(a, b) for a, b in zip(sr, dr)
        ):
            problems.append(f"row {i}: spark={sr!r} duck={dr!r}")
            if len(problems) >= 6:
                problems.append("... (truncated)")
                break
    return problems
