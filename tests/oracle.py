"""Local Spark-vs-DuckDB compare, mirroring the driver's correctness gate:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb

from amsterdam_map_data_wrangling_spark.schemas import STAR_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in STAR_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


def rows_canonical(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    shaped = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(shaped, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs {len(d_rows)}"
    s_canon = rows_canonical(s_cols, s_rows)
    d_canon = rows_canonical(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        assert a == b, f"row {i}: spark={a!r} duckdb={b!r}"
