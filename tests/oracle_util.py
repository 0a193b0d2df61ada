"""Local mirror of the driver's Spark-vs-DuckDB correctness compare.

Runs a queries() entry and its oracle_sql() side-by-side, sorts columns
by name and rows by value, and diffs stringified cells — a stricter
local predictor of the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full-precision repr: the driver hashes exact values, so any
        # bit-level float skew must fail locally too (strict predictor).
        return repr(v)
    if isinstance(v, Decimal):
        # scale-preserving: Decimal('321.00') != Decimal('321.0') to the
        # driver's hash, so it must differ here as well.
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def complex_output_columns(spark_df) -> list[str]:
    """Top-level Array/Struct/Map columns in the result schema.

    The driver's pandas canonicalizer sorts result columns and crashes
    on list cells (``TypeError: unhashable type: 'list'`` — the r5
    q_embedding_pool gate failure). Local parity must therefore REJECT
    complex-typed outputs instead of stringifying them, or local green
    does not predict driver green.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    bad = complex_output_columns(spark_df)
    if bad:
        return False, (
            f"complex-typed top-level output columns {bad}: the driver "
            "canonicalizer crashes on non-scalar cells — explode to "
            "scalar rows (id, dim, value) before returning"
        )
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = normalize(s_cols, s_rows)
    dn = normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [
            f"  spark={a}\n  duck ={b}" for a, b in zip(sn, dn) if a != b
        ][:5]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
