"""Every queries() entry with an oracle must match DuckDB exactly —
the local predictor of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_util import compare, complex_output_columns, duckdb_con

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLE[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    bad = complex_output_columns(df)
    assert not bad, (
        f"{name}: complex-typed top-level output columns {bad} crash the "
        "driver canonicalizer even on rows-only checks"
    )
    assert df.count() >= 0
