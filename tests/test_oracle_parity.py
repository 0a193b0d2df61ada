"""Every queries() entry with an oracle must match DuckDB exactly —
the local predictor of the driver's CORRECTNESS gate.

Two scales: the FULL registered-query suite (136 at round 10) runs at the default test SF
(sf0.001, override with ``SPARK_GRAFT_TEST_SF_DIR``), and the 50
queries inside the driver's gate window additionally run at the
driver's OWN scale (sf0.01) — float-sum rounding boundaries only show
up with more rows, so sf0.001 parity alone does not predict the gate
(r8 verdict #5)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from datalake_toolkit_spark.plans import GATE_WINDOW
from tests.oracle_util import compare, complex_output_columns, duckdb_con

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()
GATE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01"
)
WINDOW = list(QUERIES)[:GATE_WINDOW]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.fixture(scope="module")
def gate_con():
    c = duckdb_con(GATE_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", [n for n in WINDOW if n in ORACLE])
def test_gate_window_parity_at_gate_scale(spark, sf_dir, gate_con, name):
    """The in-window queries must be green at the DRIVER's scale, not
    just the local default — this is the gate the round is judged on."""
    if os.path.realpath(sf_dir) == os.path.realpath(GATE_SF_DIR):
        pytest.skip("default SF already at gate scale; covered above")
    df = QUERIES[name](spark, GATE_SF_DIR)
    ok, msg = compare(df, gate_con, ORACLE[name])
    assert ok, f"{name} @ {GATE_SF_DIR}: {msg}"


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
