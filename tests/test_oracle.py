"""End-to-end correctness gate: every declared query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01 —
tools/oracle_check.py; reference model: Criteo integration test with an
external numpy oracle, SURVEY §5.5)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from oracle_check import compare, duck_connect  # noqa: E402


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


def _names():
    from torcharrow_spark.queries import QUERIES

    return list(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    assert compare(name, spark, duck, sf_dir, verbose=False)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
