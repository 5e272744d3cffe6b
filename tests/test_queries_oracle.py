"""Every registered query must hash-match its DuckDB oracle — the local
mirror of the driver's CORRECTNESS gate (run at sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from kafka_etl_consumer_spark.plans import ORACLES, QUERIES
from tests.oracle_util import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


def test_all_queries_have_oracles_or_are_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops are allowed to omit oracles, but keep the list
    # explicit so nothing drops out silently
    allowed_missing = {"agg_approx_distinct"}  # HLL differs per engine
    assert missing <= allowed_missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    compare(QUERIES[name](spark, sf_dir), con, ORACLES[name], name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
