"""Fast inner-loop guard: every registered query must ANALYZE (resolve
columns, types, functions) — no execution. Catches schema drift, bad
references, and API misuse in seconds; the full oracle suite then only
fails on genuine value differences."""

from __future__ import annotations

import pytest

from kafka_etl_consumer_spark.plans import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    schema = df.schema  # triggers analysis only
    assert len(schema.fields) > 0
    # column names must be unique — duplicate names break the driver's
    # sorted-column hash comparison silently
    names = [f.name.lower() for f in schema.fields]
    assert len(names) == len(set(names)), f"duplicate columns in {name}: {names}"


def test_oracles_are_superset_consistent():
    assert set(ORACLES) <= set(QUERIES)
