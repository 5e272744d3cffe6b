"""validate_table: every rule kind must count its violations exactly on a
hand-built dirty table (nulls, duplicate keys, out-of-range values, bad
set members, dangling foreign keys)."""

from __future__ import annotations

from kafka_etl_consumer_spark.operators.validate import validate_table


def test_validate_counts_every_rule_kind(spark):
    rows = [
        (1, 10, "A", 5.0),
        (2, 10, "A", -1.0),   # range violation
        (2, 20, "B", 3.0),    # duplicate id=2
        (None, 30, "C", 2.0), # null id; "C" not in set; fk 30 dangling
        (4, None, "A", 0.0),  # null fk -> ref violation; 0.0 fails > 0
    ]
    df = spark.createDataFrame(rows, "id long, fk long, status string, v double")
    ref = spark.createDataFrame([(10,), (20,)], "k long")

    got = {
        r.rule: r.n_violations
        for r in validate_table(
            df,
            not_null=["id"],
            expr=[("v_positive", "v > 0"), ("status_in_set", "status IN ('A','B')")],
            unique=["id"],
            ref=[("fk_ref", "fk", ref, "k")],
        ).collect()
    }
    assert got == {
        "rows_scanned": 5,
        "not_null:id": 1,
        "expr:v_positive": 2,       # -1.0 and 0.0
        "expr:status_in_set": 1,    # "C"
        "unique:id": 1,             # one extra copy of id=2
        "ref:fk_ref": 2,            # fk=30 dangling, fk=NULL unmatched
    }
