"""Batch-26 invariant tests: balanced-to-minority accounting, hand-
computed regression metrics, ABC-XYZ cell placement incl. boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row


def test_balanced_downsample_to_minority(spark, tmp_path):
    rows = [(0, 3), (1, 1), (2, 2)]  # label -> count; minority = 1
    data = []
    vid = 0
    for lb, n in rows:
        for _ in range(n):
            data.append(Row(vec_id=vid, label=lb, embedding=[0.0, 1.0]))
            vid += 1
    spark.createDataFrame(data).write.parquet(str(tmp_path / "embeddings.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline21 import (
        sample_balanced_classes,
    )

    got = {
        r.label: (r.n_before, r.n_kept, r.keep_frac)
        for r in sample_balanced_classes(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (3, 1, round(1 / 3, 6)),
        1: (1, 1, 1.0),
        2: (2, 1, 0.5),
    }


def test_regression_metrics_hand_computed(spark, tmp_path):
    rows = [("1-URGENT", 1.0), ("1-URGENT", 3.0), ("5-LOW", 5.0)]
    spark.createDataFrame(
        [
            Row(o_orderkey=i, o_orderpriority=g, o_totalprice=y)
            for i, (g, y) in enumerate(rows)
        ]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline21 import (
        eval_regression_metrics,
    )

    r = eval_regression_metrics(spark, str(tmp_path)).collect()[0]
    # residuals vs group means (2, 2, 5): [-1, 1, 0]
    assert r.n_orders == 3
    assert r.mae == round(2 / 3, 4)
    assert r.rmse == round((2 / 3) ** 0.5, 4)
    # ybar = 3, SStot = 8, SSres = 2 -> R2 = 0.75
    assert r.r2 == 0.75


def test_abc_xyz_cells_and_boundaries(spark, tmp_path):
    mon = dt.datetime(2024, 1, 1)  # a Monday

    def wk(i):
        return mon + dt.timedelta(weeks=i)

    lines = []
    # part 1: rev 80 (cum 0.8 -> A, boundary inclusive), 4 weeks x 1 line
    for i in range(4):
        lines.append((1, wk(i), 20.0))
    # part 2: rev 15 (cum 0.95 -> B), weeks with 1 and 5 lines -> CV
    # score sqrt(2*26-36)/6 = 2/3 -> Y
    lines.append((2, wk(0), 2.5))
    for _ in range(5):
        lines.append((2, wk(1), 2.5))
    # part 3: rev 5 (cum 1.0 -> C), single week -> zero variability -> X
    lines.append((3, wk(0), 5.0))
    spark.createDataFrame(
        [
            Row(l_orderkey=i, l_partkey=p, l_shipdate=d, l_extendedprice=v)
            for i, (p, d, v) in enumerate(lines)
        ]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline21 import (
        orders_abc_xyz_class,
    )

    got = sorted(
        (r.abc, r.xyz, r.n_parts, r.revenue)
        for r in orders_abc_xyz_class(spark, str(tmp_path)).collect()
    )
    assert got == [
        ("A", "X", 1, 80.0),
        ("B", "Y", 1, 15.0),
        ("C", "X", 1, 5.0),
    ]
