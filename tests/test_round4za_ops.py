"""Batch-39 invariant tests: Brier/Murphy decomposition and power-law MLE
on planted data with hand-computed expectations (no scipy in the
container — expected values derived in the comments)."""

from __future__ import annotations

import math

from pyspark.sql import Row


def test_powerlaw_alpha_planted(spark, tmp_path):
    # Star + chain in one order slice: orders are % 20 == 0 to pass the
    # query's slice filter. One order containing parts [1,2,3,4] yields
    # the K4 co-order clique: every vertex has degree 3 (>= dmin 3), so
    # alpha = 1 + 4 / (4 * ln(3 / 2.5)) = 1 + 1/ln(1.2)
    rows = [
        Row(l_orderkey=20, l_partkey=p, l_linenumber=i + 1)
        for i, p in enumerate([1, 2, 3, 4])
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "lineitem.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline34 import (
        graph_degree_powerlaw,
    )

    [r] = graph_degree_powerlaw(spark, str(tmp_path)).collect()
    assert r.n_vertices == 4 and r.n_tail == 4 and r.dmin == 3 and r.d_max == 3
    assert r.alpha_hat == round(1 + 1 / math.log(3 / 2.5), 6)


def test_brier_decomposition_bounds_and_identity_direction(spark, tmp_path):
    # 8 axis-aligned 64-dim vectors: 4 with label 0 pointing along +e0
    # (the centroid direction -> score 1 -> conf 1), 4 with label 1 along
    # -e0 (score -1 -> conf 0). Perfectly calibrated, perfectly sharp:
    # brier = 0, reliability = 0, resolution = uncertainty = 0.25.
    def vec(sign):
        return [float(sign)] + [0.0] * 63

    rows = [Row(vec_id=i, label=0, embedding=vec(1.0)) for i in range(4)] + [
        Row(vec_id=4 + i, label=1, embedding=vec(-1.0)) for i in range(4)
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "embeddings.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline34 import (
        eval_brier_decomposition,
    )

    [r] = eval_brier_decomposition(spark, str(tmp_path)).collect()
    assert r.n_total == 8
    assert r.brier == 0.0
    assert r.reliability == 0.0
    assert r.uncertainty == 0.25
    assert r.resolution == 0.25
