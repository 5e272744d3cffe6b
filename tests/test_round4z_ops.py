"""Batch-38 invariant tests: classical statistics on planted data with
hand-computed closed-form expectations (no scipy in the container — the
expected values below are derived in the comments)."""

from __future__ import annotations

from pyspark.sql import Row


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [Row(event_id=i, user_id=u, event_type=et, value=float(v))
         for i, (u, et, v) in enumerate(rows)]
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_kruskal_wallis_two_clean_groups(spark, tmp_path):
    # one status, groups A=[1,2,3] B=[7,8,9]: ranks 1..6, R_A=6, R_B=15
    # H = 12/(6*7) * (36/3 + 225/3) - 3*7 = 27/7 ≈ 3.857143, no ties
    rows = [("O", "A", 1.0), ("O", "A", 2.0), ("O", "A", 3.0),
            ("O", "B", 7.0), ("O", "B", 8.0), ("O", "B", 9.0)]
    spark.createDataFrame(
        [Row(o_orderkey=i, o_orderstatus=s, o_orderpriority=g, o_totalprice=v)
         for i, (s, g, v) in enumerate(rows)]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
        stats_kruskal_wallis,
    )

    [r] = stats_kruskal_wallis(spark, str(tmp_path)).collect()
    assert r.k_groups == 2 and r.n_total == 6 and r.df == 1
    assert r.h_stat == round(27 / 7, 6)
    assert 0.0 <= r.p_value <= 1.0


def test_levene_brown_forsythe_planted(spark, tmp_path):
    # A=[1,2,3] med 2 devs [1,0,1]; B=[10,20,30] med 20 devs [10,0,10]
    # num = 3*(2/3-11/3)^2*2 = 54 ; den = (2-4/3)+(200-400/3) = 202/3
    # W = (6-2)/(2-1) * 54/(202/3) = 648/202 ≈ 3.207921
    rows = [(1, "A", 1), (2, "A", 2), (3, "A", 3),
            (4, "B", 10), (5, "B", 20), (6, "B", 30)]
    _write_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
        stats_levene_test,
    )

    [r] = stats_levene_test(spark, str(tmp_path)).collect()
    assert r.k_groups == 2 and r.n_total == 6
    assert r.df1 == 1 and r.df2 == 4
    assert r.w_stat == round(648 / 202, 6)


def test_jarque_bera_symmetric_group(spark, tmp_path):
    # [1,2,3]: m2=2/3, m3=0 (skew 0), m4=2/3 -> exk = 1.5-3 = -1.5
    # JB = 3/6 * (0 + 2.25/4) = 0.28125
    _write_events(spark, tmp_path, [(1, "A", 1), (2, "A", 2), (3, "A", 3)])
    from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
        stats_jarque_bera,
    )

    [r] = stats_jarque_bera(spark, str(tmp_path)).collect()
    assert r.skewness == 0.0
    assert r.excess_kurtosis == -1.5
    assert r.jb_stat == 0.28125


def test_effect_sizes_unit_shift(spark, tmp_path):
    # cohort0 = [1,2,3], cohort1 = [2,3,4]: means 2 vs 3, each var 1 ->
    # d = -1; g = d * (1 - 3/(4*6-9)) = -0.8
    # Cliff's delta: U1 = R1 - n1(n1+1)/2 = 8 - 6 = 2 -> 2*2/9-1 = -5/9
    rows = [(0, "A", 1), (2, "A", 2), (4, "A", 3),
            (1, "A", 2), (3, "A", 3), (5, "A", 4)]
    _write_events(spark, tmp_path, rows)
    from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
        stats_effect_sizes,
    )

    [r] = stats_effect_sizes(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.cohens_d == -1.0
    assert r.hedges_g == -0.8
    assert r.cliffs_delta == round(-5 / 9, 6)


def test_neyman_allocation_proportional_to_n_times_s(spark, tmp_path):
    # A=[1,2,3] sd 1; B=[10,12,14] sd 2; equal N -> shares 1/3 and 2/3
    rows = [("S1", 1.0), ("S1", 2.0), ("S1", 3.0),
            ("S2", 10.0), ("S2", 12.0), ("S2", 14.0)]
    spark.createDataFrame(
        [Row(c_custkey=i, c_mktsegment=s, c_acctbal=v)
         for i, (s, v) in enumerate(rows)]
    ).write.parquet(str(tmp_path / "customer.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline33 import (
        stats_neyman_allocation,
    )

    got = {r.c_mktsegment: r for r in
           stats_neyman_allocation(spark, str(tmp_path)).collect()}
    assert got["S1"].stddev == 1.0 and got["S2"].stddev == 2.0
    assert got["S1"].alloc_share == round(1 / 3, 6)
    assert got["S2"].alloc_share == round(2 / 3, 6)
    assert got["S1"].alloc_n == 333 and got["S2"].alloc_n == 666
