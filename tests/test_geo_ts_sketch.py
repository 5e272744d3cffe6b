"""Unit tests for the batch-10 operators: geo radius join, deterministic
HLL, OHLC resampling, EWMA. (Their end-to-end hash checks run in
test_queries_oracle.py like every registered query; these cover the
operator-level contracts the queries rely on.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.operators.geo import haversine_km, radius_join
from kafka_etl_consumer_spark.operators.sketch import hll_distinct
from kafka_etl_consumer_spark.operators.timeseries import ewma_last, resample_bars


def test_haversine_known_distance(spark):
    # one degree of latitude at the equator ~ 111.19 km
    df = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("d")
    )
    d = df.collect()[0].d
    assert abs(d - 111.19) < 0.1


def test_radius_join_matches_brute_force(spark):
    # lattice points 0.05 deg apart around (0,0): brute-force vs grid join
    pts = [
        Row(pid=i, lat=(i % 13) * 0.05 - 0.3, lon=(i // 13) * 0.05 - 0.3)
        for i in range(169)
    ]
    df = spark.createDataFrame(pts)
    left = df.select(
        F.col("pid").alias("a"), F.col("lat").alias("l_lat"), F.col("lon").alias("l_lon")
    )
    right = df.select(
        F.col("pid").alias("b"), F.col("lat").alias("r_lat"), F.col("lon").alias("r_lon")
    )
    got = {
        (r.a, r.b)
        for r in radius_join(left, right, 10.0).select("a", "b").collect()
    }

    def hav(p, q):
        rad = math.radians
        dlat, dlon = rad(q.lat - p.lat), rad(q.lon - p.lon)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(rad(p.lat)) * math.cos(rad(q.lat)) * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    want = {
        (p.pid, q.pid) for p in pts for q in pts if round(hav(p, q), 3) <= 10.0
    }
    assert got == want


def test_radius_join_rejects_oversize_radius(spark):
    df = spark.createDataFrame([Row(a=1, l_lat=0.0, l_lon=0.0)])
    with pytest.raises(ValueError):
        radius_join(df, df, 80.0)


def test_radius_join_rejects_out_of_range_latitude(spark):
    # |lat| > 45 silently shrinks the 1-degree-cell containment bound, so
    # the in-plan guard must raise at execution rather than drop pairs
    left = spark.createDataFrame(
        [Row(a=1, l_lat=60.0, l_lon=0.0)]
    )
    right = spark.createDataFrame([Row(b=1, r_lat=0.0, r_lon=0.0)])
    with pytest.raises(Exception, match="lat"):
        radius_join(left, right, 10.0).collect()


def test_hll_ignores_null_values(spark):
    # distinct-count semantics: NULL contributes nothing. A NULL value
    # must not create a phantom NULL register that inflates __present and
    # skews the linear-counting correction.
    from kafka_etl_consumer_spark.operators.sketch import hll_registers

    base = spark.range(200).select((F.col("id") % 50).alias("v"))
    with_nulls = base.union(
        spark.range(30).select(F.lit(None).cast("long").alias("v"))
    )
    regs = hll_registers(with_nulls, "v")
    assert regs.filter(F.col("__reg").isNull()).count() == 0
    e_clean = hll_distinct(base, "v").collect()[0].hll_estimate
    e_nulls = hll_distinct(with_nulls, "v").collect()[0].hll_estimate
    assert e_clean == e_nulls


def test_hll_estimate_within_expected_error(spark):
    # m=64 -> relative error ~ 1.04/8 = 13%; 1000 distinct values
    df = spark.range(5000).select((F.col("id") % 1000).alias("v"))
    est = hll_distinct(df, "v").collect()[0].hll_estimate
    assert 700 < est < 1300


def test_hll_merges_by_register_max(spark):
    # union of two halves == whole: HLL state must merge by max, so the
    # estimate over the union equals the estimate computed from all rows
    whole = spark.range(2000).select((F.col("id") % 500).alias("v"))
    a = whole.filter(F.col("id") % 2 == 0)
    b = whole.filter(F.col("id") % 2 == 1)
    e_whole = hll_distinct(whole, "v").collect()[0].hll_estimate
    e_union = hll_distinct(a.union(b), "v").collect()[0].hll_estimate
    assert e_whole == e_union


def test_hll_rejects_bad_m(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_distinct(df, "v", m=48)


def test_resample_bars_open_close_deterministic(spark):
    rows = [
        Row(ts="2024-01-01 00:00:01", value=10.0, event_id=2),
        Row(ts="2024-01-01 00:00:01", value=20.0, event_id=1),  # same second!
        Row(ts="2024-01-01 00:59:00", value=5.0, event_id=3),
        Row(ts="2024-01-01 06:10:00", value=7.0, event_id=4),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    bars = {
        r.bucket_ts.hour: r
        for r in resample_bars(df, every="6 hours").collect()
    }
    b0 = bars[0]
    # open = event_id 1 (ties on the second broken by event_id), close = 3
    assert (b0.open, b0.close, b0.high, b0.low, b0.n) == (20.0, 5.0, 20.0, 5.0, 3)
    assert bars[6].n == 1


def test_ewma_fold_matches_reference_recursion(spark):
    rows = [
        Row(user_id=1, ts="2024-01-01 00:00:0%d" % i, event_id=i, value=float(v))
        for i, v in enumerate([1, 2, 4, 8])
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    got = ewma_last(df, alpha=0.5).collect()[0]
    s = 1.0
    for v in [2.0, 4.0, 8.0]:
        s = 0.5 * v + 0.5 * s
    assert got.n_events == 4
    assert got.ewma == round(s, 6)


def test_ssjoin_prefix_matches_brute_force(spark):
    # adversarial micro-corpus: shared stopwords, one near-dup pair, one
    # exact dup, singletons; prefix filter must find exactly what
    # brute-force Jaccard >= 1/2 finds
    from itertools import combinations

    from kafka_etl_consumer_spark.operators.dedup import (
        set_similarity_join_prefix,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over a lazy cat",
        3: "the quick brown fox jumps over the lazy dog",
        4: "completely different words entirely here now",
        5: "the a of and or but",
        6: "the a of and or but maybe",
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    got = {
        (r.id_a, r.id_b): r.jac
        for r in set_similarity_join_prefix(df, 1, 2).collect()
    }
    want = {}
    sets = {k: set(v.split()) for k, v in texts.items()}
    for a, b in combinations(sorted(sets), 2):
        o = len(sets[a] & sets[b])
        jac = round(o / (len(sets[a]) + len(sets[b]) - o), 6)
        if jac >= 0.5:
            want[(a, b)] = jac
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 1.0  # the exact dup survived


def test_pq_assign_rejects_indivisible_dims(spark):
    from kafka_etl_consumer_spark.operators.embeddings import pq_assign

    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0] * 10)])
    with pytest.raises(ValueError):
        pq_assign(df, dims=10, subspaces=8)


def test_pq_assign_seed_vectors_code_themselves(spark):
    # a codebook seed vector reconstructs itself exactly: code == vec_id,
    # sqerr == 0 in every subspace
    from kafka_etl_consumer_spark.operators.embeddings import pq_assign

    rows = [
        Row(vec_id=i, embedding=[float(i * 16 + d) for d in range(16)])
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    out = pq_assign(df, dims=16, subspaces=2, codebook_size=4)
    for r in out.collect():
        assert r.code == r.vec_id and r.sqerr == 0.0


def test_pca_recovers_dominant_direction(spark):
    # vectors concentrated along e1 with small e2 noise: the top component
    # must be ~±e1 and explain almost all variance
    from kafka_etl_consumer_spark.operators.embeddings import pca_top_component

    rows = [
        Row(vec_id=i, embedding=[float(i + 1), 0.01 * ((-1) ** i), 0.0, 0.0])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    got = pca_top_component(df, dims=4, iters=3).collect()[0]
    comp = got.component
    assert abs(comp[0]) > 0.999
    assert got.explained_ratio > 0.999
    assert comp[0] > 0  # sign canonicalized


def test_new_operators_handle_empty_input(spark):
    # empty inputs must yield empty results with the right schema — the
    # first micro-batch of any streaming use hits exactly this
    from kafka_etl_consumer_spark.operators.dedup import (
        set_similarity_join_prefix,
    )
    from kafka_etl_consumer_spark.operators.timeseries import (
        ewma_last,
        resample_bars,
    )

    empty_ev = spark.createDataFrame(
        [],
        "user_id long, ts timestamp, value double, event_id long",
    )
    e = ewma_last(empty_ev, alpha=0.3)
    assert e.count() == 0
    assert e.columns == ["user_id", "n_events", "ewma"]

    b = resample_bars(empty_ev.withColumn("event_type", F.lit("x")))
    assert b.count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    s = set_similarity_join_prefix(empty_docs, 1, 2)
    assert s.count() == 0
    assert s.columns == ["id_a", "id_b", "jac"]


def test_pca_arrow_and_codegen_paths_agree(spark):
    from kafka_etl_consumer_spark.operators.embeddings import pca_top_component

    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + d * 3) % 11) for d in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    a = pca_top_component(df, dims=8, iters=3, use_arrow=True).collect()[0]
    b = pca_top_component(df, dims=8, iters=3, use_arrow=False).collect()[0]
    assert a.explained_ratio == b.explained_ratio
    assert a.component == b.component  # re-rounding pins both paths bit-equal


def test_holt_matches_python_recursion(spark):
    import datetime as dt

    from kafka_etl_consumer_spark.operators.timeseries import holt_last

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]
    rows = [
        Row(user_id=1, ts=base + dt.timedelta(minutes=i), value=v, event_id=i)
        for i, v in enumerate(vals)
    ] + [Row(user_id=2, ts=base, value=7.0, event_id=99)]
    df = spark.createDataFrame(rows)
    got = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_1)
        for r in holt_last(df, alpha=0.3, beta=0.2).collect()
    }
    a, b = 0.3, 0.2
    oma, omb = 1.0 - a, 1.0 - b
    lvl, trd = vals[0], 0.0
    for x in vals[1:]:
        prev = lvl
        lvl = a * x + oma * (lvl + trd)
        trd = b * (lvl - prev) + omb * trd
    assert got[1] == (
        len(vals), round(lvl, 6), round(trd, 6), round(lvl + trd, 6)
    )
    # single-observation key: level = x, trend = 0
    assert got[2] == (1, 7.0, 0.0, 7.0)
