"""Cross-engine parity guards for the formulas the round-5 binned
oracles REPLAY in DuckDB: equi-width bin assignment and quantile_cont
interpolation. The driver's hash gate only exercises the shipped
testdata; these pin the IEEE arithmetic itself on adversarial seeded
inputs (boundary-adjacent values, tiny ranges, heavy ties) so a future
Spark/DuckDB change that breaks expression-for-expression equality
fails loudly here instead of as a mysterious oracle mismatch."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

B = 64


def _seeded_values(n=4000):
    rng = np.random.default_rng(20260815)
    # uniform + boundary-adjacent + ties + denormal-ish spreads
    base = rng.uniform(-1e3, 1e3, n // 2)
    lo, hi = base.min(), base.max()
    edges = lo + (hi - lo) * np.arange(B + 1) / B
    near = np.concatenate([edges, np.nextafter(edges, -np.inf), np.nextafter(edges, np.inf)])
    ties = rng.choice(base[:50], n // 4)
    tiny = rng.uniform(0, 1e-9, n // 8) + 7.25
    return np.concatenate([base, near, ties, tiny]).astype(np.float64)


def test_bin_assignment_matches_duckdb(spark):
    # lo/hi are derived IN-ENGINE from the data, exactly like the
    # binned oracles (a bare float literal in DuckDB SQL parses as
    # DECIMAL, not DOUBLE — the oracles never embed literals for this)
    x = _seeded_values()
    lo, hi = float(x.min()), float(x.max())
    pdf = pd.DataFrame({"x": x})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            F.least(
                F.lit(B - 1), F.floor((F.col("x") - lo) / (hi - lo) * B)
            ).alias("b")
        )
        .toPandas()["b"]
        .to_numpy()
    )
    want = (
        duckdb.sql(
            f"""
            WITH rng AS (SELECT min(x) AS lo, max(x) AS hi FROM pdf)
            SELECT least({B - 1}, CAST(floor((x - lo) / (hi - lo) * {B})
                   AS BIGINT)) AS b
            FROM pdf CROSS JOIN rng
            """
        )
        .df()["b"]
        .to_numpy()
    )
    assert (got == want).all(), (got != want).sum()


def test_grid_quantiles_match_duckdb_quantile_cont(spark):
    from kafka_etl_consumer_spark.operators.ranks import grid_quantiles

    x = _seeded_values(1200)
    g = np.arange(len(x)) % 3
    pdf = pd.DataFrame({"g": g, "x": x})
    sdf = spark.createDataFrame(pdf)
    probs = [0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95]
    names = [f"q{int(p*100):02d}" for p in probs]
    got = {
        r["g"]: [r[n] for n in names]
        for r in grid_quantiles(sdf, ["g"], "x", probs, names)
        .toPandas()
        .to_dict("records")
    }
    qcols = ", ".join(
        f"quantile_cont(x, {p}) AS {n}" for p, n in zip(probs, names)
    )
    want = {
        r["g"]: [r[n] for n in names]
        for r in duckdb.sql(f"SELECT g, {qcols} FROM pdf GROUP BY g")
        .df()
        .to_dict("records")
    }
    for grp in want:
        for a, b, n in zip(got[grp], want[grp], names):
            # round(6) is what every oracle applies before hashing
            assert round(a, 6) == round(b, 6), (grp, n, a, b)


def test_exact_ntile_matches_duckdb_window_ntile(spark):
    """The r6 sharded exact_ntile replays ntile's (rank, n) bucket
    arithmetic instead of running a window — pin it against DuckDB's
    actual window ntile on adversarial sizes: n < k, n == k, n a
    multiple of k, n = k*q + r for every r, plus heavy key ties broken
    only by the id. A convention drift in either engine (first-buckets-
    bigger) fails here instead of as an oracle mismatch."""
    import duckdb as _duck
    from pyspark.sql import Row

    from kafka_etl_consumer_spark.operators.shard import exact_ntile

    rng = np.random.default_rng(20260816)
    for k in (3, 5, 10):
        for n in (1, k - 1, k, k + 1, 4 * k, 4 * k + 3):
            if n < 1:
                continue
            keys = rng.integers(0, max(2, n // 3), n)  # heavy ties
            pdf = pd.DataFrame({"id": np.arange(n), "key": keys.astype(np.float64)})
            got = {
                r["id"]: r["b"]
                for r in exact_ntile(
                    spark.createDataFrame(pdf),
                    ["key", "id"],
                    k,
                    out_col="b",
                    num_shards=7,
                ).collect()
            }
            con = _duck.connect()
            con.register("t", pdf)
            exp = dict(
                con.execute(
                    f"SELECT id, ntile({k}) OVER (ORDER BY key, id) FROM t"
                ).fetchall()
            )
            assert got == exp, (k, n)
