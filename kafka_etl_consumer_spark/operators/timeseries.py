"""Time-series resampling and smoothing operators.

The reference has no time-series surface (pass-through ETL); these extend
the analytics surface Spark-first:

- :func:`resample_bars` — OHLC downsampling, pure JVM (`min_by`/`max_by`
  over a composite event-order key inside ONE hash aggregate).
- :func:`ewma_last` — exponentially weighted moving average, the canonical
  *inherently sequential* per-key recursion: implemented as an Arrow-batched
  ``applyInPandas`` (grouped map), the documented slow path — there is no
  built-in DataFrame expression for an unbounded recursive fold. State is
  one float per key; the shuffle is one hash partition by key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resample_bars(
    df: DataFrame,
    every: str = "6 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Downsample an event stream to OHLC bars per ``every`` bucket.

    open/close are the values at the min/max of a composite order key
    ``epoch_micros(ts) * 1000 + order_col % 1000`` — timestamps alone can
    tie (and do, in any real feed); the composite makes the bar
    deterministic cross-engine (`arg_min` on the same key in the oracle;
    microseconds, not `unix_timestamp`'s truncated seconds, so both
    engines order identically). The key stays < 2^63 through year 2261.

    ONE shuffle: the (group, bucket) hash-agg; min_by/max_by partials
    collapse map-side like any other agg pair.
    """
    gcols = list(group_cols or [])
    # cast: parquet TIMESTAMP_NTZ → TIMESTAMP (identity under the UTC
    # session timezone the registry pins; unix_micros rejects NTZ input)
    key = (
        F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)
        + F.col(order_col) % 1000
    ).alias("__k")
    v = F.col(value_col)
    return (
        df.select(*gcols, F.window(ts_col, every).alias("__w"), v.alias("__v"), key)
        .groupBy(*gcols, F.col("__w.start").alias("bucket_ts"))
        .agg(
            F.min_by("__v", "__k").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max_by("__v", "__k").alias("close"),
            F.count(F.lit(1)).alias("n"),
            # mean in EXACT integer arithmetic: the 2dp source values
            # sum exactly as cents, and the 6dp half-up rounding is one
            # integer division — float accumulation order made a bucket
            # whose true mean is exactly 56.4133125 round differently
            # per run, and Spark (binary-value HALF_UP) and DuckDB
            # (shortest-decimal half-away) disagree on boundary doubles
            # BY DESIGN, so no double-path rounding can fix it (r10
            # full-sweep catch; such boundaries are common here because
            # cent-sums over n = 2^a*5^b buckets terminate at 7 digits)
            (
                F.sum(F.round(F.col("__v") * 100, 0).cast("long")) * 20000
                + F.count(F.lit(1))
            ).alias("__num"),
        )
        .withColumn(
            "mean_value",
            F.expr("__num div (2 * n)").cast("double") / 1e6,
        )
        .drop("__num")
    )


def ewma_last(
    df: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Final EWMA value per key: s_0 = x_0; s_t = alpha*x_t + (1-alpha)*s_{t-1}
    over rows ordered by (ts, order_col).

    Returns (key_col, n_events, ewma) with ewma rounded to 6. The fold is
    an explicit ``alpha*x + (1-alpha)*s`` recursion — NOT pandas ``ewm``,
    whose internal weighted-average formulation rounds differently at the
    ulp; the oracle's ``list_reduce`` lambda spells the identical
    operation sequence (including computing ``1 - alpha`` as an IEEE
    subtraction), so an inherently sequential operator still gets a
    hash-exact oracle.

    Shape: ONE shuffle — ``repartition(key)`` + ``sortWithinPartitions``
    makes each key's rows contiguous and ordered, then a mapInPandas SCAN
    folds the whole partition with O(1) carry-over state across Arrow
    batches (key-change detection emits each finished key). Measured 6x
    faster at sf0.1 than the per-group ``applyInPandas`` form, whose
    pandas per-group dispatch dominated; same single-shuffle cost,
    per-row state instead of per-group buffers, so a million-event key
    streams through without a group-sized buffer.
    """
    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("n_events", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    beta = 1.0 - alpha

    def fold(batches):
        last_key, s, n = None, 0.0, 0
        out_k: list = []
        out_n: list = []
        out_s: list = []
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            for k, x in zip(keys, vals):
                if last_key is None or k != last_key:
                    if last_key is not None:
                        out_k.append(last_key)
                        out_n.append(n)
                        out_s.append(round(s, 6))
                    last_key, s, n = k, float(x), 1
                else:
                    s = alpha * float(x) + beta * s
                    n += 1
        if last_key is not None:
            out_k.append(last_key)
            out_n.append(n)
            out_s.append(round(s, 6))
        if out_k:
            yield pd.DataFrame(
                {key_col: out_k, "n_events": out_n, "ewma": out_s}
            )

    part = (
        df.select(key_col, ts_col, value_col, order_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, order_col)
    )
    return part.mapInPandas(fold, schema)


def holt_last(
    df: DataFrame,
    alpha: float,
    beta: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Final Holt linear-trend state per key (double exponential
    smoothing): l_0 = x_0, b_0 = 0, then

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    over rows ordered by (ts, order_col). Returns (key_col, n_events,
    level, trend, forecast_1) with floats rounded to 6 — forecast_1 =
    level + trend is the one-step-ahead prediction.

    Same scan-fold shape as :func:`ewma_last` (ONE repartition+sort,
    mapInPandas with O(1) carry state across Arrow batches), with a
    two-double carry instead of one. The complements ``1 - alpha`` /
    ``1 - beta`` are computed ONCE in Python and spelled as literals in
    the oracle, so both engines fold the identical IEEE sequence — which
    is what lets an inherently sequential operator keep a hash-exact
    recursive-CTE oracle."""
    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("n_events", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_1", T.DoubleType()),
        ]
    )
    oma = 1.0 - alpha
    omb = 1.0 - beta

    def fold(batches):
        last_key, lvl, trd, n = None, 0.0, 0.0, 0
        out: dict[str, list] = {k: [] for k in (key_col, "n", "l", "b", "f")}

        def emit():
            out[key_col].append(last_key)
            out["n"].append(n)
            out["l"].append(round(lvl, 6))
            out["b"].append(round(trd, 6))
            out["f"].append(round(lvl + trd, 6))

        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            for k, x in zip(keys, vals):
                if last_key is None or k != last_key:
                    if last_key is not None:
                        emit()
                    last_key, lvl, trd, n = k, float(x), 0.0, 1
                else:
                    prev = lvl
                    lvl = alpha * float(x) + oma * (lvl + trd)
                    trd = beta * (lvl - prev) + omb * trd
                    n += 1
        if last_key is not None:
            emit()
        if out[key_col]:
            yield pd.DataFrame(
                {
                    key_col: out[key_col],
                    "n_events": out["n"],
                    "level": out["l"],
                    "trend": out["b"],
                    "forecast_1": out["f"],
                }
            )

    part = (
        df.select(key_col, ts_col, value_col, order_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, order_col)
    )
    return part.mapInPandas(fold, schema)


def holt_winters_last(
    df: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    key_col: str = "k",
    order_col: str = "d",
    value_col: str = "x",
) -> DataFrame:
    """Final additive Holt-Winters state per key over an ordered series.

    Initialization (simple, exactly replayable in SQL): after the first
    ``period`` observations, ``level = left-fold mean of season 1``,
    ``trend = 0``, ``seasonal_i = x_i - level``. From t = period+1 on:

        l_t = alpha*(x_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(x_t - l_t) + (1-gamma)*s_{t-m}

    Keys with fewer than ``period + 1`` rows are dropped (nothing to
    update). Returns (key, n_rows, level, trend, forecast_1) with floats
    rounded to 6dp; forecast_1 = l + b + s_{next}. Complements
    ``1-alpha``/``1-beta``/``1-gamma`` are computed ONCE here and the
    recursive-CTE oracle spells them as literals, so both engines fold
    the identical IEEE sequence (same contract as :func:`holt_last`).

    Scale: the fold runs AFTER the series has been aggregated to its
    grain (e.g. day), so each key's group is |periods| rows no matter
    the raw volume; applyInPandas shuffles once on the key.
    """
    oma, omb, omg = 1.0 - alpha, 1.0 - beta, 1.0 - gamma

    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("n_rows", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_1", T.DoubleType()),
        ]
    )

    def fold(key, pdf):
        pdf = pdf.sort_values(order_col)
        xs = pdf[value_col].to_numpy(dtype="float64")
        n = len(xs)
        if n < period + 1:
            return pd.DataFrame(
                {key_col: [], "n_rows": [], "level": [], "trend": [], "forecast_1": []}
            )
        acc = xs[0]
        for v in xs[1:period]:
            acc = acc + v
        mean1 = acc / float(period)
        s = [xs[i] - mean1 for i in range(period)]
        lvl, trd = mean1, 0.0
        for t in range(period, n):
            x, s0 = xs[t], s[0]
            lnew = alpha * (x - s0) + oma * (lvl + trd)
            bnew = beta * (lnew - lvl) + omb * trd
            snew = gamma * (x - lnew) + omg * s0
            s = s[1:] + [snew]
            lvl, trd = lnew, bnew
        return pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n],
                "level": [round(float(lvl), 6)],
                "trend": [round(float(trd), 6)],
                "forecast_1": [round(float(lvl + trd + s[0]), 6)],
            }
        )

    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fold, schema)
    )
