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
            F.round(F.avg("__v"), 6).alias("mean_value"),
        )
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
    an explicit ``alpha*x + (1-alpha)*s`` loop over the numpy column — NOT
    pandas ``ewm``, whose internal weighted-average formulation rounds
    differently at the ulp; the oracle's ``list_reduce`` lambda spells the
    identical operation sequence (including computing ``1 - alpha`` as an
    IEEE subtraction), so an inherently sequential operator still gets a
    hash-exact oracle.

    Scale: one hash shuffle on ``key_col``; per-group state is O(group) in
    ONE pandas batch — fine for per-user event streams (bounded keys), the
    same contract as every applyInPandas operator in this package.
    """
    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("n_events", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    beta = 1.0 - alpha

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, order_col])
        s = None
        for x in pdf[value_col].to_numpy():
            s = float(x) if s is None else alpha * float(x) + beta * s
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [round(float(s), 6)],
            }
        )

    cols = [key_col, ts_col, value_col, order_col]
    return df.select(*cols).groupBy(key_col).applyInPandas(fold, schema)
