"""One-pass table profiling: per-column null / distinct / extrema stats.

The standard first step of any data-quality pipeline over a landed table
(the reference lands parquet and offers nothing to inspect it;
ETLTask.java:197). One DataFrame aggregate computes every per-column
statistic, then a ``stack`` unpivots the wide row into one row per column
— so a table of ANY width profiles in a single scan + single reduce.

Exact distinct counts use Spark's multi-distinct planning (one Expand of
the input per distinct column — the price of exactness; swap
``approx_count_distinct`` in at 100 TB where ±2% is acceptable, noted in
SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile(df: DataFrame) -> DataFrame:
    """Profile every column of ``df`` into rows of
    (col_name, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    max_str).

    Numeric columns fill min_num/max_num (rounded aggregate doubles);
    string columns fill min_str/max_str; timestamp/date columns fill the
    string slots with ISO-formatted extrema. Exactly one scan regardless
    of column count.
    """
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    # the multi-distinct Expand multiplies rows x n_cols BEFORE the partial
    # aggregate — widen a few-file scan so that work spreads (no-op on a
    # wide 100 TB scan)
    df = ensure_min_parallelism(df)

    aggs: list = []
    per_col: dict[str, dict[str, str]] = {}

    for f in df.schema.fields:
        c = F.col(f.name)
        slug = f.name
        names = {
            "n_null": f"__{slug}__n_null",
            "n_distinct": f"__{slug}__n_distinct",
            "min_num": f"__{slug}__min_num",
            "max_num": f"__{slug}__max_num",
            "min_str": f"__{slug}__min_str",
            "max_str": f"__{slug}__max_str",
        }
        per_col[slug] = names
        aggs.append(F.sum(c.isNull().cast("long")).alias(names["n_null"]))
        aggs.append(F.count_distinct(c).alias(names["n_distinct"]))
        if isinstance(f.dataType, T.NumericType):
            mn, mx = F.round(F.min(c).cast("double"), 6), F.round(F.max(c).cast("double"), 6)
            sn = sx = F.lit(None).cast("string")
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            mn = mx = F.lit(None).cast("double")
            sn, sx = F.date_format(F.min(c), _TS_FMT), F.date_format(F.max(c), _TS_FMT)
        elif isinstance(f.dataType, T.StringType):
            mn = mx = F.lit(None).cast("double")
            sn, sx = F.min(c), F.max(c)
        else:  # arrays / structs / binary: presence stats only
            mn = mx = F.lit(None).cast("double")
            sn = sx = F.lit(None).cast("string")
        aggs.append(mn.alias(names["min_num"]))
        aggs.append(mx.alias(names["max_num"]))
        aggs.append(sn.alias(names["min_str"]))
        aggs.append(sx.alias(names["max_str"]))

    wide = df.agg(F.count(F.lit(1)).alias("__n_rows"), *aggs)

    stack_args = []
    for slug, names in per_col.items():
        stack_args.append(f"'{slug}'")
        stack_args.extend(
            f"`{names[k]}`"
            for k in ("n_null", "n_distinct", "min_num", "max_num", "min_str", "max_str")
        )
    stack = (
        f"stack({len(per_col)}, {', '.join(stack_args)}) AS "
        "(col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return wide.select(F.col("__n_rows").alias("n_rows"), F.expr(stack)).select(
        "col_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )
