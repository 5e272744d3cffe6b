"""Data-quality validation: declarative expectation checks evaluated
distributed, one (rule, n_violations) row each — the Deequ/expectations
pattern as plain DataFrame plans. The reference trusts its input blindly
(decode errors crash the pipeline, AbstractAvroDeserializeService.java:56-59
of the reference); a landed-corpus engine needs gates that COUNT violations
without failing the run, so bad batches can be quarantined by policy.

Scale notes (100 TB):
- ``not_null`` + ``expr`` rules fold into ONE aggregate over a single scan
  (a sum(CASE) per rule — no shuffle of data rows, partial agg collapses
  everything map-side to one row per partition).
- each ``unique`` rule is one hash-agg on its key (the unavoidable
  shuffle — equality needs co-location) emitting sum(extra copies).
- each ``ref`` rule is one left-anti join against the referenced keys
  (broadcast when the dimension is small, AQE decides).
The outputs are 1-row DataFrames unioned driver-free; nothing grows with
table size except the scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_table(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    expr: list[tuple[str, str]] | None = None,
    ref: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate expectation rules; returns (rule, n_violations) with one
    leading ('rows_scanned', N) row.

    ``not_null``: column names that must not be null.
    ``expr``: (rule_name, boolean SQL) — the expression must hold per row.
    SQL three-valued logic applies: a NULL-valued expression counts as
    neither holding nor violating (add an explicit ``x IS NOT NULL`` rule
    to catch nulls).
    ``unique``: column names whose values must be unique (violations =
    number of EXTRA copies).
    ``ref``: (rule_name, fk_col, ref_df, ref_col) — referential integrity;
    violations = rows whose fk has no match (null fks are violations too:
    express optional fks via an expr rule instead).
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("rows_scanned")]
    for c in not_null or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"not_null:{c}")
        )
    for name, e in expr or []:
        aggs.append(
            F.sum((~F.expr(e)).cast("int")).cast("bigint").alias(f"expr:{name}")
        )
    one = df.agg(*aggs)
    cols = one.columns
    stack_args = ", ".join(f"'{c}', `{c}`" for c in cols)
    out = one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (rule, n_violations)"
    )

    parts = [out]
    for c in unique or []:
        parts.append(
            df.groupBy(c)
            .count()
            .agg(
                F.lit(f"unique:{c}").alias("rule"),
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
            )
        )
    for name, fk, ref_df, rk in ref or []:
        missing = df.select(F.col(fk).alias(rk)).join(
            ref_df.select(rk).distinct(), rk, "left_anti"
        )
        parts.append(
            missing.agg(
                F.lit(f"ref:{name}").alias("rule"),
                F.count(F.lit(1)).cast("bigint").alias("n_violations"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
