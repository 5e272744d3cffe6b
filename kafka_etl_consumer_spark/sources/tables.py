"""Batch table loaders for the driver's synthetic star schema.

The reference writes Parquet and never reads it back (write-only sink,
ETLTask.java:197 in the reference); our analytics surface reads the landed
tables back with ``spark.read.parquet`` so every downstream query benefits
from Parquet predicate pushdown, column pruning, and (when the layout has
them) partition pruning — all free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — these are
# bounded by the schema (5 regions, 25 nations) or grow sublinearly; always
# broadcast them in joins so the fact side never shuffles for the join.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


# Columns stored as TIMESTAMP(NANOS) in the parquet footer. Spark has no
# nanosecond timestamp type (SPARK-40819): it either rejects the file or,
# with spark.sql.legacy.parquet.nanosAsLong, surfaces the raw int64. We opt
# into the long and floor-divide to microseconds — the same truncation
# DuckDB's CAST(ts AS TIMESTAMP) applies, so oracle comparisons line up.
_NANOS_TS_COLS = {"events": ("ts",)}


def table_path(sf_dir: str, name: str) -> str:
    """Storage path of one synthetic table (TESTDATA.md layout). The single
    place the ``{sf_dir}/{name}.parquet`` convention lives, for callers that
    must read a table outside Spark (e.g. a per-task pyarrow side read)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from ``sf_dir`` (TESTDATA.md layout)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view so arbitrary ANSI SQL
    runs against the landed data — the `spark.sql` entry point a reference
    user gets for free after switching (the reference offers no query
    surface at all over its output; README.md:14-26 just lists files)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ANSI SQL statement against the registered table views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
