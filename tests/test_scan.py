"""Round-trip tests for the non-Parquet batch formats (sources/scan.py):
parquet → csv/json → scan back with explicit schema → row equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_etl_consumer_spark.sources.scan import (
    scan_csv,
    scan_json,
    scan_orc,
    scan_parquet,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return scan_parquet(spark, f"{sf_dir}/nation.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = scan_csv(spark, out, schema=SCHEMA)
    assert back.schema == SCHEMA
    assert _rows(back) == _rows(nation)


def test_json_round_trip(spark, nation, tmp_path):
    out = str(tmp_path / "nation_json")
    write_json(nation, out)
    back = scan_json(spark, out, schema=SCHEMA)
    assert _rows(back) == _rows(nation)


def test_parquet_partitioned_write(spark, nation, tmp_path):
    out = str(tmp_path / "nation_part")
    write_parquet(nation, out, partition_by=["n_regionkey"])
    back = spark.read.parquet(out)
    # partition pruning: one directory read, filter reaches no data files
    one = back.filter(F.col("n_regionkey") == 2)
    assert one.count() == nation.filter(F.col("n_regionkey") == 2).count()
    assert _rows(back.select(*SCHEMA.fieldNames())) == _rows(nation)


def test_schema_required(spark, tmp_path):
    with pytest.raises(ValueError):
        scan_csv(spark, str(tmp_path), schema=None)
    with pytest.raises(ValueError):
        scan_json(spark, str(tmp_path), schema=None)


def test_sorted_write_narrows_row_group_stats(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq
    import glob as _glob

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").coalesce(1)
    plain, ordered = str(tmp_path / "plain"), str(tmp_path / "sorted")
    write_parquet(li, plain)
    write_parquet(li, ordered, sort_by=["l_orderkey"])

    def first_rg_range(path):
        f = pq.ParquetFile(_glob.glob(f"{path}/*.parquet")[0])
        col = f.schema_arrow.names.index("l_orderkey")
        st = f.metadata.row_group(0).column(col).statistics
        return st.min, st.max

    # sorted file: row group 0 covers a narrow contiguous range; data
    # round-trips identically
    smin, smax = first_rg_range(ordered)
    back = spark.read.parquet(ordered)
    assert back.count() == li.count()
    assert smin <= smax
    got = sorted(r.l_orderkey for r in back.select("l_orderkey").limit(5).collect())
    assert got[0] >= smin


def test_sql_entry_over_registered_views(spark, sf_dir):
    """Arbitrary ANSI SQL over the registered table views matches the
    DataFrame formulation of the same join+agg."""
    from kafka_etl_consumer_spark.sources.tables import load_table, sql

    got = sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, count(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
    )
    import pyspark.sql.functions as F

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    want = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_scan_json_permissive_corrupt_record_capture(spark, tmp_path):
    """Malformed JSON lines land in the corrupt-record column instead of
    failing the scan — the file-source dead-letter surface, mirroring
    decode_avro's corrupt_col for the streaming path."""
    from pyspark.sql import functions as F

    p = tmp_path / "in.json"
    p.write_text('{"a": 1, "b": "x"}\n{not json at all}\n{"a": 2, "b": "y"}\n')
    df = scan_json(
        spark,
        str(p),
        schema="a INT, b STRING, _corrupt_record STRING",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r.a for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]

    # FAILFAST surfaces the parse error instead
    import pytest as _pytest

    with _pytest.raises(Exception):
        scan_json(spark, str(p), schema="a INT, b STRING", mode="FAILFAST").collect()


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """ORC: write, scan back equal, and verify the 100 TB posture holds on
    this format too — predicate pushdown and column pruning reach the ORC
    reader exactly like the parquet plan tests assert."""
    src = scan_parquet(spark, f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_orc")
    write_orc(src, out)
    back = scan_orc(spark, out)
    assert sorted(back.collect()) == sorted(src.collect())

    pruned = scan_orc(spark, out, columns=["n_nationkey", "n_name"]).filter(
        "n_nationkey = 3"
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pruned._jdf.queryExecution().explainString(jmode)
    assert "EqualTo(n_nationkey,3)" in plan  # pushed to the ORC reader
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "n_name" in read_schema and "n_comment" not in read_schema
