"""Z-order clustering: row-group statistics must prune filters on EVERY
clustered column, not just the leading one (the property a plain sort
lacks)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _overlap_fraction(out_dir: str, col: str, lo: float, hi: float) -> float:
    """Fraction of row groups whose [min,max] for ``col`` intersects
    [lo,hi] — what a stats-pruning reader would actually scan."""
    import glob

    total = hit = 0
    for f in glob.glob(f"{out_dir}/part-*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            total += 1
            if st.max >= lo and st.min <= hi:
                hit += 1
    assert total >= 8, f"need enough row groups to measure pruning, got {total}"
    return hit / total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from kafka_etl_consumer_spark.maintenance import zorder_parquet

    src = str(tmp_path / "src")
    # two independent uniform dims -> a plain a-sort leaves b unpruned
    (
        spark.range(200_000)
        .select(
            (F.hash(F.col("id")) % 10_000).alias("a"),
            (F.hash(F.col("id") + 7) % 10_000).alias("b"),
        )
        .write.parquet(src)
    )

    zout = str(tmp_path / "zorder")
    # tiny target files + small row groups so pruning is measurable
    n = zorder_parquet(
        spark,
        src,
        ["a", "b"],
        zout,
        target_file_mb=1,
        writer_options={"parquet.block.size": str(64 * 1024)},
    )
    assert n >= 1

    # a 2% slice of each dimension
    fa = _overlap_fraction(zout, "a", -10_000, -9_600)
    fb = _overlap_fraction(zout, "b", -10_000, -9_600)
    assert fa < 0.5, f"a-filter should prune, scanned {fa:.0%}"
    assert fb < 0.5, f"b-filter should prune, scanned {fb:.0%}"

    # roundtrip integrity: same rows, just reordered
    import pyspark.sql.functions as SF

    src_sum = spark.read.parquet(src).agg(SF.sum("a"), SF.sum("b"), SF.count("*")).first()
    z_sum = spark.read.parquet(zout).agg(SF.sum("a"), SF.sum("b"), SF.count("*")).first()
    assert tuple(src_sum) == tuple(z_sum)
