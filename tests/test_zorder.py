"""Z-order clustering tests: Morton-code correctness against a Python
reference, and the layout claim itself — a z-ordered write keeps BOTH
dimensions' per-file ranges narrow, where a single-column sort leaves the
second dimension's range as wide as the table."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

import pyarrow.parquet as pq


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



def _morton2_py(x: int, y: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def _morton3_py(x: int, y: int, z: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_code_matches_python_reference(spark):
    from kafka_etl_consumer_spark.functions.zorder import zorder_code

    vals = [(0, 0, 0), (1, 2, 3), (65535, 0, 65535), (12345, 54321, 7),
            (65535, 65535, 65535), (256, 255, 1)]
    df = spark.createDataFrame(vals, "x bigint, y bigint, z bigint")
    got2 = df.select(
        "x", "y", zorder_code([F.col("x"), F.col("y")]).alias("m")
    ).collect()
    for r in got2:
        assert r.m == _morton2_py(r.x, r.y), (r.x, r.y)
    got3 = df.select(
        "x", "y", "z", zorder_code([F.col("x"), F.col("y"), F.col("z")]).alias("m")
    ).collect()
    for r in got3:
        assert r.m == _morton3_py(r.x, r.y, r.z), (r.x, r.y, r.z)
    with pytest.raises(ValueError):
        zorder_code([F.col("x")])


def _file_ranges(spark, path):
    """Per output file: (min_x, max_x, min_y, max_y)."""
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        s = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        out.append(tuple(s))
    return out


def _files_hit(ranges, boxes):
    """Total files whose (x,y) stats-range intersects each query box —
    the row-group-pruning proxy: a reader must open exactly these."""
    hits = 0
    for qx0, qx1, qy0, qy1 in boxes:
        for x0, x1, y0, y1 in ranges:
            if x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0:
                hits += 1
    return hits


def test_zorder_write_prunes_2d_box_queries(spark, tmp_path):
    """The layout claim itself: for 2-d box predicates over many files, a
    z-ordered layout's per-file min/max stats intersect FAR fewer files
    than a single-column range sort (whose every file spans all of y)."""
    from kafka_etl_consumer_spark.sources.scan import write_parquet

    n, side, files = 65536, 256, 64
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") * 2654435761) % side).alias("y"),  # decorrelated dim
    )
    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "s")
    write_parquet(df, z_path, zorder_by=["x", "y"], zorder_files=files)
    write_parquet(df.repartitionByRange(files, "x"), s_path, sort_by=["x"])

    # deterministic 32x32 query boxes scattered over the grid
    boxes = [
        (bx, bx + 31, by, by + 31)
        for bx in (0, 64, 128, 192)
        for by in (16, 96, 176)
    ]
    z_hits = _files_hit(_file_ranges(spark, z_path), boxes)
    s_hits = _files_hit(_file_ranges(spark, s_path), boxes)
    # x-sorted slabs span ALL of y: every box hits every x-overlapping
    # slab (~8 of 64 per box). Morton tiles bound both dims (~4-5 per
    # box). Margin 1.4x, not the theoretical ~1.8x: repartitionByRange
    # samples boundaries with a per-run seed, so tile edges jitter.
    assert z_hits * 1.4 < s_hits, (z_hits, s_hits)
    # the write round-trips all rows
    assert spark.read.parquet(z_path).count() == n
    with pytest.raises(ValueError):
        write_parquet(df, str(tmp_path / "bad"), sort_by=["x"], zorder_by=["x", "y"])
