"""Compaction + the remaining multimodal plumbing (audio features, resize
stub): small-file rewrite preserves data and hits the target count; audio
features match an independent numpy computation on the same bytes."""

from __future__ import annotations

import glob

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.maintenance import compact_parquet
from kafka_etl_consumer_spark.operators.multimodal import (
    attach_binary,
    extract_audio_features,
    resize_images,
)


def test_compact_parquet(spark, sf_dir, tmp_path):
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "landed")
    # simulate minute-rolling: many tiny files
    src.repartition(40).write.parquet(out)
    assert len(glob.glob(f"{out}/*.parquet")) == 40
    before = src.count()
    n_files = compact_parquet(spark, out, target_file_mb=256)
    assert n_files == 1  # sf0.001 lineitem ≪ 256 MiB
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    back = spark.read.parquet(out)
    assert back.count() == before
    assert not glob.glob(f"{out}__*")  # no temp/backup dirs left behind


def test_audio_features_match_numpy(spark, sf_dir):
    docs = attach_binary(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20), media_type="audio"
    )
    got = {r.doc_id: r for r in extract_audio_features(docs).collect()}
    for row in docs.select("doc_id", "media").collect():
        x = np.frombuffer(bytes(row.media), dtype=np.int8).astype(np.float64)
        r = got[row.doc_id]
        assert r.n_samples == len(x)
        assert r.rms == pytest.approx(float(np.sqrt((x * x).mean())))
        assert r.zero_crossings == int(((x[:-1] * x[1:]) < 0).sum())
        assert r.peak == int(np.abs(x).max())


def test_resize_is_honest_stub(spark, sf_dir):
    docs = attach_binary(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1))
    with pytest.raises(NotImplementedError, match="resize"):
        resize_images(docs, 224, 224)


def test_theta_distinct_ungrouped(spark, sf_dir):
    from kafka_etl_consumer_spark.operators.sketch import theta_distinct
    from kafka_etl_consumer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    # scale=1 keeps every hash → the sketch degenerates to the exact count
    assert theta_distinct(ev, "user_id", scale=1).first().est_distinct == exact
    # coarser scale stays a non-negative multiple-of-scale estimate
    est = theta_distinct(ev, "user_id", scale=4).first().est_distinct
    assert est is not None and est >= 0 and est % 4 == 0
