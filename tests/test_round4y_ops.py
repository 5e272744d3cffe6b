"""Batch-37 invariant test: the lang-id confusion matrix against docs
with planted marker languages (incl. a miss routed to 'und')."""

from __future__ import annotations

from pyspark.sql import Row


def test_langid_confusion_planted(spark, tmp_path):
    docs = [
        # true en, clear en markers -> diagonal hit
        (0, "en", "the cat and the dog with a hat"),
        (1, "en", "the quick fox is in the barn"),
        # true es, clear es markers -> diagonal hit
        (2, "es", "el perro y la casa de los gatos"),
        # true en but NO markers at all -> guessed 'und'
        (3, "en", "zzz qqq xxx"),
    ]
    spark.createDataFrame(
        [Row(doc_id=i, text=t, source="s", lang=lg) for i, lg, t in docs]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from kafka_etl_consumer_spark.plans.queries_pipeline32 import (
        text_langid_accuracy,
    )

    got = {
        (r.true_lang, r.guessed_lang): (r.n_docs, r.share_of_true)
        for r in text_langid_accuracy(spark, str(tmp_path)).collect()
    }
    assert got[("en", "en")] == (2, round(2 / 3, 6))
    assert got[("en", "und")] == (1, round(1 / 3, 6))
    assert got[("es", "es")] == (1, 1.0)
    assert len(got) == 3
