from kafka_etl_consumer_spark.operators.joins import asof_join, range_join
from kafka_etl_consumer_spark.operators.dedup import (
    canonical_pick,
    exact_dedup,
    minhash_lsh_matches_against,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    remove_duplicate_spans,
    shingle_arrays,
    simhash,
)
from kafka_etl_consumer_spark.operators.similarity import (
    cosine_pairs,
    cosine_pairs_blas,
    cosine_topk,
    hyperplane_bucket,
    lsh_ann_topk,
)
from kafka_etl_consumer_spark.operators.skew import salted_agg, salted_join
from kafka_etl_consumer_spark.operators.sketch import theta_distinct
from kafka_etl_consumer_spark.operators.reconcile import (
    table_checksum,
    table_diff,
)
from kafka_etl_consumer_spark.operators.sampling import (
    group_reservoir,
    stratified_sample,
)
from kafka_etl_consumer_spark.operators.text import (
    fingerprint,
    html_strip,
    unicode_clean,
    lang_id,
    quality_score,
    token_stats,
)
from kafka_etl_consumer_spark.operators.multimodal import (
    attach_binary,
    decode_image_meta,
    decode_image_pixels,
    extract_audio_features,
    resize_images,
    sample_frames,
)
from kafka_etl_consumer_spark.operators.rollup import refresh_rollup, time_bucket
from kafka_etl_consumer_spark.operators.shard import (
    exact_ntile,
    sharded_lag,
    sharded_prefix_sums,
    with_global_row_number,
)
from kafka_etl_consumer_spark.operators.text import bpe_token_count

__all__ = [
    "asof_join",
    "range_join",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "remove_duplicate_spans",
    "shingle_arrays",
    "simhash",
    "cosine_pairs",
    "cosine_pairs_blas",
    "cosine_topk",
    "hyperplane_bucket",
    "lsh_ann_topk",
    "salted_agg",
    "salted_join",
    "theta_distinct",
    "fingerprint",
    "lang_id",
    "quality_score",
    "token_stats",
    "attach_binary",
    "extract_audio_features",
    "resize_images",
    "refresh_rollup",
    "time_bucket",
    "bpe_token_count",
    "decode_image_meta",
    "decode_image_pixels",
    "sample_frames",
    "canonical_pick",
    "minhash_lsh_matches_against",
    "table_checksum",
    "table_diff",
    "group_reservoir",
    "stratified_sample",
    "html_strip",
    "unicode_clean",
]
