from kafka_etl_consumer_spark.functions.hashing import hash64, md5_fingerprint
from kafka_etl_consumer_spark.functions.vectors import cosine_similarity, dot, l2_norm
from kafka_etl_consumer_spark.functions.text import tokens, word_shingles

__all__ = [
    "hash64",
    "md5_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "word_shingles",
]
