"""Multimodal column conventions + decode plumbing.

Convention (SURVEY.md §2.2 north-star row): media travels as an opaque
``binary`` column plus a typed metadata struct
(``media_type``, ``n_bytes``, per-type fields). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages — the
Spark-side plumbing (schema, batching, partition parallelism) is real and
tested; the actual pixel/sample decoding is STUBBED because no image/audio
libraries exist in this container.

``decode_image_meta`` uses a deterministic fake decoder (header arithmetic
on the bytes) so tests and the DuckDB oracle can verify the full pipeline
shape end-to-end. ``decode_image_pixels`` is the honest stub: it raises
NotImplementedError where PIL/libvips would be called.

Scale: mapInPandas is per-partition streaming over Arrow batches — no
shuffle, memory bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
For 100 TB of media, partition input by file-size bins so batches stay
even, and keep binaries out of shuffle paths entirely (join metadata, not
payloads).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_binary(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Test-data adapter: fabricate the binary media column from text bytes
    (the driver tables ship no real media; the column TYPE is the contract)."""
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    return (
        ensure_min_parallelism(df)
        .withColumn("media", F.encode(F.col(text_col), "UTF-8"))
        .withColumn("media_type", F.lit(media_type))
    )


_IMG_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
    ]
)


def decode_image_meta(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """'Decode' image headers → metadata struct columns.

    DETERMINISTIC FAKE decoder (documented; replace ``_fake_header`` with a
    PIL/pyvips call in production): width/height/channels derived from the
    byte length so the DuckDB oracle can verify the plumbing. The
    mapInPandas stage — Arrow batch in, pandas out, declared schema — is
    exactly what a real decoder uses."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[media_col].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "width": n % 640 + 1,
                    "height": (n * 7) % 480 + 1,
                    "channels": n % 3 + 1,
                }
            )

    return df.select(id_col, media_col).mapInPandas(decode, _IMG_META_SCHEMA)


def decode_image_pixels(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real pixel decode — requires an imaging library not present in this
    environment. The stub keeps the API surface + schema contract."""
    raise NotImplementedError(
        "pixel decode requires PIL/pyvips (not in this container); "
        "wire the library into a mapInPandas stage shaped like decode_image_meta"
    )


def resize_images(df: DataFrame, width: int, height: int, media_col: str = "media") -> DataFrame:
    """Real pixel resize — imaging library required (stub, like
    decode_image_pixels). The production shape: mapInPandas batch of
    binaries → decode → resize → re-encode, one worker pass, no shuffle."""
    raise NotImplementedError(
        "pixel resize requires PIL/pyvips (not in this container); "
        "wire it into a mapInPandas stage shaped like extract_audio_features"
    )


_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def extract_audio_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extract plumbing for audio-shaped binaries: interpret the
    payload as signed 8-bit PCM and compute RMS / zero-crossing count /
    peak — REAL numpy computation per Arrow batch (a production pipeline
    swaps the PCM interpretation for a soundfile/ffmpeg decode; the batch
    shape, schema, and partition parallelism are identical). Narrow map,
    no shuffle; memory bounded by arrow batch size × max payload."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms, zc, peak = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[media_col]):
                x = np.frombuffer(bytes(payload), dtype=np.int8).astype(np.float64)
                n = len(x)
                ids.append(i)
                ns.append(n)
                rms.append(float(np.sqrt((x * x).mean())) if n else 0.0)
                zc.append(int(((x[:-1] * x[1:]) < 0).sum()) if n > 1 else 0)
                peak.append(int(np.abs(x).max()) if n else 0)
            yield pd.DataFrame(
                {"doc_id": ids, "n_samples": ns, "rms": rms,
                 "zero_crossings": zc, "peak": peak}
            )

    return df.select(id_col, media_col).mapInPandas(feats, _AUDIO_FEAT_SCHEMA)


def sample_frames(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id", every_n_bytes: int = 64
) -> DataFrame:
    """'Frame sampling' plumbing for video-shaped binaries: emit one row per
    sampled offset (deterministic stride). Real codecs replace the stride
    with keyframe offsets; the explode/flatMap shape is identical."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for i, payload in zip(pdf[id_col], pdf[media_col]):
                n = len(payload)
                for j, off in enumerate(range(0, n, every_n_bytes)):
                    ids.append(i)
                    idxs.append(j)
                    offs.append(off)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "offset": offs})

    return df.select(id_col, media_col).mapInPandas(sample, schema)
