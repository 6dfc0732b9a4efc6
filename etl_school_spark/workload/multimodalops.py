"""Multimodal workload: media-as-binary queries over the documents table.

The fake decode kernels are pure functions of the byte stream, so DuckDB
oracles replicate them from ``octet_length`` — the mapInPandas path is
hash-checked end-to-end, not just smoke-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_school_spark.multimodal.media import (
    _AUDIO_BYTES_PER_SEC,
    _MAX_H,
    _MAX_W,
    FRAME_BYTES,
    attach_media,
    audio_features,
    frame_sample,
    image_features,
)
from etl_school_spark.tables import load_table
from etl_school_spark.workload._suite import unordered_output

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_q(
    "mm_image_features",
    f"""
    WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS byte_len FROM documents)
    SELECT media_id, byte_len,
           (byte_len % {_MAX_W} + 16)::int AS width,
           ((byte_len * 31) % {_MAX_H} + 16)::int AS height,
           3::int AS channels,
           round((byte_len % {_MAX_W} + 16) * 1.0 / ((byte_len * 31) % {_MAX_H} + 16), 4) AS aspect,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM m
    ORDER BY media_id
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return unordered_output(image_features(media))


@_q(
    "mm_audio_features",
    f"""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           octet_length(encode(text)) // 2 AS n_samples,
           octet_length(encode(text)) / {_AUDIO_BYTES_PER_SEC}.0 AS duration_s
    FROM documents
    ORDER BY media_id
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"), media_type="audio")
    return unordered_output(audio_features(media))


@_q(
    "mm_frame_sample",
    f"""
    WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS byte_len
               FROM documents WHERE octet_length(encode(text)) > 0)
    SELECT media_id,
           u.off // {FRAME_BYTES} AS frame_idx,
           u.off AS frame_offset,
           least({FRAME_BYTES}, byte_len - u.off) AS frame_len
    FROM m CROSS JOIN unnest(generate_series(0, byte_len - 1, {FRAME_BYTES * 4})) AS u(off)
    ORDER BY media_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"), media_type="video")
    return unordered_output(frame_sample(media, every=4))
