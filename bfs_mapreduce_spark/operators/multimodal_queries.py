"""Multimodal-column plumbing (SURVEY.md §2.10 NEW): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` pipelines.

No real media decoders ship in this container, so the decode step is a
STUB (see ``decode_media``): it produces deterministic fake features
from the raw bytes. Everything around the stub is real and tested —
the binary column construction, Arrow batch transfer, mapInPandas
schema contract, and the chunk/frame-sampling arithmetic — so swapping
in PIL/torchaudio/ffmpeg later changes one function body, not the
pipeline.

The test corpus has no binary table, so blobs are derived
deterministically from ``documents.text`` (utf-8 bytes). That keeps
every query oracle-able: DuckDB reproduces the same features from the
same bytes.

Scale posture: blobs never shuffle — features are extracted in a
single mapInPandas projection co-located with the scan, and only the
(tiny) feature columns continue through the plan. At 100 TB that is
the difference between shipping petabytes of pixels through an
exchange and shipping a few GB of floats.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_mapreduce_spark.registry import register
from bfs_mapreduce_spark.sources.readers import load_table

_CHUNK = 32  # bytes per fake "frame"


def decode_media(blob: bytes, kind: str = "fake") -> dict:
    """Decode stub. ``kind='fake'`` returns deterministic pseudo-features
    (length, sha256, a byte-derived 'brightness'); any real kind raises
    until a decoder library is available.

    STUB: real image/audio decode (PIL / torchaudio / ffmpeg) is not
    installed in this environment. The Spark-side plumbing (binary
    schema, Arrow batching, mapInPandas signature) is the deliverable;
    this function body is the single swap point.
    """
    if kind != "fake":
        raise NotImplementedError(
            f"media decode for kind={kind!r} requires a decoder library "
            "(PIL/torchaudio/ffmpeg) not present in this environment"
        )
    return {
        "blob_len": len(blob),
        "content_sha": hashlib.sha256(blob).hexdigest(),
        "fake_brightness": round((len(blob) % 251) / 251.0, 6),
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [decode_media(b) for b in pdf["blob"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


_FEATURE_SCHEMA = "doc_id bigint, blob_len int, content_sha string, fake_brightness double"


def _with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic binary column and typed metadata — the
    shape a real multimodal table would have (blob + mime + dims)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("blob"),
        F.lit("application/x-fake").alias("mime"),
    )


@register(
    "q_multimodal_features",
    oracle="""
    -- corpus text is pure ASCII (asserted by octet_length == length),
    -- so hashing the VARCHAR hashes the same bytes Spark's blob holds
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS blob_len,
           sha256(text) AS content_sha,
           ROUND((octet_length(encode(text)) % 251) / 251.0, 6) AS fake_brightness
    FROM documents
    """,
    doc="Feature extraction over a binary column via Arrow-batched "
    "mapInPandas (decode step stubbed — deterministic byte-derived "
    "features, reproduced exactly by the DuckDB oracle). Blobs are "
    "consumed where they are read; only features leave the stage.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_blob(spark, sf_dir).select("doc_id", "blob").mapInPandas(
        _extract_features, schema=_FEATURE_SCHEMA
    )


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
    -- ASCII corpus: varchar substring == byte slicing (see above)
    WITH idx AS (
      SELECT doc_id, text,
             unnest(range((length(text) + {_CHUNK} - 1) // {_CHUNK})) AS chunk_idx
      FROM documents)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * {_CHUNK} AS INT) AS byte_offset,
           sha256(substring(text, CAST(chunk_idx * {_CHUNK} + 1 AS INT), {_CHUNK})) AS chunk_sha
    FROM idx
    """,
    doc="Frame/chunk sampling over binary payloads: fixed-size byte "
    "windows (stand-in for video frame extraction), per-chunk content "
    "hash. Pure JVM binary slicing — the explode is bounded by "
    "blob_len/chunk, no Python in the path.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_blob(spark, sf_dir)
    n_chunks = F.ceil(F.octet_length("blob") / _CHUNK).cast("int")
    return (
        # empty blobs emit NO chunks (sequence(0, -1) would auto-descend
        # and fabricate two rows; the oracle's range(0) emits none)
        b.filter(F.octet_length("blob") > 0)
        .select("doc_id", "blob", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * _CHUNK).cast("int").alias("byte_offset"),
            F.sha2(
                F.expr(f"substring(blob, chunk_idx * {_CHUNK} + 1, {_CHUNK})"), 256
            ).alias("chunk_sha"),
        )
    )


@register(
    "q_multimodal_dedup",
    oracle="""
    -- ASCII corpus: hashing the VARCHAR hashes the blob's bytes
    SELECT sha256(text) AS content_sha,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS blob_len
    FROM documents
    GROUP BY sha256(text)
    """,
    doc="Exact multimodal dedup: group binary payloads by content "
    "sha256 (the standard image/audio dedup key), canonical row = min "
    "doc_id. The hash is computed in the scan projection so only the "
    "64-hex key and two numbers reach the exchange — blobs themselves "
    "never shuffle, which is the entire game at petabyte media scale.",
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _with_blob(spark, sf_dir)
    return (
        b.select(
            F.sha2("blob", 256).alias("content_sha"),
            "doc_id",
            F.octet_length("blob").cast("bigint").alias("blob_len"),
        )
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("blob_len").alias("blob_len"),
        )
    )


@register(
    "q_multimodal_manifest",
    oracle="""
    -- ASCII corpus: octet_length(encode(..)) == the blob's byte length
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT sha256(text)) AS n_distinct_content,
           ROUND(1.0 - COUNT(DISTINCT sha256(text)) * 1.0 / COUNT(*), 6) AS dup_rate,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_blob_bytes
    FROM documents
    GROUP BY source
    """,
    doc="Shard manifest / dataset-card statistics per source: blob "
    "count, total bytes, distinct-content count, duplication rate, max "
    "payload — the summary a multimodal ingestion job publishes next "
    "to every shard. Hashes and lengths are computed in the scan "
    "projection, so the exchange carries (source, sha, len) triples, "
    "never payload bytes; the distinct-count is the only state that "
    "grows with content variety (swap approx_count_distinct at "
    "petabyte scale — q_approx_count_distinct is the anchor).",
)
def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        F.sha2(F.encode("text", "utf-8"), 256).alias("content_sha"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("blob_len"),
    )
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("blob_len").alias("total_bytes"),
        F.countDistinct("content_sha").alias("n_distinct_content"),
        F.round(
            F.lit(1.0) - F.countDistinct("content_sha") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.max("blob_len").alias("max_blob_bytes"),
    )


def resize_media(blob: bytes, target_w: int, target_h: int) -> dict:
    """Resize stub (see ``decode_media`` — same single swap point).
    Deterministic fake: 'resized' payload length scales with the target
    area over a nominal 64x64 source; sha over the truncated bytes
    stands in for resampled pixels."""
    import hashlib

    scale = (target_w * target_h) / (64 * 64)
    new_len = max(1, int(len(blob) * scale))
    resized = (blob * ((new_len // max(len(blob), 1)) + 1))[:new_len]
    return {
        "resized_len": new_len,
        "resized_sha": hashlib.sha256(resized).hexdigest(),
    }


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pd.DataFrame([resize_media(b, 32, 32) for b in pdf["blob"]])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register(
    "q_multimodal_resize",
    oracle="""
    -- fake resize: target 32x32 over nominal 64x64 => quarter length;
    -- payload repeats the source bytes, so for len//4 <= len the
    -- 'resized' bytes are simply the first len//4 bytes (ASCII corpus:
    -- varchar substring == byte slicing)
    SELECT doc_id,
           CAST(GREATEST(length(text) // 4, 1) AS INT) AS resized_len,
           sha256(substring(text, 1, CAST(GREATEST(length(text) // 4, 1) AS INT))) AS resized_sha
    FROM documents
    """,
    doc="Resize stub over binary payloads via mapInPandas: target-area "
    "scaling of the fake payload with a content hash of the result. "
    "Real resampling (PIL) drops into resize_media without touching "
    "the pipeline; blobs still never shuffle.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_blob(spark, sf_dir).select("doc_id", "blob").mapInPandas(
        _resize_batch, schema="doc_id bigint, resized_len int, resized_sha string"
    )
