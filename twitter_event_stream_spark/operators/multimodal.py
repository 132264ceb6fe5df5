"""K11 — multimodal column support (binary payloads + typed metadata).

Images/audio/video are carried as opaque ``BinaryType`` columns beside a
metadata struct (mime, byte length, content digest). The Spark-side plumbing
— schema, Arrow batch shape, partitioning, content-hash dedup — is real and
tested; actual media decoding is STUBBED (the container has no image/audio
libraries): ``decode_features`` with ``real_decode=True`` raises
``NotImplementedError``, while the default path emits a deterministic fake
feature vector derived from the payload bytes, so the distributed pipeline
around the decoder is fully exercisable.

Scale: payloads never shuffle for dedup — only their md5 digests do (same
digest-groupBy discipline as K1). Feature extraction is ``mapInPandas``
(Arrow-batched), the shape a real decoder (PIL/ffmpeg) would plug into.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table

FEATURE_DIM = 4


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column + metadata struct to the documents
    table (fixture stand-in for real media bytes)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        "lang",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col("text")).alias("digest"),
        ).alias("meta"),
    )


def decode_features(
    media: DataFrame, real_decode: bool = False, batch_hint: int = 64
) -> DataFrame:
    """Arrow-batched 'decode + feature-extract' over binary payloads.

    ``real_decode=True`` is the seam where PIL/torchaudio/ffmpeg would go —
    deliberately ``NotImplementedError`` in this container. The default
    produces FEATURE_DIM deterministic pseudo-features per payload from its
    sha256, so partitioning/batching/schema are tested end-to-end.
    """

    def extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError(
                "media decoding requires image/audio libraries not present "
                "in this container; wire PIL/ffmpeg here"
            )
        for pdf in batches:
            feats = []
            for blob in pdf["payload"]:
                digest = hashlib.sha256(bytes(blob)).digest()
                feats.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": feats}
            )

    return media.select("doc_id", "payload").mapInPandas(
        extract, "doc_id long, features array<double>"
    )


def dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact multimodal dedup: group by content digest, keep min doc_id —
    digests shuffle, payloads don't."""
    return (
        media.select("doc_id", F.md5("payload").alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS mime
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K11 (HASH slice) — binary payload metadata: byte length + content
    digest through the BinaryType column path."""
    d = table(spark, sf_dir, "documents")
    m = with_payload(d)
    return m.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
        F.col("meta.mime").alias("mime"),
    )
