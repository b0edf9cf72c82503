"""Multimodal columns: opaque binary payloads + typed metadata (task brief).

Images/audio/video ride as ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partition behavior) is real and tested; the
actual codec step is STUBBED (no image/audio libs in this container):

- ``extract_features(..., decoder='fake')`` uses a deterministic md5-driven
  fake decoder so tests pin the batch shapes and schema;
- ``decoder='real'`` raises NotImplementedError at the exact seam where
  PIL/libav would plug in.

The reference never decodes media (README promises <img>/<script> handling,
mr_crawly/README.md:7-10; parser.py:46-47 TODO) — media spans carry only
``media_ref`` — so this operator is forward-looking pipeline surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from mr_crawly_spark.operators.dedup import spread_for_compute
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder: dimensions and an
    8-dim feature vector derived from md5 of the payload."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8).astype(np.float32)
    return width, height, feats / 255.0


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """binary payloads -> (media_id, n_bytes, width, height, features[8]).

    Arrow-batched mapInPandas: each batch decodes vectorized-per-row in
    Python (the unavoidable codec boundary), everything before/after stays
    columnar. Partitioning of the input is preserved — repartition upstream
    if payloads are skewed.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # the seam where PIL / torchvision / libav would decode
                raise NotImplementedError(
                    "real media decoding unavailable in this environment; "
                    "use decoder='fake'"
                )
            out = {"media_id": [], "n_bytes": [], "width": [], "height": [], "features": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = _fake_decode(data)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(data))
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return spread_for_compute(media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias(payload_col)
    )).mapInPandas(run, MEDIA_FEATURES)


RESIZED_MEDIA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("orig_width", IntegerType()),
        StructField("orig_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(
    media: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """binary payloads -> (media_id, orig dims, target dims, resized payload).

    Same mapInPandas shape as extract_features; the fake path stands in a
    16-byte md5-derived thumbnail (deterministic, so the DuckDB oracle can
    reproduce the output bytes), the real path raises at the codec seam.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding unavailable in this environment; "
                    "use decoder='fake'"
                )
            out = {"media_id": [], "orig_width": [], "orig_height": [],
                   "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, _ = _fake_decode(data)
                thumb = hashlib.md5(
                    data + f"|resize:{target_w}x{target_h}".encode()
                ).digest()
                out["media_id"].append(mid)
                out["orig_width"].append(w)
                out["orig_height"].append(h)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["payload"].append(thumb)
            yield pd.DataFrame(out)

    return spread_for_compute(media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias(payload_col)
    )).mapInPandas(run, RESIZED_MEDIA)


FRAME_FEATURES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_frames", LongType()),
        StructField("frame_index", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def sample_frames(
    media: DataFrame,
    every_n: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling: one payload row FANS OUT to one row per
    sampled frame (media_id, n_frames, frame_index, features[8]).

    The fan-out inside mapInPandas is the Spark-relevant part — output
    batches larger than input batches, schema fixed up front; the fake
    decoder derives a deterministic frame count (1..16) and per-frame md5
    features, the real path raises at the codec seam."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)
    assert every_n >= 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding unavailable in this environment; "
                    "use decoder='fake'"
                )
            out = {"media_id": [], "n_frames": [], "frame_index": [], "features": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                n_frames = 1 + hashlib.md5(data).digest()[2] % 16
                for idx in range(0, n_frames, every_n):
                    fd = hashlib.md5(data + f"|frame:{idx}".encode()).digest()
                    feats = np.frombuffer(
                        fd[:FEATURE_DIM], dtype=np.uint8
                    ).astype(np.float32) / 255.0
                    out["media_id"].append(mid)
                    out["n_frames"].append(n_frames)
                    out["frame_index"].append(idx)
                    out["features"].append(feats)
            yield pd.DataFrame(out)

    return spread_for_compute(media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias(payload_col)
    )).mapInPandas(run, FRAME_FEATURES)


def media_spans_to_payloads(documents: DataFrame) -> DataFrame:
    """Pull media spans out of span documents as (media_id, payload) where
    payload is a deterministic synthetic binary (the corpus carries refs,
    not bytes — matching the reference, which never stores media bodies)."""
    refs = documents.select(
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
        ).alias("span")
    ).select(F.col("span.media_ref").alias("media_id")).dropDuplicates()
    return refs.withColumn(
        "payload", F.encode(F.concat(F.lit("payload:"), F.col("media_id")), "UTF-8")
    )


def binary_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact deduplication of opaque BINARY payloads (image/audio/video
    blobs) by content digest — the media twin of dedup.exact_dedup: at
    crawl scale the same asset is fetched under thousands of URLs (CDNs,
    mirrors, retina variants served byte-identical), and payload dedup is
    the single biggest storage win before any decode work.

    Output: (id_col, payload_md5, keeper_id, kept) for every input row;
    keeper = min id per digest. Plan: digest computed scan-side (md5 of
    the binary column — JVM, no decode), ONE map-side-combined agg for
    the keeper map, one equi-join on the 32-char digest. The keeper map
    has one row per DISTINCT payload, so it shuffles instead of
    broadcasting by design."""
    h = F.md5(F.col(payload_col))
    hashed = media.select(F.col(id_col), h.alias("payload_md5"))
    keepers = hashed.groupBy("payload_md5").agg(
        F.min(id_col).alias("keeper_id")
    )
    return hashed.join(keepers, "payload_md5").select(
        id_col,
        "payload_md5",
        "keeper_id",
        (F.col(id_col) == F.col("keeper_id")).alias("kept"),
    )
