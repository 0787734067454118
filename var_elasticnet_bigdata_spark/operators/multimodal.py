"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with decode/feature steps as Arrow-batched pandas stages.

The image/audio/video codec libraries are NOT in this container
(north-star spec: stub the decode, make the Spark-side plumbing
real). What IS real and tested here:

- the schema convention: ``payload BINARY`` + ``media STRUCT<kind,
  mime, width, height, duration_ms>`` carried losslessly through
  shuffles and Arrow boundaries;
- ``mapInPandas`` batch shape for decode/feature-extraction (bytes in
  → fixed-width float vector out), with a deterministic fake decoder
  so the pipeline is end-to-end testable;
- frame sampling for "video" payloads as byte-stride slicing — the
  partitioning/batching logic is identical to a real codec's;
- the real-decoder seam: ``decode_image`` raises NotImplementedError
  with the dependency it would need (pillow/libav), so swapping the
  fake for a real codec is a one-function change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_STRUCT = StructType(
    [
        StructField("kind", StringType()),  # image | audio | video | other
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """REAL decoder seam — not available in this container."""
    raise NotImplementedError(
        "image decode requires pillow/opencv (not installed); "
        "swap fake_decode_features for a real decoder here"
    )


def fake_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: byte-histogram moments.
    Same signature/shape a real decoder's feature head would have."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim)
    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b % dim, minlength=dim).astype(np.float64)
    return hist / hist.sum()


def attach_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata has no binary column; synthesize one (utf-8 bytes of
    the text) plus media metadata — the schema convention under test."""
    return df.select(
        "*",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/x-fake").alias("mime"),
            (F.length(text_col) % 64 + 1).cast("int").alias("width"),
            (F.length(text_col) % 48 + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media"),
    )


def extract_features(
    df: DataFrame, id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """Arrow-batched decode → feature vector. The batch shape
    (payload bytes in, fixed-width float array out) is exactly what a
    real image/audio feature extractor uses."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    idc = id_col

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                fake_decode_features(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame({idc: pdf[idc], "features": feats})

    return df.select(id_col, "payload").mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 32,
    stride: int = 4,
    max_frames: int = 8,
) -> DataFrame:
    """"Video" frame sampling: every ``stride``-th ``frame_bytes``
    chunk, capped at ``max_frames`` — one output row per sampled
    frame (id, frame_idx, frame payload). Row-explode shape matches a
    real frame sampler; the chunking is byte-stride in lieu of codec
    keyframes."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )
    idc, fb, st, mf = id_col, frame_bytes, stride, max_frames

    def run(batches):
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for rid, payload in zip(pdf[idc], pdf["payload"]):
                if payload is None:
                    continue
                n_chunks = max(len(payload) // fb, 1)
                taken = 0
                for ci in range(0, n_chunks, st):
                    if taken >= mf:
                        break
                    chunk = bytes(payload[ci * fb : (ci + 1) * fb])
                    out_ids.append(rid)
                    out_idx.append(taken)
                    out_frames.append(chunk)
                    taken += 1
            yield pd.DataFrame(
                {idc: out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select(id_col, "payload").mapInPandas(run, schema)
