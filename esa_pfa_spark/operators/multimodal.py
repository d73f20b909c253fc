"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with struct metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms.  Two codec tiers:

 * ``decode_batch`` — the deterministic fake (oracle-checkable end to
   end; the SQL oracle mirrors the fake's arithmetic), proving the
   schema/batch/partitioning plumbing;
 * ``decode_media_batch`` — a REAL decode through the stdlib PNG/WAV
   mini-codecs (operators/codecs.py: zlib inflate + scanline unfilter,
   RIFF walk), fixture-golden-tested — the documented swap point
   exercised for real.  Heavier formats (JPEG/MP4) still need a real
   library and slot into the same ``decode_media`` dispatch.

Reference analog: the auxdata raster load + per-patch quicklook path
(AlgalBloomFeatureWriter.java:216-229; RemoteClassifierService quicklook
endpoints, pfa-ws-server/.../RemoteClassifierService.java:47-435).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def as_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pack a column as the opaque binary payload + metadata struct."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("fake/raw").alias("mime"),
        ).alias("meta"),
    )


def decode_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image decode.  A real codec
    (PIL/ffmpeg) replaces THIS function only; everything around it stays.
    Raises nothing — a production decode would NotImplementedError on
    unsupported mime types."""
    n = len(payload)
    return n, n % 256, (n * 7) % 256


def decode_batch(df: DataFrame) -> DataFrame:
    """mapInPandas decode: iterator-of-batches in, decoded metadata out.
    Partitioning is preserved; each Arrow batch is processed with no
    per-row JVM crossings."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            decoded = [decode_fake(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]
)


def decode_media_batch(df: DataFrame) -> DataFrame:
    """REAL codec decode (operators.codecs: stdlib PNG + WAV parsers) over
    the same mapInPandas plumbing as ``decode_batch`` — this is the
    documented stub swap point exercised for real.  Input rows carry
    (doc_id, payload binary, mime string); output one metadata row per
    input with modality-appropriate fields and a per-row ok/err channel
    (a corrupt payload must not fail the task — the production contract
    for web-scale media)."""
    from esa_pfa_spark.operators.codecs import decode_media

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for did, payload, mime in zip(b["doc_id"], b["payload"], b["mime"]):
                try:
                    m = decode_media(payload, mime)
                    rows.append(
                        {"doc_id": int(did), "mime": mime, "ok": True, "err": None, **m}
                    )
                except Exception as e:  # UnsupportedMediaError, truncation, ...
                    rows.append(
                        {
                            "doc_id": int(did), "mime": mime, "ok": False,
                            "err": str(e)[:200], "width": None, "height": None,
                            "channels": None, "sample_rate": None, "n_samples": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType(), False),
                    T.StructField("mime", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)


def resize_batch(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' transform: binary in → binary out, 1:1, metadata updated.
    The stub truncates/pads deterministically; a real image resize (PIL)
    replaces ONLY the inner function — the mapInPandas signature, schema
    and batch shape are what production uses."""

    def fake_resize(p: bytes) -> bytes:
        # real codec: raise NotImplementedError for unsupported mime types
        return bytes(p[:target_bytes]).ljust(target_bytes, b"\0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_payload = [fake_resize(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "payload": out_payload,
                    "meta": [
                        {"n_bytes": len(p), "mime": "fake/resized"} for p in out_payload
                    ],
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_features_batch(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: binary in → fixed-dim float vector out, numpy-
    vectorized inside the batch (a real embedding model replaces the inner
    transform; the Arrow batch shape is the production one)."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for p in b["payload"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8)
                # deterministic fake embedding: strided byte means
                pad = (-len(a)) % dim
                a = np.pad(a, (0, pad)) if pad else a
                feats.append(
                    (a.reshape(dim, -1).mean(axis=1) / 255.0).tolist()
                    if a.size
                    else [0.0] * dim
                )
            yield pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "features": feats})

    return df.mapInPandas(run, schema=schema)


def frame_sample_batch(df: DataFrame, frame_bytes: int = 32, max_frames: int = 4) -> DataFrame:
    """Frame sampling: one input 'video' row → up to ``max_frames`` frame
    rows (1:N batch shape — the UDTF-like case).  Frames are byte slices in
    the stub; ffmpeg keyframe extraction would replace the slicer only."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                p = bytes(p)
                n = min(max(len(p) // frame_bytes, 1), max_frames)
                for i in range(n):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(p[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=schema)
