"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with struct metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms.  The actual codec step is STUBBED (no
image/audio libraries in this environment) behind ``decode_stub`` — a
deterministic fake that derives "decoded" metadata purely from the bytes,
so the Spark-side plumbing (schema, batching, partitioning, UDF signature)
is real and oracle-checkable while the codec is swappable.

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
