"""Streaming exact deduplication — the ingest-time form of
``operators.dedup.exact_dedup`` for a document stream.

Native Structured Streaming: ``dropDuplicatesWithinWatermark`` on the
content digest keeps ONE state row per distinct digest inside the
watermark horizon and evicts it once the watermark passes — state is
O(distinct digests per horizon), not O(stream).  This is the idiomatic
scale path (no custom stateful operator needed); the batch operator
remains the exact global dedup for reprocessing runs.

Semantics note: within-watermark dedup is windowed — a duplicate arriving
AFTER its first occurrence left the state horizon is re-emitted.  Global
exactness over history is the batch path's job (the same division of
labor as stream_ffill vs the batch as-of, streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only the first occurrence of each content digest within the
    watermark horizon.  Input needs an event-time column ``ts``."""
    with_digest = stream_df.withColumn("__digest", F.md5(F.col(text_col)))
    return (
        with_digest.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
