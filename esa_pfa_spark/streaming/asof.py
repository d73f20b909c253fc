"""Streaming point-in-time feature lookup: a probe STREAM (entity_id,
query_ts, ...) served against a static / slowly-refreshed observation
table, with the exact batch as-of semantics (backward, tolerance-bounded,
zero temporal leakage).

Physical form: ``foreachBatch`` running the batch ``operators.asof.
asof_join`` on each micro-batch — the production-standard shape for
stream-static enrichment when the join is not a plain equi-join:

 * each micro-batch is a small probe table; the static side keeps its
   hash partitioning across batches, and Spark broadcasts the (small)
   batch side automatically when it fits;
 * semantics are IDENTICAL to the batch operator by construction — one
   code path, one test surface (no reimplemented window logic to drift);
 * exactly-once to file sinks comes from the streaming checkpoint +
   idempotent-by-batchId parquet append.

A pure stream-static join + streaming max_by aggregation could express
backward-as-of natively, but needs a watermarked streaming aggregation
whose state is keyed by probe row — strictly more state and a weaker
tolerance story than delegating to the proven batch operator per batch.

Reference analog: the interactive query path (DsQueryTool /
pfa-database/.../DsQuery.java) serves per-product feature lookups on
demand; this is its streaming-serving re-expression.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

from esa_pfa_spark.operators.asof import asof_join


def stream_asof_features(
    probe_stream: DataFrame,
    observations: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    on: str | list[str] = "entity_id",
    probe_ts: str = "query_ts",
    obs_ts: str = "ts",
    payload: Iterable[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    trigger: dict | None = None,
):
    """Start a streaming query enriching ``probe_stream`` with the latest
    in-tolerance observation per entity.  Returns the StreamingQuery.

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` (default
    ``{"availableNow": True}`` — drain what's there and stop; pass e.g.
    ``{"processingTime": "10 seconds"}`` for continuous serving)."""

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            observations,
            on=on,
            probe_ts=probe_ts,
            obs_ts=obs_ts,
            payload=payload,
            direction=direction,
            tolerance=tolerance,
        )
        out.write.mode("append").parquet(sink_path)

    writer = (
        probe_stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
