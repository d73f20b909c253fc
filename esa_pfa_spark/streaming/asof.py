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
 * ``foreachBatch`` is at-least-once: a micro-batch can be REPLAYED after
   a failure, so the sink write must be idempotent by batch id.  Each
   batch overwrites its own ``sink_path/batch_id=<id>`` directory — a
   replay rewrites the same files instead of appending duplicates, which
   together with the streaming checkpoint gives end-to-end exactly-once
   to the file sink.  Readers of ``sink_path`` see ``batch_id`` as a
   discovered partition column.

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


def batch_enricher(
    observations: DataFrame,
    sink_path: str,
    *,
    on: str | list[str] = "entity_id",
    probe_ts: str = "query_ts",
    obs_ts: str = "ts",
    payload: Iterable[str] | None = None,
    direction: str = "backward",
    tolerance=None,
):
    """The per-micro-batch function: as-of enrich, then an IDEMPOTENT
    write — each batch owns ``sink_path/batch_id=<id>`` and overwrites it
    wholesale, so an at-least-once ``foreachBatch`` replay rewrites the
    same directory instead of appending duplicates.  Exposed as a module
    function so replay idempotency is directly testable."""

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
        out.write.mode("overwrite").parquet(f"{sink_path}/batch_id={int(batch_id)}")

    return _enrich


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
    _enrich = batch_enricher(
        observations,
        sink_path,
        on=on,
        probe_ts=probe_ts,
        obs_ts=obs_ts,
        payload=payload,
        direction=direction,
        tolerance=tolerance,
    )
    writer = (
        probe_stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()


def bitemporal_batch_enricher(
    observations: DataFrame,
    sink_path: str,
    *,
    on: str | list[str] = "entity_id",
    probe_ts: str = "query_ts",
    obs_ts: str = "ts",
    knowledge_ts: str = "knowledge_ts",
    payload: Iterable[str] | None = None,
    tolerance=None,
):
    """Bitemporal variant of ``batch_enricher``: each micro-batch of probes
    is served with ``asof_join_bitemporal`` (restatement-correct — only
    versions whose knowledge_ts precedes the probe's query_ts are
    visible), same idempotent ``batch_id=<id>`` overwrite sink.  The
    observation table may be refreshed between batches; because every
    version row is retained (restatements append, never update), a
    replayed batch re-reads a SUPERSET of versions yet still computes the
    same answer for old query_ts values — the bitemporal filter makes the
    enrichment naturally replay-stable."""

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        from esa_pfa_spark.operators.asof import asof_join_bitemporal

        out = asof_join_bitemporal(
            batch_df,
            observations,
            on=on,
            probe_ts=probe_ts,
            obs_ts=obs_ts,
            knowledge_ts=knowledge_ts,
            payload=payload,
            tolerance=tolerance,
        )
        out.write.mode("overwrite").parquet(f"{sink_path}/batch_id={int(batch_id)}")

    return _enrich


def stream_bitemporal_features(
    probe_stream: DataFrame,
    observations: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    on: str | list[str] = "entity_id",
    probe_ts: str = "query_ts",
    obs_ts: str = "ts",
    knowledge_ts: str = "knowledge_ts",
    payload: Iterable[str] | None = None,
    tolerance=None,
    trigger: dict | None = None,
):
    """Streaming restatement-correct feature lookup; see
    ``stream_asof_features`` for the execution/idempotency contract."""
    _enrich = bitemporal_batch_enricher(
        observations,
        sink_path,
        on=on,
        probe_ts=probe_ts,
        obs_ts=obs_ts,
        knowledge_ts=knowledge_ts,
        payload=payload,
        tolerance=tolerance,
    )
    writer = (
        probe_stream.writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
