"""Streaming sketch maintenance: count-min cells and HLL registers as
ENGINE-NATIVE stateful streaming aggregations.

Unlike the Misra-Gries stream (a custom applyInPandasWithState
operator, streaming/heavyhitters.py), these two sketches need no custom
state code at all: a CMS is additive counts on (row, col) and an HLL is
max-rank per (group, register) — both are built-in streaming aggregates
whose state is BOUNDED BY CONSTRUCTION (depth*width cells / 2^p
registers per group, forever), so no watermark or timeout eviction is
required and the query can legitimately run unbounded.  That is the
Spark-first answer: when the sketch's merge operation is an aggregate
the engine already streams, reuse the batch expression tree verbatim.

Parity contract (tested): the streaming state after consuming a corpus
in any number of micro-batches equals the batch sketch of the whole
corpus — the mergeability property, enforced by the engine's own
partial-aggregation machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_cms(
    stream: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Count-min cells over a streaming source — the identical cell
    expressions as profile.cms_build, grouped by the engine's stateful
    streaming aggregation.  Run with outputMode 'update' (emit changed
    cells) or 'complete' (emit the whole <= depth*width-row sketch)."""
    from esa_pfa_spark.operators.profile import _cms_hash

    v = F.col(value_col)
    cells = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("row"), _cms_hash(v, i, seed, width).alias("col")
            )
            for i in range(depth)
        ])
    ).alias("c")
    return (
        stream.filter(v.isNotNull())
        .select(cells)
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def stream_hll_registers(
    stream: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """HLL registers over a streaming source — profile.hll_registers'
    expression tree on a streaming DataFrame; max/sum stream natively
    with 2^p-row-per-group bounded state.  Finish with
    profile.hll_distinct's estimate arithmetic on the emitted register
    table (or just call hll_distinct on the sink table)."""
    from esa_pfa_spark.operators.profile import hll_registers

    return hll_registers(stream, value_col, group_col=group_col, p=p, seed=seed)
