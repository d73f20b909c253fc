"""Sequential signal features over entity timelines: EWMA state summaries
and CUSUM changepoint scores — the monitoring/feature ops that need
ORDER, not just frames.

``ewma_by_key``: the exponentially weighted state a feature store keeps
per entity.  Recursive (s = (1-a)s + a·x), so no window frame expresses
it; instead of a Python UDF the fold runs JVM-side with ``F.aggregate``
over the entity's time-sorted value array — and because the DuckDB
oracle's ``list_reduce`` executes the IDENTICAL operation sequence on
doubles, the result is bit-exact across engines (same trick as the
engine's decimal sums, but for an order-DEPENDENT recurrence).

``cusum_by_key``: one-sided CUSUM drift score.  The textbook recurrence
S_i = max(0, S_{i-1} + x_i - c) looks sequential, but telescoping gives
  S_i = (P_i - i·c) - min_{j<=i}(P_j - j·c),   P = running sum
so the max score is pure window algebra over ONE sort: cumulative sum,
running min, max — no fold at all.  (The same de-recursion the engine
uses for difference-of-cumulatives in pit.py.)

Scale: both are one Exchange on the key; per-key array size bounds the
EWMA task (same bound as every per-key collect in the engine); CUSUM
never materializes an array at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_by_key(
    df: DataFrame,
    value: str = "value",
    key: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    alpha: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Final EWMA state per key: fold s := (1-alpha)*s + alpha*x over the
    time-sorted values, seeded with the FIRST value (the standard
    adjust=False form).  Returns (key, n, ewma)."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    grouped = (
        df.select(key, F.struct(F.col(ts).alias("t"),
                                *( [F.col(tiebreak).alias("tb")] if tiebreak else [] ),
                                F.col(value).cast("double").alias("v")).alias("__e"))
        .groupBy(key)
        .agg(F.sort_array(F.collect_list("__e")).alias("__evs"))
    )
    vals = F.transform(F.col("__evs"), lambda e: e["v"])
    head = F.element_at(vals, 1)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    folded = F.aggregate(
        rest,
        head,
        lambda acc, x: acc * F.lit(1.0 - alpha) + F.lit(alpha) * x,
    )
    return grouped.select(
        key,
        F.size("__evs").cast("long").alias("n"),
        F.round(folded, round_to).alias("ewma"),
    )


def cusum_by_key(
    df: DataFrame,
    value: str = "value",
    key: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    target: float = 0.0,
    slack: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """One-sided CUSUM drift score per key: max_i S_i with
    S_i = max(0, S_{i-1} + (x_i - target - slack)), computed WITHOUT the
    recurrence via the telescoped window form (module docstring).
    Returns (key, n, cusum_max); flag rows upstream with
    ``cusum_max > h`` for the drift alarm."""
    c = float(target) + float(slack)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w_cum = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    # d_i = P_i - i*c as an exact decimal cumulative (order-independent
    # addition; the subtraction of running-min then happens in double)
    d = F.sum((F.col(value) - F.lit(c)).cast("decimal(18,6)")).over(w_cum)
    scored = df.withColumn("__d", d.cast("double"))
    run_min = F.min(F.least(F.col("__d"), F.lit(0.0))).over(w_cum)
    s_i = F.col("__d") - run_min
    per_row = scored.withColumn("__s", s_i)
    return (
        per_row.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("__s"), round_to).alias("cusum_max"),
        )
    )
