"""Snapshot diff (CDC compute form): classify every key across two
table versions as insert / delete / update / unchanged.

The lakehouse maintenance primitive behind incremental feature
refreshes (plans/incremental.py consumes "what changed"; this produces
it when the source system only hands you full snapshots — the common
case for upstream dumps).  Iceberg's changelog read is the storage-side
shortcut; this is the engine-portable compute of the same answer, so
pipelines behave identically whether the diff comes from a changelog or
from two snapshots.

Scale shape: ONE full-outer equi-join on the key (both sides shuffle
once, co-partitioned — at 100 TB bucket both snapshots on the key and
the exchange disappears), then map-only classification; the summary is
a partial agg of a handful of groups.  Column comparison is null-safe
(``eqNullSafe`` / SQL ``IS DISTINCT FROM``) so NULL→value and
value→NULL both count as changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key change classification.  Returns the key columns +
    ``change_type`` ('insert' | 'delete' | 'update' | 'unchanged') +
    one ``chg_<col>`` boolean per compared column (false for
    inserts/deletes — the column-level flags describe updates)."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in key_cols and c in new.columns
        ]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    any_chg = None
    for c in compare_cols:
        e = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        any_chg = e if any_chg is None else (any_chg | e)
    ctype = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(any_chg, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    return j.select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in key_cols
        ],
        ctype.alias("change_type"),
        *[
            (both & (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))))
            .alias(f"chg_{c}")
            for c in compare_cols
        ],
    )


def table_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Counts per change type plus per-column changed counts (update
    rows only) — the audit row a snapshot refresh logs."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in key_cols and c in new.columns
        ]
    d = table_diff(old, new, key_cols, compare_cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in compare_cols:
        aggs.append(F.sum(F.col(f"chg_{c}").cast("long")).alias(f"n_chg_{c}"))
    return d.groupBy("change_type").agg(*aggs).orderBy("change_type")
