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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _uniq_marker(prefixed_keys: list[str], side: str):
    """An ``__in_<side>`` marker that doubles as a key-uniqueness guard:
    1 when the key appears once in its snapshot, raise_error otherwise.
    Folded into the marker column (which change-type classification
    consumes) so Catalyst cannot prune it, and windowed on the join key
    so the window reuses the join's own Exchange."""
    cnt = F.count(F.lit(1)).over(Window.partitionBy(*prefixed_keys))
    return F.when(cnt == 1, F.lit(1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"table_diff: duplicate key in '{side}' snapshot ("),
                F.concat_ws(
                    ",", *[F.col(k).cast("string") for k in prefixed_keys]
                ),
                F.lit(
                    ") — diff semantics are per UNIQUE key; duplicate keys "
                    "cross-multiply through the full-outer join and inflate "
                    "change counts. Dedup the snapshot first."
                ),
            )
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    validate_keys: bool = False,
) -> DataFrame:
    """Per-key change classification.  Returns the key columns +
    ``change_type`` ('insert' | 'delete' | 'update' | 'unchanged') +
    one ``chg_<col>`` boolean per compared column (false for
    inserts/deletes — the column-level flags describe updates).

    PRECONDITION: each snapshot must be key-unique (the reference's
    changelog semantics are per unique key).  A duplicated key
    cross-multiplies through the full-outer join and silently inflates
    ``table_diff_summary``'s counts.  Pass ``validate_keys=True`` to
    enforce it in-plan: the job then fails loudly on the first duplicate
    (the check windows on the join key, so it reuses the join's shuffle
    rather than adding one)."""
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
    if validate_keys:
        o = o.withColumn(
            "__in_old", _uniq_marker([f"__ko_{k}" for k in key_cols], "old")
        )
        n = n.withColumn(
            "__in_new", _uniq_marker([f"__kn_{k}" for k in key_cols], "new")
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
    validate_keys: bool = False,
) -> DataFrame:
    """Counts per change type plus per-column changed counts (update
    rows only) — the audit row a snapshot refresh logs.  Same key-
    uniqueness precondition as ``table_diff``; ``validate_keys=True``
    makes a duplicated-key snapshot fail the audit instead of wrongly
    inflating it."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in key_cols and c in new.columns
        ]
    d = table_diff(old, new, key_cols, compare_cols, validate_keys=validate_keys)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in compare_cols:
        aggs.append(F.sum(F.col(f"chg_{c}").cast("long")).alias(f"n_chg_{c}"))
    return d.groupBy("change_type").agg(*aggs).orderBy("change_type")
