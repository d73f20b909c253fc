"""Entity feature snapshot: the one-call per-entity feature block a
training run materializes before joining labels — every timeline-shape
family (level/trend, rhythm, diversity, seasonality) in ONE composed
lazy plan.

Composition notes (why this is cheap): every component is a per-key
aggregate hashing on the SAME key, so Catalyst plans each branch as one
partial-agg Exchange and the final full-outer joins are co-partitioned
(sort-merge on already-hashed sides, no extra row-scale shuffle beyond
each branch's own).  Components drop degenerate entities independently
(trend needs >= 2 events at distinct times, gaps need >= 2 events, ...),
hence FULL OUTER joins — an entity with any feature appears once, with
nulls where a family is undefined.

Reference analog: the reference assembles its per-patch feature vector
from independent extractors into one record (FeatureWriter.java:159-176);
this is the entity-timeline re-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from esa_pfa_spark.operators.signal import (
    behavior_profile_by_key,
    gap_stats_by_key,
    seasonality_strength_by_key,
    trend_by_key,
)


def entity_feature_snapshot(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """Per-entity snapshot: trend (slope/intercept/R^2) x inter-event
    rhythm (gap stats + burstiness) x behavioral diversity (type entropy,
    dominant type) x hour-of-day seasonality (eta^2), full-outer joined
    on the entity key.  One lazy plan; every branch is exact-integer /
    decimal-sum engine-portable, so the whole snapshot is oracle-exact.
    """
    t = trend_by_key(events, key_col=key_col, ts_col=ts_col, value_col=value_col)
    g = gap_stats_by_key(events, key_col=key_col, ts_col=ts_col, tiebreak=tiebreak)
    b = behavior_profile_by_key(events, key_col=key_col, type_col=type_col)
    s = seasonality_strength_by_key(
        events, key_col=key_col, ts_col=ts_col, value_col=value_col
    ).withColumnRenamed("n_events", "n_events_seasonal")
    out = (
        t.join(g, [key_col], "full")
        .join(b.withColumnRenamed("n_events", "n_events_total"), [key_col], "full")
        .join(s, [key_col], "full")
    )
    return out.orderBy(key_col)
