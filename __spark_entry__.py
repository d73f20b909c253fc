"""Driver contract for the spark-graft builder (PySpark target).

Every operator family from SURVEY.md §2 has a queries() entry; each entry
has an exactly-equivalent DuckDB oracle in oracle_sql() unless the
semantics are non-SQL-expressible (the non-reuse two-pointer pairing and
the synthetic flagship pipeline), which the driver records as rows-only.
(The iterative connected-components grid IS oracled — a recursive CTE
propagating decreasing labels.)

Portability conventions (verified Spark 4.1 vs DuckDB):
  * floats rounded via round(x, 6) AFTER all arithmetic;
  * big sums go through decimal(18,6) casts per row (order-independent
    exact addition) then back to double;
  * hashing is md5 (bit-identical across engines);
  * word split = single space; percentiles = linear interpolation
    (Spark percentile == DuckDB quantile_cont);
  * deterministic sampling/tie-breaks use integer arithmetic, never rand().
"""

from __future__ import annotations

import datetime as dt
import sys
from collections.abc import Callable
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esa_pfa_spark.operators.asof import asof_join
from esa_pfa_spark.operators import dedup as DD
from esa_pfa_spark.operators import similarity as SIM
from esa_pfa_spark.operators import textstats as TS
from esa_pfa_spark.operators import multimodal as MM
from esa_pfa_spark.operators.features import stx_columns
from esa_pfa_spark.operators.pairing import find_pairs, interval_pairs
from esa_pfa_spark.operators.windows import run_length, session_summary, sessionize

DAY = 86400


def _ld(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ldw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Wide load for compute-heavy per-row pipelines (shingling, minhash,
    regex gates, edit distance, winnowing, k-means): the small-SF parquet
    files are one or two row groups, so their scans plan 1-2 tasks and the
    expensive first map stage serializes on a 32-slot session.  Fans the
    scan out to slot parallelism when (and only when) it has fewer splits
    than slots — at production scale a table scan has thousands of row
    groups and this is a no-op.  Consumers must be partitioning-invariant
    (the oracle mirror pins that); queries whose plan shape is asserted
    (shuffle_order, token_pack_capacity) deliberately keep plain _ld, as
    do the long composed chains (curation v2/v3, pagerank) where an A/B
    measured the extra scan shuffle as a net loss — their wall time is
    stage-count-bound, not first-map-bound."""
    from esa_pfa_spark.operators.linalg import _fan_out

    return _fan_out(_ld(spark, sf_dir, name))


def _r6(c):
    """6dp engine-side round, signed-zero normalized.  Spark's round goes
    through BigDecimal and already returns +0.0 for tiny negatives (verified),
    but the `+ 0.0` pins that contract explicitly and mirrors the `+ 0.0`
    the DuckDB oracles need (DuckDB round() is sign-preserving: -1e-16
    rounds to -0.0, whose bit pattern fails the driver's value hash —
    the r4 cyclical_time_features FAIL)."""
    return F.round(c, 6) + F.lit(0.0)


def _dsum(c):
    """Order-independent sum: per-row double -> decimal(18,6) -> exact sum -> double."""
    return F.sum(c.cast("decimal(18,6)")).cast("double")


# ---------------------------------------------------------------------------
# Core engine semantics on the events table
# ---------------------------------------------------------------------------

def q_asof_backward(spark, sf_dir):
    """J1/W4: latest purchase at-or-before each click, 7d tolerance."""
    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        payload=["purchase_value"], direction="backward", tolerance=dt.timedelta(days=7),
    )
    return out.select(
        "event_id", "user_id", "query_ts", "matched_ts", _r6(F.col("purchase_value")).alias("purchase_value")
    )


SQL_ASOF_BACKWARD = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase'),
     m AS (SELECT c.event_id, c.user_id, c.query_ts,
                  (SELECT max(p.ts) FROM p
                    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
                      AND epoch(c.query_ts)-epoch(p.ts) <= {7*DAY}) AS matched_ts
           FROM c)
SELECT m.event_id, m.user_id, m.query_ts, m.matched_ts,
       round(p.value, 6) AS purchase_value
FROM m LEFT JOIN p ON p.user_id=m.user_id AND p.ts=m.matched_ts
"""


def q_asof_forward(spark, sf_dir):
    """Forward as-of: earliest error at-or-after each click, 1d tolerance."""
    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("error_value")
    )
    out = asof_join(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        payload=["error_value"], direction="forward", tolerance=dt.timedelta(days=1),
    )
    return out.select(
        "event_id", "user_id", "query_ts", "matched_ts", _r6(F.col("error_value")).alias("error_value")
    )


def q_asof_nearest(spark, sf_dir):
    """Nearest as-of: closest purchase within 12h of each click (either
    side; |dt| ties -> the earlier).  Both directional fills share ONE
    Exchange (see asof.py)."""
    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        payload=["purchase_value"], direction="nearest",
        tolerance=dt.timedelta(hours=12),
    )
    return out.select(
        "event_id", "user_id", "query_ts", "matched_ts",
        _r6(F.col("purchase_value")).alias("purchase_value"),
    )


SQL_ASOF_NEAREST = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase'),
     m AS (SELECT c.event_id, c.user_id, c.query_ts,
                  (SELECT p.ts FROM p
                    WHERE p.user_id=c.user_id
                      AND abs(epoch_us(c.query_ts)-epoch_us(p.ts)) <= {12*3600*1000000}
                    ORDER BY abs(epoch_us(c.query_ts)-epoch_us(p.ts)), p.ts
                    LIMIT 1) AS matched_ts
           FROM c)
SELECT m.event_id, m.user_id, m.query_ts, m.matched_ts,
       round(p.value, 6) AS purchase_value
FROM m LEFT JOIN p ON p.user_id=m.user_id AND p.ts=m.matched_ts
"""


def q_pit_two_table(spark, sf_dir):
    """Feature-store PIT lookup: each click aligned against TWO feature
    groups with independent timelines/tolerances (purchases backward 7d,
    errors backward 3d) — asof.asof_join_multi; both stages share the
    user_id hash partitioning."""
    from esa_pfa_spark.operators.asof import asof_join_multi

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("error_value")
    )
    out = asof_join_multi(
        probes,
        [
            ("purchase", purchases,
             dict(obs_ts="ts", payload=["purchase_value"],
                  direction="backward", tolerance=dt.timedelta(days=7))),
            ("error", errors,
             dict(obs_ts="ts", payload=["error_value"],
                  direction="backward", tolerance=dt.timedelta(days=3))),
        ],
        on="user_id", probe_ts="query_ts",
    )
    return out.select(
        "event_id", "user_id", "query_ts",
        "purchase_matched_ts", _r6(F.col("purchase_value")).alias("purchase_value"),
        "error_matched_ts", _r6(F.col("error_value")).alias("error_value"),
    )


SQL_PIT_TWO_TABLE = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase'),
     er AS (SELECT user_id, ts, value FROM events WHERE event_type='error'),
     m AS (SELECT c.event_id, c.user_id, c.query_ts,
                  (SELECT max(p.ts) FROM p
                    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
                      AND epoch(c.query_ts)-epoch(p.ts) <= {7*DAY}) AS purchase_matched_ts,
                  (SELECT max(er.ts) FROM er
                    WHERE er.user_id=c.user_id AND er.ts<=c.query_ts
                      AND epoch(c.query_ts)-epoch(er.ts) <= {3*DAY}) AS error_matched_ts
           FROM c)
SELECT m.event_id, m.user_id, m.query_ts,
       m.purchase_matched_ts, round(p.value, 6) AS purchase_value,
       m.error_matched_ts, round(er.value, 6) AS error_value
FROM m
LEFT JOIN p ON p.user_id=m.user_id AND p.ts=m.purchase_matched_ts
LEFT JOIN er ON er.user_id=m.user_id AND er.ts=m.error_matched_ts
"""


def q_pit_window_agg(spark, sf_dir):
    """Windowed PIT aggregation features (operators/pit.py): for each
    click, count / exact sum / mean / deterministic last of the user's
    purchases in the half-open window (query_ts - 7d, query_ts] —
    difference-of-cumulatives over ONE fused fill (no pair blowup)."""
    from esa_pfa_spark.operators.pit import pit_window_agg

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("obs_id")
    )
    out = pit_window_agg(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        value="value", tiebreak="obs_id", window=dt.timedelta(days=7),
    )
    return out.select(
        "event_id", "user_id", "query_ts", "n_win",
        _r6(F.col("sum_win")).alias("sum_win"),
        _r6(F.col("mean_win")).alias("mean_win"),
        _r6(F.col("last_val")).alias("last_val"),
        "last_ts",
    )


SQL_PIT_WINDOW_AGG = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value, event_id AS obs_id FROM events WHERE event_type='purchase')
SELECT c.event_id, c.user_id, c.query_ts,
  (SELECT count(*) FROM p WHERE p.user_id=c.user_id
    AND p.ts<=c.query_ts AND p.ts > c.query_ts - INTERVAL 7 DAY) AS n_win,
  round((SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    AND p.ts > c.query_ts - INTERVAL 7 DAY), 6) AS sum_win,
  round((SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    AND p.ts > c.query_ts - INTERVAL 7 DAY HAVING count(*) > 0), 6) AS mean_win,
  round((SELECT p.value FROM p WHERE p.user_id=c.user_id
    AND p.ts<=c.query_ts AND p.ts > c.query_ts - INTERVAL 7 DAY
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1), 6) AS last_val,
  (SELECT p.ts FROM p WHERE p.user_id=c.user_id
    AND p.ts<=c.query_ts AND p.ts > c.query_ts - INTERVAL 7 DAY
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1) AS last_ts
FROM c
"""


SQL_ASOF_FORWARD = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='error'),
     m AS (SELECT c.event_id, c.user_id, c.query_ts,
                  (SELECT min(p.ts) FROM p
                    WHERE p.user_id=c.user_id AND p.ts>=c.query_ts
                      AND epoch(p.ts)-epoch(c.query_ts) <= {DAY}) AS matched_ts
           FROM c)
SELECT m.event_id, m.user_id, m.query_ts, m.matched_ts,
       round(p.value, 6) AS error_value
FROM m LEFT JOIN p ON p.user_id=m.user_id AND p.ts=m.matched_ts
"""


def q_ffill(spark, sf_dir):
    """W4 forward-fill: carry the last purchase value to every event."""
    ev = _ld(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        _r6(F.last(pv, ignorenulls=True).over(w)).alias("last_purchase_value"),
    )


SQL_FFILL = """
SELECT event_id, user_id,
       round(last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS last_purchase_value
FROM events
"""


def q_lag_lead(spark, sf_dir):
    """W1/W2 analogs: lag/lead/gradient of value along each user timeline."""
    ev = _ld(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag1 = F.lag("value", 1).over(w)
    lead1 = F.lead("value", 1).over(w)
    return ev.select(
        "event_id", "user_id",
        _r6(lag1).alias("lag_1_value"),
        _r6(lead1).alias("lead_1_value"),
        _r6(lead1 - lag1).alias("gradient_value"),
    )


SQL_LAG_LEAD = """
SELECT event_id, user_id,
       round(lag(value, 1) OVER w, 6) AS lag_1_value,
       round(lead(value, 1) OVER w, 6) AS lead_1_value,
       round(lead(value, 1) OVER w - lag(value, 1) OVER w, 6) + 0.0 AS gradient_value
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_rolling_mean(spark, sf_dir):
    """W1: trailing 3-row rolling mean per user."""
    ev = _ld(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id", _r6(F.avg("value").over(w)).alias("rolling_mean_3")
    )


SQL_ROLLING = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS rolling_mean_3
FROM events
"""


def q_rolling_median(spark, sf_dir):
    """W1 extension: trailing 5-row exact rolling median per user — the
    robust rolling statistic (operators/windows.py rolling_median; Spark
    has no frame-median aggregate, so it's array_sort over the frame)."""
    from esa_pfa_spark.operators.windows import rolling_median

    ev = _ld(spark, sf_dir, "events")
    # deterministic frame order: (ts, event_id) — mirror SQL_ROLLING
    ev = ev.withColumn(
        "__ord", F.struct(F.col("ts"), F.col("event_id"))
    )
    out = rolling_median(ev, "value", key="user_id", ts="__ord", before=4, after=0)
    return out.select(
        "event_id", "user_id",
        _r6(F.col("rolling_median_value")).alias("rolling_median_5"),
    )


SQL_ROLLING_MEDIAN = """
SELECT event_id, user_id,
       round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS rolling_median_5
FROM events
"""


def q_sessionize(spark, sf_dir):
    """A7 1-D analog: 30-minute-gap sessions."""
    ev = _ld(spark, sf_dir, "events")
    out = sessionize(ev, key="user_id", ts="ts", gap=dt.timedelta(minutes=30))
    return out.select("event_id", "user_id", F.col("session_id").cast("long").alias("session_id"), "session_len")


SQL_SESSIONIZE = """
WITH d AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT event_id, user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM d)
SELECT event_id, user_id, session_id,
       CAST(count(*) OVER (PARTITION BY user_id, session_id) AS INT) AS session_len
FROM s
"""


def q_session_summary(spark, sf_dir):
    ev = _ld(spark, sf_dir, "events")
    out = session_summary(ev, key="user_id", ts="ts", gap=dt.timedelta(minutes=30), value="value")
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start", "session_end", "session_len",
        _r6(F.col("session_mean")).alias("session_mean"),
        _r6(F.col("session_sum")).alias("session_sum"),
    )


SQL_SESSION_SUMMARY = """
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts, value,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM d)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS INT) AS session_len,
       round(avg(value), 6) AS session_mean,
       round(sum(value), 6) AS session_sum
FROM s GROUP BY user_id, session_id
"""


def q_run_length(spark, sf_dir):
    """W3 gaps-and-islands: maximal runs of equal event_type per user."""
    ev = _ld(spark, sf_dir, "events")
    return run_length(ev, key="user_id", ts="ts", flag_col="event_type").select(
        "user_id", "event_type", "run_start", "run_len"
    )


SQL_RUN_LENGTH = """
WITH g AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts)
         - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS grp
  FROM events)
SELECT user_id, event_type, min(ts) AS run_start, CAST(count(*) AS INT) AS run_len
FROM g GROUP BY user_id, event_type, grp
"""


def q_stx_by_type(spark, sf_dir):
    """A1: the canonical 10-stat STX vector per event_type."""
    ev = _ld(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(*stx_columns("value"))
    return agg.select(
        "event_type",
        *[_r6(F.col(c)).alias(c) for c in ["mean", "stdev", "cvar", "min", "max", "p10", "p50", "p90", "skewness"]],
        "count",
    )


SQL_STX = """
WITH s AS (
  SELECT event_type,
         avg(value) AS mean, stddev(value) AS stdev,
         min(value) AS mn, max(value) AS mx,
         quantile_cont(value, 0.1) AS p10, quantile_cont(value, 0.5) AS p50,
         quantile_cont(value, 0.9) AS p90,
         CAST(count(value) AS INT) AS count
  FROM events GROUP BY event_type)
SELECT event_type, round(mean,6) AS mean, round(stdev,6) AS stdev,
       round(stdev/mean,6) AS cvar,
       round(mn,6) AS min, round(mx,6) AS max,
       round(p10,6) AS p10, round(p50,6) AS p50, round(p90,6) AS p90,
       round((p90 - 2*p50 + p10)/(p90 - p10),6) + 0.0 AS skewness,
       count
FROM s
"""


def q_interval_pairs(spark, sf_dir):
    """J1 (with-reuse form): event pairs of the same user with dt in
    [1h, 24h] — time-bucketed band join (identical output to the plain
    band join, tested; ~3x faster and per-task bounded for hot keys)."""
    from esa_pfa_spark.operators.pairing import interval_pairs_bucketed

    ev = _ld(spark, sf_dir, "events")
    return interval_pairs_bucketed(
        ev, key="user_id", ts="ts", id_col="event_id",
        min_tol=dt.timedelta(hours=1), max_tol=dt.timedelta(hours=24),
    )


SQL_INTERVAL_PAIRS = f"""
SELECT a.user_id, a.ts AS ts1, b.ts AS ts2,
       a.event_id AS event_id1, b.event_id AS event_id2
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch(b.ts) - epoch(a.ts) >= 3600
 AND epoch(b.ts) - epoch(a.ts) <= {DAY}
"""


def q_grid_bucket(spark, sf_dir):
    """PatchCS grid-bucketing analog: floor-bucket value x hour-of-day."""
    ev = _ld(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / 50).cast("int").alias("bucket_v"),
            F.hour("ts").alias("bucket_h"),
        )
        .agg(F.count(F.lit(1)).alias("n"), _r6(F.avg("value")).alias("avg_value"))
    )


SQL_GRID_BUCKET = """
SELECT CAST(floor(value/50) AS INT) AS bucket_v,
       CAST(hour(ts) AS INT) AS bucket_h,
       count(*) AS n, round(avg(value),6) AS avg_value
FROM events GROUP BY 1, 2
"""


def q_topk(spark, sf_dir):
    """O2/O3: deterministic top-20 by value."""
    ev = _ld(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", "user_id", _r6(F.col("value")).alias("value"))
        .limit(20)
    )


SQL_TOPK = """
SELECT event_id, user_id, round(value,6) AS value
FROM events ORDER BY value DESC, event_id LIMIT 20
"""


def q_topk_per_group(spark, sf_dir):
    """Per-group top-k (partitioned window — the scale-safe per-key rank,
    vs global top-k's TakeOrderedAndProject): 3 longest docs per source."""
    from esa_pfa_spark.plans.query import top_k_per_group

    return top_k_per_group(
        _ld(spark, sf_dir, "documents").select("source", "doc_id", "n_chars"),
        group="source", col="n_chars", k=3, tiebreak="doc_id",
    )


SQL_TOPK_PER_GROUP = """
SELECT source, doc_id, n_chars,
       CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
            AS INT) AS rank
FROM documents QUALIFY rank <= 3
"""


def q_sample(spark, sf_dir):
    """O4 deterministic sampling: integer-hash gate, no rand()."""
    ev = _ld(spark, sf_dir, "events")
    return ev.filter((F.col("event_id") * 2654435761) % 100 < 5).select(
        "event_id", "user_id", _r6(F.col("value")).alias("value")
    )


SQL_SAMPLE = """
SELECT event_id, user_id, round(value,6) AS value
FROM events WHERE (event_id * 2654435761) % 100 < 5
"""


def q_json_extract(spark, sf_dir):
    """Scalar expression surface: JSON path extraction + aggregation."""
    ev = _ld(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), _r6(F.avg(k)).alias("avg_k")
    )


SQL_JSON = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
FROM events GROUP BY event_type
"""


def q_normalize(spark, sf_dir):
    """A8: global min/max normalization to [0,1]."""
    ev = _ld(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        _r6((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))).alias("norm_value"),
    )


SQL_NORMALIZE = """
SELECT event_id, round((value - b.mn)/(b.mx - b.mn), 6) AS norm_value
FROM events, (SELECT min(value) AS mn, max(value) AS mx FROM events) b
"""


# ---------------------------------------------------------------------------
# Relational operator coverage (TPC-H-ish)
# ---------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    li = _ld(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            _r6(F.avg("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity),6) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    cu = _ld(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _ld(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1996-07-01"))
    li = _ld(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-07-01"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_shipdate  > TIMESTAMP '1996-07-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_tpch_q5ish(spark, sf_dir):
    """Multi-way join: revenue by nation for ASIA customers."""
    r = _ld(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _ld(spark, sf_dir, "nation")
    cu = _ld(spark, sf_dir, "customer")
    o = _ld(spark, sf_dir, "orders")
    li = _ld(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(rev).alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_region_counts(spark, sf_dir):
    """J4-style broadcast dimension join chain."""
    r = _ld(spark, sf_dir, "region")
    n = _ld(spark, sf_dir, "nation")
    cu = _ld(spark, sf_dir, "customer")
    return (
        cu.join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), _r6(F.avg("c_acctbal")).alias("avg_acctbal"))
    )


SQL_REGION_COUNTS = """
SELECT r_name, n_name, count(*) AS n_customers, round(avg(c_acctbal),6) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_custdist_outer(spark, sf_dir):
    """Left-outer join surface (TPC-H Q13 shape): distribution of customers
    by order count, zero-order customers included."""
    cu = _ld(spark, sf_dir, "customer")
    o = _ld(spark, sf_dir, "orders")
    per_cust = (
        cu.join(o, cu.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_CUSTDIST = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
"""


def q_semi_anti(spark, sf_dir):
    """Semi/anti-join surface: per nation, customers with vs without any
    order (left_semi / left_anti — no right columns materialized)."""
    cu = _ld(spark, sf_dir, "customer")
    o = _ld(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    with_orders = cu.join(o, "c_custkey", "left_semi").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    without = cu.join(o, "c_custkey", "left_anti").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_inactive")
    )
    return with_orders.join(without, "c_nationkey", "full_outer").select(
        "c_nationkey",
        F.coalesce("n_active", F.lit(0)).alias("n_active"),
        F.coalesce("n_inactive", F.lit(0)).alias("n_inactive"),
    )


SQL_SEMI_ANTI = """
WITH a AS (SELECT c_nationkey, count(*) AS n_active FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           GROUP BY c_nationkey),
     b AS (SELECT c_nationkey, count(*) AS n_inactive FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           GROUP BY c_nationkey)
SELECT coalesce(a.c_nationkey, b.c_nationkey) AS c_nationkey,
       coalesce(n_active, 0) AS n_active,
       coalesce(n_inactive, 0) AS n_inactive
FROM a FULL OUTER JOIN b ON a.c_nationkey = b.c_nationkey
"""


def q_masked_counts(spark, sf_dir):
    """A3/A4: conditional counts + capped ratio."""
    li = _ld(spark, sf_dir, "lineitem")
    n_disc = F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
    n_tot = F.count(F.lit(1))
    ratio = n_disc * 1.0 / n_tot
    return li.groupBy("l_returnflag").agg(
        n_tot.alias("n_total"),
        n_disc.alias("n_disc_gt5"),
        _r6(ratio).alias("disc_ratio"),
        _r6(F.least(ratio * 2, F.lit(1.0))).alias("capped_ratio"),
    )


SQL_MASKED_COUNTS = """
SELECT l_returnflag, count(*) AS n_total,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc_gt5,
       round(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)*1.0/count(*), 6) AS disc_ratio,
       round(least(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)*1.0/count(*)*2, 1.0), 6) AS capped_ratio
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Dedup / text analysis / similarity (documents, embeddings)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return DD.exact_dedup(_ld(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1
"""


def q_text_quality(spark, sf_dir):
    return TS.quality_scores(_ld(spark, sf_dir, "documents"))


_STOP_IN = ",".join(f"'{s}'" for s in TS.STOPWORDS)
SQL_TEXT_QUALITY = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       CAST(length(text) AS INT) AS n_chars_actual,
       round(length(replace(text, ' ', ''))*1.0 / len(string_split(text, ' ')), 6) AS avg_word_len,
       round(len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN})))*1.0
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       CAST(length(text) < 100 AS INT) AS is_short
FROM documents
"""


def q_token_counts(spark, sf_dir):
    return TS.token_counts(_ld(spark, sf_dir, "documents"))


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS alnum_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS INT) AS bpe_ish_tokens
FROM documents
"""


def q_lang_guess(spark, sf_dir):
    return TS.lang_guess(_ld(spark, sf_dir, "documents"))


SQL_LANG_GUESS = r"""
WITH g AS (
  SELECT doc_id, lang,
         CASE WHEN len(regexp_extract_all(text, '\b(the|is|and|a)\b')) >= 2
              THEN 'en' ELSE 'other' END AS lang_guess
  FROM documents)
SELECT doc_id, lang_guess, CAST(lang_guess = lang AS INT) AS matches_label FROM g
"""


def q_fingerprint(spark, sf_dir):
    return TS.fingerprint(_ld(spark, sf_dir, "documents"))


SQL_FINGERPRINT = r"""
SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
FROM documents
"""


def q_unigram_logprob(spark, sf_dir):
    """LM-scoring quality proxy: per-doc mean ln p(word) under the corpus
    unigram distribution (textstats.unigram_logprob)."""
    return TS.unigram_logprob(_ld(spark, sf_dir, "documents"))


SQL_UNIGRAM_LOGPROB = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
freq AS (SELECT w, count(*) AS wc FROM w GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM w)
SELECT doc_id,
       count(*) AS n_words,
       round(CAST(sum(CAST(ln(wc * 1.0 / n_total) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_logprob
FROM w JOIN freq USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def q_source_kl(spark, sf_dir):
    """Per-source KL divergence vs the corpus word distribution — the
    ingest-batch drift monitor (textstats.source_kl)."""
    return TS.source_kl(_ld(spark, sf_dir, "documents"))


SQL_SOURCE_KL = """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
sw AS (SELECT source, w, count(*) AS swc FROM w GROUP BY 1, 2),
stot AS (SELECT source, sum(swc) AS sn FROM sw GROUP BY 1),
cw AS (SELECT w, sum(swc) AS cwc FROM sw GROUP BY 1),
ctot AS (SELECT sum(sn) AS cn FROM stot)
SELECT source,
       count(*) AS n_distinct_words,
       round(CAST(sum(CAST(
           (swc * 1.0 / sn) * ln((swc * 1.0 / sn) / (cwc * 1.0 / cn))
           AS DECIMAL(18,6))) AS DOUBLE), 6) AS kl_vs_corpus
FROM sw JOIN stot USING (source) JOIN cw USING (w) CROSS JOIN ctot
GROUP BY source
"""


def q_zipf_slope(spark, sf_dir):
    """Per-source Zipf rank-frequency slope (textstats.zipf_slope) —
    closed-form OLS entirely in column math."""
    return TS.zipf_slope(_ld(spark, sf_dir, "documents"))


SQL_ZIPF_SLOPE = """
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
f AS (SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2),
r AS (SELECT source, c,
             row_number() OVER (PARTITION BY source ORDER BY c DESC, w ASC) AS r
      FROM f),
t AS (SELECT source, ln(r * 1.0) AS x, ln(c * 1.0) AS y FROM r),
a AS (SELECT source, count(*) AS n_vocab,
             CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(18,6))) AS DOUBLE) AS sxx
      FROM t GROUP BY 1)
SELECT source, n_vocab,
       round((n_vocab * sxy - sx * sy) / (n_vocab * sxx - sx * sx), 6) + 0.0 AS zipf_slope
FROM a
"""


def q_oov_rate(spark, sf_dir):
    """Per-doc OOV ratio vs the corpus top-1000 vocabulary
    (textstats.oov_rate; vocabulary broadcast, corpus never shuffles)."""
    return TS.oov_rate(_ld(spark, sf_dir, "documents"), vocab_size=1000)


SQL_OOV_RATE = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
v AS (SELECT w, 1 AS iv FROM (SELECT w, count(*) AS c FROM w GROUP BY 1)
      ORDER BY c DESC, w ASC LIMIT 1000)
SELECT doc_id, count(*) AS n_words,
       round(sum(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           AS oov_ratio
FROM w LEFT JOIN v USING (w)
GROUP BY doc_id
"""


def q_ngram_jaccard(spark, sf_dir):
    """Stop-shingle cap ON (dedup.MAX_SHINGLE_FREQ=1000, mirrored in the
    oracle): shingles with doc-frequency > 1000 are excluded from both
    intersections and sizes — bounds the shingle-bucket self-join's
    per-bucket fan-out at web scale (see ngram_jaccard_pairs docstring)."""
    return DD.ngram_jaccard_pairs(_ldw(spark, sf_dir, "documents"), threshold=0.2)


SQL_NGRAM_JACCARD = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
capped AS (SELECT shingle FROM sh0 GROUP BY shingle
           HAVING count(*) <= {DD.MAX_SHINGLE_FREQ}),
sh AS (SELECT doc_id, sh0.shingle FROM sh0 JOIN capped ON sh0.shingle = capped.shingle),
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da AS doc_id_a, db AS doc_id_b,
       round(i*1.0/(sa.s + sb.s - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
WHERE i*1.0/(sa.s + sb.s - i) >= 0.2
"""


def q_minhash_signatures(spark, sf_dir):
    return DD.minhash_signatures(_ld(spark, sf_dir, "documents"))


SQL_MINHASH_SIG = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3)
SELECT doc_id,
       min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
       min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
       min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
FROM sh GROUP BY doc_id
"""


def q_minhash_candidates(spark, sf_dir):
    return DD.minhash_band_candidates(_ld(spark, sf_dir, "documents"))


SQL_MINHASH_CAND = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id)
SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
FROM sig a JOIN sig b
  ON a.doc_id < b.doc_id
 AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
   OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))
"""


def q_editdist_rerank(spark, sf_dir):
    """Candidate→verify funnel tail (dedup.editdist_rerank): exact
    Levenshtein + normalized similarity over the LSH-banded candidate
    pairs — the final exact check before a merge decision.  The O(len²)
    DP runs ONLY on the pruned candidate set (the funnel's whole
    point), and both engines share the DP definition, so the stage is
    exactly oracled."""
    cand = DD.minhash_band_candidates(_ldw(spark, sf_dir, "documents"))
    return DD.editdist_rerank(
        _ld(spark, sf_dir, "documents"), cand
    ).orderBy(F.col("edit_sim").desc(), "doc_id_a", "doc_id_b")


SQL_EDITDIST_RERANK = f"""
WITH cand AS MATERIALIZED ({SQL_MINHASH_CAND}),
j AS (SELECT c.doc_id_a, c.doc_id_b,
             levenshtein(da.text, db.text) AS edit_dist,
             GREATEST(length(da.text), length(db.text)) AS mx
      FROM cand c JOIN documents da ON da.doc_id = c.doc_id_a
                  JOIN documents db ON db.doc_id = c.doc_id_b)
SELECT doc_id_a, doc_id_b, CAST(edit_dist AS INT) AS edit_dist,
       ROUND(CAST(1.0 AS DOUBLE) - CAST(edit_dist AS DOUBLE) / mx, 6) AS edit_sim
FROM j ORDER BY edit_sim DESC, doc_id_a, doc_id_b
"""


def q_minhash_estimates(spark, sf_dir):
    """MinHash Jaccard estimates over the banded candidates — the cheap
    re-rank stage between candidate generation and exact verification
    (dedup.minhash_jaccard_estimates).  Deterministic, so exactly
    oracled despite being an estimator; accuracy vs exact Jaccard is
    contract-tested in tests/test_dedup.py."""
    return DD.minhash_jaccard_estimates(_ld(spark, sf_dir, "documents"))


SQL_MINHASH_ESTIMATES = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         FROM sig a JOIN sig b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5)))
SELECT c.doc_id_a, c.doc_id_b,
       round(((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END)
            + (CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END)
            + (CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END)
            + (CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END)
            + (CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END)
            + (CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END)) * 1.0 / 6, 6)
           AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_id_a
JOIN sig sb ON sb.doc_id = c.doc_id_b
"""


def q_dedup_survivors(spark, sf_dir):
    """Survivor selection over the MinHash-LSH candidate pairs: clusters
    by alternating large-star/small-star connected components (O(log n)
    rounds — see dedup.graph_components), canonical = cluster-min id."""
    docs = _ldw(spark, sf_dir, "documents")
    return DD.dedup_survivors(docs, DD.minhash_band_candidates(docs))


SQL_DEDUP_SURVIVORS = """
WITH RECURSIVE
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         FROM sig a JOIN sig b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))),
e AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
nodes AS (SELECT DISTINCT u AS id FROM e),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.id WHERE r.lbl < e.v),
comp AS (SELECT id, min(lbl) AS canonical FROM reach GROUP BY 1)
SELECT d.doc_id,
       coalesce(c.canonical, d.doc_id) AS canonical_doc_id,
       coalesce(c.canonical, d.doc_id) = d.doc_id AS survives
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
"""


def q_simhash(spark, sf_dir):
    return DD.simhash16(_ld(spark, sf_dir, "documents"))


def _simhash_sql() -> str:
    hexpr = "CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER)"
    sums = ",\n       ".join(
        f"sum(CASE WHEN ({hexpr} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(16)
    )
    total = " + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
WITH words AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
s AS (SELECT doc_id,
       {sums}
      FROM words GROUP BY doc_id)
SELECT doc_id, CAST({total} AS INT) AS simhash FROM s
"""


def q_embedding_topk(spark, sf_dir):
    emb = _ld(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return SIM.cosine_topk(emb.filter(F.col("vec_id") != 0), probe, k=20)


SQL_EMB_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
      FROM embeddings e, q WHERE e.vec_id != 0)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM s QUALIFY rank <= 20
"""


def q_quantized_topk(spark, sf_dir):
    """int8-quantized cosine top-k (similarity.quantized_cosine_topk):
    the 4×-bandwidth-reduction serving path, value-level oracle (integer
    products are bit-exact across engines)."""
    emb = _ld(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return SIM.quantized_cosine_topk(emb.filter(F.col("vec_id") != 0), probe, k=20)


SQL_QUANTIZED_TOPK = """
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> floor(x * 127.0 /
                greatest(list_max(list_transform(embedding::DOUBLE[], y -> abs(y))), 1e-30)
                + 0.5)) AS q8
  FROM embeddings),
p AS (SELECT q8 AS pq8 FROM qz WHERE vec_id = 0),
s AS (SELECT qz.vec_id,
             list_dot_product(qz.q8, p.pq8)
             / (sqrt(list_dot_product(qz.q8, qz.q8))
                * sqrt(list_dot_product(p.pq8, p.pq8))) AS cos
      FROM qz, p WHERE qz.vec_id != 0)
SELECT vec_id,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank,
       round(cos, 6) + 0.0 AS qcos
FROM s QUALIFY rank <= 20
"""


def q_embedding_neardup(spark, sf_dir):
    return SIM.neardup_pairs(_ld(spark, sf_dir, "embeddings"), threshold=0.3)


SQL_EMB_NEARDUP = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
"""


def q_multimodal_meta(spark, sf_dir):
    """Binary payload plumbing: pack -> mapInPandas decode stub -> metadata."""
    docs = _ld(spark, sf_dir, "documents")
    return MM.decode_batch(MM.as_binary_payload(docs))


SQL_MULTIMODAL = """
SELECT doc_id,
       CAST(strlen(text) AS INT) AS n_bytes,
       CAST(strlen(text) % 256 AS INT) AS width,
       CAST((strlen(text) * 7) % 256 AS INT) AS height
FROM documents
"""


def q_multimodal_frames(spark, sf_dir):
    """Frame sampling (1:N mapInPandas): each binary payload yields
    min(max(bytes//32, 1), 4) frame rows."""
    docs = _ld(spark, sf_dir, "documents")
    return MM.frame_sample_batch(MM.as_binary_payload(docs)).select("doc_id", "frame_idx")


SQL_MULTIMODAL_FRAMES = """
SELECT doc_id, CAST(unnest(generate_series(1, n)) - 1 AS INT) AS frame_idx
FROM (SELECT doc_id,
             CAST(least(greatest(strlen(text) // 32, 1), 4) AS BIGINT) AS n
      FROM documents)
"""


def q_curation(spark, sf_dir):
    """End-to-end curation pipeline (plans/curation.py): quality gate ->
    exact dedup (keep min doc_id per digest) -> near-dup removal (drop the
    greater doc of each Jaccard>=0.2 pair).  The production composition
    of the engine's text/dedup operators, one lazy DataFrame program."""
    from esa_pfa_spark.plans.curation import curate_documents

    return curate_documents(_ld(spark, sf_dir, "documents"))


SQL_CURATION = f"""
WITH good AS (
  SELECT d.* FROM documents d
  WHERE len(string_split(text, ' ')) >= 5
    AND len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN}))) * 1.0
        / len(string_split(text, ' ')) <= 0.7),
canon AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text)),
k AS (SELECT good.* FROM good JOIN canon USING (doc_id)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM k),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
capped AS (SELECT shingle FROM sh0 GROUP BY shingle
           HAVING count(*) <= {DD.MAX_SHINGLE_FREQ}),
sh AS (SELECT doc_id, sh0.shingle FROM sh0 JOIN capped ON sh0.shingle = capped.shingle),
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
nd AS (SELECT DISTINCT db AS doc_id
       FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
       WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.2)
SELECT k.doc_id, k.source FROM k ANTI JOIN nd USING (doc_id)
"""


def q_training_windows(spark, sf_dir):
    """Corpus -> training windows, end-to-end: curation chain -> portable
    tokenization -> capacity-128 packing (plans/curation.py
    training_windows).  The whole training-data path as ONE lazy program
    with an exact chained-CTE oracle."""
    from esa_pfa_spark.plans.curation import training_windows

    return training_windows(_ld(spark, sf_dir, "documents"))


# the curation CTE chain (SQL_CURATION) feeding the packing cumsum
# (SQL_TOKEN_PACKING) over the survivors
SQL_TRAINING_WINDOWS = (
    SQL_CURATION.rsplit("SELECT k.doc_id", 1)[0].rstrip().rstrip(")")
    + """),
surv AS (
  SELECT k.source, k.doc_id, k.text FROM k ANTI JOIN nd USING (doc_id)),
tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM surv),
cum AS (SELECT source, doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY source, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS gs
        FROM tok WHERE n_tok > 0),
sp AS (SELECT source, doc_id, n_tok, gs,
              unnest(generate_series(CAST(gs // 128 AS BIGINT),
                                     CAST((gs + n_tok - 1) // 128 AS BIGINT))) AS chunk_id
       FROM cum)
SELECT source, doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(greatest(chunk_id * 128 - gs, 0) AS BIGINT) AS tok_start_in_doc,
       CAST(least(chunk_id * 128 + 128 - gs, n_tok)
            - greatest(chunk_id * 128 - gs, 0) AS BIGINT) AS n_in_chunk
FROM sp
"""
)


# ---------------------------------------------------------------------------
# Non-SQL-expressible (rows-only checks): flagship synthetic pipeline
# ---------------------------------------------------------------------------

def q_flagship_synth(spark, sf_dir):
    """The north-star pipeline on the exact input-hint tokens table:
    STX token stats + lag/lead + sessionize + backward as-of (7d), verified
    against the pandas oracle in tests/test_pipeline.py."""
    from esa_pfa_spark import synth
    from esa_pfa_spark.plans.pipeline import feature_table

    obs = synth.observations_df(spark, seed=42, n_entities=30, mean_obs=25, mean_tok=24)
    probes = synth.queries_df(spark, seed=42, n_entities=30, mean_obs=25)
    return feature_table(obs, probes).drop("tokens")


def q_nonreuse_pairs_synth(spark, sf_dir):
    """FindPatchPairs.java:57-76 non-reuse two-pointer pairing (stateful
    sequential per key — not SQL-expressible), session-sliced for
    parallelism; exactness proven in tests/test_pairing.py."""
    from esa_pfa_spark import synth

    obs = synth.observations_df(spark, seed=42, n_entities=30, mean_obs=25, mean_tok=24)
    return find_pairs(obs, min_overlap=0.2, chunk="session")




# ---------------------------------------------------------------------------
# Extended operator coverage (round-1 additions)
# ---------------------------------------------------------------------------

def q_bfill(spark, sf_dir):
    """W4 backward-fill: next purchase value at-or-after each event."""
    ev = _ld(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id", "user_id",
        _r6(F.first(pv, ignorenulls=True).over(w)).alias("next_purchase_value"),
    )


SQL_BFILL = """
SELECT event_id, user_id,
       round(first_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS next_purchase_value
FROM events
"""


def q_nsphere(spark, sf_dir):
    """n-sphere decomposition (SpectralFeaturesOp.java:86-141) as pure
    column math over a 4-component per-row vector."""
    from esa_pfa_spark.functions.expr import nsphere_angle, nsphere_magnitude

    li = _ld(spark, sf_dir, "lineitem")
    d = [
        F.col("l_quantity") - 25.0,
        F.col("l_discount") * 100.0 - 5.0,
        F.col("l_tax") * 100.0 - 4.0,
        (F.col("l_partkey") % 7).cast("double") - 3.0,
    ]
    return li.select(
        "l_orderkey", "l_linenumber",
        _r6(nsphere_magnitude(*d)).alias("magnitude"),
        _r6(nsphere_angle(0, *d)).alias("angle_1"),
        _r6(nsphere_angle(1, *d)).alias("angle_2"),
        _r6(nsphere_angle(2, *d)).alias("angle_3"),
    )


SQL_NSPHERE = """
WITH v AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity - 25.0 AS d1,
         l_discount * 100.0 - 5.0 AS d2,
         l_tax * 100.0 - 4.0 AS d3,
         CAST(l_partkey % 7 AS DOUBLE) - 3.0 AS d4
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round(sqrt(d1*d1 + d2*d2 + d3*d3 + d4*d4), 6) AS magnitude,
       round(CASE WHEN d1*d1 + d2*d2 + d3*d3 + d4*d4 = 0 THEN 0.0
                  ELSE acos(least(greatest(d1 / sqrt(d1*d1 + d2*d2 + d3*d3 + d4*d4), -1.0), 1.0)) END, 6) AS angle_1,
       round(CASE WHEN d2*d2 + d3*d3 + d4*d4 = 0 THEN 0.0
                  ELSE acos(least(greatest(d2 / sqrt(d2*d2 + d3*d3 + d4*d4), -1.0), 1.0)) END, 6) AS angle_2,
       round(CASE WHEN d4 < 0 THEN 2*pi() - (CASE WHEN d3*d3 + d4*d4 = 0 THEN 0.0
                  ELSE acos(least(greatest(d3 / sqrt(d3*d3 + d4*d4), -1.0), 1.0)) END)
                  ELSE (CASE WHEN d3*d3 + d4*d4 = 0 THEN 0.0
                  ELSE acos(least(greatest(d3 / sqrt(d3*d3 + d4*d4), -1.0), 1.0)) END) END, 6) AS angle_3
FROM v
"""


def q_embedding_centroid(spark, sf_dir):
    """A9 cluster-center mean vector: element-wise mean per label."""
    emb = _ld(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy("label", "pos").agg(
        _r6(F.avg(F.col("v").cast("double"))).alias("centroid")
    )


SQL_EMB_CENTROID = """
SELECT label, i - 1 AS pos, round(avg(CAST(embedding[i] AS DOUBLE)), 6) + 0.0 AS centroid
FROM embeddings, generate_series(1, 64) AS t(i)
GROUP BY label, i - 1
"""


def q_source_dictionary(spark, sf_dir):
    """A10 name->index dictionary (Lucene2Simple.java:64-91), built with
    the scalable two-pass ranked form (operators/dictionary.py) — no
    partition-less dense_rank window; identical output."""
    from esa_pfa_spark.operators.dictionary import dense_ids

    docs = _ld(spark, sf_dir, "documents")
    return dense_ids(docs, "source", out_col="dict_id")


SQL_SOURCE_DICT = """
SELECT source, dense_rank() OVER (ORDER BY source) - 1 AS dict_id
FROM (SELECT DISTINCT source FROM documents)
"""

_GRID_CTE = """
g AS (SELECT CAST(event_id % 50 AS INT) AS x,
             CAST((event_id // 50) % 40 AS INT) AS y,
             max(value) > 150 AS flag
      FROM events GROUP BY 1, 2)
"""


def _events_grid(spark, sf_dir):
    ev = _ld(spark, sf_dir, "events")
    return ev.groupBy(
        (F.col("event_id") % 50).cast("int").alias("x"),
        (F.floor(F.col("event_id") / 50) % 40).cast("int").alias("y"),
    ).agg((F.max("value") > 150).alias("flag"))


def q_grid_adjacency(spark, sf_dir):
    """A5 adjacency-pair counts (AggregationMetrics.java:83-129) as a
    relational neighbor self-join over an events-derived boolean grid."""
    from esa_pfa_spark.operators.spatial import adjacency_counts

    return adjacency_counts(_events_grid(spark, sf_dir))


SQL_GRID_ADJACENCY = f"""
WITH {_GRID_CTE},
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
pairs AS (
  SELECT a.flag AS f, b.flag AS nf
  FROM g a CROSS JOIN o JOIN g b ON b.x = a.x + o.dx AND b.y = a.y + o.dy)
SELECT CAST(sum(CASE WHEN NOT f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n00,
       CAST(sum(CASE WHEN NOT f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       CAST(sum(CASE WHEN f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       CAST(sum(CASE WHEN f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n11
FROM pairs
"""


def q_grid_connectivity(spark, sf_dir):
    """A6 connectivity metrics (ConnectivityMetrics.java:44-126):
    occupied/inside/border + fractal index over the derived grid."""
    from esa_pfa_spark.operators.spatial import connectivity_metrics

    g = _events_grid(spark, sf_dir)
    m = connectivity_metrics(g)
    return m.select(
        "occupied", "inside", "border", _r6(F.col("fractal_index")).alias("fractal_index")
    )


SQL_GRID_CONNECTIVITY = f"""
WITH {_GRID_CTE},
occ AS (SELECT x, y FROM g WHERE flag),
o(dx, dy) AS (VALUES (-1,0),(1,0),(0,-1),(0,1)),
nset AS (
  SELECT a.x, a.y, count(*) AS c
  FROM occ a CROSS JOIN o JOIN g b ON b.x = a.x + o.dx AND b.y = a.y + o.dy AND b.flag
  GROUP BY a.x, a.y),
cls AS (
  SELECT occ.x, occ.y, coalesce(nset.c, 0) = 4 AS is_inside
  FROM occ LEFT JOIN nset ON occ.x = nset.x AND occ.y = nset.y)
SELECT count(*) AS occupied,
       CAST(sum(CASE WHEN is_inside THEN 1 ELSE 0 END) AS BIGINT) AS inside,
       CAST(count(*) - sum(CASE WHEN is_inside THEN 1 ELSE 0 END) AS BIGINT) AS border,
       round(2.0 - sum(CASE WHEN is_inside THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS fractal_index
FROM cls
"""


def q_staircase(spark, sf_dir):
    """W5 threshold-staircase count (FrontsCloudMaskOperator.java:117-163)."""
    from esa_pfa_spark.functions.expr import staircase_count

    ev = _ld(spark, sf_dir, "events")
    return ev.select(
        "event_id", staircase_count(F.col("value"), 0.0, 250.0, 10.0).alias("stair")
    )


SQL_STAIRCASE = """
SELECT event_id,
       CAST(least(greatest(floor((value - 0.0) / 10.0) + 1, 0), 25) AS INT) AS stair
FROM events
"""


def q_date_roundtrip(spark, sf_dir):
    """2.8 date surface: encode the reference's name scheme
    X%04dY%04d_T<yyyyMMddHHmm> and parse the timestamp back
    (BiTempPreprocessor.java:135-139, FindPatchPairs.java:85-91)."""
    from esa_pfa_spark.functions.expr import ts_from_name

    ev = _ld(spark, sf_dir, "events")
    name = F.format_string(
        "X%04dY%04d_T%s",
        (F.col("event_id") % 100).cast("int"),
        (F.col("event_id") % 50).cast("int"),
        F.date_format("ts", "yyyyMMddHHmm"),
    )
    named = ev.select("event_id", "ts", name.alias("name"))
    return named.select(
        "event_id", "name",
        ts_from_name(F.col("name")).alias("parsed_ts"),
    )


SQL_DATE_ROUNDTRIP = r"""
WITH n AS (
  SELECT event_id, ts,
         printf('X%04dY%04d_T%s', CAST(event_id % 100 AS INT),
                CAST(event_id % 50 AS INT), strftime(ts, '%Y%m%d%H%M')) AS name
  FROM events)
SELECT event_id, name,
       strptime(regexp_extract(name, 'T(\d{12})', 1), '%Y%m%d%H%M') AS parsed_ts
FROM n
"""

_SCORE_WEIGHTS = [(((i * 37) % 19) - 9) / 10.0 for i in range(64)]


def q_linear_score(spark, sf_dir):
    """2.10 batch-scoring UDF surface (SVM.classify analog,
    SVM.java:122-132): vectorized linear decision + threshold labels."""
    import numpy as np

    from esa_pfa_spark.operators.scoring import classify_threshold, score_linear

    emb = _ld(spark, sf_dir, "embeddings")
    scored = score_linear(emb, np.array(_SCORE_WEIGHTS), bias=0.1)
    return classify_threshold(scored).select(
        "vec_id", _r6(F.col("decision")).alias("decision"), F.col("label").cast("int").alias("label")
    )


def _linear_score_sql() -> str:
    w = ", ".join(str(x) for x in _SCORE_WEIGHTS)
    return f"""
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], [{w}]::DOUBLE[]) + 0.1, 6) + 0.0 AS decision,
       CASE WHEN list_dot_product(embedding::DOUBLE[], [{w}]::DOUBLE[]) + 0.1 > 0
            THEN 1 ELSE 0 END AS label
FROM embeddings
"""


def q_rolling_time_range(spark, sf_dir):
    """W1 on a TIME frame: trailing 1-hour rolling mean/count per user via
    rangeBetween on epoch seconds (SURVEY.md §2.5 frame-spec requirement)."""
    from esa_pfa_spark.functions.time import epoch_s

    ev = _ld(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s(F.col("ts")))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", "user_id",
        _r6(F.avg("value").over(w)).alias("rolling_1h_mean"),
        F.count(F.lit(1)).over(w).cast("int").alias("rolling_1h_n"),
    )


SQL_ROLLING_TIME = """
SELECT event_id, user_id,
       round(avg(value) OVER w, 6) AS rolling_1h_mean,
       CAST(count(*) OVER w AS INT) AS rolling_1h_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def q_session_window_native(spark, sf_dir):
    """Native F.session_window (the streaming-capable session operator) in
    batch mode; oracle emulates its end-exclusive semantics (new session
    when delta >= gap; session_end = last_ts + gap)."""
    import datetime as dt

    from esa_pfa_spark.streaming.sessions import session_window_agg

    ev = _ld(spark, sf_dir, "events")
    out = session_window_agg(ev, "user_id", "ts", gap=dt.timedelta(minutes=30), value="value")
    return out.select(
        "user_id", "session_start", "session_end", "session_len",
        _r6(F.col("session_mean")).alias("session_mean"),
        _r6(F.col("session_sum")).alias("session_sum"),
    )


SQL_SESSION_WINDOW_NATIVE = """
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
              THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM d)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS INT) AS session_len,
       round(avg(value), 6) AS session_mean,
       round(sum(value), 6) AS session_sum
FROM s GROUP BY user_id, sid
"""


def q_scd2_intervals(spark, sf_dir):
    """SCD2 compaction of the purchase log: change-row filter (level =
    floor(value) — repeated identical levels collapse) + [valid_from,
    valid_to) validity intervals (windows.scd2_intervals).  The
    interval⋈probe form of the PIT lookup is proven equal to asof_join
    in tests/test_windows.py."""
    from esa_pfa_spark.operators.windows import scd2_intervals

    p = (
        _ld(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", F.floor("value").alias("level"))
    )
    out = scd2_intervals(
        p, key="user_id", ts="ts", dedupe_unchanged=["level"], tiebreak=["event_id"]
    )
    return out.select("user_id", "level", F.col("ts").alias("valid_from"), "valid_to")


SQL_SCD2_INTERVALS = """
WITH p AS (SELECT user_id, ts, event_id, CAST(floor(value) AS BIGINT) AS level
           FROM events WHERE event_type='purchase'),
d AS (SELECT user_id, ts, event_id, level,
        CASE WHEN lag(ts) OVER w IS NULL
               OR lag(level) OVER w IS DISTINCT FROM level THEN 1 ELSE 0 END AS chg
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, ts, event_id, level FROM d WHERE chg = 1)
SELECT user_id, level, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM s
"""


def q_tumbling_rate(spark, sf_dir):
    """Tumbling-window ingest-rate monitor (streaming/rates.py — batch
    form of the watermarked streaming aggregation; stream/batch parity
    tested in tests/test_streaming_rates.py)."""
    from esa_pfa_spark.streaming.rates import tumbling_rate

    return tumbling_rate(
        _ld(spark, sf_dir, "events"),
        ts="ts", key="event_type", width=dt.timedelta(minutes=5), value="value",
    )


SQL_TUMBLING_RATE = """
SELECT event_type,
       CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP) AS w_start,
       CAST(to_timestamp(floor(epoch(ts) / 300) * 300 + 300) AS TIMESTAMP) AS w_end,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def q_salted_agg(spark, sf_dir):
    """Skew remedy with an oracle: two-phase salted aggregation must equal
    the plain GROUP BY (salting is physical, not semantic).  Sums ride
    decimal(18,6) so the two-phase addition is order-independent exact."""
    from esa_pfa_spark.skew import salted_agg

    ev = _ld(spark, sf_dir, "events").withColumn(
        "vdec", F.col("value").cast("decimal(18,6)")
    )
    out = salted_agg(ev, "user_id", {"n": ("count", "*"), "vsum": ("sum", "vdec")}, n_salt=16)
    return out.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        _r6(F.col("vsum").cast("double")).alias("sum_value"),
        _r6(F.col("vsum").cast("double") / F.col("n")).alias("avg_value"),
    )


SQL_SALTED_AGG = """
SELECT user_id, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
FROM events GROUP BY user_id
"""


def _lsh_planes():
    import numpy as np

    rng = np.random.default_rng(7)
    return rng.standard_normal((8, 64)).astype(np.float64)


def _sig_sql(vec_expr: str) -> str:
    """DuckDB expression computing the 8-bit hyperplane-sign signature of
    ``vec_expr`` with the SAME seeded planes as the Spark side."""
    planes = _lsh_planes()
    terms = []
    for b in range(planes.shape[0]):
        lits = ", ".join(repr(x) for x in planes[b])
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], [{lits}]::DOUBLE[]) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(terms)


def q_ann_lsh_topk(spark, sf_dir):
    """Approximate NN, the scale path: random-hyperplane LSH bucket prunes
    candidates, exact cosine re-ranks within the probe's bucket."""
    emb = _ld(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return SIM.ann_topk_lsh(
        emb.filter(F.col("vec_id") != 0), probe, k=10, n_planes=8, seed=7, dim=64
    )


def _ann_lsh_sql() -> str:
    sig = _sig_sql("embedding")
    qsig = _sig_sql("qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.embedding, q.qv
  FROM embeddings e, q
  WHERE e.vec_id != 0 AND ({sig}) = ({qsig})),
s AS (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], qv::DOUBLE[])
         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            * sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))) AS cos
  FROM cand)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM s QUALIFY rank <= 10
"""


def q_ann_lsh_batch(spark, sf_dir):
    """Batch-probe ANN (the production shape): probes 0..2 each search
    their own LSH bucket in one pass; per-probe rank is a window
    PARTITIONED BY probe_id — the shuffle scales with the probe count."""
    emb = _ld(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    cands = emb.filter(F.col("vec_id") > 2)
    return SIM.ann_topk_lsh_batch(cands, probes, k=5, n_planes=8, seed=7, dim=64)


def _ann_lsh_batch_sql() -> str:
    sig = _sig_sql("embedding")
    return f"""
WITH s AS (SELECT vec_id, embedding, ({sig}) AS sig
           FROM embeddings WHERE vec_id > 2),
p AS (SELECT vec_id AS probe_id, embedding AS qv, ({sig}) AS sig
      FROM embeddings WHERE vec_id <= 2),
sc AS (SELECT p.probe_id, s.vec_id,
              list_dot_product(s.embedding::DOUBLE[], p.qv::DOUBLE[])
              / (sqrt(list_dot_product(s.embedding::DOUBLE[], s.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(p.qv::DOUBLE[], p.qv::DOUBLE[]))) AS cos
       FROM s JOIN p ON s.sig = p.sig)
SELECT probe_id, vec_id,
       CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM sc QUALIFY rank <= 5
"""


def q_embedding_neardup_lsh(spark, sf_dir):
    """Near-dup pairs with LSH blocking (the non-quadratic scale path):
    the self-join is restricted to equal signature buckets."""
    emb = _ld(spark, sf_dir, "embeddings")
    sigs = SIM.lsh_signature(emb, n_planes=8, seed=7, dim=64)
    withsig = emb.join(sigs, "vec_id")
    return SIM.neardup_pairs(withsig, threshold=0.3, block_col="lsh_sig")


def _neardup_lsh_sql() -> str:
    sig = _sig_sql("embedding")
    return f"""
WITH s AS (SELECT vec_id, embedding, ({sig}) AS sig FROM embeddings)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
"""


def q_most_ambiguous(spark, sf_dir):
    """§3.3 active-learning surface: the q vectors nearest the decision
    boundary (smallest |decision value|) — ActiveLearning.java:483-493."""
    import numpy as np

    from esa_pfa_spark.operators.scoring import score_linear
    from esa_pfa_spark.plans.query import most_ambiguous

    emb = _ld(spark, sf_dir, "embeddings")
    scored = score_linear(emb, np.array(_SCORE_WEIGHTS), bias=0.1)
    out = most_ambiguous(scored, decision_col="decision", k=15, tiebreak="vec_id")
    return out.select("vec_id", _r6(F.col("decision")).alias("decision"))


def _most_ambiguous_sql() -> str:
    w = ", ".join(str(x) for x in _SCORE_WEIGHTS)
    return f"""
WITH s AS (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], [{w}]::DOUBLE[]) + 0.1 AS decision
  FROM embeddings)
SELECT vec_id, round(decision, 6) + 0.0 AS decision
FROM s ORDER BY abs(decision), vec_id LIMIT 15
"""


def q_asof_multikey(spark, sf_dir):
    """As-of join on a COMPOSITE key (user_id, event_type): latest prior
    same-type event's value at each probe, 3d tolerance — exercises the
    list-key path of asof_join."""
    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id", "user_id", "event_type", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_id") % 5 != 0).select(
        "user_id", "event_type", "ts", F.col("value").alias("prev_value")
    )
    out = asof_join(
        probes, obs, on=["user_id", "event_type"], probe_ts="query_ts", obs_ts="ts",
        payload=["prev_value"], direction="backward", tolerance=dt.timedelta(days=3),
    )
    return out.select(
        "event_id", "user_id", "event_type", "query_ts", "matched_ts",
        _r6(F.col("prev_value")).alias("prev_value"),
    )


SQL_ASOF_MULTIKEY = f"""
WITH c AS (SELECT event_id, user_id, event_type, ts AS query_ts
           FROM events WHERE event_id % 5 = 0),
     p AS (SELECT user_id, event_type, ts, value
           FROM events WHERE event_id % 5 != 0),
     m AS (SELECT c.event_id, c.user_id, c.event_type, c.query_ts,
                  (SELECT max(p.ts) FROM p
                    WHERE p.user_id = c.user_id AND p.event_type = c.event_type
                      AND p.ts <= c.query_ts
                      AND epoch(c.query_ts) - epoch(p.ts) <= {3*DAY}) AS matched_ts
           FROM c)
SELECT m.event_id, m.user_id, m.event_type, m.query_ts, m.matched_ts,
       round(p.value, 6) AS prev_value
FROM m LEFT JOIN p
  ON p.user_id = m.user_id AND p.event_type = m.event_type AND p.ts = m.matched_ts
"""


def _ivf_centroids():
    import numpy as np

    rng = np.random.default_rng(11)
    return rng.standard_normal((8, 64)).astype(np.float64)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: vectors are assigned to the nearest of 8 seeded
    centroids (argmax dot, ties to lowest index); the probe searches only
    its own cluster, exact cosine re-rank inside."""
    from esa_pfa_spark.operators.similarity import ivf_assign, cosine, _rank_topk

    emb = _ld(spark, sf_dir, "embeddings")
    cents = _ivf_centroids()
    assigned = ivf_assign(emb.filter(F.col("vec_id") != 0), cents)
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    passigned = ivf_assign(probe, cents, vec_col="q", id_col=None).select(
        F.col("ivf_cluster").alias("__pc"), "q"
    )
    cand = assigned.crossJoin(F.broadcast(passigned)).filter(
        F.col("ivf_cluster") == F.col("__pc")
    )
    scored = cand.select("vec_id", cosine(F.col("embedding"), F.col("q")).alias("cos"))
    return _rank_topk(scored, 10, "vec_id")


def _ivf_sql() -> str:
    cents = _ivf_centroids()

    def dots(vec):
        return ", ".join(
            f"list_dot_product({vec}::DOUBLE[], [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
            for c in cents
        )

    # argmax with ties to lowest index: list_position finds the FIRST match
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
a AS (SELECT vec_id, embedding,
             CAST(list_position(d, list_max(d)) AS INT) AS cl
      FROM (SELECT vec_id, embedding, [{dots("embedding")}] AS d
            FROM embeddings WHERE vec_id != 0)),
p AS (SELECT qv, CAST(list_position(d, list_max(d)) AS INT) AS cl
      FROM (SELECT qv, [{dots("qv")}] AS d FROM q)),
s AS (SELECT a.vec_id,
             list_dot_product(a.embedding::DOUBLE[], p.qv::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(p.qv::DOUBLE[], p.qv::DOUBLE[]))) AS cos
      FROM a JOIN p ON a.cl = p.cl)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM s QUALIFY rank <= 10
"""


def q_ann_ivf_multiprobe(spark, sf_dir):
    """Multi-probe IVF ANN (similarity.ann_topk_ivf, nprobe=2): the probe
    searches its TWO nearest cells — the production recall remedy for the
    single-cell miss mode (true neighbor assigned to the runner-up cell).
    Deterministic cell order (dot desc, ties to lowest index) => exact
    oracle.  Recall-vs-nprobe contract: tests/test_similarity.py."""
    from esa_pfa_spark.operators.similarity import ann_topk_ivf

    emb = _ld(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return ann_topk_ivf(
        emb.filter(F.col("vec_id") != 0), probe, _ivf_centroids(), k=10, nprobe=2
    )


def _ivf_multiprobe_sql(nprobe: int = 2) -> str:
    cents = _ivf_centroids()

    def dots(vec):
        return ", ".join(
            f"list_dot_product({vec}::DOUBLE[], [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
            for c in cents
        )

    # probe's top-P cells: rank cell indices by dot desc, index asc
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
a AS (SELECT vec_id, embedding,
             CAST(list_position(d, list_max(d)) AS INT) AS cl
      FROM (SELECT vec_id, embedding, [{dots("embedding")}] AS d
            FROM embeddings WHERE vec_id != 0)),
p AS (SELECT qv, [{dots("qv")}] AS d FROM q),
pc AS (SELECT CAST(i AS INT) AS cl
       FROM (SELECT unnest(d) AS val, generate_subscripts(d, 1) AS i FROM p)
       ORDER BY val DESC, i ASC LIMIT {nprobe}),
s AS (SELECT a.vec_id,
             list_dot_product(a.embedding::DOUBLE[], q.qv::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))) AS cos
      FROM a JOIN pc ON a.cl = pc.cl CROSS JOIN q)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM s QUALIFY rank <= 10
"""


def q_ann_lsh_multiprobe(spark, sf_dir):
    """Hamming-radius-1 multi-probe LSH ANN: the probe also searches every
    bucket one sign-bit away (9 buckets at 8 planes) — recovers neighbors
    that landed just across one hyperplane, the dominant LSH miss mode."""
    emb = _ld(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return SIM.ann_topk_lsh(
        emb.filter(F.col("vec_id") != 0), probe, k=10, n_planes=8, seed=7, dim=64,
        hamming_radius=1,
    )


def _ann_lsh_multiprobe_sql(n_planes: int = 8) -> str:
    sig = _sig_sql("embedding")
    qsig = _sig_sql("qv")
    popcount = " + ".join(
        f"((xor(({sig}), ({qsig})) >> {b}) & 1)" for b in range(n_planes)
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.embedding, q.qv
  FROM embeddings e, q
  WHERE e.vec_id != 0 AND ({popcount}) <= 1),
s AS (
  SELECT vec_id,
         list_dot_product(embedding::DOUBLE[], qv::DOUBLE[])
         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
            * sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))) AS cos
  FROM cand)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM s QUALIFY rank <= 10
"""


def _cv_grid():
    # 11 x 10, the reference's SVM grid shape (SVM.java:219-260)
    scales = [round(0.1 * i, 1) for i in range(11)]          # 0.0 .. 1.0
    biases = [round(-0.5 + 0.1 * j, 1) for j in range(10)]   # -0.5 .. 0.4
    return [(s, b) for s in scales for b in biases]


def _cv_weights():
    import numpy as np

    rng = np.random.default_rng(17)
    return rng.standard_normal(64).astype(np.float64)


def q_cv_grid_pick(spark, sf_dir):
    """Distributed CV grid selection (scoring.cv_grid_scores): 110 linear
    scorers s*(w.x)+b evaluated under 5-fold CV in ONE data pass (grid as
    an exploded literal, two partial-agg shuffles of |grid| rows); target
    y = the vector's first component, fold = md5 bucket of vec_id.
    Reference analog: the 11x10 SVM grid search + 5-fold CV
    (SVM.java:219-260)."""
    from esa_pfa_spark.operators.scoring import cv_grid_scores

    emb = _ld(spark, sf_dir, "embeddings")
    data = emb.select(
        "vec_id", "embedding",
        F.element_at("embedding", 1).cast("double").alias("y"),
    )
    return cv_grid_scores(
        data, _cv_weights(), _cv_grid(), label_col="y", id_col="vec_id",
        n_folds=5, seed=0,
    )


def _cv_grid_sql() -> str:
    w = ", ".join(repr(float(x)) for x in _cv_weights())
    grid_rows = ", ".join(f"({s!r}, {b!r})" for s, b in _cv_grid())
    return f"""
WITH d AS (
  SELECT CAST(('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 6)) AS INTEGER)
             % 10000 % 5 AS fold,
         list_dot_product(embedding::DOUBLE[], [{w}]::DOUBLE[]) AS dd,
         CAST(embedding[1] AS DOUBLE) AS y
  FROM embeddings),
g AS (SELECT * FROM (VALUES {grid_rows}) AS t(scale, bias)),
fl AS (SELECT g.scale, g.bias, d.fold,
              avg((g.scale * d.dd + g.bias - d.y) * (g.scale * d.dd + g.bias - d.y)) AS l
       FROM d CROSS JOIN g GROUP BY g.scale, g.bias, d.fold),
cv AS (SELECT scale, bias, round(avg(l), 6) AS cv_loss
       FROM fl GROUP BY scale, bias)
SELECT CAST(scale AS DOUBLE) AS scale, CAST(bias AS DOUBLE) AS bias, cv_loss,
       CAST(row_number() OVER (ORDER BY cv_loss, scale, bias) AS INT) AS rank
FROM cv
"""


def q_logreg_train(spark, sf_dir):
    """Distributed batch-gradient logistic regression
    (scoring.logreg_fit): 6 GD rounds over the first 4 embedding
    components, label 0 as the positive class — the quality-classifier
    trainer of a curation pipeline (FineWeb-style educational gates are
    this shape).  Each round is ONE map-side-combinable aggregation
    (the shuffle carries a single row of dims+2 decimal sums); weights
    ride between rounds as plan literals (the kmeans_fit driver-loop
    device).  Output: coefficients / bias / n_rows / training accuracy,
    all rounded engine-side.  Reference analog: the SVM trainer consumed
    at ActiveLearning.java:176-190, re-expressed as the distributed-GD
    plan."""
    from esa_pfa_spark.operators.scoring import logreg_summary

    emb = _ld(spark, sf_dir, "embeddings")
    return logreg_summary(
        spark, emb, vec_col="embedding", label_col="label", positive=0,
        dims=4, lr=0.5, iters=6,
    )


def _logreg_cte(
    dims: int = 4,
    lr: float = 0.5,
    iters: int = 6,
    label_sql: str = "label = 0",
) -> tuple[str, str]:
    parts, p = _logreg_cte_parts(dims, lr, iters, label_sql)
    return "WITH " + parts, p


def _logreg_cte_parts(
    dims: int = 4,
    lr: float = 0.5,
    iters: int = 6,
    label_sql: str = "label = 0",
    keep_cols: str = "",
) -> tuple[str, str]:
    """Chained-CTE batch-GD trainer mirroring logreg_fit bit-for-bit:
    per-row gradient terms 6dp-rounded then decimal-summed (partition-
    order-free), the weight step `w - lr * (CAST(s AS DOUBLE) / n)` in
    the identical IEEE operation order.  Returns (WITH-chain ending at
    `it{iters}`, the sigmoid expression over `base` columns and weight
    alias `t`) so every logreg-family oracle shares the training chain.
    CTEs are MATERIALIZED — without it DuckDB inlines the chain and each
    `it{{k}}` reference doubles the scan count (2^iters blow-up)."""
    xs = ", ".join(f"CAST(embedding[{j + 1}] AS DOUBLE) AS x{j}" for j in range(dims))
    w0 = ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(dims))
    parts = [f"""
base AS MATERIALIZED (SELECT {xs}{keep_cols},
                CASE WHEN {label_sql} THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END AS y
         FROM embeddings),
it0 AS MATERIALIZED (SELECT {w0}, CAST(0.0 AS DOUBLE) AS b)"""]
    z = " + ".join([f"t.w{j} * x{j}" for j in range(dims)] + ["t.b"])
    p = f"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + EXP(-({z}))))"
    lrs = f"CAST({lr!r} AS DOUBLE)"
    for it in range(1, iters + 1):
        prev = f"it{it - 1}"
        sums = ",\n          ".join(
            f"SUM(CAST(ROUND(({p} - y) * x{j}, 6) AS DECIMAL(18,6))) AS s{j}"
            for j in range(dims)
        )
        steps = ", ".join(
            f"t.w{j} - {lrs} * (CAST(g.s{j} AS DOUBLE) / g.n) AS w{j}"
            for j in range(dims)
        )
        parts.append(f"""
g{it} AS MATERIALIZED (SELECT count(*) AS n,
          {sums},
          SUM(CAST(ROUND({p} - y, 6) AS DECIMAL(18,6))) AS sb
       FROM base, {prev} t),
it{it} AS MATERIALIZED (SELECT {steps},
                t.b - {lrs} * (CAST(g.sb AS DOUBLE) / g.n) AS b
         FROM {prev} t, g{it} g)""")
    return ",".join(parts), p


def _logreg_sql(dims: int = 4, lr: float = 0.5, iters: int = 6) -> str:
    """Summary oracle: coefficients / bias / n_rows / accuracy from the
    shared training chain, every value rounded in-engine."""
    cte, p = _logreg_cte(dims, lr, iters)
    names = "\n  UNION ALL ".join(
        f"SELECT 'w{j}' AS name, t.w{j} AS value FROM it{iters} t"
        for j in range(dims)
    )
    return (
        cte
        + f""",
acc AS (SELECT count(*) AS n,
               SUM(CASE WHEN ({p} >= CAST(0.5 AS DOUBLE))
                             = (y = CAST(1.0 AS DOUBLE))
                        THEN 1 ELSE 0 END) AS c
        FROM base, it{iters} t)
SELECT name, ROUND(value, 6) + 0.0 AS value FROM (
  {names}
  UNION ALL SELECT 'bias' AS name, t.b AS value FROM it{iters} t
  UNION ALL SELECT 'n_rows' AS name, CAST(a.n AS DOUBLE) AS value FROM acc a
  UNION ALL SELECT 'accuracy' AS name, CAST(a.c AS DOUBLE) / a.n AS value FROM acc a
) ORDER BY name
"""
    )


def q_logreg_calibration(spark, sf_dir):
    """Reliability diagram / calibration bins for the trained quality
    classifier (scoring.logreg_calibration): score every row with the
    6-round GD fit, bin predicted p into 10 fixed-width bins, report
    per-bin count, mean confidence, observed positive rate, and |gap|
    (the per-bin ECE term) — the standard diagnostic before a curation
    gate trusts classifier scores as sampling weights.  The label is the
    learnable sign of x0+x1 (the stored 10-way label is near-noise for
    these features, which would park every row in the base-rate bin —
    correct but a degenerate demonstration).  Scale shape: the fit (one
    tiny-row agg per round) + ONE map pass and a 10-group partial agg;
    conf means use 6dp decimal sums, acc means are exact 0/1 integer
    sums — both engine-order-free."""
    from esa_pfa_spark.operators.scoring import logreg_calibration

    emb = _ld(spark, sf_dir, "embeddings")
    sig = F.when(
        F.element_at("embedding", 1).cast("double")
        + F.element_at("embedding", 2).cast("double")
        > 0,
        1,
    ).otherwise(0)
    data = emb.select("embedding", sig.alias("sig"))
    return logreg_calibration(
        spark, data, n_bins=10, vec_col="embedding", label_col="sig",
        positive=1, dims=4, lr=5.0, iters=8,
    )


def _logreg_calibration_sql(
    dims: int = 4, lr: float = 5.0, iters: int = 8, n_bins: int = 10
) -> str:
    cte, p = _logreg_cte(
        dims, lr, iters,
        label_sql="(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)) > 0",
    )
    return (
        cte
        + f""",
sc AS (SELECT LEAST(CAST(FLOOR({p} * {n_bins}) AS INT), {n_bins - 1}) AS bin,
              CAST(ROUND({p}, 6) AS DECIMAL(18,6)) AS rp, y
       FROM base, it{iters} t),
ag AS (SELECT bin, count(*) AS n, SUM(rp) AS sp, SUM(y) AS sy
       FROM sc GROUP BY bin)
SELECT bin, n,
       ROUND(CAST(sp AS DOUBLE) / n, 6) AS conf,
       ROUND(sy / n, 6) AS acc,
       ROUND(ABS(sy / n - CAST(sp AS DOUBLE) / n), 6) AS gap
FROM ag ORDER BY bin
"""
    )


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog approximate distinct users per event type
    (profile.hll_distinct, p=8 / 256 registers) reported against the
    exact countDistinct with observed relative error — the mergeable
    cardinality sketch whose shuffle is m rows per group at ANY corpus
    size (exact distinct shuffles every distinct value).  The 60-bit
    md5 hash, bit-length rank, and exact-int64 harmonic denominator
    make the estimate bit-portable across engines."""
    from esa_pfa_spark.operators.profile import hll_distinct

    ev = _ld(spark, sf_dir, "events")
    sk = hll_distinct(ev, "user_id", "event_type", p=8, seed=0)
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    joined = sk.join(ex, "event_type")
    rel = (
        F.abs(F.col("hll_est") - F.col("exact_distinct").cast("double"))
        / F.col("exact_distinct")
    )
    return joined.select(
        "event_type", "n_rows", "hll_est", "exact_distinct",
        F.round(rel, 6).alias("rel_err"),
    ).orderBy("event_type")


def _hll_sql(p: int = 8, seed: int = 0) -> str:
    m = 1 << p
    w1 = 60 - p + 1  # rho for rest == 0
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
WITH h AS (
  SELECT event_type, CAST(hv % {m} AS INT) AS reg, (hv >> {p}) AS rest
  FROM (SELECT event_type,
               CAST(('0x' || substr(md5('{seed}:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL)),
r AS (SELECT event_type, reg,
             MAX(CASE WHEN rest = 0 THEN {w1}
                      ELSE {w1} - length(bin(rest)) END) AS mreg,
             count(*) AS c
      FROM h GROUP BY event_type, reg),
g AS (SELECT event_type,
             SUM(CAST(1 AS BIGINT) << ({w1} - mreg)) AS t_ne,
             count(*) AS v, SUM(c) AS n_rows
      FROM r GROUP BY event_type),
est AS (SELECT event_type, n_rows,
               CAST({alpha!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)
                 / (CAST(t_ne + ({m} - v) * (CAST(1 AS BIGINT) << {w1}) AS DOUBLE)
                    / CAST({float(1 << w1)!r} AS DOUBLE)) AS e_raw,
               {m} - v AS empty
        FROM g),
fin AS (SELECT event_type, n_rows,
               ROUND(CASE WHEN e_raw <= CAST({2.5 * m!r} AS DOUBLE) AND empty > 0
                          THEN CAST({float(m)!r} AS DOUBLE)
                               * LN(CAST({float(m)!r} AS DOUBLE) / CAST(empty AS DOUBLE))
                          ELSE e_raw END, 6) AS hll_est
        FROM est),
ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
       FROM events GROUP BY event_type)
SELECT f.event_type, CAST(f.n_rows AS BIGINT) AS n_rows, f.hll_est, ex.exact_distinct,
       ROUND(ABS(f.hll_est - CAST(ex.exact_distinct AS DOUBLE)) / ex.exact_distinct, 6) AS rel_err
FROM fin f JOIN ex USING (event_type) ORDER BY f.event_type
"""


def q_pagerank_docs(spark, sf_dir):
    """Link-graph centrality for corpus quality weighting
    (graph.pagerank): 5 damped iterations over a deterministic synthetic
    out-link graph on the documents table, top-20 docs by rank.
    Web-scale curation ranks hosts exactly this way (Common Crawl-style
    centrality weighting) before sampling.  The three link maps are
    deliberately NOT all bijections (a quadratic map and a mod-97 hub
    map skew in-degree; an affine map keeps connectivity) — a regular
    graph would rank uniformly.  Per iteration: one src-partitioned
    edges-ranks join, one dst partial-agg shuffle, one scalar dangling
    aggregate — the Pregel decomposition; lineage cut per round."""
    from esa_pfa_spark.operators.graph import demo_link_graph, pagerank

    docs = _ld(spark, sf_dir, "documents")
    pr = pagerank(demo_link_graph(docs), iters=5, damping=0.85)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("r").desc(), F.col("v").asc())
    # partition-less window over n rows at sf-test scale; production
    # takes top-k via TakeOrdered on the rank column instead
    return (
        pr.select(F.col("v").alias("doc_id"), F.round("r", 6).alias("pr"),
                  F.row_number().over(w).cast("int").alias("rank"))
        .filter(F.col("rank") <= 20)
    )


def _pagerank_cte_parts(
    iters: int = 5, damping: float = 0.85, prefix: str = ""
) -> str:
    """The pagerank CTE chain (no WITH prefix) mirroring graph.pagerank
    bit-for-bit: 9dp decimal contribution/dangling sums, fixed IEEE
    rank update.  ``prefix`` namespaces the CTE names for composition
    into larger programs; the final ranks CTE is ``{prefix}r{iters}``."""
    x = prefix
    d = f"CAST({damping!r} AS DOUBLE)"
    edges = "\n  UNION ALL ".join(
        f"SELECT doc_id AS src, {dst} AS dst FROM documents, {x}nn"
        for dst in [
            f"(doc_id * doc_id + 1) % {x}nn.n",
            f"(doc_id * 13 + 5) % {x}nn.n",
            "doc_id % 97",
        ]
    )
    parts = [f"""
{x}nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
{x}e AS MATERIALIZED (SELECT src, dst FROM (
  {edges}
) WHERE src != dst),
{x}od AS MATERIALIZED (SELECT src, count(*) AS od FROM {x}e GROUP BY src),
{x}v AS MATERIALIZED (SELECT DISTINCT v FROM
  (SELECT src AS v FROM {x}e UNION ALL SELECT dst AS v FROM {x}e)),
{x}r0 AS MATERIALIZED (SELECT v.v, CAST(1.0 AS DOUBLE) / {x}nn.n AS r FROM {x}v v, {x}nn)"""]
    for it in range(1, iters + 1):
        p = f"{x}r{it - 1}"
        parts.append(f"""
{x}c{it} AS MATERIALIZED (SELECT e.dst, CAST(ROUND(r.r / od.od, 9) AS DECIMAL(18,9)) AS c
       FROM {x}e e JOIN {x}od od USING (src) JOIN {p} r ON r.v = e.src),
{x}s{it} AS MATERIALIZED (SELECT dst, SUM(c) AS s FROM {x}c{it} GROUP BY dst),
{x}d{it} AS MATERIALIZED (SELECT COALESCE(SUM(CAST(ROUND(r.r, 9) AS DECIMAL(18,9))),
                       CAST(0 AS DECIMAL(18,9))) AS dm
       FROM {p} r LEFT JOIN {x}od od ON od.src = r.v WHERE od.src IS NULL),
{x}r{it} AS MATERIALIZED (SELECT v.v,
         (CAST(1.0 AS DOUBLE) - {d}) / nn.n
           + {d} * (COALESCE(CAST(s.s AS DOUBLE), CAST(0.0 AS DOUBLE))
                    + CAST(dd.dm AS DOUBLE) / nn.n) AS r
       FROM {x}v v CROSS JOIN {x}nn nn CROSS JOIN {x}d{it} dd
       LEFT JOIN {x}s{it} s ON s.dst = v.v)""")
    return ",".join(parts)


def _pagerank_sql(iters: int = 5, damping: float = 0.85, topk: int = 20) -> str:
    return (
        "WITH " + _pagerank_cte_parts(iters, damping)
        + f"""
SELECT v AS doc_id, ROUND(r, 6) AS pr,
       CAST(row_number() OVER (ORDER BY r DESC, v) AS INT) AS rank
FROM r{iters} QUALIFY rank <= {topk}
"""
    )


def q_cms_word_counts(spark, sf_dir):
    """Count-min sketch point-frequency estimates (profile.cms_build /
    cms_estimate, width 1024 x depth 4) for the 30 most frequent words
    of the documents corpus, reported against exact counts with the
    overestimate (cms_est - exact, NEVER negative — the sketch's
    one-sided guarantee).  The mergeable-summary trio: MG heavy hitters
    (top-k), HLL (cardinality), CMS (point frequency) — all with
    bounded shuffles (here depth*width counter cells) at any corpus
    size."""
    from esa_pfa_spark.operators.profile import cms_build, cms_estimate
    from esa_pfa_spark.operators.textstats import _words

    docs = _ld(spark, sf_dir, "documents")
    words = docs.select(F.explode(_words("text")).alias("w"))
    sketch = cms_build(words, "w", width=1024, depth=4, seed=0)
    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("exact_n"))
    from pyspark.sql import Window

    top = exact.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("exact_n").desc(), F.col("w").asc())
        ),
    ).filter(F.col("rnk") <= 30)
    est = cms_estimate(sketch, top.select("w", "exact_n", "rnk"), "w",
                       width=1024, depth=4, seed=0)
    return (
        top.join(est, "w")
        .select(
            F.col("w").alias("word"),
            "exact_n",
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_n")).cast("long").alias("overest"),
            F.col("rnk").cast("int").alias("rank"),
        )
        .orderBy("rank")
    )


def _cms_sql(width: int = 1024, depth: int = 4, seed: int = 0, topk: int = 30) -> str:
    def h(i: int, src: str) -> str:
        return (
            f"SELECT {i} AS row, CAST(('0x' || substr(md5('{seed}:{i}:' || w), 1, 6))"
            f" AS INTEGER) % {width} AS col, w FROM {src}"
        )

    cell_rows = "\n    UNION ALL ".join(h(i, "words") for i in range(depth))
    kcell_rows = "\n    UNION ALL ".join(h(i, "top") for i in range(depth))
    return f"""
WITH words AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
cells AS MATERIALIZED (
    {cell_rows}),
sketch AS MATERIALIZED (
  SELECT row, col, count(*) AS cnt FROM cells GROUP BY row, col),
exact AS MATERIALIZED (
  SELECT w, count(*) AS exact_n FROM words GROUP BY w),
top AS MATERIALIZED (
  SELECT w, exact_n,
         CAST(row_number() OVER (ORDER BY exact_n DESC, w) AS INT) AS rank
  FROM exact QUALIFY rank <= {topk}),
kcells AS (
    {kcell_rows}),
est AS (
  SELECT k.w, MIN(COALESCE(s.cnt, 0)) AS cms_est
  FROM kcells k LEFT JOIN sketch s USING (row, col) GROUP BY k.w)
SELECT t.w AS word, t.exact_n, CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(e.cms_est - t.exact_n AS BIGINT) AS overest, t.rank
FROM top t JOIN est e USING (w) ORDER BY t.rank
"""


_ZORDER_BOXES = {
    "x_band": {"x": (32, 47)},
    "y_band": {"y": (96, 127)},
    "xy_box": {"x": (32, 47), "y": (96, 127)},
}


def q_zorder_pruning(spark, sf_dir):
    """Layout-quality measurement (operators/layout.py): cluster the
    events table by a z-order (Morton) key vs a linear single-column
    sort, cut each layout into 64 simulated files, and count how many
    files' min-max envelopes a reader must open for three predicate
    boxes.  The z-ordered layout prunes on BOTH dimensions (the Delta
    OPTIMIZE ZORDER / Iceberg sort-order play); the linear layout
    prunes x perfectly and y not at all — the table shows the trade
    honestly per box.  Exact integer bit algebra throughout; the global
    ntile is the write simulation (production layouts come from
    write-time range partitioning)."""
    from esa_pfa_spark.operators.layout import (
        file_minmax_stats, files_scanned, morton_key,
    )

    ev = _ld(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 256).alias("x"),
        (F.col("event_id") % 256).alias("y"),
        "event_id",
    )
    layouts = {
        "linear_x": [F.col("x"), F.col("event_id")],
        "zorder": [morton_key(F.col("x"), F.col("y"), bits=8), F.col("event_id")],
    }
    pieces = []
    for lname, order in layouts.items():
        stats = file_minmax_stats(base, order, n_files=64, stat_cols=["x", "y"])
        for bname, box in _ZORDER_BOXES.items():
            pieces.append(
                files_scanned(stats, box).select(
                    F.lit(lname).alias("layout"),
                    F.lit(bname).alias("box"),
                    F.col("n_files").cast("long").alias("n_files"),
                    F.col("files_scanned").cast("long").alias("files_scanned"),
                    F.round(
                        F.col("files_scanned").cast("double") / F.col("n_files"), 6
                    ).alias("frac_scanned"),
                )
            )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("layout", "box")


def _zorder_sql(n_files: int = 64, bits: int = 8) -> str:
    from esa_pfa_spark.operators.layout import morton_sql

    mk = morton_sql("x", "y", bits)
    selects = []
    for lname, order in [("linear_x", "x, event_id"), ("zorder", f"{mk}, event_id")]:
        for bname, box in _ZORDER_BOXES.items():
            cond = " AND ".join(
                f"max_{c} >= {lo} AND min_{c} <= {hi}" for c, (lo, hi) in box.items()
            )
            selects.append(f"""
SELECT '{lname}' AS layout, '{bname}' AS box,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       ROUND(CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS frac_scanned
FROM (SELECT file_id, min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM (SELECT ntile({n_files}) OVER (ORDER BY {order}) AS file_id, x, y
            FROM base)
      GROUP BY file_id)""")
    return (
        """
WITH base AS MATERIALIZED (
  SELECT user_id % 256 AS x, event_id % 256 AS y, event_id FROM events)
"""
        + "\nUNION ALL".join(selects)
        + "\nORDER BY layout, box\n"
    )


_BLOOM_M, _BLOOM_K, _BLOOM_THRESH = 65536, 4, 450000


def q_bloom_prune(spark, sf_dir):
    """Runtime-filter join pruning (profile.bloom_build / bloom_prune):
    the high-value orders subset builds a bloom filter whose BOUNDED
    bit-position table (<= m rows, here 64k, regardless of how many
    millions of keys the dim side has) broadcasts to prune lineitem
    with k map-side semi-joins — ZERO shuffles of the big table before
    the real join.  Output: one audit row — big-side rows, rows passing
    the bloom, true matches, false positives (pruning is sound: no
    false negatives, callers still run the real join), observed FP
    rate.  This is the engine-level form of Spark's runtime bloom
    filters (spark.sql.optimizer.runtime.bloomFilter), made portable
    and oracle-checkable."""
    from esa_pfa_spark.operators.profile import bloom_build, bloom_prune

    orders = _ld(spark, sf_dir, "orders")
    li = _ld(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = orders.filter(F.col("o_totalprice") > _BLOOM_THRESH).select("o_orderkey")
    pos = bloom_build(dim, "o_orderkey", m=_BLOOM_M, k=_BLOOM_K, seed=0)
    pruned = bloom_prune(li, "l_orderkey", pos, m=_BLOOM_M, k=_BLOOM_K, seed=0)
    n_big = li.count()
    n_after = pruned.count()
    n_true = li.join(
        dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi"
    ).count()
    row = spark.createDataFrame(
        [(n_big, n_after, n_true)],
        "n_big long, n_after_bloom long, n_true long",
    )
    return row.select(
        "n_big", "n_after_bloom", "n_true",
        (F.col("n_after_bloom") - F.col("n_true")).alias("false_pos"),
        F.round(
            (F.col("n_after_bloom") - F.col("n_true"))
            / (F.col("n_big") - F.col("n_true")),
            6,
        ).alias("fp_rate"),
    )


def _bloom_sql(m: int = _BLOOM_M, k: int = _BLOOM_K, seed: int = 0) -> str:
    def h(i: int, col: str) -> str:
        return (
            f"CAST(('0x' || substr(md5('{seed}:{i}:' || CAST({col} AS VARCHAR)), 1, 6))"
            f" AS INTEGER) % {m}"
        )

    build = "\n  UNION ALL ".join(
        f"SELECT {h(i, 'o_orderkey')} AS pos FROM dim" for i in range(k)
    )
    member = " AND ".join(
        f"({h(i, 'l_orderkey')}) IN (SELECT pos FROM pos)" for i in range(k)
    )
    return f"""
WITH dim AS MATERIALIZED (
  SELECT o_orderkey FROM orders WHERE o_totalprice > {_BLOOM_THRESH}),
pos AS MATERIALIZED (SELECT DISTINCT pos FROM (
  {build})),
stats AS (SELECT
  (SELECT count(*) FROM lineitem) AS n_big,
  (SELECT count(*) FROM lineitem WHERE {member}) AS n_after_bloom,
  (SELECT count(*) FROM lineitem
   WHERE l_orderkey IN (SELECT o_orderkey FROM dim)) AS n_true)
SELECT n_big, n_after_bloom, n_true,
       n_after_bloom - n_true AS false_pos,
       ROUND((n_after_bloom - n_true) / (n_big - n_true), 6) AS fp_rate
FROM stats
"""


def q_table_diff(spark, sf_dir):
    """Snapshot diff / CDC compute (plans/diff.py table_diff_summary):
    classify every key across two deterministic versions of the events
    table — v_old drops nothing; v_new deletes event_id % 97 == 0,
    bumps value by 1 where event_id % 13 == 0, and appends synthetic
    rows (event_id + 10^9 for event_id % 101 == 0).  One full-outer
    co-partitioned join + map-only classification + a 4-group partial
    agg; null-safe column compare.  This is what feeds
    plans/incremental.py when upstream only hands full snapshots."""
    from esa_pfa_spark.plans.diff import table_diff_summary

    ev = _ld(spark, sf_dir, "events").select("event_id", "event_type", "value")
    old = ev
    kept = ev.filter(F.col("event_id") % 97 != 0)
    updated = kept.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 13 == 0, F.col("value") + 1)
        .otherwise(F.col("value")).alias("value"),
    )
    inserted = ev.filter(F.col("event_id") % 101 == 0).select(
        (F.col("event_id") + 1_000_000_000).alias("event_id"),
        "event_type", "value",
    )
    new = updated.unionByName(inserted)
    return table_diff_summary(old, new, ["event_id"], ["event_type", "value"])


SQL_TABLE_DIFF = """
WITH old AS MATERIALIZED (SELECT event_id, event_type, value FROM events),
new AS MATERIALIZED (
  SELECT event_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN value + 1 ELSE value END AS value
  FROM events WHERE event_id % 97 != 0
  UNION ALL
  SELECT event_id + 1000000000, event_type, value
  FROM events WHERE event_id % 101 = 0),
d AS (SELECT
        CASE WHEN o.event_id IS NULL THEN 'insert'
             WHEN n.event_id IS NULL THEN 'delete'
             WHEN (o.event_type IS DISTINCT FROM n.event_type)
               OR (o.value IS DISTINCT FROM n.value) THEN 'update'
             ELSE 'unchanged' END AS change_type,
        (o.event_id IS NOT NULL AND n.event_id IS NOT NULL
         AND o.event_type IS DISTINCT FROM n.event_type) AS chg_event_type,
        (o.event_id IS NOT NULL AND n.event_id IS NOT NULL
         AND o.value IS DISTINCT FROM n.value) AS chg_value
      FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id)
SELECT change_type, count(*) AS n_rows,
       CAST(SUM(CASE WHEN chg_event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_chg_event_type,
       CAST(SUM(CASE WHEN chg_value THEN 1 ELSE 0 END) AS BIGINT) AS n_chg_value
FROM d GROUP BY change_type ORDER BY change_type
"""


def q_woe_encode(spark, sf_dir):
    """Weight-of-Evidence categorical encoding + Information Value
    (encode.woe_encode): event_type scored against the high-value
    target ``value > 50`` with 0.5 additive smoothing — the global
    (non-temporal) complement of the expanding target encoder; one
    category-row shuffle, totals folded back as literals."""
    from esa_pfa_spark.operators.encode import woe_encode

    ev = _ld(spark, sf_dir, "events")
    return woe_encode(ev, "event_type", F.col("value") > 50)


SQL_WOE_ENCODE = """
WITH per AS MATERIALIZED (
  SELECT event_type AS category, count(*) AS n,
         SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN NOT (value > 50) THEN 1 ELSE 0 END) AS n_neg
  FROM events GROUP BY event_type),
tot AS MATERIALIZED (SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn FROM per),
x AS (SELECT category, n, n_pos, n_neg,
        (CAST(n_pos AS DOUBLE) + CAST(0.5 AS DOUBLE))
          / (CAST(tp AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS pp,
        (CAST(n_neg AS DOUBLE) + CAST(0.5 AS DOUBLE))
          / (CAST(tn AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS pn
      FROM per, tot)
SELECT category, CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       ROUND(LN(pp / pn), 6) + 0.0 AS woe,
       ROUND((pp - pn) * LN(pp / pn), 6) + 0.0 AS iv
FROM x ORDER BY category
"""


def q_flag_predicate(spark, sf_dir):
    """§2.8 flag/bit predicates (l1_flags.INVALID analog): synthesize an
    8-bit flag word from event_id, count rows matching bitmask tests."""
    from esa_pfa_spark.functions.expr import flag_set

    ev = _ld(spark, sf_dir, "events")
    flags = (F.col("event_id") % 256).cast("int")
    tagged = ev.select(
        "event_type",
        flag_set(flags, 0).alias("f_invalid"),                       # mask 0x01
        (flag_set(flags, 1) | flag_set(flags, 4)).alias("f_bright_or_land"),  # mask 0x12
    )
    return tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f_invalid").cast("int")).alias("n_invalid"),
        F.sum(F.col("f_bright_or_land").cast("int")).alias("n_bright_or_land"),
    )


SQL_FLAG_PREDICATE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN (CAST(event_id % 256 AS INT) & 1) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       CAST(sum(CASE WHEN (CAST(event_id % 256 AS INT) & 18) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright_or_land
FROM events GROUP BY event_type
"""


def q_nan_validity(spark, sf_dir):
    """P6 NaN validity filter (ActiveLearning.java:218-245): NaNs are
    injected deterministically (vec_id % 7 == 0 poisons element 0), then
    rows with any-NaN vectors are dropped; both branches exercised."""
    from esa_pfa_spark.plans.query import valid_vectors

    emb = _ld(spark, sf_dir, "embeddings")
    poisoned = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") % 7 == 0,
            F.concat(
                F.array(F.lit(float("nan")).cast("float")),
                F.slice(F.col("embedding"), 2, 63),
            ),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    return valid_vectors(poisoned, "embedding").select("vec_id")


SQL_NAN_VALIDITY = """
SELECT vec_id FROM embeddings WHERE vec_id % 7 != 0
"""


def q_transect_runs(spark, sf_dir):
    """A6 transect half (ConnectivityMetrics.java:127-164): mean/σ of the
    per-transect max run length of set cells, over a deterministic transect
    sample (rows y≡2 mod 5, columns x≡3 mod 5) of the events-derived grid."""
    from esa_pfa_spark.operators.spatial import transect_run_stats

    m = transect_run_stats(_events_grid(spark, sf_dir), step=5, row_off=2, col_off=3)
    return m.select(
        "n_transects",
        _r6(F.col("mean_max_run")).alias("mean_max_run"),
        _r6(F.col("std_max_run")).alias("std_max_run"),
    )


SQL_TRANSECT_RUNS = f"""
WITH {_GRID_CTE},
t AS (
  SELECT 'r' || y AS tid, x AS pos, flag FROM g WHERE y % 5 = 2
  UNION ALL
  SELECT 'c' || x AS tid, y AS pos, flag FROM g WHERE x % 5 = 3),
s AS (SELECT tid, pos, pos - row_number() OVER (PARTITION BY tid ORDER BY pos) AS grp
      FROM t WHERE flag),
runs AS (SELECT tid, grp, count(*) AS run_len FROM s GROUP BY 1, 2),
mr AS (SELECT tid, max(run_len) AS max_run FROM runs GROUP BY 1),
allt AS (SELECT DISTINCT tid FROM t),
per AS (SELECT allt.tid, coalesce(mr.max_run, 0) AS max_run
        FROM allt LEFT JOIN mr ON allt.tid = mr.tid)
SELECT CAST(count(*) AS INT) AS n_transects,
       round(avg(max_run), 6) AS mean_max_run,
       round(coalesce(stddev(max_run), 0), 6) AS std_max_run
FROM per
"""


def q_contagion_clumpiness(spark, sf_dir):
    """A5 contagion/clumpiness (AggregationMetrics.java:131-164) as a
    single-row oracle query over the events-derived grid."""
    from esa_pfa_spark.operators.spatial import contagion_clumpiness_df

    m = contagion_clumpiness_df(_events_grid(spark, sf_dir))
    return m.select(
        "n00", "n01", "n10", "n11",
        _r6(F.col("contagion")).alias("contagion"),
        _r6(F.col("clumpiness")).alias("clumpiness"),
    )


SQL_CONTAGION_CLUMPINESS = f"""
WITH {_GRID_CTE},
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
pairs AS (
  SELECT a.flag AS f, b.flag AS nf
  FROM g a CROSS JOIN o JOIN g b ON b.x = a.x + o.dx AND b.y = a.y + o.dy),
n AS (
  SELECT CAST(sum(CASE WHEN NOT f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(sum(CASE WHEN NOT f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM pairs),
c AS (SELECT CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_set,
             count(*) AS n_all FROM g),
m AS (
  SELECT n00, n01, n10, n11,
         n00 + n01 + n10 + n11 AS tot,
         n_set * 1.0 / n_all AS p_cls,
         CASE WHEN n11 + n10 > 0 THEN n11 * 1.0 / (n11 + n10) ELSE 0.0 END AS gl
  FROM n, c)
SELECT n00, n01, n10, n11,
       round(CASE WHEN tot > 0 THEN 1.0 +
             ((CASE WHEN n00 > 0 THEN (n00*1.0/tot) * ln(n00*1.0/tot) ELSE 0 END) +
              (CASE WHEN n01 > 0 THEN (n01*1.0/tot) * ln(n01*1.0/tot) ELSE 0 END) +
              (CASE WHEN n10 > 0 THEN (n10*1.0/tot) * ln(n10*1.0/tot) ELSE 0 END) +
              (CASE WHEN n11 > 0 THEN (n11*1.0/tot) * ln(n11*1.0/tot) ELSE 0 END))
             / (2.0 * ln(2.0)) ELSE 1.0 END, 6) AS contagion,
       round(CASE WHEN p_cls = 0.0 OR p_cls = 1.0 THEN 0.0
                  WHEN gl >= p_cls THEN (gl - p_cls) / (1.0 - p_cls)
                  ELSE (gl - p_cls) / p_cls END, 6) AS clumpiness
FROM m
"""


def q_patch_metrics(spark, sf_dir):
    """A5 in the reference's true consumption shape: contagion/clumpiness
    PER PATCH (the rejection filter consumes per-patch clumpiness,
    AlgalBloomFeatureWriter.java:277-303) — grouped neighbor join, one row
    per 10x10 patch of the events grid."""
    from esa_pfa_spark.operators.spatial import patch_metrics

    m = patch_metrics(_events_grid(spark, sf_dir), patch=10)
    return m.select(
        "px", "py", "n00", "n01", "n10", "n11",
        _r6(F.col("contagion")).alias("contagion"),
        _r6(F.col("clumpiness")).alias("clumpiness"),
    )


SQL_PATCH_METRICS = f"""
WITH {_GRID_CTE},
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
pairs AS (
  SELECT a.x // 10 AS px, a.y // 10 AS py, a.flag AS f, b.flag AS nf
  FROM g a CROSS JOIN o JOIN g b ON b.x = a.x + o.dx AND b.y = a.y + o.dy
  WHERE (a.x + o.dx) // 10 = a.x // 10 AND (a.y + o.dy) // 10 = a.y // 10),
adj AS (
  SELECT px, py,
         CAST(sum(CASE WHEN NOT f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n00,
         CAST(sum(CASE WHEN NOT f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM pairs GROUP BY 1, 2),
cells AS (
  SELECT x // 10 AS px, y // 10 AS py,
         CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS nset,
         count(*) AS nall
  FROM g GROUP BY 1, 2),
m AS (
  SELECT c.px, c.py,
         CAST(coalesce(adj.n00, 0) AS BIGINT) AS n00,
         CAST(coalesce(adj.n01, 0) AS BIGINT) AS n01,
         CAST(coalesce(adj.n10, 0) AS BIGINT) AS n10,
         CAST(coalesce(adj.n11, 0) AS BIGINT) AS n11,
         nset, nall
  FROM cells c LEFT JOIN adj ON c.px = adj.px AND c.py = adj.py),
x AS (
  SELECT px, py, n00, n01, n10, n11,
         n00 + n01 + n10 + n11 AS tot,
         nset * 1.0 / nall AS p_cls,
         CASE WHEN n11 + n10 > 0 THEN n11 * 1.0 / (n11 + n10) ELSE 0.0 END AS gl
  FROM m)
SELECT CAST(px AS INT) AS px, CAST(py AS INT) AS py, n00, n01, n10, n11,
       round(CASE WHEN tot > 0 THEN 1.0 +
             ((CASE WHEN n00 > 0 THEN (n00*1.0/tot) * ln(n00*1.0/tot) ELSE 0 END) +
              (CASE WHEN n01 > 0 THEN (n01*1.0/tot) * ln(n01*1.0/tot) ELSE 0 END) +
              (CASE WHEN n10 > 0 THEN (n10*1.0/tot) * ln(n10*1.0/tot) ELSE 0 END) +
              (CASE WHEN n11 > 0 THEN (n11*1.0/tot) * ln(n11*1.0/tot) ELSE 0 END))
             / (2.0 * ln(2.0)) ELSE 1.0 END, 6) AS contagion,
       round(CASE WHEN p_cls = 0.0 OR p_cls = 1.0 THEN 0.0
                  WHEN gl >= p_cls THEN (gl - p_cls) / (1.0 - p_cls)
                  ELSE (gl - p_cls) / p_cls END, 6) AS clumpiness
FROM x
"""


def q_patch_connectivity(spark, sf_dir):
    """A6 per patch (ConnectivityMetrics on each patch raster): occupied /
    inside / border / fractal per 10x10 patch; only patches with at least
    one set cell appear (no raster -> no metric, as in the reference)."""
    from esa_pfa_spark.operators.spatial import patch_connectivity

    m = patch_connectivity(_events_grid(spark, sf_dir), patch=10)
    return m.select(
        "px", "py", "occupied", "inside", "border",
        _r6(F.col("fractal_index")).alias("fractal_index"),
    )


SQL_PATCH_CONNECTIVITY = f"""
WITH {_GRID_CTE},
occ AS (SELECT x, y, x // 10 AS px, y // 10 AS py FROM g WHERE flag),
o(dx, dy) AS (VALUES (-1,0),(1,0),(0,-1),(0,1)),
nset AS (
  SELECT a.x, a.y, count(*) AS c
  FROM occ a CROSS JOIN o JOIN g b
    ON b.x = a.x + o.dx AND b.y = a.y + o.dy AND b.flag
  WHERE (a.x + o.dx) // 10 = a.px AND (a.y + o.dy) // 10 = a.py
  GROUP BY a.x, a.y),
cls AS (
  SELECT occ.px, occ.py, coalesce(nset.c, 0) = 4 AS is_inside
  FROM occ LEFT JOIN nset ON occ.x = nset.x AND occ.y = nset.y)
SELECT CAST(px AS INT) AS px, CAST(py AS INT) AS py,
       count(*) AS occupied,
       CAST(sum(CASE WHEN is_inside THEN 1 ELSE 0 END) AS BIGINT) AS inside,
       CAST(count(*) - sum(CASE WHEN is_inside THEN 1 ELSE 0 END) AS BIGINT) AS border,
       round(2.0 - sum(CASE WHEN is_inside THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS fractal_index
FROM cls GROUP BY 1, 2
"""


def q_patch_rejection(spark, sf_dir):
    """P3 composed as in the reference (AlgalBloomFeatureWriter.java:277-303):
    reject a patch when valid ratio < 0.2, or ratio < 0.5 AND
    clumpiness < 0.0 (cheap test first, clumpiness only in the uncertain
    band)."""
    from esa_pfa_spark.operators.spatial import patch_rejection

    m = patch_rejection(_events_grid(spark, sf_dir), patch=10)
    return m.select(
        "px", "py",
        _r6(F.col("valid_ratio")).alias("valid_ratio"),
        _r6(F.col("clumpiness")).alias("clumpiness"),
        F.col("accepted").cast("int").alias("accepted"),
    )


SQL_PATCH_REJECTION = f"""
WITH {_GRID_CTE},
o(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
pairs AS (
  SELECT a.x // 10 AS px, a.y // 10 AS py, a.flag AS f, b.flag AS nf
  FROM g a CROSS JOIN o JOIN g b ON b.x = a.x + o.dx AND b.y = a.y + o.dy
  WHERE (a.x + o.dx) // 10 = a.x // 10 AND (a.y + o.dy) // 10 = a.y // 10),
adj AS (
  SELECT px, py,
         CAST(sum(CASE WHEN f AND NOT nf THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN f AND nf THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM pairs GROUP BY 1, 2),
cells AS (
  SELECT x // 10 AS px, y // 10 AS py,
         CAST(sum(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS nset,
         count(*) AS nall
  FROM g GROUP BY 1, 2),
m AS (
  SELECT c.px, c.py,
         CAST(coalesce(adj.n10, 0) AS BIGINT) AS n10,
         CAST(coalesce(adj.n11, 0) AS BIGINT) AS n11,
         nset * 1.0 / nall AS ratio
  FROM cells c LEFT JOIN adj ON c.px = adj.px AND c.py = adj.py),
x AS (
  SELECT px, py, ratio,
         CASE WHEN ratio = 0.0 OR ratio = 1.0 THEN 0.0
              WHEN (CASE WHEN n11 + n10 > 0 THEN n11 * 1.0 / (n11 + n10) ELSE 0.0 END) >= ratio
              THEN ((CASE WHEN n11 + n10 > 0 THEN n11 * 1.0 / (n11 + n10) ELSE 0.0 END) - ratio) / (1.0 - ratio)
              ELSE ((CASE WHEN n11 + n10 > 0 THEN n11 * 1.0 / (n11 + n10) ELSE 0.0 END) - ratio) / ratio
         END AS clump
  FROM m)
SELECT CAST(px AS INT) AS px, CAST(py AS INT) AS py,
       round(ratio, 6) AS valid_ratio,
       round(clump, 6) AS clumpiness,
       CAST(NOT (ratio < 0.2 OR (ratio < 0.5 AND clump < 0.0)) AS INT) AS accepted
FROM x
"""


def q_diversity_pick(spark, sf_dir):
    """§3.3 complete getMostAmbiguous: uncertainty ranking THEN deterministic
    farthest-point diversity selection (ActiveLearning.java:116-149,501-532;
    KernelKmeansClusterer.java:67-106).  5 picks from the 15 most ambiguous."""
    import numpy as np

    from esa_pfa_spark.operators.scoring import score_linear
    from esa_pfa_spark.plans.query import diversity_pick

    emb = _ld(spark, sf_dir, "embeddings")
    scored = score_linear(emb, np.array(_SCORE_WEIGHTS), bias=0.1)
    return diversity_pick(
        scored, decision_col="decision", vec_col="embedding", k=15, n_pick=5
    )


def _diversity_pick_sql() -> str:
    w = ", ".join(str(x) for x in _SCORE_WEIGHTS)
    return f"""
WITH RECURSIVE cand AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_dot_product(embedding::DOUBLE[], [{w}]::DOUBLE[]) + 0.1 AS decision
  FROM embeddings ORDER BY abs(decision), vec_id LIMIT 15
),
pick(step, ids, vecs) AS (
  SELECT * FROM (
    SELECT 1 AS step, [vec_id] AS ids, [v] AS vecs
    FROM cand ORDER BY abs(decision), vec_id LIMIT 1)
  UNION ALL
  SELECT p.step + 1,
         list_append(p.ids, nx.vec_id),
         list_append(p.vecs, nx.v)
  FROM pick p, LATERAL (
    SELECT c.vec_id, c.v
    FROM cand c
    WHERE NOT list_contains(p.ids, c.vec_id)
    ORDER BY list_min(list_transform(p.vecs,
        s -> list_dot_product(c.v, c.v) + list_dot_product(s, s)
             - 2*list_dot_product(c.v, s))) DESC,
      c.vec_id
    LIMIT 1) nx
  WHERE p.step < 5
)
SELECT CAST(unnest(ids) AS BIGINT) AS vec_id,
       CAST(unnest(generate_series(1, len(ids))) AS INT) AS pick_order
FROM pick WHERE step = 5
"""


def q_largest_component(spark, sf_dir):
    """A7 connected components (RegionGrower.java:46-144) via iterative
    min-label propagation; exact DuckDB oracle via a recursive CTE —
    propagating only DECREASING labels is complete for the per-cell min,
    because the component's minimum id is smaller than every other cell id
    it must reach.  Goldens in tests/test_spatial.py."""
    from esa_pfa_spark.operators.spatial import largest_component

    return largest_component(_events_grid(spark, sf_dir))


SQL_LARGEST_COMPONENT = f"""
WITH RECURSIVE {_GRID_CTE},
occ AS (SELECT x, y, x * 1000000 + y AS id FROM g WHERE flag),
reach(x, y, lbl) AS (
  SELECT x, y, id FROM occ
  UNION
  SELECT o.x, o.y, r.lbl
  FROM reach r
  JOIN occ o ON abs(o.x - r.x) + abs(o.y - r.y) = 1
  WHERE r.lbl < o.x * 1000000 + o.y),
comp AS (SELECT x, y, min(lbl) AS component FROM reach GROUP BY 1, 2),
sz AS (SELECT component, count(*) AS s FROM comp GROUP BY 1)
SELECT CAST(max(s) AS BIGINT) AS max_cluster_size,
       CAST(sum(s) AS BIGINT) AS num_samples
FROM sz
"""


# ---------------------------------------------------------------------------
# Token-sequence operators (the input-hint payload: tokens array<int32>).
# Token ids are DERIVED from documents.text with the portable md5-hash
# tokenizer (tokens.word_token) so every query has an exact DuckDB oracle:
#   Spark  conv(substr(md5(w),1,6),16,10) % V
#   DuckDB CAST(('0x' || substr(md5(w),1,6)) AS INTEGER) % V
# verified bit-identical.  Production inputs arrive pre-tokenized and skip
# the derivation step.
# ---------------------------------------------------------------------------

_TOK_SQL = (
    "list_transform(string_split(text, ' '), "
    "w -> CAST(('0x' || substr(md5(w), 1, 6)) AS INTEGER) % 32768)"
)


def _tokenized_docs(spark, sf_dir):
    from esa_pfa_spark.operators.tokens import tokenize

    return tokenize(_ld(spark, sf_dir, "documents"))


def _tokenized_docs_w(spark, sf_dir):
    """_tokenized_docs over the fanned-out scan (_ldw) — for the
    fingerprint/winnowing/BPE pipelines whose per-row token kernels
    dominate their wall time."""
    from esa_pfa_spark.operators.tokens import tokenize

    return tokenize(_ldw(spark, sf_dir, "documents"))


def q_token_chunks(spark, sf_dir):
    """Fixed-window LM chunking (max_len=16, stride=12 => overlapping
    windows): map-only column math, no shuffle.  chunk_fp is the md5 of the
    comma-joined window — the token-array equality witness the north rule
    requires, checked cell-for-cell against the oracle."""
    from esa_pfa_spark.operators.tokens import chunk_tokens

    return chunk_tokens(_tokenized_docs(spark, sf_dir), max_len=16, stride=12)


SQL_TOKEN_CHUNKS = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
st AS (SELECT doc_id, toks,
              unnest(generate_series(0, len(toks) - 1, 12)) AS s
       FROM tok WHERE len(toks) > 0),
c AS (SELECT doc_id, s // 12 AS chunk_idx, list_slice(toks, s + 1, s + 16) AS ck
      FROM st)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(ck) AS BIGINT) AS n_chunk,
       CAST(ck[1] AS BIGINT) AS first_tok,
       CAST(ck[len(ck)] AS BIGINT) AS last_tok,
       md5(array_to_string(ck, ',')) AS chunk_fp
FROM c
"""


def q_length_buckets(spark, sf_dir):
    """Bucketed-batching padding analysis over the token table
    (tokens.length_bucket_stats, width=64)."""
    from esa_pfa_spark.operators.tokens import length_bucket_stats

    return length_bucket_stats(_tokenized_docs(spark, sf_dir), width=64)


SQL_LENGTH_BUCKETS = """
WITH tok AS (SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
b AS (SELECT ((n_tok - 1) // 64 + 1) * 64 AS bucket_cap, n_tok
      FROM tok WHERE n_tok > 0)
SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
       count(*) AS n_seqs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(sum(n_tok) * 1.0 / (count(*) * bucket_cap), 6) AS padding_efficiency
FROM b GROUP BY bucket_cap
"""


def q_token_packing(spark, sf_dir):
    """Context-window sequence packing (capacity=128) in deterministic
    (source, doc_id) order.  The oracle's global-window cumsum is the
    single-task plan; the engine uses the range-partitioned per-partition
    offset decomposition (tokens.pack_offsets) — same rows, scalable."""
    from esa_pfa_spark.operators.tokens import pack_offsets

    return pack_offsets(_tokenized_docs(spark, sf_dir), capacity=128)


SQL_TOKEN_PACKING = """
WITH tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
             FROM documents),
cum AS (SELECT source, doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY source, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS gs
        FROM tok WHERE n_tok > 0),
sp AS (SELECT source, doc_id, n_tok, gs,
              unnest(generate_series(CAST(gs // 128 AS BIGINT),
                                     CAST((gs + n_tok - 1) // 128 AS BIGINT))) AS chunk_id
       FROM cum)
SELECT source, doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(greatest(chunk_id * 128 - gs, 0) AS BIGINT) AS tok_start_in_doc,
       CAST(least(chunk_id * 128 + 128 - gs, n_tok)
            - greatest(chunk_id * 128 - gs, 0) AS BIGINT) AS n_in_chunk
FROM sp
"""


def q_pack_manifest(spark, sf_dir):
    """Per-window document-composition manifest (capacity=128): what a
    training loader needs to rebuild attention-mask boundaries inside each
    packed context window."""
    from esa_pfa_spark.operators.tokens import pack_manifest

    return pack_manifest(_tokenized_docs(spark, sf_dir), capacity=128)


SQL_PACK_MANIFEST = """
WITH tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
             FROM documents),
cum AS (SELECT source, doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY source, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS gs
        FROM tok WHERE n_tok > 0),
sp AS (SELECT source, doc_id, n_tok, gs,
              unnest(generate_series(CAST(gs // 128 AS BIGINT),
                                     CAST((gs + n_tok - 1) // 128 AS BIGINT))) AS chunk_id
       FROM cum),
pieces AS (SELECT chunk_id, source, doc_id,
                  least(chunk_id * 128 + 128 - gs, n_tok)
                  - greatest(chunk_id * 128 - gs, 0) AS n_in_chunk
           FROM sp)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_in_chunk) AS BIGINT) AS n_tok,
       string_agg(source || ':' || CAST(doc_id AS VARCHAR) || ':'
                  || CAST(n_in_chunk AS VARCHAR), '|'
                  ORDER BY source, doc_id) AS manifest
FROM pieces GROUP BY chunk_id
"""


def q_token_vocab(spark, sf_dir):
    """Vocabulary histogram top-50: explode -> partial-agg (map-side
    combine) -> TakeOrderedAndProject; deterministic tie-break (cnt desc,
    token asc)."""
    from esa_pfa_spark.operators.tokens import vocab_counts

    return vocab_counts(_tokenized_docs(spark, sf_dir), k=50)


SQL_TOKEN_VOCAB = f"""
WITH tok AS (SELECT {_TOK_SQL} AS toks FROM documents),
t AS (SELECT unnest(toks) AS token FROM tok)
SELECT CAST(token AS BIGINT) AS token, count(*) AS cnt
FROM t GROUP BY 1
ORDER BY cnt DESC, token ASC LIMIT 50
"""


def q_token_bigrams(spark, sf_dir):
    """Adjacent-pair (bigram) count table top-40 — the n-gram LM shape;
    pairs built JVM-side, same partial-agg top-k plan as the vocab."""
    from esa_pfa_spark.operators.tokens import bigram_counts

    return bigram_counts(_tokenized_docs(spark, sf_dir), k=40)


SQL_TOKEN_BIGRAMS = f"""
WITH tok AS (SELECT {_TOK_SQL} AS toks FROM documents),
p AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> {{'t1': toks[i], 't2': toks[i + 1]}})) AS pr
      FROM tok WHERE len(toks) >= 2)
SELECT CAST(pr.t1 AS BIGINT) AS t1, CAST(pr.t2 AS BIGINT) AS t2, count(*) AS cnt
FROM p GROUP BY 1, 2
ORDER BY cnt DESC, t1 ASC, t2 ASC LIMIT 40
"""


def q_dup_ngram_spans(spark, sf_dir):
    """Exact-substring training-data dedup at 8-gram granularity: corpus-
    duplicated token windows merged into maximal per-doc spans.  Fingerprint
    agg with map-side combine, equi-join back, doc-partitioned span merge —
    no all-pairs stage (see tokens.dup_ngram_summary scale notes)."""
    from esa_pfa_spark.operators.tokens import dup_ngram_summary

    return dup_ngram_summary(_tokenized_docs_w(spark, sf_dir), n=8, min_count=2)


SQL_DUP_NGRAM = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
w AS (SELECT doc_id, len(toks) AS n_tok,
             unnest(generate_series(0, len(toks) - 8)) AS s, toks
      FROM tok WHERE len(toks) >= 8),
f AS (SELECT doc_id, n_tok, s,
             md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
      FROM w),
d AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2),
dw AS (SELECT doc_id, n_tok, s FROM f JOIN d USING (fp)),
b AS (SELECT doc_id, n_tok, s,
             CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM dw),
g AS (SELECT doc_id, n_tok, s,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS grp
      FROM b),
sp AS (SELECT doc_id, n_tok, grp, count(*) AS w, max(s) + 8 - min(s) AS len
       FROM g GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(max(n_tok) AS BIGINT) AS n_tok,
       CAST(sum(w) AS BIGINT) AS n_dup_windows,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(len) AS BIGINT) AS dup_tokens,
       round(sum(len) * 1.0 / max(n_tok), 6) AS dup_frac
FROM sp GROUP BY doc_id
"""


def q_token_loss_mask(spark, sf_dir):
    """Per-token loss mask zeroing corpus-duplicated 8-gram spans
    (tokens.token_loss_mask): the loader artifact of exact-substring
    dedup when the doc is kept but the repeated span leaves the loss."""
    from esa_pfa_spark.operators.tokens import token_loss_mask

    out = token_loss_mask(_tokenized_docs_w(spark, sf_dir), n=8, min_count=2)
    return out.select("doc_id", "n_tok", "n_masked", "mask_fp")


SQL_TOKEN_LOSS_MASK = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
w AS (SELECT doc_id, len(toks) AS n_tok,
             unnest(generate_series(0, len(toks) - 8)) AS s, toks
      FROM tok WHERE len(toks) >= 8),
f AS (SELECT doc_id, n_tok, s,
             md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
      FROM w),
d AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2),
dw AS (SELECT doc_id, n_tok, s FROM f JOIN d USING (fp)),
b AS (SELECT doc_id, s,
             CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM dw),
g AS (SELECT doc_id, s,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS grp
      FROM b),
sp AS (SELECT doc_id, grp, min(s) AS s0, max(s) + 8 - min(s) AS l
       FROM g GROUP BY 1, 2),
spl AS (SELECT doc_id, list(struct_pack(s := s0, l := l)) AS spans
        FROM sp GROUP BY doc_id),
base AS (SELECT doc_id, len(toks) AS n_tok FROM tok WHERE len(toks) > 0),
mm AS (SELECT base.doc_id, base.n_tok,
              list_transform(generate_series(0, base.n_tok - 1), p ->
                CASE WHEN spl.spans IS NULL THEN 1
                     WHEN len(list_filter(spl.spans,
                              x -> p >= x.s AND p < x.s + x.l)) > 0 THEN 0
                     ELSE 1 END) AS mask
       FROM base LEFT JOIN spl ON spl.doc_id = base.doc_id)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(n_tok - list_sum(mask) AS BIGINT) AS n_masked,
       md5(array_to_string(mask, '')) AS mask_fp
FROM mm
"""


def q_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF terms per document: per-(doc,token) hash agg -> vocab-
    bounded df table broadcast back (scored rows never shuffle) -> per-DOC
    window top-k (no global window)."""
    from esa_pfa_spark.operators.tokens import tfidf_topk

    return tfidf_topk(_tokenized_docs(spark, sf_dir), k=3)


SQL_TFIDF = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
pt AS (SELECT doc_id, len(toks) AS n_tok, unnest(toks) AS token
       FROM tok WHERE len(toks) > 0),
c AS (SELECT doc_id, n_tok, token, count(*) AS c FROM pt GROUP BY 1, 2, 3),
dfq AS (SELECT token, count(*) AS df_t FROM c GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM tok WHERE len(toks) > 0),
s AS (SELECT doc_id, token, c, df_t,
             round((c * 1.0 / n_tok) * ln(n_docs * 1.0 / df_t), 6) AS score
      FROM c JOIN dfq USING (token) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token ASC) AS rank
      FROM s)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, CAST(token AS BIGINT) AS token,
       CAST(c AS BIGINT) AS tf_count, CAST(df_t AS BIGINT) AS doc_freq, score
FROM r WHERE rank <= 3
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs scored by 8-gram overlap
    with a deterministic held-out "eval" slice (md5(doc_id) first hex char
    '0', ~1/16 of docs).  Eval fingerprints are DISTINCT + broadcast — the
    exploded training windows never shuffle; one per-doc agg Exchange."""
    from esa_pfa_spark.operators.tokens import decontaminate

    docs = _tokenized_docs(spark, sf_dir)
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return decontaminate(docs.filter(~is_eval), docs.filter(is_eval), n=8)


SQL_DECONTAMINATE = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks,
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_eval
             FROM documents),
w AS (SELECT doc_id, is_eval, len(toks) AS n_tok,
             unnest(generate_series(0, len(toks) - 8)) AS s, toks
      FROM tok WHERE len(toks) >= 8),
f AS (SELECT doc_id, is_eval, n_tok, s,
             md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
      FROM w),
ev AS (SELECT DISTINCT fp FROM f WHERE is_eval),
j AS (SELECT f.doc_id, f.n_tok,
             CASE WHEN ev.fp IS NULL THEN 0 ELSE 1 END AS hit
      FROM f LEFT JOIN ev ON f.fp = ev.fp
      WHERE NOT f.is_eval)
SELECT doc_id,
       CAST(max(n_tok) AS BIGINT) AS n_tok,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(hit) AS BIGINT) AS n_eval_hits,
       round(sum(hit) * 1.0 / count(*), 6) AS contamination_frac,
       sum(hit) > 0 AS contaminated
FROM j GROUP BY doc_id
"""


def q_decontaminate_bloom(spark, sf_dir):
    """Bloom-filter decontamination (tokens.decontaminate_bloom): the
    fixed-size-broadcast variant — one m/8-byte bitmap regardless of eval
    corpus size, k=3 portable double-hash positions, no false negatives.
    The oracle reproduces the SAME Bloom semantics (position-set join), so
    even false positives match exactly."""
    from esa_pfa_spark.operators.tokens import decontaminate_bloom

    docs = _tokenized_docs(spark, sf_dir)
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return decontaminate_bloom(
        docs.filter(~is_eval), docs.filter(is_eval), n=8, m_bits=1 << 20, k=3
    )


SQL_DECON_BLOOM = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks,
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_eval
             FROM documents),
w AS (SELECT doc_id, is_eval, len(toks) AS n_tok,
             unnest(generate_series(0, len(toks) - 8)) AS s, toks
      FROM tok WHERE len(toks) >= 8),
f AS (SELECT doc_id, is_eval, n_tok, s,
             md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
      FROM w),
h AS (SELECT doc_id, is_eval, n_tok, s,
             CAST(('0x' || substr(fp, 1, 15)) AS UBIGINT) % 1048576 AS hm,
             (CAST(('0x' || substr(fp, 16, 15)) AS UBIGINT) * 2 + 1) % 1048576 AS st
      FROM f),
pos AS (SELECT doc_id, is_eval, n_tok, s,
               unnest([hm, (hm + st) % 1048576, (hm + 2 * st) % 1048576]) AS p
        FROM h),
ev AS (SELECT DISTINCT p FROM pos WHERE is_eval),
perwin AS (SELECT pos.doc_id, pos.n_tok, pos.s,
                  CASE WHEN bool_and(ev.p IS NOT NULL) THEN 1 ELSE 0 END AS hit
           FROM pos LEFT JOIN ev ON pos.p = ev.p
           WHERE NOT pos.is_eval GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(max(n_tok) AS BIGINT) AS n_tok,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(hit) AS BIGINT) AS n_bloom_hits,
       round(sum(hit) * 1.0 / count(*), 6) AS contamination_frac,
       sum(hit) > 0 AS contaminated
FROM perwin GROUP BY doc_id
"""


def q_incremental_asof_features(spark, sf_dir):
    """Incremental feature-table maintenance (plans/incremental.py): the
    Spark side computes features for the post-cut probe window from ONLY
    the per-entity state (bootstrapped at cut 2024-01-13) + the delta
    observations — while the DuckDB oracle performs the FULL-history
    recompute.  A hash match therefore PROVES incremental == full, the
    module's central claim (never rescan history at 10^12 scale)."""
    import datetime as dt

    from esa_pfa_spark.plans.incremental import entity_state, incremental_fill

    cut = dt.datetime(2024, 1, 13)
    tol = dt.timedelta(days=7)
    gap = dt.timedelta(days=1)
    ev = _ld(spark, sf_dir, "events").select("user_id", "ts", "value")
    state = entity_state(ev, cut, gap=gap, entity="user_id", value_col="value")
    delta = ev.filter(F.col("ts") >= F.lit(cut))
    probes = (
        _ld(spark, sf_dir, "events")
        .select("user_id", (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("query_ts"))
        .filter(F.col("query_ts") >= F.lit(cut + tol))
    )
    return incremental_fill(
        delta, probes, state, tolerance=tol, gap=gap,
        entity="user_id", value_col="value",
    )


SQL_INCREMENTAL_ASOF = """
WITH o AS (SELECT user_id, ts, value,
             lag(value) OVER w AS lag_1_value,
             lead(value) OVER w AS lead_1_value,
             lag(ts) OVER w AS prev_ts
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
b AS (SELECT *, CASE WHEN prev_ts IS NULL
                       OR date_diff('microsecond', prev_ts, ts) <= 86400000000
                     THEN 0 ELSE 1 END AS brk FROM o),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id FROM b),
sl AS (SELECT *, count(*) OVER (PARTITION BY user_id, session_id) AS session_len
       FROM s),
probes AS (SELECT event_id, user_id, ts + INTERVAL 2 HOUR AS query_ts FROM events
           WHERE ts + INTERVAL 2 HOUR >= TIMESTAMP '2024-01-20 00:00:00'),
m AS (SELECT p.event_id, p.user_id, p.query_ts, max(sl.ts) AS matched_ts
      FROM probes p LEFT JOIN sl ON sl.user_id = p.user_id
        AND sl.ts <= p.query_ts AND sl.ts >= p.query_ts - INTERVAL 7 DAY
      GROUP BY 1, 2, 3)
SELECT m.user_id, m.query_ts, m.matched_ts,
       sl.value, sl.lag_1_value, sl.lead_1_value,
       CAST(sl.session_id AS BIGINT) AS session_id,
       CAST(sl.session_len AS INTEGER) AS session_len
FROM m LEFT JOIN sl ON sl.user_id = m.user_id AND sl.ts = m.matched_ts
"""


def q_incremental_state_roll(spark, sf_dir):
    """roll_state driver proof: Spark bootstraps the per-entity state at
    2024-01-10, advances it over the [01-10, 01-20) window WITHOUT
    rereading history; the oracle computes the state at 2024-01-20 from
    the FULL history.  Hash match == the state algebra is exact."""
    import datetime as dt

    from esa_pfa_spark.plans.incremental import entity_state, roll_state

    cut1, cut2 = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    gap = dt.timedelta(days=1)
    ev = _ld(spark, sf_dir, "events").select("user_id", "ts", "value")
    s1 = entity_state(ev, cut1, gap=gap, entity="user_id", value_col="value")
    window = ev.filter((F.col("ts") >= F.lit(cut1)) & (F.col("ts") < F.lit(cut2)))
    return roll_state(s1, window, gap=gap, entity="user_id", value_col="value")


SQL_INCREMENTAL_ROLL = """
WITH o AS (SELECT user_id, ts, value,
             lag(ts) OVER w AS prev_ts,
             row_number() OVER w AS oidx
           FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
b AS (SELECT *, CASE WHEN prev_ts IS NULL
                       OR date_diff('microsecond', prev_ts, ts) <= 86400000000
                     THEN 0 ELSE 1 END AS brk FROM o),
s AS (SELECT *,
        sum(brk) OVER cum AS session_id,
        max(CASE WHEN brk = 1 OR oidx = 1 THEN oidx END) OVER cum AS sess_start
      FROM b WINDOW cum AS (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING))
SELECT user_id,
       max(ts) AS last_ts,
       arg_max(value, ts) AS last_value,
       CAST(count(*) AS BIGINT) AS obs_before,
       CAST(max(session_id) AS BIGINT) AS sessions_before,
       CAST(max(sess_start) AS BIGINT) AS last_sess_start
FROM s GROUP BY user_id
"""


def q_curation_decontaminated(spark, sf_dir):
    """Curation chain with the benchmark-hygiene tail: quality gate ->
    exact dedup -> near-dup removal -> drop any survivor sharing an 8-gram
    with the held-out eval slice (md5(doc_id) hex[0] == '0').  The
    decontamination stage runs LAST, over only the survivors (the
    production order: cheapest gates first, broadcast join last)."""
    from esa_pfa_spark.plans.curation import curate_documents

    docs = _ld(spark, sf_dir, "documents")
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return curate_documents(docs.filter(~is_eval), eval_docs=docs.filter(is_eval))


SQL_CURATION_DECON = f"""
WITH traindocs AS (
  SELECT * FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'),
good AS (
  SELECT d.* FROM traindocs d
  WHERE len(string_split(text, ' ')) >= 5
    AND len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN}))) * 1.0
        / len(string_split(text, ' ')) <= 0.7),
canon AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text)),
k AS (SELECT good.* FROM good JOIN canon USING (doc_id)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM k),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
capped AS (SELECT shingle FROM sh0 GROUP BY shingle
           HAVING count(*) <= {DD.MAX_SHINGLE_FREQ}),
sh AS (SELECT doc_id, sh0.shingle FROM sh0 JOIN capped ON sh0.shingle = capped.shingle),
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
nd AS (SELECT DISTINCT db AS doc_id
       FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
       WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.2),
surv AS (SELECT k.* FROM k ANTI JOIN nd USING (doc_id)),
evt AS (SELECT {_TOK_SQL} AS toks FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
evw AS (SELECT DISTINCT md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
        FROM (SELECT toks, unnest(generate_series(0, len(toks) - 8)) AS s
              FROM evt WHERE len(toks) >= 8)),
st AS (SELECT doc_id, {_TOK_SQL} AS toks FROM surv),
stw AS (SELECT doc_id, md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
        FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 8)) AS s
              FROM st WHERE len(toks) >= 8)),
cont AS (SELECT DISTINCT stw.doc_id FROM stw JOIN evw USING (fp))
SELECT surv.doc_id, surv.source FROM surv ANTI JOIN cont USING (doc_id)
"""


def q_token_repetition(spark, sf_dir):
    """Gopher-style intra-document repetition gates: distinct-token ratio +
    most-frequent-token share.  Two-level aggregation, one shuffle keyed by
    doc_id."""
    from esa_pfa_spark.operators.tokens import repetition_stats

    return repetition_stats(_tokenized_docs(spark, sf_dir))


SQL_TOKEN_REPETITION = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
pt AS (SELECT doc_id, unnest(toks) AS token FROM tok),
c AS (SELECT doc_id, token, count(*) AS c FROM pt GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tok,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(1.0 - count(*) * 1.0 / sum(c), 6) AS dup_ratio,
       round(max(c) * 1.0 / sum(c), 6) AS top_token_share,
       round(ln(sum(c)) - CAST(sum(CAST(c * ln(c) AS DECIMAL(18,6))) AS DOUBLE)
             / sum(c), 6) + 0.0 AS entropy
FROM c GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Dataset assembly: split / mixture-sample / deterministic shuffle order.
# Same md5 portability primitive as the tokenizer; no rand() anywhere, so
# membership and order are properties of the row, reproducible across
# engines, partitionings and cluster sizes.
# ---------------------------------------------------------------------------


def q_dataset_split(spark, sf_dir):
    """Deterministic 90/5/5 split; output = per-(source, split) counts
    (small) so the oracle checks the full assignment without shipping
    every row."""
    from esa_pfa_spark.operators.dataset import hash_split

    d = hash_split(
        _ld(spark, sf_dir, "documents"),
        {"train": 0.9, "val": 0.05, "test": 0.05},
        seed=7,
    )
    return d.groupBy("source", "split").agg(F.count(F.lit(1)).alias("n"))


SQL_DATASET_SPLIT = """
WITH b AS (
  SELECT source,
         CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
             % 10000 AS bk
  FROM documents),
s AS (SELECT source,
             CASE WHEN bk < 9000 THEN 'train'
                  WHEN bk < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM b)
SELECT source, split, count(*) AS n FROM s GROUP BY 1, 2
"""


def q_split_leakage(spark, sf_dir):
    """Eval-contamination audit: MinHash candidate pairs that straddle the
    90/5/5 split — each is a train⋈eval near-dup leak
    (dataset.split_leakage)."""
    from esa_pfa_spark.operators.dataset import hash_split, split_leakage

    docs = _ld(spark, sf_dir, "documents")
    pairs = DD.minhash_band_candidates(docs)
    splits = hash_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}, seed=7
    ).select("doc_id", "split")
    return split_leakage(pairs, splits)


SQL_SPLIT_LEAKAGE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
         FROM sig a JOIN sig b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))),
sp AS (SELECT doc_id,
              CASE WHEN bk < 9000 THEN 'train'
                   WHEN bk < 9500 THEN 'val'
                   ELSE 'test' END AS split
       FROM (SELECT doc_id,
                    CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
                        % 10000 AS bk
             FROM documents))
SELECT c.doc_id_a, c.doc_id_b, sa.split AS split_a, sb.split AS split_b
FROM cand c
JOIN sp sa ON sa.doc_id = c.doc_id_a
JOIN sp sb ON sb.doc_id = c.doc_id_b
WHERE sa.split <> sb.split
"""


def q_mixture_sample(spark, sf_dir):
    """Per-source mixture weighting: src0 30%, src1 100%, everything else
    5% — the sampled doc_ids themselves (deterministic membership)."""
    from esa_pfa_spark.operators.dataset import mixture_sample

    return mixture_sample(
        _ld(spark, sf_dir, "documents"),
        {"src0": 0.3, "src1": 1.0},
        seed=11,
        default_rate=0.05,
    ).select("doc_id", "source")


SQL_MIXTURE_SAMPLE = """
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
             % 10000 AS bk,
         CASE WHEN source = 'src0' THEN 3000
              WHEN source = 'src1' THEN 10000
              ELSE 500 END AS thr
  FROM documents)
WHERE bk < thr
"""


def q_shuffle_order(spark, sf_dir):
    """Seeded global shuffle order for export.  The oracle's row_number()
    OVER (ORDER BY md5) is the single-task plan; the engine ranks via
    content-defined hash-prefix buckets + per-bucket offsets
    (plan-asserted no SinglePartition in tests/test_plans.py)."""
    from esa_pfa_spark.operators.dataset import deterministic_shuffle

    return deterministic_shuffle(
        _ld(spark, sf_dir, "documents").select("doc_id"), seed=3
    )


SQL_SHUFFLE_ORDER = """
SELECT doc_id,
       row_number() OVER (
           ORDER BY md5('3:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS shuffle_pos
FROM documents
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction gate (textstats.redact_pii): synthetic docs carry no
    PII, so the query deterministically injects an email / IPv4 / phone
    into doc_id%4 slices first, then scrubs — exercising both presence
    and absence.  Map-only JVM regex; exact oracle (md5 of the scrubbed
    text + per-type counts)."""
    from esa_pfa_spark.operators.textstats import redact_pii

    docs = _ld(spark, sf_dir, "documents")
    d = F.col("doc_id")
    tail = (
        F.when(d % 4 == 0, F.concat(F.lit(" reach user"), d.cast("string"),
                                    F.lit("@mail.example.com")))
        .when(d % 4 == 1, F.concat(F.lit(" from 10.1.2."), (d % 256).cast("string")))
        .when(d % 4 == 2, F.concat(F.lit(" call +1-555-"),
                                   F.lpad((d % 10000).cast("string"), 4, "0")))
        .otherwise(F.lit(""))
    )
    seeded = docs.select("doc_id", F.concat("text", tail).alias("text"))
    out = redact_pii(seeded)
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_md5"),
        "n_email", "n_ipv4", "n_phone",
    )


SQL_PII_SCRUB = r"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 4 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
           WHEN doc_id % 4 = 1 THEN ' from 10.1.2.' || CAST(doc_id % 256 AS VARCHAR)
           WHEN doc_id % 4 = 2 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE '' END AS t
  FROM documents),
s1 AS (SELECT doc_id, t,
              len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
       FROM seeded),
s2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
              regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS t2
       FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4,
              len(regexp_extract_all(t2, '\+\d{1,3}[- ]\d{3}[- ]\d{4}')) AS n_phone,
              regexp_replace(t2, '\+\d{1,3}[- ]\d{3}[- ]\d{4}', '<PHONE>', 'g') AS t3
       FROM s2)
SELECT doc_id, md5(t3) AS clean_md5, n_email, n_ipv4, n_phone
FROM s3
"""


def q_c4_line_clean(spark, sf_dir):
    """C4-style line cleaning (textstats.c4_line_filter): synthetic docs
    are one unpunctuated line, so the query first seeds line structure —
    every 6 words become a '.'-terminated line, the ragged tail stays
    unpunctuated — then cleans: the tail fails the terminal-punct gate,
    lines containing 'slow' fail the ban-list gate.  Map-only
    higher-order array functions, no explode."""
    from esa_pfa_spark.operators.textstats import c4_line_filter

    docs = _ld(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"((?:\S+ ){5}\S+) ", "$1.\n"
        ).alias("text"),
    )
    out = c4_line_filter(
        seeded, min_words=3, require_terminal_punct=True, ban_words=("slow",)
    )
    return out.select(
        "doc_id", "n_lines", "n_kept", F.md5("clean_text").alias("clean_md5")
    )


SQL_C4_LINE_CLEAN = r"""
WITH seeded AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\S+ ){5}\S+) ', '\1.' || chr(10), 'g') AS t
  FROM documents),
f AS (
  SELECT doc_id,
         str_split(t, chr(10)) AS ls,
         list_filter(str_split(t, chr(10)), x ->
           len(str_split(trim(x), ' ')) >= 3
           AND regexp_matches(x, '[.!?"]\s*$')
           AND NOT contains(lower(x), 'slow')) AS ks
  FROM seeded)
SELECT doc_id,
       CAST(len(ls) AS INT) AS n_lines,
       CAST(len(ks) AS INT) AS n_kept,
       md5(array_to_string(ks, chr(10))) AS clean_md5
FROM f
"""


def q_encoding_garbage(spark, sf_dir):
    """Mojibake gate (textstats.encoding_garbage): synthetic docs are pure
    ASCII, so the query seeds deterministic damage first — U+FFFD
    replacement chars into doc_id%5==0, a BEL control char into %5==1,
    accented non-ASCII into %5==2 — then counts each damage class and the
    non-ASCII ratio.  Pure JVM regexp, map-only."""
    from esa_pfa_spark.operators.textstats import encoding_garbage

    docs = _ld(spark, sf_dir, "documents")
    d = F.col("doc_id")
    tail = (
        F.when(d % 5 == 0, F.lit(" ��"))
        .when(d % 5 == 1, F.lit(" \x07bel"))
        .when(d % 5 == 2, F.lit(" héllo wörld"))
        .otherwise(F.lit(""))
    )
    seeded = docs.select("doc_id", F.concat("text", tail).alias("text"))
    out = encoding_garbage(seeded)
    return out.select("doc_id", "n_replacement", "n_control", "nonascii_ratio")


SQL_ENCODING_GARBAGE = r"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 5 = 0 THEN ' ' || chr(65533) || chr(65533)
           WHEN doc_id % 5 = 1 THEN ' ' || chr(7) || 'bel'
           WHEN doc_id % 5 = 2 THEN ' h' || chr(233) || 'llo w' || chr(246) || 'rld'
           ELSE '' END AS t
  FROM documents),
counted AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, chr(65533))) AS n_replacement,
         len(regexp_extract_all(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) AS n_control,
         len(t) - len(regexp_extract_all(t, '[\x20-\x7E\t\n\r]')) AS n_nonascii
  FROM seeded)
SELECT doc_id,
       CAST(n_replacement AS INT) AS n_replacement,
       CAST(n_control AS INT) AS n_control,
       round(CASE WHEN len(t) > 0
             THEN CAST(n_nonascii AS DOUBLE) / len(t) ELSE 0.0 END, 6) AS nonascii_ratio
FROM counted
"""


def q_pit_multi_window(spark, sf_dir):
    """Multi-horizon PIT features (pit.pit_multi_window_agg): 1d / 7d / 30d
    purchase aggregates at each click, all horizons sharing ONE fused
    fill and one hash agg — no per-horizon joins or passes."""
    from esa_pfa_spark.operators.pit import pit_multi_window_agg

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("obs_id")
    )
    out = pit_multi_window_agg(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        value="value", tiebreak="obs_id",
        windows={"1d": dt.timedelta(days=1), "7d": dt.timedelta(days=7),
                 "30d": dt.timedelta(days=30)},
    )
    cols = ["event_id", "user_id", "query_ts"]
    for nme in ("1d", "7d", "30d"):
        cols += [f"n_{nme}",
                 _r6(F.col(f"sum_{nme}")).alias(f"sum_{nme}"),
                 _r6(F.col(f"mean_{nme}")).alias(f"mean_{nme}")]
    return out.select(*cols)


def _pit_horizon_sql(nme: str, days: int) -> str:
    return f"""
  (SELECT count(*) FROM p WHERE p.user_id=c.user_id
    AND p.ts<=c.query_ts AND p.ts > c.query_ts - INTERVAL {days} DAY) AS n_{nme},
  round((SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    AND p.ts > c.query_ts - INTERVAL {days} DAY), 6) AS sum_{nme},
  round((SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    AND p.ts > c.query_ts - INTERVAL {days} DAY HAVING count(*) > 0), 6) AS mean_{nme}"""


SQL_PIT_MULTI_WINDOW = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase')
SELECT c.event_id, c.user_id, c.query_ts,
{_pit_horizon_sql('1d', 1)},
{_pit_horizon_sql('7d', 7)},
{_pit_horizon_sql('30d', 30)}
FROM c
"""


def q_token_budget_mix(spark, sf_dir):
    """Token-budget mixture (dataset.mixture_by_token_budget): per-source
    token quotas filled in seeded hash order — the tokens-per-source mix
    spec of a real LLM run, reproducible across backfills."""
    from esa_pfa_spark.operators.dataset import mixture_by_token_budget
    from esa_pfa_spark.operators.tokens import tokenize

    docs = tokenize(_ld(spark, sf_dir, "documents")).select(
        "doc_id", "source", "n_tok"
    )
    budgets = {"src0": 800, "src1": 400, "src2": 1200}
    return mixture_by_token_budget(docs, budgets)


SQL_TOKEN_BUDGET_MIX = """
WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents),
c AS (SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source
               ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS cum,
             CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400
                         WHEN 'src2' THEN 1200 END AS budget
      FROM d)
SELECT doc_id, source, CAST(n_tok AS INT) AS n_tok, CAST(cum AS BIGINT) AS cum_tok
FROM c WHERE budget IS NOT NULL AND cum <= budget
"""


def q_quantile_bins(spark, sf_dir):
    """Equal-frequency binning (encode.quantile_bins): decile index per
    purchase value — edge table via one aggregate, map-only assignment
    (no ntile global window)."""
    from esa_pfa_spark.operators.encode import quantile_bins

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = quantile_bins(ev, value="value", n_bins=10)
    return out.select("event_id", _r6(F.col("value")).alias("value"), "bin")


SQL_QUANTILE_BINS = """
WITH p AS (SELECT event_id, value FROM events WHERE event_type='purchase'),
e AS (SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM p)
SELECT p.event_id, round(p.value, 6) AS value,
       CAST(len(list_filter(e.edges, x -> p.value >= x)) AS INT) AS bin
FROM p, e
"""


def q_robust_z(spark, sf_dir):
    """Robust outlier score (encode.robust_z_by_group): per-event-type
    0.6745*(v - median)/MAD — the gate that survives its own outliers."""
    from esa_pfa_spark.operators.encode import robust_z_by_group

    ev = _ld(spark, sf_dir, "events")
    out = robust_z_by_group(ev, value="value", group="event_type")
    return out.select("event_id", "event_type", "robust_z")


SQL_ROBUST_Z = """
WITH m AS (SELECT event_id, event_type, value,
                  quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS med
           FROM events),
d AS (SELECT *, quantile_cont(abs(value - med), 0.5)
                OVER (PARTITION BY event_type) AS mad
      FROM m)
SELECT event_id, event_type,
       round(CASE WHEN mad > 0
             THEN 0.6745 * (value - med) / mad END, 6) + 0.0 AS robust_z
FROM d
"""


def q_ewma_by_user(spark, sf_dir):
    """Per-entity EWMA state (signal.ewma_by_key): JVM fold over the
    time-sorted purchase values — bit-exact vs DuckDB list_reduce because
    both run the identical double operation sequence (alpha=0.25 keeps
    the multipliers exactly representable)."""
    from esa_pfa_spark.operators.signal import ewma_by_key

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ewma_by_key(
        ev, value="value", key="user_id", ts="ts", tiebreak="event_id", alpha=0.25
    )


SQL_EWMA_BY_USER = """
WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type='purchase'),
g AS (SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
      FROM p GROUP BY user_id)
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n,
       round(list_reduce(vs, (acc, x) -> acc * 0.75 + 0.25 * x), 6) AS ewma
FROM g
"""


def q_cusum_by_user(spark, sf_dir):
    """Per-entity one-sided CUSUM drift score (signal.cusum_by_key),
    target 50: the recurrence de-recursed into cumsum/running-min/max
    window algebra over ONE sort — no fold, no UDF."""
    from esa_pfa_spark.operators.signal import cusum_by_key

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return cusum_by_key(
        ev, value="value", key="user_id", ts="ts", tiebreak="event_id", target=50.0
    )


SQL_CUSUM_BY_USER = """
WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type='purchase'),
d AS (SELECT user_id, ts, event_id,
             CAST(sum(CAST(value - 50.0 AS DECIMAL(18,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS d
      FROM p),
s AS (SELECT user_id,
             d - min(least(d, 0.0))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS s
      FROM d)
SELECT user_id, CAST(count(*) AS BIGINT) AS n, round(max(s), 6) + 0.0 AS cusum_max
FROM s GROUP BY user_id
"""


def q_profile_events(spark, sf_dir):
    """Per-column ingest audit (profile.profile_table): exact distinct /
    null counts, decimal-exact numeric means, string min/max — one
    distributed pass, one output row per column."""
    from esa_pfa_spark.operators.profile import profile_table

    ev = _ld(spark, sf_dir, "events")
    return profile_table(ev, columns=["user_id", "value", "event_type", "props", "ts"])


SQL_PROFILE_EVENTS = """
SELECT 'user_id' AS column, count(*) AS n,
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT user_id) AS n_distinct,
       round(CAST(min(user_id) AS DOUBLE), 6) AS num_min,
       round(CAST(max(user_id) AS DOUBLE), 6) AS num_max,
       round(CAST(sum(CAST(user_id AS DECIMAL(28,6))) AS DOUBLE) / count(user_id), 6) AS num_mean,
       CAST(NULL AS VARCHAR) AS str_min, CAST(NULL AS VARCHAR) AS str_max
FROM events
UNION ALL
SELECT 'value', count(*),
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT value),
       round(min(value), 6), round(max(value), 6),
       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(value), 6),
       NULL, NULL
FROM events
UNION ALL
SELECT 'event_type', count(*),
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT event_type),
       NULL, NULL, NULL, min(event_type), max(event_type)
FROM events
UNION ALL
SELECT 'props', count(*),
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT props),
       NULL, NULL, NULL, min(props), max(props)
FROM events
UNION ALL
SELECT 'ts', count(*),
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT ts),
       round(CAST(epoch_us(min(ts)) AS DOUBLE), 6),
       round(CAST(epoch_us(max(ts)) AS DOUBLE), 6),
       round(CAST(sum(CAST(epoch_us(ts) AS DECIMAL(28,6))) AS DOUBLE) / count(ts), 6),
       NULL, NULL
FROM events
"""


def q_interval_lookup(spark, sf_dir):
    """Point-in-interval dimension lookup (ranges.interval_lookup): each
    purchase value joined to every OVERLAPPING tier band [i*25, i*25+30]
    via fixed-width bucket decomposition — an equi-join on the bucket, not
    the O(n*m) BroadcastNestedLoopJoin the BETWEEN theta-join plans."""
    from esa_pfa_spark.operators.ranges import interval_lookup

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    points = ev.select("event_id", F.col("value").alias("v"))
    tiers = spark.range(16).select(
        F.col("id").cast("int").alias("tier_id"),
        (F.col("id") * 25.0).alias("lo"),
        (F.col("id") * 25.0 + 30.0).alias("hi"),
    )
    out = interval_lookup(points, tiers, point_col="v", bucket_width=25.0)
    return out.select(
        "event_id", "tier_id", _r6(F.col("v")).alias("v"), "lo", "hi"
    )


SQL_INTERVAL_LOOKUP = """
WITH tiers AS (SELECT CAST(i AS INT) AS tier_id, i * 25.0 AS lo, i * 25.0 + 30.0 AS hi
               FROM (SELECT unnest(generate_series(0, 15)) AS i)),
p AS (SELECT event_id, value AS v FROM events WHERE event_type = 'purchase')
SELECT p.event_id, t.tier_id, round(p.v, 6) AS v, t.lo, t.hi
FROM p JOIN tiers t ON p.v >= t.lo AND p.v <= t.hi
"""


def q_funnel(spark, sf_dir):
    """Greedy-earliest funnel signup -> view -> purchase per user, each
    step within 10 days of the previous (ranges.funnel): one groupBy +
    sorted-array fold, no per-step self-joins."""
    from esa_pfa_spark.operators.ranges import funnel

    ev = _ld(spark, sf_dir, "events")
    return funnel(
        ev, steps=["signup", "view", "purchase"], key="user_id",
        within=dt.timedelta(days=10),
    )


SQL_FUNNEL = """
WITH u AS (SELECT DISTINCT user_id FROM events
           WHERE event_type IN ('signup', 'view', 'purchase')),
s1 AS (SELECT u.user_id,
              (SELECT min(ts) FROM events e
                WHERE e.user_id = u.user_id AND e.event_type = 'signup') AS step_1_ts
       FROM u),
s2 AS (SELECT s1.*,
              (SELECT min(ts) FROM events e
                WHERE e.user_id = s1.user_id AND e.event_type = 'view'
                  AND s1.step_1_ts IS NOT NULL AND e.ts > s1.step_1_ts
                  AND epoch_us(e.ts) - epoch_us(s1.step_1_ts) <= 864000000000) AS step_2_ts
       FROM s1),
s3 AS (SELECT s2.*,
              (SELECT min(ts) FROM events e
                WHERE e.user_id = s2.user_id AND e.event_type = 'purchase'
                  AND s2.step_2_ts IS NOT NULL AND e.ts > s2.step_2_ts
                  AND epoch_us(e.ts) - epoch_us(s2.step_2_ts) <= 864000000000) AS step_3_ts
       FROM s2)
SELECT user_id, step_1_ts, step_2_ts, step_3_ts,
       CAST(CASE WHEN step_3_ts IS NOT NULL THEN 3
                 WHEN step_2_ts IS NOT NULL THEN 2
                 WHEN step_1_ts IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_depth
FROM s3
"""


def q_negative_samples(spark, sf_dir):
    """Deterministic contrastive negative sampling (dataset.
    negative_samples): 2 corpus-wide negatives per doc via dense-rank
    index + seeded md5 offset; never self, reproducible across runs."""
    from esa_pfa_spark.operators.dataset import negative_samples

    docs = _ld(spark, sf_dir, "documents")
    return negative_samples(docs, id_col="doc_id", n_neg=2, seed=0)


SQL_NEGATIVE_SAMPLES = """
WITH ids AS (SELECT doc_id, dense_rank() OVER (ORDER BY doc_id) - 1 AS idx
             FROM (SELECT DISTINCT doc_id FROM documents)),
n AS (SELECT count(*) AS total FROM ids),
e AS (SELECT d.doc_id, d.idx, g.i,
             1 + CAST(('0x' || substr(md5('0:' || CAST(g.i AS VARCHAR) || ':'
                       || CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                 % (n.total - 1) AS off
      FROM ids d CROSS JOIN n CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS i) g)
SELECT e.doc_id, CAST(e.i AS INT) AS neg_rank, t.doc_id AS neg_id
FROM e
JOIN n ON TRUE
JOIN ids t ON t.idx = (e.idx + e.off) % n.total
"""


def q_zscore_by_user(spark, sf_dir):
    """Per-group standardization (encode.zscore_by_group): event value
    z-scored within each user; null for constant/singleton groups."""
    from esa_pfa_spark.operators.encode import zscore_by_group

    ev = _ld(spark, sf_dir, "events")
    out = zscore_by_group(ev, value="value", group="user_id")
    return out.select("event_id", "user_id", _r6(F.col("z")).alias("z"))


SQL_ZSCORE_BY_USER = """
SELECT event_id, user_id,
       round(CASE WHEN stddev_samp(value) OVER (PARTITION BY user_id) > 0
             THEN (value - avg(value) OVER (PARTITION BY user_id))
                  / stddev_samp(value) OVER (PARTITION BY user_id) END, 6) AS z
FROM events
"""


def q_winsorize_by_type(spark, sf_dir):
    """Per-group winsorization (encode.winsorize_by_group): clamp value to
    each event type's [p05, p95] interpolated percentiles."""
    from esa_pfa_spark.operators.encode import winsorize_by_group

    ev = _ld(spark, sf_dir, "events")
    out = winsorize_by_group(ev, value="value", group="event_type", lo=0.05, hi=0.95)
    return out.select(
        "event_id", "event_type", _r6(F.col("value_w")).alias("value_w")
    )


SQL_WINSORIZE_BY_TYPE = """
SELECT event_id, event_type,
       round(least(greatest(value,
                            quantile_cont(value, 0.05) OVER (PARTITION BY event_type)),
                   quantile_cont(value, 0.95) OVER (PARTITION BY event_type)), 6) AS value_w
FROM events
"""


def q_target_encode(spark, sf_dir):
    """Leakage-free expanding target encoding (encode.
    target_encode_expanding): each event's te_mean is the mean value of
    the SAME user's strictly-earlier events — the PIT-correct form of
    the classic (leaky) category-mean encoding."""
    from esa_pfa_spark.operators.encode import target_encode_expanding

    ev = _ld(spark, sf_dir, "events")
    out = target_encode_expanding(
        ev, category="user_id", target="value", ts="ts", tiebreak="event_id"
    )
    return out.select(
        "event_id", "user_id", "te_n", _r6(F.col("te_mean")).alias("te_mean")
    )


SQL_TARGET_ENCODE = """
SELECT event_id, user_id,
       CAST(count(value) OVER w AS BIGINT) AS te_n,
       round(CASE WHEN count(value) OVER w > 0
             THEN CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                  / count(value) OVER w END, 6) AS te_mean
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def q_cyclical_time(spark, sf_dir):
    """Cyclical calendar encodings (encode.cyclical_time_features):
    hour/dow ordinals + wrap-preserving (sin, cos) pairs.  Map-only."""
    from esa_pfa_spark.operators.encode import cyclical_time_features

    ev = _ld(spark, sf_dir, "events")
    out = cyclical_time_features(ev)
    return out.select(
        "event_id", "hour", "dow",
        "hour_sin", "hour_cos", "dow_sin", "dow_cos",
    )


SQL_CYCLICAL_TIME = """
SELECT event_id,
       CAST(hour(ts) AS INT) AS hour,
       CAST(dayofweek(ts) AS INT) AS dow,
       round(sin(hour(ts) * (2 * pi() / 24)), 6) + 0.0 AS hour_sin,
       round(cos(hour(ts) * (2 * pi() / 24)), 6) + 0.0 AS hour_cos,
       round(sin(dayofweek(ts) * (2 * pi() / 7)), 6) + 0.0 AS dow_sin,
       round(cos(dayofweek(ts) * (2 * pi() / 7)), 6) + 0.0 AS dow_cos
FROM events
"""


def q_mg_heavy_hitters(spark, sf_dir):
    """Misra-Gries heavy hitters (tokens.mg_heavy_hitters): 32 logical
    md5-bucket summaries of k=32 counters each, merged by token, top-20 —
    the mergeable-summaries algebra in relational form (exactly oracled
    because the bucket split is content-defined, not physical)."""
    from esa_pfa_spark.operators.tokens import mg_heavy_hitters

    toks = _tokenized_docs(spark, sf_dir).select("doc_id", "tokens")
    return mg_heavy_hitters(toks, k=32, m=20, n_summaries=32)


SQL_MG_HEAVY_HITTERS = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
x AS (SELECT CAST(('0x' || substr(md5('hh:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER) % 32 AS pid,
             unnest(toks) AS token
      FROM tok),
c AS (SELECT pid, CAST(token AS BIGINT) AS token, count(*) AS cnt FROM x GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY cnt DESC, token ASC) AS rn FROM c),
th AS (SELECT pid, coalesce(max(CASE WHEN rn = 33 THEN cnt END), 0) AS thresh FROM r GROUP BY pid),
s AS (SELECT r.token, r.cnt - th.thresh AS est FROM r JOIN th USING (pid)
      WHERE r.cnt - th.thresh > 0),
b AS (SELECT CAST(sum(thresh) AS BIGINT) AS err_bound FROM th),
m AS (SELECT token, CAST(sum(est) AS BIGINT) AS est_count FROM s GROUP BY token)
SELECT token, est_count, err_bound FROM m, b
ORDER BY est_count DESC, token ASC LIMIT 20
"""


def q_bpe_merge_table(spark, sf_dir):
    """Distributed BPE merge training (tokens.bpe_train): 6 rounds of
    corpus-wide pair counts -> deterministic argmax -> map-only vectorized
    merge.  Iterative (driver holds only the O(n_merges) merge table), so
    no SQL oracle — exactness vs a sequential single-process oracle is
    property-tested in tests/test_bpe.py."""
    from esa_pfa_spark.operators.tokens import bpe_train

    toks = _tokenized_docs(spark, sf_dir).select("doc_id", "tokens")
    _, _, table = bpe_train(toks, n_merges=6)
    return table


def q_bpe_sampled_apply(spark, sf_dir):
    """BPE at scale (tokens.bpe_train_sampled): merge table trained
    driver-side on a deterministic sample, then ALL 256 rules applied
    corpus-wide in ONE map-only mapInPandas pass — vs bpe_train's
    one-full-corpus-rewrite-per-round.  Output: per-doc merged length +
    md5 fingerprint of the merged sequence (deterministic).  Iterative
    trainer => no SQL oracle (rows-only); exactness of the one-pass apply
    vs the per-round trainer is tested in tests/test_bpe.py."""
    from esa_pfa_spark.operators.tokens import bpe_train_sampled

    toks = _tokenized_docs_w(spark, sf_dir).select("doc_id", "tokens")
    _, applied, _ = bpe_train_sampled(toks, n_merges=256, sample_docs=10_000)
    merged_str = F.array_join(
        F.transform(F.col("tokens"), lambda x: x.cast("string")), ","
    )
    return applied.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_merged"),
        F.md5(merged_str).alias("merged_fp"),
    )


def q_bpe_encode_sampled(spark, sf_dir):
    """Production-vocab BPE encode (tokens.bpe_encode): merge table trained
    driver-side on a deterministic sample (512 merges), then encoded
    corpus-wide in ONE map-only pass whose per-batch cost is INDEPENDENT
    of the table size — pair->rank dict + lazy min-rank heap over a
    linked list, the standard tokenizer encode shape — vs bpe_apply's one
    vectorized sweep PER RULE.  Equality with bpe_apply on trained tables
    is tested in tests/test_bpe.py; near-flat cost 256 -> 4096 merges is
    measured in BENCH/BPE_ENCODE.md.  Iterative trainer => no SQL oracle
    (rows-only).  Reference analog: the fixed up-front vocab regime of
    DatasetDescriptor (pfa-core/.../op/DatasetDescriptor.java:10-77)."""
    from esa_pfa_spark.operators.tokens import bpe_train_sampled

    toks = _tokenized_docs(spark, sf_dir).select("doc_id", "tokens")
    _, applied, _ = bpe_train_sampled(
        toks, n_merges=512, sample_docs=10_000, encoder="encode"
    )
    merged_str = F.array_join(
        F.transform(F.col("tokens"), lambda x: x.cast("string")), ","
    )
    return applied.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_merged"),
        F.md5(merged_str).alias("merged_fp"),
    )


def q_curation_v3(spark, sf_dir):
    """The verified-and-weighted curation chain
    (plans.curate_documents_v3): Gopher gates -> LSH candidates
    CONFIRMED by exact Levenshtein (v2 trusted the bands) -> best-copy
    survivors -> PageRank authority x trained-logreg quality -> top-50
    export.  Five independently-oracled operators proven as ONE chain
    against an assembled SQL program (gopher/candidate CTEs + the
    recursive-component CTE + the prefixed pagerank chain + the logreg
    GD chain)."""
    from esa_pfa_spark.plans.curation import curate_documents_v3

    return curate_documents_v3(
        _ld(spark, sf_dir, "documents"), _ld(spark, sf_dir, "embeddings"),
        min_words=20, sim_thresh=0.9, pr_iters=3, topn=50,
    )


def _curation_v3_sql(
    sim_thresh: float = 0.9, pr_iters: int = 3, topn: int = 50
) -> str:
    pr_parts = _pagerank_cte_parts(iters=pr_iters, prefix="pg")
    lr_parts, p_expr = _logreg_cte_parts(
        dims=4, lr=5.0, iters=4,
        label_sql="(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)) > 0",
        keep_cols=", vec_id",
    )
    return f"""
WITH RECURSIVE
gq AS MATERIALIZED (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_len,
         (length(text) - length(replace(text, '#', '')))
           + CAST(floor((length(text) - length(replace(text, '...', ''))) / 3) AS BIGINT) AS symbols,
         CAST(len(list_filter(string_split(text, ' '), x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS alpha_frac,
         len(list_filter([{_GOPHER_STOPS}], s -> list_contains(string_split(text, ' '), s))) AS stop_hits
  FROM documents),
gated AS MATERIALIZED (
  SELECT d.* FROM documents d JOIN gq USING (doc_id)
  WHERE NOT (gq.n_words < 20 OR gq.n_words > 100000)
    AND NOT (gq.mean_len < 3.0 OR gq.mean_len > 10.0)
    AND NOT (CAST(gq.symbols AS DOUBLE) / gq.n_words > 0.1)
    AND NOT (gq.alpha_frac < 0.8)),
wv AS (SELECT doc_id, string_split(text, ' ') AS ws FROM gated),
shv AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM wv WHERE len(ws) >= 3),
sigv AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM shv GROUP BY doc_id),
candv AS MATERIALIZED (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         FROM sigv a JOIN sigv b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))),
ver AS MATERIALIZED (
  SELECT c.u, c.v FROM candv c
  JOIN gated da ON da.doc_id = c.u
  JOIN gated db ON db.doc_id = c.v
  WHERE ROUND(CAST(1.0 AS DOUBLE)
              - CAST(levenshtein(da.text, db.text) AS DOUBLE)
                / GREATEST(length(da.text), length(db.text)), 6)
        >= {sim_thresh!r}),
e2g AS (SELECT u, v FROM ver UNION SELECT v, u FROM ver),
nodes AS (SELECT DISTINCT u AS id FROM e2g),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e2g.v, r.lbl FROM reach r JOIN e2g ON e2g.u = r.id WHERE r.lbl < e2g.v),
comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY 1),
best AS (SELECT comp, id AS canon FROM (
           SELECT c.id, c.comp, g.n_chars,
                  row_number() OVER (PARTITION BY c.comp
                                     ORDER BY g.n_chars DESC, c.id ASC) AS rn
           FROM comp c JOIN gated g ON g.doc_id = c.id)
         WHERE rn = 1),
mm AS (SELECT c.id, b.canon FROM comp c JOIN best b USING (comp)),
surv AS MATERIALIZED (
  SELECT g.doc_id, g.source FROM gated g LEFT JOIN mm ON mm.id = g.doc_id
  WHERE coalesce(mm.canon, g.doc_id) = g.doc_id),
{pr_parts},
{lr_parts},
qual AS MATERIALIZED (SELECT base.vec_id AS doc_id, {p_expr} AS p
                      FROM base, it4 t),
joined AS (
  SELECT s.doc_id, s.source, r.r AS pr_raw, q.p
  FROM surv s JOIN pgr{pr_iters} r ON r.v = s.doc_id
  JOIN qual q ON q.doc_id = s.doc_id
  WHERE q.p >= CAST(0.5 AS DOUBLE))
SELECT doc_id, source,
       ROUND(pr_raw, 6) AS pr, ROUND(p, 6) AS p_quality,
       ROUND(pr_raw * p, 9) AS export_score,
       CAST(row_number() OVER (ORDER BY ROUND(pr_raw * p, 9) DESC, doc_id) AS INT) AS rank
FROM joined QUALIFY rank <= {topn}
"""


def q_quantile_normalize(spark, sf_dir):
    """Cross-source quantile normalization (encode.quantile_normalize):
    per-event-type value distributions mapped onto the global
    distribution — the batch-effect correction a multi-instrument /
    multi-scraper corpus needs before features are comparable across
    sources.  Exact rank + interpolation chain, bit-oracled; the global
    indexed order is the test-scale device (production interpolates
    against a ddsketch quantile table instead — see the docstring)."""
    from esa_pfa_spark.operators.encode import quantile_normalize

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    return quantile_normalize(ev, "value", "event_type", "event_id")


SQL_QUANTILE_NORMALIZE = """
WITH src AS MATERIALIZED (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v
  FROM events WHERE event_id % 7 = 0),
ranked AS (
  SELECT event_type, event_id, v,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY v, event_id) - 1 AS DOUBLE) AS rk,
         CAST(count(*) OVER (PARTITION BY event_type) - 1 AS DOUBLE) AS ng
  FROM src),
idx AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY v, event_type, event_id) - 1 AS gi, v AS gv
  FROM src),
nt AS (SELECT count(*) AS n FROM src),
based AS (
  SELECT r.event_type, r.event_id, r.v,
         (CASE WHEN r.ng = 0 THEN CAST(0.5 AS DOUBLE) ELSE r.rk / r.ng END)
           * CAST(nt.n - 1 AS DOUBLE) AS pos
  FROM ranked r, nt),
b2 AS (
  SELECT b.*, CAST(FLOOR(pos) AS BIGINT) AS lo,
         LEAST(CAST(FLOOR(pos) AS BIGINT) + 1, (SELECT n - 1 FROM nt)) AS hi
  FROM based b)
SELECT b2.event_type, b2.event_id, b2.v AS value,
       ROUND(l.gv + (b2.pos - b2.lo) * (h.gv - l.gv), 6) AS qnorm
FROM b2 JOIN idx l ON l.gi = b2.lo JOIN idx h ON h.gi = b2.hi
"""


def q_mutual_information(spark, sf_dir):
    """Model-free feature ranking (encode.mutual_information): MI of
    three candidate categorical features — event_type, hour-of-day,
    and a deterministic user cohort — against the high-value label
    (value > 50), all in ONE corpus pass whose shuffle carries only
    the distinct (feature, value, label) cells."""
    from esa_pfa_spark.operators.encode import mutual_information

    ev = _ld(spark, sf_dir, "events")
    return mutual_information(
        ev,
        {
            "event_type": F.col("event_type"),
            "hour": F.hour("ts"),
            "user_cohort": F.col("user_id") % 8,
        },
        (F.col("value") > 50),
    )


SQL_MUTUAL_INFORMATION = """
WITH pairs AS MATERIALIZED (
  SELECT feat, fv, CAST(value > 50 AS VARCHAR) AS y FROM (
    SELECT 'event_type' AS feat, CAST(event_type AS VARCHAR) AS fv, value FROM events
    UNION ALL
    SELECT 'hour', CAST(hour(ts) AS VARCHAR), value FROM events
    UNION ALL
    SELECT 'user_cohort', CAST(user_id % 8 AS VARCHAR), value FROM events)),
joint AS (SELECT feat, fv, y, count(*) AS nxy FROM pairs GROUP BY 1, 2, 3),
nx AS (SELECT feat, fv, count(*) AS nx FROM pairs GROUP BY 1, 2),
ny AS (SELECT feat, y, count(*) AS ny FROM pairs GROUP BY 1, 2),
nn AS (SELECT feat, count(*) AS n FROM pairs GROUP BY 1)
SELECT j.feat AS feat, count(*) AS n_cells,
       ROUND(CAST(SUM(CAST(ROUND(
         (CAST(j.nxy AS DOUBLE) / nn.n)
           * LN(CAST(j.nxy AS DOUBLE) * nn.n
                / (CAST(nx.nx AS DOUBLE) * ny.ny)), 9) AS DECIMAL(18,9)))
         AS DOUBLE), 6) + 0.0 AS mi
FROM joint j
JOIN nx USING (feat, fv) JOIN ny USING (feat, y) JOIN nn USING (feat)
GROUP BY j.feat ORDER BY j.feat
"""


def q_cramers_v(spark, sf_dir):
    """Chi-square + Cramér's V effect size per candidate feature vs the
    high-value label (encode.cramers_v) — the cardinality-comparable
    companion of mutual_information_rank; zero cells folded in by the
    chi2 = sum nxy^2*n/(nx*ny) - n identity (no cross-product plan)."""
    from esa_pfa_spark.operators.encode import cramers_v

    ev = _ld(spark, sf_dir, "events")
    return cramers_v(
        ev,
        {
            "event_type": F.col("event_type"),
            "hour": F.hour("ts"),
            "user_cohort": F.col("user_id") % 8,
        },
        (F.col("value") > 50),
    )


SQL_CRAMERS_V = """
WITH pairs AS MATERIALIZED (
  SELECT feat, fv, CAST(value > 50 AS VARCHAR) AS y FROM (
    SELECT 'event_type' AS feat, CAST(event_type AS VARCHAR) AS fv, value FROM events
    UNION ALL
    SELECT 'hour', CAST(hour(ts) AS VARCHAR), value FROM events
    UNION ALL
    SELECT 'user_cohort', CAST(user_id % 8 AS VARCHAR), value FROM events)),
joint AS (SELECT feat, fv, y, count(*) AS nxy FROM pairs GROUP BY 1, 2, 3),
nx AS (SELECT feat, fv, count(*) AS nx FROM pairs GROUP BY 1, 2),
ny AS (SELECT feat, y, count(*) AS ny FROM pairs GROUP BY 1, 2),
nn AS (SELECT feat, count(*) AS n,
              count(DISTINCT fv) AS r, count(DISTINCT y) AS c
       FROM pairs GROUP BY 1),
agg AS (
  SELECT j.feat, nn.n, nn.r, nn.c,
         CAST(SUM(CAST(ROUND(
           (CAST(j.nxy AS DOUBLE) * j.nxy
              / (CAST(nx.nx AS DOUBLE) * ny.ny)) * nn.n, 9)
           AS DECIMAL(28,9))) AS DOUBLE) AS s
  FROM joint j
  JOIN nx USING (feat, fv) JOIN ny USING (feat, y) JOIN nn USING (feat)
  GROUP BY 1, 2, 3, 4)
SELECT feat, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(s - n, 6) + 0.0 AS chi2,
       ROUND(CASE WHEN LEAST(r, c) - 1 > 0
                  THEN SQRT(GREATEST(s - n, 0.0) / n / (LEAST(r, c) - 1))
                  ELSE NULL END, 6) + 0.0 AS cramers_v
FROM agg ORDER BY feat
"""


def q_bpe_roundtrip(spark, sf_dir):
    """Tokenizer round-trip audit (tokens.bpe_decode): encode the corpus
    with a 256-merge sampled-trained table, decode it back, and report
    per-doc identity with the original token sequence plus the
    compression achieved — the invariant a tokenizer swap must preserve
    before any retokenized corpus ships.  Decode is one map-only pass of
    pure numpy repeat/cumsum expansion (vocabulary-sized driver table,
    corpus-independent).  Iterative trainer => rows-only (the identity
    columns are self-checking: roundtrip_ok must be true on every row)."""
    from esa_pfa_spark.operators.tokens import bpe_decode, bpe_train_sampled

    toks = _tokenized_docs(spark, sf_dir).select("doc_id", "tokens")
    merges, applied, _ = bpe_train_sampled(
        toks, n_merges=256, sample_docs=10_000, encoder="encode"
    )
    decoded = bpe_decode(applied, merges).select(
        "doc_id", F.col("tokens").alias("decoded")
    )
    orig = toks.select("doc_id", F.col("tokens").alias("orig"))
    enc_len = applied.select("doc_id", F.size("tokens").cast("long").alias("n_enc"))
    return (
        orig.join(decoded, "doc_id")
        .join(enc_len, "doc_id")
        .select(
            "doc_id",
            F.size("orig").cast("long").alias("n_orig"),
            "n_enc",
            (F.col("decoded") == F.col("orig")).alias("roundtrip_ok"),
        )
    )


def q_salted_join(spark, sf_dir):
    """Skew-remedy salted equi-join (skew.salted_join): orders x customer
    on custkey via (key, salt) with the right side explode-replicated —
    row-identical to the plain join (the oracle IS the plain join)."""
    from esa_pfa_spark.skew import salted_join

    orders = _ld(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _ld(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    out = salted_join(orders, cust, on="o_custkey", n_salt=8, how="inner")
    return out.select(
        "o_orderkey", "o_custkey", "c_nationkey",
        _r6(F.col("o_totalprice")).alias("o_totalprice"),
    )


SQL_SALTED_JOIN = """
SELECT o.o_orderkey, o.o_custkey, c.c_nationkey,
       round(o.o_totalprice, 6) AS o_totalprice
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
"""


def q_psi_drift(spark, sf_dir):
    """Feature-drift gate (features.psi_drift): PSI of the purchase-value
    distribution, first half of the month vs second half, 10 fixed-width
    buckets, add-one smoothed.  One tiny shuffle (n_buckets rows) past the
    scan."""
    from esa_pfa_spark.operators.features import psi_drift

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    labeled = ev.withColumn(
        "period",
        F.when(F.col("ts") < F.lit(dt.datetime(2024, 1, 16)), "base").otherwise("cur"),
    )
    return psi_drift(labeled, value_col="value", bucket_width=25.0, n_buckets=10)


SQL_PSI_DRIFT = """
WITH ev AS (SELECT value,
                   CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'base' ELSE 'cur' END AS period
            FROM events WHERE event_type='purchase'),
c AS (SELECT CAST(least(greatest(floor(value / 25.0), 0), 9) AS INT) AS bucket,
             sum(CASE WHEN period='base' THEN 1 ELSE 0 END) AS nb,
             sum(CASE WHEN period='cur' THEN 1 ELSE 0 END) AS nc
      FROM ev GROUP BY 1),
t AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM c)
SELECT round(sum(((nb + 1.0) / (tb + 10) - (nc + 1.0) / (tc + 10))
             * ln(((nb + 1.0) / (tb + 10)) / ((nc + 1.0) / (tc + 10)))), 6) + 0.0 AS psi,
       CAST(sum(nb) AS BIGINT) AS n_base,
       CAST(sum(nc) AS BIGINT) AS n_cur
FROM c, t
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (similarity.semantic_dedup): k-means-blocked embedding
    near-dup removal — within-cluster cosine pairs >= 0.3, components,
    cluster-min canonical.  k is DERIVED from the corpus:
    max(4, ceil(n/100)) — 5 at sf0.01 (n=500, mirrored by the oracle's
    k=5 CTE), 20 at sf0.1 — so the within-cluster quadratic term stays
    ~n*100/2, linear in corpus size."""
    from esa_pfa_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        _ldw(spark, sf_dir, "embeddings"),
        threshold=0.3, n_iter=2, target_cluster_rows=100, k_min=4,
    )
    return out.select(
        "vec_id",
        F.col("canonical_doc_id").alias("canonical_vec_id"),
        "survives",
    )


def q_stratified_sample(spark, sf_dir):
    """Exactly-50-per-source deterministic sample (dataset.
    stratified_fixed_k): balanced eval panels with reproducible
    membership — seeded md5 rank within each source."""
    from esa_pfa_spark.operators.dataset import stratified_fixed_k

    docs = _ld(spark, sf_dir, "documents")
    out = stratified_fixed_k(docs, group_col="source", id_col="doc_id", k=50)
    return out.select("doc_id", "source", "samp_rank")


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, source, CAST(rn AS INT) AS samp_rank
FROM (SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
WHERE rn <= 50
"""


def q_rollup_source_lang(spark, sf_dir):
    """Multi-granularity corpus report in ONE pass: ROLLUP(source, lang)
    emits per-(source,lang), per-source, and grand-total aggregates from a
    single shuffle — the composition-report shape a curation pipeline
    publishes per ingest.  gid disambiguates real nulls from rollup rows."""
    docs = _ld(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select("source", "lang", "n_docs", "sum_chars", "gid")
    )


SQL_ROLLUP_SOURCE_LANG = """
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(grouping(source, lang) AS INT) AS gid
FROM documents
GROUP BY ROLLUP(source, lang)
"""


def q_pivot_event_counts(spark, sf_dir):
    """Wide behavioral feature matrix: user-cohort x event-type counts via
    groupBy().pivot() with an EXPLICIT value list (no distinct-scan
    inference job — the two-pass trap at scale); absent cells coalesce
    to 0 so the matrix is dense."""
    ev = _ld(spark, sf_dir, "events")
    types = ["click", "purchase", "error", "signup", "view"]
    wide = (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "cohort", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types]
    )


SQL_PIVOT_EVENT_COUNTS = """
SELECT user_id % 10 AS cohort,
       CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id % 10
"""


def q_kmeans_centroids(spark, sf_dir):
    """Distributed k-means (Lloyd) IVF-centroid training — 4 clusters, 2
    iterations, deterministic lowest-id init (operators/clustering.py).
    Scaled-integer arithmetic makes the training bit-reproducible, so the
    iterative algorithm carries an EXACT chained-CTE oracle (one CTE block
    per Lloyd iteration), not just a rows-only check."""
    from esa_pfa_spark.operators.clustering import kmeans_centroids_df

    return kmeans_centroids_df(_ld(spark, sf_dir, "embeddings"), k=4, n_iter=2)


def q_kmeans_sizes(spark, sf_dir):
    """Final IVF cell histogram under the trained centroids — the skew
    signal a probe planner reads (hot cell -> candidate fan-out)."""
    from esa_pfa_spark.operators.clustering import kmeans_cluster_sizes

    return kmeans_cluster_sizes(_ld(spark, sf_dir, "embeddings"), k=4, n_iter=2)


def q_ann_ivf_trained(spark, sf_dir):
    """End-to-end trained-IVF ANN: k-means-trained coarse cells (not the
    round-1 fixed seeded centroids), probe searches only its own cell,
    exact cosine re-rank via TakeOrderedAndProject.  Training, assignment,
    and re-rank all carry one exact oracle (kmeans CTE + int64 L2
    assignment + double cosine)."""
    from esa_pfa_spark.operators.clustering import (
        SCALE, assign_clusters, kmeans_fit, _scaled,
    )
    from esa_pfa_spark.operators.similarity import cosine, _rank_topk

    emb = _ld(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=4, n_iter=2)
    scaled = emb.select("vec_id", "embedding", _scaled(emb, "embedding").alias("__xs"))
    assigned = assign_clusters(scaled, cents).drop("__xs")
    probe = assigned.filter(F.col("vec_id") == 0).select(
        F.col("cluster").alias("__pc"), F.col("embedding").alias("q")
    )
    cand = (
        assigned.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .filter(F.col("cluster") == F.col("__pc"))
    )
    scored = cand.select("vec_id", cosine(F.col("embedding"), F.col("q")).alias("cos"))
    return _rank_topk(scored, 10, "vec_id")


def _kmeans_cte(k: int = 4, n_iter: int = 2) -> str:
    """Chained-CTE Lloyd: exploded scaled-int table `e`, init from the k
    smallest vec_ids, then per iteration assignment (argmin int64 squared
    distance, ties -> lowest cluster) and update (floor(sum/count + 0.5),
    one exact-int IEEE double division — identical to the engine's).
    Ends with centroid CTE ``c{n_iter}``."""
    parts = [f"""
e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xs
      FROM embeddings),
init AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cl
         FROM (SELECT DISTINCT vec_id FROM e ORDER BY vec_id LIMIT {k})),
c0 AS (SELECT i.cl, e.dim, e.xs AS cs FROM init i JOIN e ON e.vec_id = i.vec_id)"""]
    for it in range(1, n_iter + 1):
        p, c = f"c{it - 1}", f"c{it}"
        parts.append(f"""
d{it} AS (SELECT e.vec_id, c.cl, sum((e.xs - c.cs) * (e.xs - c.cs)) AS d
      FROM e JOIN {p} c ON e.dim = c.dim GROUP BY e.vec_id, c.cl),
a{it} AS (SELECT vec_id, cl FROM (
        SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
        FROM d{it}) WHERE rn = 1),
s{it} AS (SELECT a.cl, e.dim,
             CAST(floor(CAST(sum(e.xs) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cs
      FROM a{it} a JOIN e ON e.vec_id = a.vec_id GROUP BY a.cl, e.dim),
{c} AS (SELECT p.cl, p.dim, coalesce(s.cs, p.cs) AS cs
      FROM {p} p LEFT JOIN s{it} s ON s.cl = p.cl AND s.dim = p.dim)""")
    return "WITH " + ",".join(parts)


SQL_KMEANS_CENTROIDS = (
    _kmeans_cte()
    + """
SELECT cl AS cluster, dim, cs AS c_scaled FROM c2
"""
)

_KMEANS_FINAL_ASSIGN = """,
d3 AS (SELECT e.vec_id, c.cl, sum((e.xs - c.cs) * (e.xs - c.cs)) AS d
       FROM e JOIN c2 c ON e.dim = c.dim GROUP BY e.vec_id, c.cl),
a3 AS (SELECT vec_id, cl FROM (
         SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
         FROM d3) WHERE rn = 1)"""

SQL_KMEANS_SIZES = (
    _kmeans_cte()
    + _KMEANS_FINAL_ASSIGN
    + """
SELECT cl AS cluster, count(*) AS n_vectors FROM a3 GROUP BY cl
"""
)

SQL_ANN_IVF_TRAINED = (
    _kmeans_cte()
    + _KMEANS_FINAL_ASSIGN
    + """,
pq AS (SELECT em.embedding AS qv, a3.cl
       FROM a3 JOIN embeddings em ON em.vec_id = a3.vec_id
       WHERE a3.vec_id = 0),
s AS (SELECT a3.vec_id,
             list_dot_product(em.embedding::DOUBLE[], pq.qv::DOUBLE[])
             / (sqrt(list_dot_product(em.embedding::DOUBLE[], em.embedding::DOUBLE[]))
                * sqrt(list_dot_product(pq.qv::DOUBLE[], pq.qv::DOUBLE[]))) AS cos
      FROM a3 JOIN pq ON a3.cl = pq.cl
      JOIN embeddings em ON em.vec_id = a3.vec_id
      WHERE a3.vec_id != 0)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS rank
FROM s QUALIFY rank <= 10
"""
)


SQL_SEMANTIC_DEDUP = (
    # k mirrors the engine's derived-k rule at the oracle's scale:
    # max(4, ceil(500/100)) = 5 on the 500-row sf0.01 embeddings table
    _kmeans_cte(k=5).replace("WITH ", "WITH RECURSIVE ", 1)
    + _KMEANS_FINAL_ASSIGN
    + """,
pr AS (SELECT x.vec_id AS u, y.vec_id AS v
       FROM a3 x JOIN a3 y ON x.cl = y.cl AND x.vec_id < y.vec_id
       JOIN embeddings ex ON ex.vec_id = x.vec_id
       JOIN embeddings ey ON ey.vec_id = y.vec_id
       WHERE list_dot_product(ex.embedding::DOUBLE[], ey.embedding::DOUBLE[])
             / (sqrt(list_dot_product(ex.embedding::DOUBLE[], ex.embedding::DOUBLE[]))
                * sqrt(list_dot_product(ey.embedding::DOUBLE[], ey.embedding::DOUBLE[]))) >= 0.3),
ed AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
nds AS (SELECT DISTINCT u AS id FROM ed),
reach(id, lbl) AS (
  SELECT id, id FROM nds
  UNION
  SELECT ed.v, r.lbl FROM reach r JOIN ed ON ed.u = r.id WHERE r.lbl < ed.v),
comp AS (SELECT id, min(lbl) AS canonical FROM reach GROUP BY 1)
SELECT em.vec_id,
       coalesce(c.canonical, em.vec_id) AS canonical_vec_id,
       coalesce(c.canonical, em.vec_id) = em.vec_id AS survives
FROM embeddings em LEFT JOIN comp c ON c.id = em.vec_id
"""
)




def q_pit_decay_features(spark, sf_dir):
    """Exponential time-decay PIT aggregates (pit.decayed_pit_features):
    recency-weighted sum / weight / mean of each user's purchases at click
    time, tau=1 day, support window (query_ts - 30*tau, query_ts].
    Bucketed band join (no BNLJ, hot-key-bounded tasks); per-term decimal
    rounding makes the sums order-independent exact — the oracle witness."""
    from esa_pfa_spark.operators.pit import decayed_pit_features

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return decayed_pit_features(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        value="value", tau=dt.timedelta(days=1), cutoff=30.0,
    ).select("user_id", "event_id", "query_ts", "n_win",
             "decay_sum", "decay_wt", "decay_mean")


SQL_PIT_DECAY = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase'),
     j AS (
       SELECT c.event_id, c.user_id, c.query_ts,
              CAST(round(exp(-(CAST(epoch_us(c.query_ts)-epoch_us(p.ts) AS DOUBLE)/1e6)/{DAY}.0) * p.value, 6)
                   AS DECIMAL(18,6)) AS t_sum,
              CAST(round(exp(-(CAST(epoch_us(c.query_ts)-epoch_us(p.ts) AS DOUBLE)/1e6)/{DAY}.0), 6)
                   AS DECIMAL(18,6)) AS t_wt
       FROM c JOIN p ON p.user_id = c.user_id
        AND epoch_us(c.query_ts)-epoch_us(p.ts) >= 0
        AND epoch_us(c.query_ts)-epoch_us(p.ts) < {30 * DAY} * CAST(1e6 AS BIGINT)),
     a AS (SELECT event_id, user_id, query_ts, count(*) AS n_win,
                  sum(t_sum) AS ds, sum(t_wt) AS dw
           FROM j GROUP BY 1, 2, 3)
SELECT c.user_id, c.event_id, c.query_ts,
       CAST(coalesce(a.n_win, 0) AS BIGINT) AS n_win,
       round(CAST(a.ds AS DOUBLE), 6) AS decay_sum,
       round(CAST(a.dw AS DOUBLE), 6) AS decay_wt,
       round(CASE WHEN CAST(a.dw AS DOUBLE) > 0
             THEN CAST(a.ds AS DOUBLE) / CAST(a.dw AS DOUBLE) END, 6) AS decay_mean
FROM c LEFT JOIN a USING (event_id, user_id, query_ts)
"""


def q_pit_decay_prefix(spark, sf_dir):
    """Hot-key decayed PIT via per-(key, block) PREFIX SUMS
    (pit.decayed_pit_pandas): same recency-weighted sum / weight / mean as
    pit_decay_features_1d but computed with zero pair materialization —
    block-rebased cumulatives answer each probe with two searchsorted
    lookups, O((n+m) log n) per key instead of the band join's
    probes x in-horizon-obs output (126x blow-up under a 0.7-hot-frac
    entity, BENCH/SKEW_DECAY.md; decayed_pit_auto routes Zipf-head keys
    here).  Contract difference vs the band join, and why this oracle is
    exact anyway: terms accumulate UNROUNDED in float64 (the band join
    rounds per term at 6dp into decimal), so the oracle below also sums
    unrounded doubles; both sides carry ~1e-13 absolute error and are
    rounded at 5dp — agreement is boundary-safe by ~8 orders.

    Scoped to the user_id %% 25 == 0 key slice: the prefix path's regime
    is HOT keys (decayed_pit_auto routes only the Zipf head here — a few
    keys carrying many rows each); running every key of a uniform corpus
    through it pays the cogroup's per-(key, block) Python overhead with
    none of the blow-up it exists to avoid (27.9s vs 1.5s at sf0.1).
    Perf evidence for the hot regime lives in BENCH/SKEW_DECAY.md; this
    entry is the exactness gate."""
    from esa_pfa_spark.operators.pit import decayed_pit_pandas

    ev = _ld(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return decayed_pit_pandas(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        value="value", tau=dt.timedelta(days=1), cutoff=30.0, round_to=5,
    ).select("user_id", "event_id", "query_ts", "n_win",
             "decay_sum", "decay_wt", "decay_mean")


SQL_PIT_DECAY_PREFIX = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events
           WHERE event_type='click' AND user_id % 25 = 0),
     p AS (SELECT user_id, ts, value FROM events
           WHERE event_type='purchase' AND user_id % 25 = 0),
     j AS (
       SELECT c.event_id, c.user_id, c.query_ts,
              exp(-(CAST(epoch_us(c.query_ts)-epoch_us(p.ts) AS DOUBLE)/1e6)/{DAY}.0) AS w,
              coalesce(p.value, 0.0) AS v
       FROM c JOIN p ON p.user_id = c.user_id
        AND epoch_us(c.query_ts)-epoch_us(p.ts) >= 0
        AND epoch_us(c.query_ts)-epoch_us(p.ts) < {30 * DAY} * CAST(1e6 AS BIGINT)),
     a AS (SELECT event_id, user_id, query_ts, count(*) AS n_win,
                  sum(w * v) AS ds, sum(w) AS dw
           FROM j GROUP BY 1, 2, 3)
SELECT c.user_id, c.event_id, c.query_ts,
       CAST(coalesce(a.n_win, 0) AS BIGINT) AS n_win,
       round(a.ds, 5) AS decay_sum,
       round(a.dw, 5) AS decay_wt,
       round(CASE WHEN a.dw > 0 THEN a.ds / a.dw END, 5) AS decay_mean
FROM c LEFT JOIN a USING (event_id, user_id, query_ts)
"""


def q_purged_time_folds(spark, sf_dir):
    """Purged k-fold time-series CV with embargo (dataset.purged_time_folds):
    5 equal-width time folds over events, 1-day embargo; summary counts per
    fold.  The evaluation-protocol side of leakage safety — rows inside the
    embargo band around a test fold are purged from that fold's train set."""
    from esa_pfa_spark.operators.dataset import purged_time_folds

    ev = _ld(spark, sf_dir, "events").select("event_id", "ts")
    x = purged_time_folds(ev, ts="ts", k=5, embargo=dt.timedelta(days=1))
    return x.groupBy("fold").agg(
        F.count(F.when(F.col("role") == "test", 1)).alias("n_test"),
        F.count(F.when(F.col("role") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("role") == "purged", 1)).alias("n_purged"),
    ).orderBy("fold")


SQL_PURGED_FOLDS = f"""
WITH b AS (SELECT min(epoch_us(ts)) AS min_eus,
                  max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span1 FROM events),
r AS (SELECT epoch_us(e.ts) AS eus,
             CAST(((epoch_us(e.ts) - b.min_eus) * 5) // b.span1 AS INT) AS rf,
             b.min_eus, b.span1
      FROM events e CROSS JOIN b),
x AS (SELECT r.eus, r.rf, CAST(f.fold AS INT) AS fold,
             r.min_eus + (f.fold * r.span1 + 4) // 5 AS lo,
             r.min_eus + ((f.fold + 1) * r.span1 + 4) // 5 - 1 AS hi
      FROM r CROSS JOIN (SELECT unnest(range(5)) AS fold) f),
a AS (SELECT fold,
             CASE WHEN rf = fold THEN 'test'
                  WHEN eus >= lo - {DAY} * CAST(1e6 AS BIGINT)
                   AND eus <= hi + {DAY} * CAST(1e6 AS BIGINT) THEN 'purged'
                  ELSE 'train' END AS role
      FROM x)
SELECT fold,
       count(*) FILTER (role = 'test') AS n_test,
       count(*) FILTER (role = 'train') AS n_train,
       count(*) FILTER (role = 'purged') AS n_purged
FROM a GROUP BY fold ORDER BY fold
"""




def q_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (importance.dsir_topk_sample, Xie et al.
    2023): hashed unigram+bigram bag models for the target domain (lang=en
    docs) vs the raw corpus; per-doc log importance weight (decimal-exact
    sum of 6dp-rounded bucket log-ratios); deterministic Gumbel-top-100
    sample.  Distributions are m=4096-row broadcasts; the only real shuffle
    is the per-doc weight sum."""
    from esa_pfa_spark.operators.importance import dsir_topk_sample

    docs = _ld(spark, sf_dir, "documents")
    return dsir_topk_sample(
        docs, k=100, id_col="doc_id", m=4096, seed=1,
        target_predicate=F.col("lang") == "en",
    )


SQL_DSIR_SAMPLE = """
WITH f AS (
  SELECT doc_id, lang,
         list_concat(
           list_transform(string_split(text, ' '),
             w -> CAST(('0x' || substr(md5(w), 1, 6)) AS INTEGER) % 4096),
           list_transform(range(greatest(len(string_split(text, ' ')) - 1, 0)),
             i -> CAST(('0x' || substr(md5(string_split(text, ' ')[i + 1] || ' ' ||
                                           string_split(text, ' ')[i + 2]), 1, 6))
                       AS INTEGER) % 4096)
         ) AS feats
  FROM documents),
ex AS (SELECT doc_id, lang, unnest(feats) AS bucket FROM f),
rc AS (SELECT bucket, count(*) AS cr FROM ex GROUP BY 1),
tc AS (SELECT bucket, count(*) AS ct FROM ex WHERE lang = 'en' GROUP BY 1),
nr AS (SELECT sum(cr) AS nr FROM rc),
nt AS (SELECT sum(ct) AS nt FROM tc),
lr AS (
  SELECT b.range AS bucket,
         round(ln(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / CAST(nt.nt + 4096 AS DOUBLE))
             - ln(CAST(coalesce(rc.cr, 0) + 1 AS DOUBLE) / CAST(nr.nr + 4096 AS DOUBLE)),
               6) AS logratio
  FROM range(4096) b
  LEFT JOIN rc ON rc.bucket = b.range
  LEFT JOIN tc ON tc.bucket = b.range
  CROSS JOIN nr CROSS JOIN nt),
w AS (
  SELECT ex.doc_id,
         CAST(count(*) AS BIGINT) AS n_feat,
         CAST(sum(CAST(lr.logratio AS DECIMAL(18,6))) AS DOUBLE) AS log_weight
  FROM ex JOIN lr USING (bucket)
  GROUP BY ex.doc_id)
SELECT doc_id, n_feat, log_weight,
       round(log_weight / 1.0
             + (-ln(-ln((CAST(('0x' || substr(md5('dsir:1:' || CAST(doc_id AS VARCHAR)), 1, 6))
                              AS INTEGER) + 0.5) / 16777216.0))), 6) + 0.0 AS gumbel_key
FROM w
ORDER BY gumbel_key DESC, doc_id ASC
LIMIT 100
"""




def q_bm25_topk(spark, sf_dir):
    """BM25 top-20 against a 3-term query (textstats.bm25_topk): corpus
    stats + df broadcast, query-term filter BEFORE the shuffle, per-term
    6dp-rounded decimal-exact scores, TakeOrdered top-k."""
    from esa_pfa_spark.operators.textstats import bm25_topk

    return bm25_topk(
        _ld(spark, sf_dir, "documents"),
        ["spark", "shuffle", "join"], k=20,
    )


SQL_BM25_TOPK = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w,
                     len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM base),
hits AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
         FROM (SELECT doc_id, dl, unnest(w) AS t FROM base)
         WHERE t IN ('join', 'shuffle', 'spark')
         GROUP BY 1, 2, 3),
dfreq AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY 1),
scored AS (
  SELECT h.doc_id, h.dl,
         round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * h.tf * 2.2
               / (h.tf + 1.2 * (0.25 + 0.75 * CAST(h.dl AS DOUBLE) / s.avgdl)),
               6) AS term_score
  FROM hits h JOIN dfreq d USING (t) CROSS JOIN stats s)
SELECT doc_id, CAST(dl AS INT) AS dl,
       CAST(count(*) AS BIGINT) AS n_hit,
       CAST(sum(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS score
FROM scored
GROUP BY doc_id, dl
ORDER BY score DESC, doc_id ASC
LIMIT 20
"""


def q_token_entropy(spark, sf_dir):
    """Per-doc token-distribution Shannon entropy + normalized entropy
    (textstats.token_entropy) over the hash-tokenized documents — the
    gibberish/boilerplate gate; decimal-exact plogp sums."""
    from esa_pfa_spark.operators.textstats import token_entropy

    return token_entropy(_tokenized_docs(spark, sf_dir))


SQL_TOKEN_ENTROPY = f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           w -> CAST(('0x' || substr(md5(w), 1, 6)) AS INTEGER) % {32768}) AS tokens
  FROM documents),
ex AS (SELECT doc_id, len(tokens) AS n_tok, unnest(tokens) AS t FROM toks),
tf AS (SELECT doc_id, n_tok, t, count(*) AS tf FROM ex GROUP BY 1, 2, 3),
agg AS (
  SELECT doc_id, n_tok,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(CAST(round(-(CAST(tf AS DOUBLE) / CAST(n_tok AS DOUBLE))
                             * ln(CAST(tf AS DOUBLE) / CAST(n_tok AS DOUBLE)), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS entropy
  FROM tf GROUP BY 1, 2)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, n_distinct,
       round(entropy, 6) AS entropy,
       round(CASE WHEN n_distinct > 1
             THEN entropy / ln(CAST(n_distinct AS DOUBLE)) END, 6) AS entropy_norm
FROM agg
"""




def q_gopher_rules(spark, sf_dir):
    """Gopher/MassiveText document-shape gates (textstats.gopher_rules):
    word-count band, mean-word-length band, symbol ratio, alpha-word
    fraction, required-stopword hits — per-rule violation flags + keep.
    Map-only JVM column math."""
    from esa_pfa_spark.operators.textstats import gopher_rules

    return gopher_rules(_ld(spark, sf_dir, "documents"))


_GOPHER_STOPS = "'the','be','to','of','and','that','have','with'"
SQL_GOPHER_RULES = f"""
WITH b AS (
  SELECT doc_id,
         string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_len,
         (length(text) - length(replace(text, '#', '')))
           + CAST(floor((length(text) - length(replace(text, '...', ''))) / 3) AS BIGINT) AS symbols,
         CAST(len(list_filter(string_split(text, ' '), x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS alpha_frac,
         len(list_filter([{_GOPHER_STOPS}], s -> list_contains(string_split(text, ' '), s))) AS stop_hits
  FROM documents)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mean_len, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_frac,
       CAST(stop_hits AS INT) AS stop_hits,
       CAST(n_words < 50 OR n_words > 100000 AS INT) AS fail_word_count,
       CAST(mean_len < 3.0 OR mean_len > 10.0 AS INT) AS fail_mean_len,
       CAST(CAST(symbols AS DOUBLE) / n_words > 0.1 AS INT) AS fail_symbol_ratio,
       CAST(alpha_frac < 0.8 AS INT) AS fail_alpha,
       CAST(stop_hits < 2 AS INT) AS fail_stopwords,
       CAST(CAST(n_words < 50 OR n_words > 100000 AS INT)
          + CAST(mean_len < 3.0 OR mean_len > 10.0 AS INT)
          + CAST(CAST(symbols AS DOUBLE) / n_words > 0.1 AS INT)
          + CAST(alpha_frac < 0.8 AS INT)
          + CAST(stop_hits < 2 AS INT) AS INT) AS n_failed,
       CAST(CAST(n_words < 50 OR n_words > 100000 AS INT)
          + CAST(mean_len < 3.0 OR mean_len > 10.0 AS INT)
          + CAST(CAST(symbols AS DOUBLE) / n_words > 0.1 AS INT)
          + CAST(alpha_frac < 0.8 AS INT)
          + CAST(stop_hits < 2 AS INT) = 0 AS INT) AS keep
FROM b
"""




def q_asof_lag3(spark, sf_dir):
    """Lag-k as-of features (asof.asof_lagk_join, k=3, 7-day tolerance):
    per click, the 3 most recent purchase values/timestamps of the same
    user — rank algebra (row_number + union-fill as-of rank + k-exploded
    equi-join), bounded k x |probes| shuffle, probes never dropped,
    out-of-tolerance lags nulled in place."""
    from esa_pfa_spark.operators.asof import asof_lagk_join

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("obs_id")
    )
    return asof_lagk_join(
        probes, obs, k=3, on="user_id", probe_ts="query_ts", obs_ts="ts",
        value="value", tiebreak="obs_id", tolerance=dt.timedelta(days=7),
    )


SQL_ASOF_LAG3 = """
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value, event_id AS obs_id FROM events WHERE event_type='purchase')
SELECT c.user_id, c.event_id, c.query_ts,
  (SELECT CASE WHEN epoch(c.query_ts)-epoch(ts) <= 604800 THEN value END FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1 OFFSET 0) AS lag1_val,
  (SELECT CASE WHEN epoch(c.query_ts)-epoch(ts) <= 604800 THEN ts END FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1 OFFSET 0) AS lag1_ts,
  (SELECT CASE WHEN epoch(c.query_ts)-epoch(ts) <= 604800 THEN value END FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1 OFFSET 1) AS lag2_val,
  (SELECT CASE WHEN epoch(c.query_ts)-epoch(ts) <= 604800 THEN ts END FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1 OFFSET 1) AS lag2_ts,
  (SELECT CASE WHEN epoch(c.query_ts)-epoch(ts) <= 604800 THEN value END FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1 OFFSET 2) AS lag3_val,
  (SELECT CASE WHEN epoch(c.query_ts)-epoch(ts) <= 604800 THEN ts END FROM p
    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
    ORDER BY p.ts DESC, p.obs_id DESC LIMIT 1 OFFSET 2) AS lag3_ts
FROM c
"""




def q_dedup_best_survivors(spark, sf_dir):
    """Quality-aware survivor selection (dedup.dedup_survivors_by_score):
    same MinHash-LSH candidate clusters as minhash_dedup_survivors, but
    each cluster keeps its LONGEST member (n_chars, ties to min id) — the
    keep-the-best-copy policy a production curation pipeline ships.
    Argmax rides a struct-max partial agg, no window/sort."""
    docs = _ld(spark, sf_dir, "documents")
    return DD.dedup_survivors_by_score(
        docs, DD.minhash_band_candidates(docs), score="n_chars"
    )


SQL_DEDUP_BEST_SURVIVORS = """
WITH RECURSIVE
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         FROM sig a JOIN sig b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))),
e AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
nodes AS (SELECT DISTINCT u AS id FROM e),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.id WHERE r.lbl < e.v),
comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY 1),
best AS (SELECT comp, id AS canon FROM (
           SELECT c.id, c.comp, d.n_chars,
                  row_number() OVER (PARTITION BY c.comp
                                     ORDER BY d.n_chars DESC, c.id ASC) AS rn
           FROM comp c JOIN documents d ON d.doc_id = c.id)
         WHERE rn = 1),
m AS (SELECT c.id, b.canon FROM comp c JOIN best b USING (comp))
SELECT d.doc_id, d.n_chars,
       coalesce(m.canon, d.doc_id) AS canonical_doc_id,
       coalesce(m.canon, d.doc_id) = d.doc_id AS survives
FROM documents d LEFT JOIN m ON m.id = d.doc_id
"""




def q_temperature_mixture(spark, sf_dir):
    """Temperature-flattened mixture resampling (dataset.
    temperature_mixture_sample, alpha=0.5, budget 0.5N, grouped by lang):
    tail languages get boosted toward p^alpha shares; rates derive from
    corpus counts in-plan (no collect), membership via the md5 bucket."""
    from esa_pfa_spark.operators.dataset import temperature_mixture_sample

    out = temperature_mixture_sample(
        _ld(spark, sf_dir, "documents").select("doc_id", "lang"),
        alpha=0.5, keep_frac=0.5, group_col="lang",
    )
    return out.select("doc_id", "lang", _r6(F.col("rate")).alias("rate"), "thr")


SQL_TEMPERATURE_MIXTURE = """
WITH c AS (SELECT lang, count(*) AS ns FROM documents GROUP BY 1),
n AS (SELECT sum(ns) AS n FROM c),
z AS (SELECT CAST(sum(CAST(round(pow(CAST(c.ns AS DOUBLE) / n.n, 0.5), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS z
      FROM c CROSS JOIN n),
r AS (SELECT c.lang,
             least(1.0,
                   0.5 * n.n * (round(pow(CAST(c.ns AS DOUBLE) / n.n, 0.5), 6) / z.z)
                   / c.ns) AS rate
      FROM c CROSS JOIN n CROSS JOIN z)
SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate,
       CAST(floor(r.rate * 10000) AS INT) AS thr
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
      % 10000 < CAST(floor(r.rate * 10000) AS INT)
"""




def q_curriculum_order(spark, sf_dir):
    """Curriculum export order (dataset.curriculum_order): stage documents
    by entropy-free proxy difficulty (n_chars quantile quartiles), shuffle
    within stage by the md5 key; summary = per-stage count + first 3 doc
    ids in export order (the deterministic witness of the full ordering)."""
    from esa_pfa_spark.operators.dataset import curriculum_order

    out = curriculum_order(
        _ld(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        score="n_chars", n_stages=4,
    )
    w = Window.partitionBy("stage").orderBy("sort_key", "doc_id")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__rn") <= 3,
                               F.format_string("%02d|%s", F.col("__rn"), F.col("doc_id")))
                    )
                ),
            ).alias("head_ids"),
        )
        .orderBy("stage")
    )


SQL_CURRICULUM_ORDER = """
WITH e AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS ed
           FROM documents),
s AS (SELECT d.doc_id, d.n_chars,
             CAST(len(list_filter(e.ed, x -> CAST(d.n_chars AS DOUBLE) >= x)) AS INT) AS stage,
             md5('cur0:' || CAST(d.doc_id AS VARCHAR)) AS sort_key
      FROM documents d CROSS JOIN e),
r AS (SELECT *, row_number() OVER (PARTITION BY stage ORDER BY sort_key, doc_id) AS rn
      FROM s)
SELECT stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       string_agg(CASE WHEN rn <= 3 THEN printf('%02d|%d', rn, doc_id) END, ','
                  ORDER BY CASE WHEN rn <= 3 THEN printf('%02d|%d', rn, doc_id) END) AS head_ids
FROM r GROUP BY stage ORDER BY stage
"""




def q_ccnet_buckets(spark, sf_dir):
    """CCNet perplexity bucketing (textstats.ccnet_ppl_buckets): per-source
    head/middle/tail terciles of the unigram-LM quality score; per-group
    edges broadcast, assignment map-only."""
    from esa_pfa_spark.operators.textstats import ccnet_ppl_buckets

    return ccnet_ppl_buckets(_ld(spark, sf_dir, "documents"))


SQL_CCNET_BUCKETS = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
freq AS (SELECT w, count(*) AS wc FROM w GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM w),
sc AS (SELECT doc_id,
              count(*) AS n_words,
              round(CAST(sum(CAST(ln(wc * 1.0 / n_total) AS DECIMAL(18,6))) AS DOUBLE)
                    / count(*), 6) AS avg_logprob
       FROM w JOIN freq USING (w) CROSS JOIN tot
       GROUP BY doc_id),
j AS (SELECT sc.doc_id, d.source, sc.n_words, sc.avg_logprob
      FROM sc JOIN documents d USING (doc_id)),
e AS (SELECT source,
             quantile_cont(avg_logprob, 1.0/3) AS e1,
             quantile_cont(avg_logprob, 2.0/3) AS e2
      FROM j GROUP BY source)
SELECT j.doc_id, j.source, j.n_words, j.avg_logprob,
       CASE WHEN j.avg_logprob >= e.e2 THEN 'head'
            WHEN j.avg_logprob >= e.e1 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM j JOIN e USING (source)
"""




def q_ngram_containment(spark, sf_dir):
    """Directed containment near-dup pairs (dedup.ngram_containment_pairs):
    |small ∩ big| / |small| over capped 3-shingle sets — catches
    quote-inclusion that symmetric Jaccard misses; same one-df-pass +
    shingle equi-join skeleton as ngram_jaccard_pairs."""
    return DD.ngram_containment_pairs(
        _ldw(spark, sf_dir, "documents"), threshold=0.5
    )


SQL_NGRAM_CONTAINMENT = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
capped AS (SELECT shingle FROM sh0 GROUP BY shingle
           HAVING count(*) <= {DD.MAX_SHINGLE_FREQ}),
sh AS (SELECT doc_id, sh0.shingle FROM sh0 JOIN capped ON sh0.shingle = capped.shingle),
sz AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sc AS (SELECT da, db, i, sa.s AS sa, sb.s AS sb,
              CASE WHEN sa.s < sb.s OR (sa.s = sb.s AND da < db) THEN da ELSE db END AS small_id,
              CASE WHEN sa.s < sb.s OR (sa.s = sb.s AND da < db) THEN db ELSE da END AS big_id,
              least(sa.s, sb.s) AS ss
       FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db)
SELECT small_id AS doc_id_small, big_id AS doc_id_big,
       round(i*1.0/ss, 6) AS containment,
       round(i*1.0/(sa + sb - i), 6) AS jaccard
FROM sc
WHERE i*1.0/ss >= 0.5
"""




def q_asof_staleness(spark, sf_dir):
    """Feature-freshness audit (asof.asof_staleness_profile): per
    hour-of-day, match rate and staleness p50/p95/max of the 7-day
    backward as-of between clicks and purchases — the diurnal serving
    health view; 1-Exchange fill + one tiny-cardinality hash agg."""
    from esa_pfa_spark.operators.asof import asof_staleness_profile

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return asof_staleness_profile(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        tolerance=dt.timedelta(days=7), group_name="hour_of_day",
    )


SQL_ASOF_STALENESS = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
     m AS (SELECT c.event_id, c.user_id, c.query_ts,
                  (SELECT max(p.ts) FROM p
                    WHERE p.user_id=c.user_id AND p.ts<=c.query_ts
                      AND epoch(c.query_ts)-epoch(p.ts) <= {7*DAY}) AS matched_ts
           FROM c),
     g AS (SELECT hour(query_ts) AS hour_of_day,
                  CASE WHEN matched_ts IS NOT NULL THEN 1 ELSE 0 END AS hit,
                  epoch(query_ts) - epoch(matched_ts) AS stale
           FROM m)
SELECT hour_of_day,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(hit) AS BIGINT) AS n_matched,
       round(sum(hit) * 1.0 / count(*), 6) AS match_rate,
       round(quantile_cont(stale, 0.5), 6) AS stale_p50_s,
       round(quantile_cont(stale, 0.95), 6) AS stale_p95_s,
       round(max(stale), 6) AS stale_max_s
FROM g GROUP BY hour_of_day ORDER BY hour_of_day
"""




def q_curation_v2(spark, sf_dir):
    """The composed 2023-era curation chain (plans.curate_documents_v2):
    Gopher shape gates -> CCNet per-source tiers (tail dropped) ->
    best-copy MinHash dedup -> temperature mixture.  Every stage is an
    independently-oracled operator; this query proves the CHAIN end to
    end against one full-chain SQL program."""
    from esa_pfa_spark.plans.curation import curate_documents_v2

    return curate_documents_v2(_ld(spark, sf_dir, "documents"))


SQL_CURATION_V2 = f"""
WITH RECURSIVE
gq AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_len,
         (length(text) - length(replace(text, '#', '')))
           + CAST(floor((length(text) - length(replace(text, '...', ''))) / 3) AS BIGINT) AS symbols,
         CAST(len(list_filter(string_split(text, ' '), x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS alpha_frac,
         len(list_filter([{_GOPHER_STOPS}], s -> list_contains(string_split(text, ' '), s))) AS stop_hits
  FROM documents),
gated AS (
  SELECT d.* FROM documents d JOIN gq USING (doc_id)
  WHERE NOT (gq.n_words < 20 OR gq.n_words > 100000)
    AND NOT (gq.mean_len < 3.0 OR gq.mean_len > 10.0)
    AND NOT (CAST(gq.symbols AS DOUBLE) / gq.n_words > 0.1)
    AND NOT (gq.alpha_frac < 0.8)),
w2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM gated),
freq AS (SELECT w, count(*) AS wc FROM w2 GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM w2),
sc AS (SELECT doc_id,
              round(CAST(sum(CAST(ln(wc * 1.0 / n_total) AS DECIMAL(18,6))) AS DOUBLE)
                    / count(*), 6) AS avg_logprob
       FROM w2 JOIN freq USING (w) CROSS JOIN tot GROUP BY doc_id),
scj AS (SELECT sc.doc_id, g.source, sc.avg_logprob FROM sc JOIN gated g USING (doc_id)),
edges AS (SELECT source,
                 quantile_cont(avg_logprob, 1.0/3) AS e1,
                 quantile_cont(avg_logprob, 2.0/3) AS e2
          FROM scj GROUP BY source),
tiered AS (
  SELECT g.*, CASE WHEN s.avg_logprob >= e.e2 THEN 'head'
                   WHEN s.avg_logprob >= e.e1 THEN 'middle'
                   ELSE 'tail' END AS ppl_bucket
  FROM gated g JOIN scj s USING (doc_id) JOIN edges e ON e.source = g.source),
kept AS (SELECT * FROM tiered WHERE ppl_bucket <> 'tail'),
wv AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM wv WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         FROM sig a JOIN sig b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))),
e2g AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
nodes AS (SELECT DISTINCT u AS id FROM e2g),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e2g.v, r.lbl FROM reach r JOIN e2g ON e2g.u = r.id WHERE r.lbl < e2g.v),
comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY 1),
best AS (SELECT comp, id AS canon FROM (
           SELECT c.id, c.comp, k.n_chars,
                  row_number() OVER (PARTITION BY c.comp
                                     ORDER BY k.n_chars DESC, c.id ASC) AS rn
           FROM comp c JOIN kept k ON k.doc_id = c.id)
         WHERE rn = 1),
mm AS (SELECT c.id, b.canon FROM comp c JOIN best b USING (comp)),
surv AS (SELECT k.* FROM kept k LEFT JOIN mm ON mm.id = k.doc_id
         WHERE coalesce(mm.canon, k.doc_id) = k.doc_id),
cnt AS (SELECT source, count(*) AS ns FROM surv GROUP BY 1),
ntot AS (SELECT sum(ns) AS n FROM cnt),
z AS (SELECT CAST(sum(CAST(round(pow(CAST(c.ns AS DOUBLE) / ntot.n, 0.5), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS z
      FROM cnt c CROSS JOIN ntot),
rt AS (SELECT c.source,
              least(1.0,
                    0.6 * ntot.n * (round(pow(CAST(c.ns AS DOUBLE) / ntot.n, 0.5), 6) / z.z)
                    / c.ns) AS rate
       FROM cnt c CROSS JOIN ntot CROSS JOIN z)
SELECT s.doc_id, s.source, s.ppl_bucket, round(r.rate, 6) AS rate
FROM surv s JOIN rt r USING (source)
WHERE CAST(('0x' || substr(md5('0:' || CAST(s.doc_id AS VARCHAR)), 1, 6)) AS INTEGER)
      % 10000 < CAST(floor(r.rate * 10000) AS INT)
"""




def q_cluster_safe_split(spark, sf_dir):
    """Leak-free split assignment (dataset.cluster_safe_split): the
    near-dup cluster canonical, not the raw doc id, feeds the md5 split —
    every duplicate-cluster member lands in the same split, so
    split_leakage over the same pairs is zero by construction."""
    from esa_pfa_spark.operators.dataset import cluster_safe_split

    docs = _ld(spark, sf_dir, "documents")
    return cluster_safe_split(
        docs, DD.minhash_band_candidates(docs),
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )


SQL_CLUSTER_SAFE_SPLIT = """
WITH RECURSIVE
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         list_transform(generate_series(1, len(ws)-2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3),
sig AS (SELECT doc_id,
        min(md5('s0:' || shingle)) AS mh0, min(md5('s1:' || shingle)) AS mh1,
        min(md5('s2:' || shingle)) AS mh2, min(md5('s3:' || shingle)) AS mh3,
        min(md5('s4:' || shingle)) AS mh4, min(md5('s5:' || shingle)) AS mh5
        FROM sh GROUP BY doc_id),
cand AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         FROM sig a JOIN sig b
           ON a.doc_id < b.doc_id
          AND ((a.mh0 = b.mh0 AND a.mh1 = b.mh1 AND a.mh2 = b.mh2)
            OR (a.mh3 = b.mh3 AND a.mh4 = b.mh4 AND a.mh5 = b.mh5))),
e AS (SELECT u, v FROM cand UNION SELECT v, u FROM cand),
nodes AS (SELECT DISTINCT u AS id FROM e),
reach(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN e ON e.u = r.id WHERE r.lbl < e.v),
comp AS (SELECT id, min(lbl) AS canonical FROM reach GROUP BY 1),
m AS (SELECT d.doc_id, coalesce(c.canonical, d.doc_id) AS canonical_doc_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
b AS (SELECT doc_id, canonical_doc_id,
             CAST(('0x' || substr(md5('0:' || CAST(canonical_doc_id AS VARCHAR)), 1, 6))
                  AS INTEGER) % 10000 AS bk
      FROM m)
SELECT doc_id, canonical_doc_id,
       CASE WHEN bk < 8000 THEN 'train'
            WHEN bk < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""




def q_pit_decay_multi(spark, sf_dir):
    """Multi-horizon decayed PIT aggregates (pit.decayed_pit_features_multi,
    taus 1d + 7d): one bucketed band join bounded by the LARGEST horizon
    serves every decay constant — adding a faster tau costs two decimal
    aggregates, not another join."""
    from esa_pfa_spark.operators.pit import decayed_pit_features_multi

    ev = _ld(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return decayed_pit_features_multi(
        probes, obs, taus={"1d": dt.timedelta(days=1), "7d": dt.timedelta(days=7)},
        on="user_id", probe_ts="query_ts", obs_ts="ts", value="value", cutoff=30.0,
    )


def _decay_term_sql(tau_s: int, what: str) -> str:
    d = f"(CAST(epoch_us(c.query_ts)-epoch_us(p.ts) AS DOUBLE)/1e6)/{tau_s}.0"
    body = f"exp(-{d})" + (" * p.value" if what == "sum" else "")
    return (
        f"CASE WHEN epoch_us(c.query_ts)-epoch_us(p.ts) < {30 * tau_s} * CAST(1e6 AS BIGINT) "
        f"THEN CAST(round({body}, 6) AS DECIMAL(18,6)) ELSE CAST(0.0 AS DECIMAL(18,6)) END"
    )


SQL_PIT_DECAY_MULTI = f"""
WITH c AS (SELECT event_id, user_id, ts AS query_ts FROM events WHERE event_type='click'),
     p AS (SELECT user_id, ts, value FROM events WHERE event_type='purchase'),
     j AS (
       SELECT c.event_id, c.user_id, c.query_ts,
              {_decay_term_sql(DAY, "sum")} AS ts1,
              {_decay_term_sql(DAY, "wt")} AS tw1,
              {_decay_term_sql(7 * DAY, "sum")} AS ts7,
              {_decay_term_sql(7 * DAY, "wt")} AS tw7
       FROM c JOIN p ON p.user_id = c.user_id
        AND epoch_us(c.query_ts)-epoch_us(p.ts) >= 0
        AND epoch_us(c.query_ts)-epoch_us(p.ts) < {30 * 7 * DAY} * CAST(1e6 AS BIGINT)),
     a AS (SELECT event_id, user_id, query_ts, count(*) AS n_win,
                  sum(ts1) AS ds1, sum(tw1) AS dw1,
                  sum(ts7) AS ds7, sum(tw7) AS dw7
           FROM j GROUP BY 1, 2, 3)
SELECT c.user_id, c.event_id, c.query_ts,
       CAST(coalesce(a.n_win, 0) AS BIGINT) AS n_win,
       round(CAST(a.ds1 AS DOUBLE), 6) AS decay_sum_1d,
       round(CAST(a.dw1 AS DOUBLE), 6) AS decay_wt_1d,
       round(CASE WHEN CAST(a.dw1 AS DOUBLE) > 0
             THEN CAST(a.ds1 AS DOUBLE) / CAST(a.dw1 AS DOUBLE) END, 6) AS decay_mean_1d,
       round(CAST(a.ds7 AS DOUBLE), 6) AS decay_sum_7d,
       round(CAST(a.dw7 AS DOUBLE), 6) AS decay_wt_7d,
       round(CASE WHEN CAST(a.dw7 AS DOUBLE) > 0
             THEN CAST(a.ds7 AS DOUBLE) / CAST(a.dw7 AS DOUBLE) END, 6) AS decay_mean_7d
FROM c LEFT JOIN a USING (event_id, user_id, query_ts)
"""




def q_vocab_coverage(spark, sf_dir):
    """Tokenizer-budget curve (tokens.vocab_coverage_curve): corpus
    coverage of the top-s tokens at s in {100, 1000, 8000} — one corpus
    scan, vocab-bounded rank, |sizes|-row readoff."""
    from esa_pfa_spark.operators.tokens import vocab_coverage_curve

    return vocab_coverage_curve(_tokenized_docs(spark, sf_dir), sizes=[100, 1000, 8000])


SQL_VOCAB_COVERAGE = f"""
WITH toks AS (
  SELECT list_transform(string_split(text, ' '),
           w -> CAST(('0x' || substr(md5(w), 1, 6)) AS INTEGER) % {32768}) AS tokens
  FROM documents),
ex AS (SELECT unnest(tokens) AS t FROM toks),
freq AS (SELECT t, count(*) AS c FROM ex GROUP BY 1),
rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS r FROM freq),
tot AS (SELECT sum(c) AS n_total FROM rk),
s AS (SELECT unnest([100, 1000, 8000]) AS vocab_size)
SELECT CAST(s.vocab_size AS INT) AS vocab_size,
       CAST(sum(CASE WHEN rk.r <= s.vocab_size THEN rk.c ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(max(tot.n_total) AS BIGINT) AS n_total,
       round(sum(CASE WHEN rk.r <= s.vocab_size THEN rk.c ELSE 0 END) * 1.0
             / max(tot.n_total), 6) AS coverage
FROM s CROSS JOIN rk CROSS JOIN tot
GROUP BY s.vocab_size
"""




def q_span_corruption(spark, sf_dir):
    """T5 span-corruption masks (tokens.span_corruption_mask): start rate
    5% with span lengths 1..5 (mean 3 -> ~15% corruption, the T5 recipe);
    membership is a pure function of (seed, doc, position) — reproducible
    pretraining-data generation.  Map-only nested higher-order lambdas."""
    from esa_pfa_spark.operators.tokens import span_corruption_mask

    return span_corruption_mask(_tokenized_docs(spark, sf_dir)).drop("mask")


SQL_SPAN_CORRUPTION = f"""
WITH toks AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok
  FROM documents),
base AS (
  SELECT doc_id, n_tok,
         list_transform(range(n_tok), p ->
           CASE WHEN len(list_filter(range(greatest(p - 4, 0), p + 1), q ->
                  CAST(('0x' || substr(md5('spanstart0:' || CAST(doc_id AS VARCHAR) || ':' || CAST(q AS VARCHAR)), 1, 6)) AS INTEGER) % 1000 < 50
                  AND p < q + 1 + CAST(('0x' || substr(md5('spanlen0:' || CAST(doc_id AS VARCHAR) || ':' || CAST(q AS VARCHAR)), 1, 6)) AS INTEGER) % 5
                )) > 0 THEN 1 ELSE 0 END) AS mask,
         len(list_filter(range(n_tok), p ->
           CAST(('0x' || substr(md5('spanstart0:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p AS VARCHAR)), 1, 6)) AS INTEGER) % 1000 < 50
         )) AS n_spans
  FROM toks WHERE n_tok > 0)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(list_sum(mask) AS BIGINT) AS n_masked,
       md5(list_aggregate(list_transform(mask, x -> CAST(x AS VARCHAR)), 'string_agg', '')) AS mask_fp
FROM base
"""




def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining (similarity.hard_negatives_topk): for each of
    the first 10 vectors, the 2 most cosine-similar vectors with a
    DIFFERENT label — the contrastive-training near-misses; probe batch
    broadcast, per-probe partitioned rank (no global window)."""
    emb = _ld(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("q"),
        F.col("label").alias("probe_label"),
    )
    return SIM.hard_negatives_topk(emb, probes, k=2)


SQL_HARD_NEGATIVES = """
WITH p AS (SELECT vec_id AS probe_id, embedding AS qv, label AS probe_label
           FROM embeddings WHERE vec_id < 10),
s AS (SELECT p.probe_id, e.vec_id,
             list_dot_product(e.embedding::DOUBLE[], p.qv::DOUBLE[])
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(p.qv::DOUBLE[], p.qv::DOUBLE[]))) AS cos
      FROM embeddings e, p WHERE e.label != p.probe_label)
SELECT probe_id,
       CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS INT) AS rank,
       vec_id
FROM s QUALIFY rank <= 2
"""




def q_bigram_pmi(spark, sf_dir):
    """Collocation mining (tokens.bigram_pmi_topk): top-30 adjacent token
    pairs by PMI with a min-count floor — the phrase-detection pass;
    vocab-bounded unigram broadcasts, TakeOrdered top-k."""
    from esa_pfa_spark.operators.tokens import bigram_pmi_topk

    return bigram_pmi_topk(_tokenized_docs(spark, sf_dir), k=30, min_count=5)


SQL_BIGRAM_PMI = f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           w -> CAST(('0x' || substr(md5(w), 1, 6)) AS INTEGER) % {32768}) AS tokens
  FROM documents),
bg AS (SELECT unnest(list_zip(tokens[1:-2], tokens[2:-1])) AS p FROM toks
       WHERE len(tokens) >= 2),
big AS (SELECT p[1] AS tok_a, p[2] AS tok_b, count(*) AS c_ab
        FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
uni AS (SELECT unnest(tokens) AS t FROM toks),
uc AS (SELECT t, count(*) AS c FROM uni GROUP BY 1),
nu AS (SELECT count(*) AS n_uni FROM uni),
nb AS (SELECT sum(greatest(len(tokens) - 1, 0)) AS n_big FROM toks)
SELECT big.tok_a, big.tok_b, CAST(big.c_ab AS BIGINT) AS c_ab,
       round(ln((CAST(big.c_ab AS DOUBLE) / nb.n_big)
                / ((CAST(ua.c AS DOUBLE) / nu.n_uni)
                   * (CAST(ub.c AS DOUBLE) / nu.n_uni))), 6) + 0.0 AS pmi
FROM big
JOIN uc ua ON ua.t = big.tok_a
JOIN uc ub ON ub.t = big.tok_b
CROSS JOIN nu CROSS JOIN nb
ORDER BY pmi DESC, big.tok_a ASC, big.tok_b ASC
LIMIT 30
"""




def q_epoch_allocation(spark, sf_dir):
    """Data-constrained epoch allocation (dataset.epoch_allocation):
    per-source repeats under a 50k-token budget, alpha=0.5 flattened mix,
    4-epoch repeat cap — the repeats-per-source plan of the
    data-constrained scaling regime; one tiny per-source aggregate."""
    from esa_pfa_spark.operators.dataset import epoch_allocation

    toks = _tokenized_docs(spark, sf_dir).select("source", "n_tok")
    return epoch_allocation(
        toks, budget_tokens=50_000, alpha=0.5, max_repeats=4.0
    )


SQL_EPOCH_ALLOCATION = """
WITH c AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
n AS (SELECT sum(n_tokens) AS n FROM c),
z AS (SELECT CAST(sum(CAST(round(pow(CAST(c.n_tokens AS DOUBLE) / n.n, 0.5), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS z
      FROM c CROSS JOIN n),
r AS (SELECT c.source, c.n_tokens,
             round(pow(CAST(c.n_tokens AS DOUBLE) / n.n, 0.5), 6) / z.z AS q,
             least(4.0,
                   50000.0 * (round(pow(CAST(c.n_tokens AS DOUBLE) / n.n, 0.5), 6) / z.z)
                   / c.n_tokens) AS repeats
      FROM c CROSS JOIN n CROSS JOIN z)
SELECT source, n_tokens,
       round(q, 6) AS q_share,
       round(repeats, 6) AS repeats,
       CAST(round(repeats * n_tokens, 0) AS BIGINT) AS tokens_contributed
FROM r
"""




def q_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality with stupid backoff (textstats.bigram_logprob,
    Brants et al. 2007): per-doc mean ln p(w|prev) — word order now
    matters, unlike the unigram proxy; bigram counts equi-join back
    (never broadcast — the bigram vocab outgrows broadcasts at scale),
    unigram/total ride broadcasts."""
    from esa_pfa_spark.operators.textstats import bigram_logprob

    return bigram_logprob(_ld(spark, sf_dir, "documents"))


SQL_BIGRAM_LOGPROB = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
uni AS (SELECT unnest(ws) AS t FROM w),
uc AS (SELECT t, count(*) AS c FROM uni GROUP BY 1),
nt AS (SELECT count(*) AS n_total FROM uni),
pr AS (SELECT doc_id, unnest(list_zip(ws[1:-2], ws[2:-1])) AS p FROM w WHERE len(ws) >= 2),
ex AS (SELECT doc_id, p[1] AS v, p[2] AS wd FROM pr),
bg AS (SELECT v, wd, count(*) AS c_vw FROM ex GROUP BY 1, 2),
terms AS (
  SELECT ex.doc_id,
         CAST(round(CASE WHEN bg.c_vw IS NOT NULL
                    THEN ln(CAST(bg.c_vw AS DOUBLE) / cv.c)
                    ELSE ln(0.4 * CAST(cw.c AS DOUBLE) / nt.n_total) END, 6)
              AS DECIMAL(18,6)) AS term
  FROM ex
  LEFT JOIN bg ON bg.v = ex.v AND bg.wd = ex.wd
  JOIN uc cv ON cv.t = ex.v
  JOIN uc cw ON cw.t = ex.wd
  CROSS JOIN nt),
pt AS (SELECT doc_id, sum(term) AS s, count(*) AS np FROM terms GROUP BY 1),
ft AS (SELECT w.doc_id, len(w.ws) AS n_words,
              CAST(round(ln(CAST(uc.c AS DOUBLE) / nt.n_total), 6) AS DECIMAL(18,6)) AS f
       FROM w JOIN uc ON uc.t = w.ws[1] CROSS JOIN nt)
SELECT ft.doc_id,
       CAST(ft.n_words AS BIGINT) AS n_words,
       round(CAST(coalesce(pt.s, CAST(0 AS DECIMAL(18,6))) + ft.f AS DOUBLE)
             / (coalesce(pt.np, 0) + 1), 6) + 0.0 AS avg_logprob
FROM ft LEFT JOIN pt ON pt.doc_id = ft.doc_id
"""


def q_block_dedup(spark, sf_dir):
    """Sub-document (paragraph-level) exact dedup (dedup.block_dedup,
    CCNet sec 3.1 / Dolma line-dedup shape): 16-word blocks, one global
    keeper per distinct block (min (doc_id, idx)), documents reassembled
    from surviving blocks.  Segmentation is pure built-ins (split +
    transform + posexplode of BLOCKS, never words); one fingerprint
    groupBy with map-side min(struct) partials + one equi-join back +
    one per-doc reassembly agg — boilerplate-hash skew collapses
    map-side before the exchange."""
    from esa_pfa_spark.operators.dedup import block_dedup

    return block_dedup(
        _ldw(spark, sf_dir, "documents"), block_words=16
    ).select("doc_id", "n_blocks", "n_kept", "clean_text")


SQL_BLOCK_DEDUP = """
WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
seg0 AS (SELECT doc_id, ws,
                CAST(unnest(range(0, CAST(ceil(len(ws)/16.0) AS BIGINT)))
                     AS INT) AS block_idx
         FROM w),
seg AS (SELECT doc_id, block_idx,
               array_to_string(ws[(block_idx*16+1):(block_idx*16+16)], ' ') AS btxt
        FROM seg0),
f AS (SELECT *, substr(md5(btxt), 1, 16) AS fp FROM seg),
k AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id, block_idx) AS rn
      FROM f),
agg AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(btxt, ' ' ORDER BY block_idx) AS clean_text
        FROM k WHERE rn = 1 GROUP BY doc_id),
nb AS (SELECT doc_id,
              CAST(ceil(len(string_split(coalesce(text, ''), ' '))/16.0) AS INT)
                  AS n_blocks
       FROM documents)
SELECT nb.doc_id, nb.n_blocks,
       CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept, agg.clean_text
FROM nb LEFT JOIN agg USING (doc_id)
"""


_DD_ALPHA = 0.02
_DD_GAMMA = (1.0 + _DD_ALPHA) / (1.0 - _DD_ALPHA)
_DD_LG = __import__("math").log(_DD_GAMMA)


def q_ddsketch_quantiles(spark, sf_dir):
    """Mergeable relative-error quantile sketch (profile.ddsketch_quantiles,
    DDSketch — Masson et al. VLDB'19): log-spaced bins at alpha=0.02,
    p50/p90/p99 per event_type answered from bin cumulative counts.  The
    shuffle carries only (group, bin) partial counts — bounded by
    log_gamma(vmax/vmin) per group regardless of row count — and sketches
    merge by adding counts, unlike exact percentiles.  Both engines use
    the SAME Python-computed ln(gamma) literal and a 9dp-rounded bin
    quotient, so binning is bit-identical."""
    from esa_pfa_spark.operators.profile import ddsketch_quantiles

    return ddsketch_quantiles(
        _ld(spark, sf_dir, "events"),
        value_col="value",
        quantiles=[0.5, 0.9, 0.99],
        group_col="event_type",
        alpha=_DD_ALPHA,
    ).select("event_type", "q", "n_pos", "q_est")


SQL_DDSKETCH = f"""
WITH pos AS (
  SELECT event_type,
         CAST(-floor(-round(ln(CAST(value AS DOUBLE)) / {_DD_LG!r}, 9)) AS BIGINT) AS b
  FROM events WHERE value > 0),
bins AS (SELECT event_type, b, count(*) AS c FROM pos GROUP BY 1, 2),
cum AS (SELECT event_type, b,
               sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM bins),
q AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
hit AS (SELECT event_type, q.q AS q, min(b) AS b, max(n) AS n_pos
        FROM cum, q WHERE cum >= ceil(q.q * n) GROUP BY 1, 2)
SELECT event_type, q, CAST(n_pos AS BIGINT) AS n_pos,
       round(2 * power({_DD_GAMMA!r}, b) / ({_DD_GAMMA!r} + 1), 6) AS q_est
FROM hit
"""


def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement as a deterministic top-k
    (dataset.weighted_sample_topk, Efraimidis-Spirakis A-ES): 50 docs
    drawn proportionally to n_chars via the md5 exponential race.
    Priority is map-only column math; the global top-k plans as
    TakeOrderedAndProject (per-partition heaps, k-sized merge), never a
    global sort."""
    from esa_pfa_spark.operators.dataset import weighted_sample_topk

    return weighted_sample_topk(
        _ld(spark, sf_dir, "documents").select("doc_id", "source", "n_chars"),
        k=50, weight_col="n_chars", seed=7,
    ).select("doc_id", "source", "n_chars", "priority")


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, source, n_chars,
       round(-ln((CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 6))
                       AS INTEGER) + 0.5) / 16777216.0)
             / CAST(n_chars AS DOUBLE), 9) AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority, doc_id
LIMIT 50
"""


def _pq_codebooks():
    """Seeded (m=8, ks=16, subdim=8) int64 codebooks on the 10^6 SCALE
    grid, spanning the embeddings' scaled range (values in ~[-0.53,
    0.46] -> +/-6e5): the fixed-codebook regime (the trained form would
    reuse clustering.kmeans_fit per subspace, as ann_ivf_trained does
    for cells)."""
    import numpy as np

    rng = np.random.default_rng(13)
    return rng.integers(-600_000, 600_001, size=(8, 16, 8), dtype=np.int64)


def q_pq_adc_topk(spark, sf_dir):
    """Product-quantization ADC top-k (similarity.pq_adc_topk, Jégou et
    al. TPAMI'11 / the FAISS scan shape): stored vectors compress to 8
    codes each (one Arrow encode pass), the probe precomputes an exact
    int64 distance table to all 128 codewords, and every candidate's
    approximate distance is 8 table lookups in whole-stage codegen —
    the memory-bound ANN path that reads 8 bytes/vector at scale.  All
    arithmetic exact int64 on the SCALE grid => exact oracle."""
    from esa_pfa_spark.operators.similarity import pq_adc_topk

    emb = _ld(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return pq_adc_topk(
        emb.filter(F.col("vec_id") != 0), probe, _pq_codebooks(), k=10
    )


def _pq_sql() -> str:
    C = _pq_codebooks()
    m, ks, subdim = C.shape

    def scaled(col):
        return (
            f"list_transform({col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        )

    def sub(vec, j):
        return f"{vec}[{j * subdim + 1}:{(j + 1) * subdim}]"

    def d2(vec, j, c):
        # exact: every term is an integer < 2^53, so double dot products
        # are exact and the final CAST loses nothing
        cl = "[" + ", ".join(str(int(x)) for x in C[j][c]) + "]"
        cc = int((C[j][c].astype(object) ** 2).sum())
        s = sub(vec, j)
        return (
            f"CAST(list_dot_product({s}::DOUBLE[], {s}::DOUBLE[])"
            f" - 2 * list_dot_product({s}::DOUBLE[], {cl}::DOUBLE[])"
            f" + {cc} AS BIGINT)"
        )

    # per subspace: candidate code = first-min index; probe keeps the
    # full 16-entry distance list; ADC term = qd_j[code_j]
    code_cols = ", ".join(
        f"list_position(dj{j}, list_min(dj{j})) AS c{j}" for j in range(m)
    )
    dj_cols = ", ".join(
        "[" + ", ".join(d2("vs", j, c) for c in range(ks)) + f"] AS dj{j}"
        for j in range(m)
    )
    qd_cols = ", ".join(
        "[" + ", ".join(d2("qs", j, c) for c in range(ks)) + f"] AS qd{j}"
        for j in range(m)
    )
    adc = " + ".join(f"p.qd{j}[a.c{j}]" for j in range(m))
    return f"""
WITH v AS (SELECT vec_id, {scaled("embedding")} AS vs
           FROM embeddings WHERE vec_id != 0),
d AS (SELECT vec_id, {dj_cols} FROM v),
a AS (SELECT vec_id, {code_cols} FROM d),
q AS (SELECT {scaled("embedding")} AS qs FROM embeddings WHERE vec_id = 0),
p AS (SELECT {qd_cols} FROM q),
s AS (SELECT a.vec_id, CAST({adc} AS BIGINT) AS adc_d2 FROM a, p)
SELECT vec_id, CAST(row_number() OVER (ORDER BY adc_d2, vec_id) AS INT) AS rank,
       adc_d2
FROM s QUALIFY rank <= 10
"""


def q_ivfpq_topk(spark, sf_dir):
    """IVFADC (Jégou et al. TPAMI'11 §IV): the full FAISS production
    composition — IVF cell pruning (similarity.ivf_assign, argmax-dot
    cells) cuts the candidate set to the probe's cell, then PQ
    asymmetric distance ranks ONLY that cell's codes.  At 100 TB the
    scan touches 1/n_cells of the corpus at 8 bytes/vector; both stages
    are the already-oracled operators composed, so the oracle is their
    SQL composition."""
    from esa_pfa_spark.operators.similarity import ivf_assign, pq_adc_topk

    emb = _ld(spark, sf_dir, "embeddings")
    cents = _ivf_centroids()
    assigned = ivf_assign(emb.filter(F.col("vec_id") != 0), cents)
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    passigned = ivf_assign(probe, cents, vec_col="q", id_col=None).select(
        F.col("ivf_cluster").alias("__pc"), "q"
    )
    cand = assigned.join(
        F.broadcast(passigned.select("__pc")), F.col("ivf_cluster") == F.col("__pc")
    ).select("vec_id", "embedding")
    return pq_adc_topk(cand, probe.select("q"), _pq_codebooks(), k=10)


def q_tokenizer_fertility(spark, sf_dir):
    """Corpus tokenizer-fertility budgeting by (source, lang) —
    textstats.tokenizer_fertility: exact integer sums -> one hash agg,
    ratios from sums (partitioning-invariant)."""
    return TS.tokenizer_fertility(_ld(spark, sf_dir, "documents"))


SQL_TOKENIZER_FERTILITY = """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(length(text)) * 1.0
             / sum(len(string_split(text, ' '))), 6) AS chars_per_ws_token,
       round(sum(length(text)) * 1.0
             / sum(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]'))), 6)
           AS chars_per_bpe_token,
       round(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]'))) * 1.0
             / sum(len(string_split(text, ' '))), 6) AS subword_fanout
FROM documents
GROUP BY source, lang
"""


def q_pq_trained_topk(spark, sf_dir):
    """Trained-codebook PQ ADC (similarity.pq_train_codebooks: one
    integer-exact k-means per subspace, Jégou TPAMI'11 §III) — the
    production regime vs pq_adc_topk_10's fixed codebooks.  Rows-only
    driver check (Lloyd training is not SQL-expressible); determinism
    and the distortion-improvement contract (trained quantization error
    <= seeded-random codebooks on the same corpus) are pinned in
    tests/test_similarity.py."""
    from esa_pfa_spark.operators.similarity import pq_adc_topk, pq_train_codebooks

    emb = _ld(spark, sf_dir, "embeddings")
    stored = emb.filter(F.col("vec_id") != 0)
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    books = pq_train_codebooks(stored, m=8, ks=16, n_iter=2)
    return pq_adc_topk(stored, probe, books, k=10)


def _ivfpq_sql() -> str:
    cents = _ivf_centroids()

    def dots(vec):
        return ", ".join(
            f"list_dot_product({vec}::DOUBLE[], [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
            for c in cents
        )

    pq = _pq_sql()
    # swap the PQ oracle's candidate CTE for the cell-pruned one; the
    # rest of the generated SQL (codes, probe table, ADC, rank) is reused
    # verbatim
    cell_cte = f"""
WITH qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
pc AS (SELECT CAST(list_position(d, list_max(d)) AS INT) AS cl
       FROM (SELECT [{dots("embedding")}] AS d FROM qv)),
cand AS (SELECT e.vec_id, e.embedding,
                CAST(list_position(d, list_max(d)) AS INT) AS cl
         FROM (SELECT vec_id, embedding, [{dots("embedding")}] AS d
               FROM embeddings WHERE vec_id != 0) e),
pruned AS (SELECT cand.vec_id, cand.embedding
           FROM cand JOIN pc ON cand.cl = pc.cl),"""
    body = pq.replace(
        "WITH v AS (SELECT vec_id, ", "v AS (SELECT vec_id, ", 1
    ).replace("FROM embeddings WHERE vec_id != 0)", "FROM pruned)", 1)
    return cell_cte + body


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------



def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (tokens.winnow_fingerprints; Schleimer et
    al., SIGMOD 2003): per-doc selected-min k-gram hashes, k=4 / w=4 —
    the whole selection runs in-row via higher-order array functions
    (transform + array_min over key slices): no explode, no shuffle,
    whole-stage codegen.  fp_digest is the md5 of the sorted selection —
    the cell-level equality witness."""
    from esa_pfa_spark.operators.tokens import winnow_fingerprints

    return winnow_fingerprints(_tokenized_docs_w(spark, sf_dir), k=4, w=4)


_WINNOW_G = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
g AS (SELECT doc_id, len(toks) AS n_tok, len(toks) - 3 AS m,
             list_transform(generate_series(0, len(toks) - 4),
               i -> md5(array_to_string(list_slice(toks, i + 1, i + 4), ','))
                    || lpad(CAST(999999 - i AS VARCHAR), 6, '0')) AS keys
      FROM tok WHERE len(toks) >= 4)"""

SQL_WINNOW_FPS = f"""
{_WINNOW_G},
s AS (SELECT doc_id, n_tok, m,
             list_sort(list_distinct(list_transform(
               generate_series(0, greatest(m - 4, 0)),
               i -> list_min(list_slice(keys, i + 1, i + 4))))) AS sel
      FROM g)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(m AS BIGINT) AS n_grams,
       CAST(len(sel) AS BIGINT) AS n_fp,
       round(len(sel) * 1.0 / m, 6) AS density,
       md5(array_to_string(sel, '|')) AS fp_digest
FROM s
"""


def q_winnow_dup_pairs(spark, sf_dir):
    """MOSS-style match step (tokens.winnow_dup_pairs): doc pairs sharing
    >= 2 winnowed gram hashes, stop-fingerprints (freq > 50) dropped before
    the bucket self-join — in-row selection, then fp-bucketed equi-join,
    never all-pairs."""
    from esa_pfa_spark.operators.tokens import winnow_dup_pairs

    return winnow_dup_pairs(
        _tokenized_docs_w(spark, sf_dir), k=4, w=4, min_shared=2, max_fp_freq=50
    )


SQL_WINNOW_PAIRS = f"""
{_WINNOW_G},
sd AS (SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(0, greatest(m - 4, 0)),
         i -> substr(list_min(list_slice(keys, i + 1, i + 4)), 1, 32)))) AS fp
       FROM g),
keep AS (SELECT fp FROM sd GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
fk AS (SELECT doc_id, fp FROM sd JOIN keep USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_token_rank_drift(spark, sf_dir):
    """Cross-source unigram drift (tokens.token_rank_drift): exact Spearman
    rho between per-source frequency ranks over the all-source common
    vocab; ranks made total by (count DESC, token ASC) so the permutation
    statistic is engine-identical.  Everything past the first partial-agg
    is vocab-bounded."""
    from esa_pfa_spark.operators.tokens import token_rank_drift

    return token_rank_drift(_tokenized_docs(spark, sf_dir))


SQL_TOKEN_RANK_DRIFT = f"""
WITH tok AS (SELECT source, {_TOK_SQL} AS toks FROM documents),
ex AS (SELECT source, unnest(toks) AS t FROM tok),
c AS (SELECT source, t, count(*) AS cnt FROM ex GROUP BY 1, 2),
common AS (SELECT t FROM c GROUP BY t
           HAVING count(*) = (SELECT count(DISTINCT source) FROM c)),
r AS (SELECT c.source, c.t,
             row_number() OVER (PARTITION BY c.source
                                ORDER BY c.cnt DESC, c.t ASC) AS rk
      FROM c JOIN common USING (t)),
p AS (SELECT a.source AS source_a, b.source AS source_b,
             CAST(a.rk AS BIGINT) - CAST(b.rk AS BIGINT) AS d
      FROM r a JOIN r b ON a.t = b.t AND a.source < b.source)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_common,
       round(1.0 - 6.0 * sum(d * d)
             / (count(*) * (CAST(count(*) AS DOUBLE) * count(*) - 1.0)),
             6) + 0.0 AS spearman_rho
FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""




def q_trend_by_user(spark, sf_dir):
    """Per-entity OLS trend features (signal.trend_by_key): slope/day,
    intercept, R^2 of value vs time per user — exact-integer normal-
    equation sums (epoch-us x, micro-unit y) so the double finish is
    engine-identical; ONE map-side-combinable partial agg, no window."""
    from esa_pfa_spark.operators.signal import trend_by_key

    return trend_by_key(_ld(spark, sf_dir, "events"))


SQL_TREND_BY_USER = """
WITH e AS (SELECT user_id,
             CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS HUGEINT) AS x,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yu
           FROM events),
a AS (SELECT user_id, count(*) AS n,
             sum(x) AS sx, sum(x * x) AS sxx,
             sum(yu) AS syu, sum(yu * yu) AS syy,
             sum(x * yu) AS sxy
      FROM e GROUP BY 1),
d AS (SELECT *,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(syu AS DOUBLE) AS num,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(syu AS DOUBLE) * CAST(syu AS DOUBLE) AS deny
      FROM a
      WHERE CAST(n AS HUGEINT) * sxx - sx * sx > 0)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(num * 86400.0 / denx, 6) + 0.0 AS slope_per_day,
       round((CAST(syu AS DOUBLE) - num / denx * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 1000000.0, 6) + 0.0 AS intercept,
       CASE WHEN CAST(n AS HUGEINT) * syy - syu * syu > 0
            THEN round(num * num / (denx * deny), 6) END AS r2
FROM d ORDER BY user_id
"""



def q_gap_stats(spark, sf_dir):
    """Inter-event-time features (signal.gap_stats_by_key): per-user gap
    count/mean/min/max/std (seconds) + Goh-Barabasi burstiness from exact
    integer-microsecond gaps; ONE Exchange (the lag window's), the groupBy
    reuses its partitioning."""
    from esa_pfa_spark.operators.signal import gap_stats_by_key

    return gap_stats_by_key(_ld(spark, sf_dir, "events"))


SQL_GAP_STATS = """
WITH g AS (SELECT user_id,
             CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS HUGEINT) AS g
           FROM events),
a AS (SELECT user_id, count(*) AS n, sum(g) AS sg, sum(g * g) AS sg2,
             min(g) AS gmin, max(g) AS gmax
      FROM g WHERE g IS NOT NULL GROUP BY 1),
d AS (SELECT *, CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mean_us,
             sqrt(greatest(CAST(n AS DOUBLE) * CAST(sg2 AS DOUBLE)
                           - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE), 0.0))
               / CAST(n AS DOUBLE) AS std_us
      FROM a)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       round(mean_us / 1000000.0, 6) AS gap_mean_s,
       round(CAST(gmin AS DOUBLE) / 1000000.0, 6) AS gap_min_s,
       round(CAST(gmax AS DOUBLE) / 1000000.0, 6) AS gap_max_s,
       round(std_us / 1000000.0, 6) AS gap_std_s,
       CASE WHEN std_us + mean_us > 0
            THEN round((std_us - mean_us) / (std_us + mean_us), 6) + 0.0 END AS burstiness
FROM d ORDER BY user_id
"""


def q_ks_drift(spark, sf_dir):
    """Binning-free drift gate (features.ks_drift): two-sample KS statistic
    of the value distribution per event type, first half of the month vs
    second (PSI's split); the max runs over exact decimal cross-products,
    shuffle bounded by distinct values."""
    from esa_pfa_spark.operators.features import ks_drift

    ev = _ld(spark, sf_dir, "events").withColumn(
        "period",
        F.when(F.col("ts") < F.lit(dt.datetime(2024, 1, 16)), "base").otherwise("cur"),
    )
    return ks_drift(ev, value_col="value", group_col="event_type")


SQL_KS_DRIFT = """
WITH ev AS (SELECT event_type AS g, value AS v,
                   CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'base' ELSE 'cur' END AS period
            FROM events),
c AS (SELECT g, v,
             CAST(sum(CASE WHEN period = 'base' THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
             CAST(sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS HUGEINT) AS nc
      FROM ev GROUP BY 1, 2),
w AS (SELECT g,
             sum(nb) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
             sum(nc) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc,
             sum(nb) OVER (PARTITION BY g) AS tb,
             sum(nc) OVER (PARTITION BY g) AS tc
      FROM c),
a AS (SELECT g, max(tb) AS tb, max(tc) AS tc,
             max(abs(cb * tc - cc * tb)) AS dmax
      FROM w GROUP BY 1)
SELECT g AS event_type, CAST(tb AS BIGINT) AS n_base, CAST(tc AS BIGINT) AS n_cur,
       round(CAST(dmax AS DOUBLE) / (CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)), 6) AS ks_d
FROM a WHERE tb > 0 AND tc > 0 ORDER BY 1
"""


def q_rfm_scores(spark, sf_dir):
    """RFM entity scoring (features.rfm_scores): recency/frequency/monetary
    per user + equal-frequency 1..5 scores via the edge-broadcast
    quantile_bins pattern (never a global ntile window)."""
    from esa_pfa_spark.operators.features import rfm_scores

    return rfm_scores(_ld(spark, sf_dir, "events"))


SQL_RFM_SCORES = """
WITH per AS (SELECT user_id AS key, max(epoch_us(ts)) AS last_us,
                    count(*) AS frequency,
                    sum(CAST(value AS DECIMAL(18,6))) AS monetary
             FROM events GROUP BY 1),
ref AS (SELECT max(last_us) AS ref_us FROM per),
m AS (SELECT key,
             round(CAST(ref_us - last_us AS DOUBLE) / 86400000000.0, 6) AS recency_days,
             CAST(frequency AS BIGINT) AS frequency,
             round(CAST(monetary AS DOUBLE), 6) AS monetary
      FROM per, ref),
er AS (SELECT quantile_cont(recency_days, [0.2,0.4,0.6,0.8]) AS e FROM m),
ef AS (SELECT quantile_cont(frequency, [0.2,0.4,0.6,0.8]) AS e FROM m),
em AS (SELECT quantile_cont(monetary, [0.2,0.4,0.6,0.8]) AS e FROM m)
SELECT m.key AS user_id, m.recency_days, m.frequency, m.monetary,
       CAST(5 - len(list_filter(er.e, x -> m.recency_days >= x)) AS INT) AS r_score,
       CAST(len(list_filter(ef.e, x -> m.frequency >= x)) + 1 AS INT) AS f_score,
       CAST(len(list_filter(em.e, x -> m.monetary >= x)) + 1 AS INT) AS m_score,
       CAST((5 - len(list_filter(er.e, x -> m.recency_days >= x))) * 100
            + (len(list_filter(ef.e, x -> m.frequency >= x)) + 1) * 10
            + (len(list_filter(em.e, x -> m.monetary >= x)) + 1) AS INT) AS rfm_code
FROM m, er, ef, em ORDER BY user_id
"""



def q_acf_by_user(spark, sf_dir):
    """Per-entity autocorrelation (signal.acf_by_key) at lags 1 and 2 —
    Pearson r over (v_t, v_{t+lag}) pairs in event order; all leads from
    ONE window pass, shuffle after it is |keys|*|lags| rows."""
    from esa_pfa_spark.operators.signal import acf_by_key

    return acf_by_key(_ld(spark, sf_dir, "events"), lags=(1, 2))


SQL_ACF_BY_USER = """
WITH e AS (SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yu
           FROM events),
l AS (SELECT user_id, yu AS x,
             lead(yu, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y1,
             lead(yu, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y2
      FROM e),
p AS (SELECT user_id, 1 AS lag, x, y1 AS y FROM l WHERE y1 IS NOT NULL
      UNION ALL
      SELECT user_id, 2, x, y2 FROM l WHERE y2 IS NOT NULL),
a AS (SELECT user_id, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM p GROUP BY 1, 2)
SELECT user_id, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0 AS acf
FROM a
WHERE CAST(n AS HUGEINT) * sxx - sx * sx > 0
  AND CAST(n AS HUGEINT) * syy - sy * sy > 0
ORDER BY user_id, lag
"""



def q_novelty_curve(spark, sf_dir):
    """Corpus-saturation diagnostic (tokens.novelty_curve): per ingest-order
    bucket, new vs already-seen 8-gram fingerprints + the cumulative
    distinct curve; shuffles bounded by distinct fingerprints, exact
    integer bucketing."""
    from esa_pfa_spark.operators.tokens import novelty_curve

    return novelty_curve(_tokenized_docs(spark, sf_dir), n=8, n_buckets=10)


SQL_NOVELTY_CURVE = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
mx AS (SELECT max(doc_id) AS mx FROM tok),
w AS (SELECT doc_id, unnest(generate_series(0, len(toks) - 8)) AS s, toks
      FROM tok WHERE len(toks) >= 8),
f AS (SELECT doc_id,
             md5(array_to_string(list_slice(toks, s + 1, s + 8), ',')) AS fp
      FROM w),
bf AS (SELECT CAST((doc_id * 10) // (mx + 1) AS INT) AS bucket, fp FROM f, mx),
occ AS (SELECT bucket, count(*) AS n_windows FROM bf GROUP BY 1),
d AS (SELECT DISTINCT bucket, fp FROM bf),
per AS (SELECT bucket, count(*) AS n_fps FROM d GROUP BY 1),
fb AS (SELECT fp, min(bucket) AS bucket FROM d GROUP BY 1),
nov AS (SELECT bucket, count(*) AS n_novel FROM fb GROUP BY 1),
j AS (SELECT per.bucket, occ.n_windows, per.n_fps,
             coalesce(nov.n_novel, 0) AS n_novel
      FROM per JOIN occ USING (bucket) LEFT JOIN nov USING (bucket))
SELECT bucket, CAST(n_windows AS BIGINT) AS n_windows,
       CAST(n_fps AS BIGINT) AS n_fps, CAST(n_novel AS BIGINT) AS n_novel,
       round(CAST(n_novel AS DOUBLE) / CAST(n_fps AS DOUBLE), 6) AS novelty_rate,
       CAST(sum(n_novel) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct
FROM j ORDER BY bucket
"""



def q_behavior_profile(spark, sf_dir):
    """Behavioral diversity per user (signal.behavior_profile_by_key):
    event-type entropy (+normalized), dominant type + share; both aggs
    hash on the user key (subset clustering, one effective shuffle)."""
    from esa_pfa_spark.operators.signal import behavior_profile_by_key

    return behavior_profile_by_key(_ld(spark, sf_dir, "events"))


SQL_BEHAVIOR_PROFILE = """
WITH c AS (SELECT user_id, event_type AS ty, count(*) AS cnt
           FROM events GROUP BY 1, 2),
w AS (SELECT *, sum(cnt) OVER (PARTITION BY user_id) AS n FROM c),
t AS (SELECT user_id, n, cnt, ty,
             round(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS plogp
      FROM w),
a AS (SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(CAST(plogp AS DECIMAL(18,6))) AS h
      FROM t GROUP BY 1),
r AS (SELECT user_id, ty, cnt,
             row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, ty ASC) AS rk
      FROM c),
top AS (SELECT user_id, ty AS top_type, cnt AS top_cnt FROM r WHERE rk = 1)
SELECT a.user_id, a.n_events, a.n_types,
       round(CAST(h AS DOUBLE), 6) AS type_entropy,
       CASE WHEN a.n_types > 1
            THEN round(CAST(h AS DOUBLE) / ln(CAST(a.n_types AS DOUBLE)), 6)
       END AS type_entropy_norm,
       top.top_type,
       round(CAST(top_cnt AS DOUBLE) / CAST(a.n_events AS DOUBLE), 6) AS top_share
FROM a JOIN top USING (user_id) ORDER BY a.user_id
"""


def q_seasonality_hour(spark, sf_dir):
    """Daily-rhythm strength per user (signal.seasonality_strength_by_key):
    eta^2 of value explained by hour-of-day, from exact integer micro-unit
    cell sums; |keys|*24 cells shuffle, no window over events."""
    from esa_pfa_spark.operators.signal import seasonality_strength_by_key

    return seasonality_strength_by_key(_ld(spark, sf_dir, "events"))


SQL_SEASONALITY_HOUR = """
WITH e AS (SELECT user_id, hour(ts) AS h,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yu
           FROM events),
c AS (SELECT user_id, h, count(*) AS nh, sum(yu) AS sh, sum(yu * yu) AS qh
      FROM e GROUP BY 1, 2),
t AS (SELECT *,
             CAST(round(CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                        / CAST(nh AS DOUBLE), 6) AS DECIMAL(38,6)) AS term
      FROM c),
a AS (SELECT user_id, sum(nh) AS n, sum(sh) AS s, sum(qh) AS q,
             sum(term) AS bsum, count(*) AS n_hours
      FROM t GROUP BY 1)
SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(n_hours AS BIGINT) AS n_hours,
       round(greatest(least(
         (CAST(bsum AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)),
         1.0), 0.0), 6) + 0.0 AS eta2_hour
FROM a WHERE CAST(n AS HUGEINT) * q - s * s > 0 ORDER BY user_id
"""



def q_embedding_drift(spark, sf_dir):
    """Embedding-space drift per label (similarity.embedding_drift):
    1 - cos between first-half and second-half ingest centroids; exact
    decimal element sums, the only row-scale shuffle is the
    (label, period, dim) partial agg."""
    from esa_pfa_spark.operators.similarity import embedding_drift

    emb = _ld(spark, sf_dir, "embeddings")
    mx = emb.agg(F.max("vec_id").alias("__mx"))
    lab = emb.crossJoin(F.broadcast(mx)).withColumn(
        "period",
        F.when(F.expr("(vec_id * 2) div (__mx + 1)") == 0, "base").otherwise("cur"),
    )
    return embedding_drift(lab, group_col="label")


SQL_EMBEDDING_DRIFT = """
WITH mx AS (SELECT max(vec_id) AS mx FROM embeddings),
lab AS (SELECT label,
               CASE WHEN (vec_id * 2) // (mx + 1) = 0 THEN 'base' ELSE 'cur' END AS p,
               embedding
        FROM embeddings, mx),
ex AS (SELECT label, p, i - 1 AS dim,
              CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6)) AS v6
       FROM lab, generate_series(1, 64) AS t(i)),
cells AS (SELECT label, p, dim, count(*) AS n, sum(v6) AS s FROM ex GROUP BY 1, 2, 3),
m AS (SELECT label, p, dim,
             CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS m
      FROM cells),
b AS (SELECT label, dim,
             max(CASE WHEN p = 'base' THEN m END) AS ma,
             max(CASE WHEN p = 'cur' THEN m END) AS mb
      FROM m GROUP BY 1, 2),
a AS (SELECT label, count(*) AS n_dims,
             sum(ma * mb) AS num, sum(ma * ma) AS na, sum(mb * mb) AS nb
      FROM b WHERE ma IS NOT NULL AND mb IS NOT NULL GROUP BY 1
      HAVING sum(ma * ma) > 0 AND sum(mb * mb) > 0)
SELECT label, CAST(n_dims AS BIGINT) AS n_dims,
       round(CAST(num AS DOUBLE)
             / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) + 0.0 AS centroid_cos,
       round(1.0 - CAST(num AS DOUBLE)
             / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) + 0.0 AS drift
FROM a ORDER BY label
"""



def q_bitemporal_asof(spark, sf_dir):
    """Bitemporal as-of (asof.asof_join_bitemporal): observations carry a
    deterministic publication lag (event_id % 49 hours) and every 5th
    event is RESTATED 7 days later (+100); probes one day after each 3rd
    event must see exactly what was knowable then — the zero-leakage
    lookup.  Same 1-Exchange union+window shape as the flagship as-of."""
    from esa_pfa_spark.operators.asof import asof_join_bitemporal

    ev = _ld(spark, sf_dir, "events")
    lag = F.expr("make_interval(0, 0, 0, 0, CAST(event_id % 49 AS INT), 0, 0)")
    obs = ev.select(
        "user_id", "ts", (F.col("ts") + lag).alias("knowledge_ts"), "value"
    ).unionByName(
        ev.filter(F.col("event_id") % 5 == 0).select(
            "user_id",
            "ts",
            (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("knowledge_ts"),
            (F.col("value") + 100).alias("value"),
        )
    )
    probes = ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("query_ts"),
    )
    return asof_join_bitemporal(
        probes, obs, on="user_id", tolerance=dt.timedelta(days=3)
    ).orderBy("probe_id")


SQL_BITEMPORAL_ASOF = """
WITH obs AS (
  SELECT user_id, ts, ts + (INTERVAL 1 HOUR) * (event_id % 49) AS kts, value
  FROM events
  UNION ALL
  SELECT user_id, ts, ts + INTERVAL 7 DAY, value + 100
  FROM events WHERE event_id % 5 = 0),
p AS (SELECT event_id AS probe_id, user_id, ts + INTERVAL 1 DAY AS query_ts
      FROM events WHERE event_id % 3 = 0),
j AS (SELECT p.probe_id, p.user_id, p.query_ts,
             o.ts AS mts, o.kts, o.value,
             row_number() OVER (PARTITION BY p.probe_id
                                ORDER BY o.ts DESC, o.kts DESC, o.value DESC) AS rk
      FROM p LEFT JOIN obs o
        ON o.user_id = p.user_id
       AND greatest(o.kts, o.ts) <= p.query_ts
       AND o.ts >= p.query_ts - INTERVAL 3 DAY)
SELECT user_id, probe_id, query_ts, mts AS matched_ts,
       kts AS matched_knowledge_ts, value
FROM j WHERE rk = 1 ORDER BY probe_id
"""



def q_hashed_cross(spark, sf_dir):
    """Feature-hashing trick (encode.hashed_cross): (event_type x hour)
    crosses bucketed portably at 64; map-only assignment, one tiny count
    agg for the oracle view (bucket load + collision count)."""
    from esa_pfa_spark.operators.encode import hashed_cross

    ev = _ld(spark, sf_dir, "events").withColumn("hour", F.hour("ts"))
    hc = hashed_cross(ev, ["event_type", "hour"], n_buckets=64)
    # n_crosses counts distinct over a null-safe composite (same chr(31)
    # separator / chr(0)-sentinel encoding hashed_cross itself uses):
    # countDistinct(a, b) drops rows where ANY argument is NULL, while
    # DuckDB's count(DISTINCT (a, b)) keeps NULL-bearing structs — the two
    # diverge the moment event_type or ts is NULL.
    composite = F.concat_ws(
        "\x1f",
        F.coalesce(F.col("event_type").cast("string"), F.lit("\x00null")),
        F.coalesce(F.col("hour").cast("string"), F.lit("\x00null")),
    )
    return (
        hc.groupBy("cross_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(composite).cast("long").alias("n_crosses"),
        )
        .orderBy("cross_bucket")
    )


SQL_HASHED_CROSS = """
WITH h AS (SELECT event_type, hour(ts) AS hr FROM events),
b AS (SELECT CAST(CAST(('0x' || substr(md5(concat_ws(chr(31), '0',
               coalesce(CAST(event_type AS VARCHAR), chr(0) || 'null'),
               coalesce(CAST(hr AS VARCHAR), chr(0) || 'null'))), 1, 6))
             AS INTEGER) % 64 AS INT) AS cross_bucket,
             event_type, hr
      FROM h)
SELECT cross_bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT concat_ws(chr(31),
              coalesce(CAST(event_type AS VARCHAR), chr(0) || 'null'),
              coalesce(CAST(hr AS VARCHAR), chr(0) || 'null'))) AS BIGINT) AS n_crosses
FROM b GROUP BY 1 ORDER BY 1
"""



def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention (profile.cohort_retention): share of each
    first-activity cohort active at each later weekly offset; key-hashed
    distinct + min aggs, co-partitioned join, |periods|^2 output."""
    from esa_pfa_spark.operators.profile import cohort_retention

    return cohort_retention(_ld(spark, sf_dir, "events"), unit_days=7)


SQL_COHORT_RETENTION = """
WITH ua AS (SELECT DISTINCT user_id,
                   CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0) AS INT) AS period
            FROM events),
c AS (SELECT user_id, min(period) AS cohort FROM ua GROUP BY 1),
j AS (SELECT c.cohort, ua.period - c.cohort AS week_offset, ua.user_id
      FROM ua JOIN c USING (user_id)),
act AS (SELECT cohort, week_offset, CAST(count(*) AS BIGINT) AS n_active
        FROM j GROUP BY 1, 2),
sz AS (SELECT cohort, n_active AS n_cohort FROM act WHERE week_offset = 0)
SELECT act.cohort, CAST(act.week_offset AS INT) AS week_offset, act.n_active, sz.n_cohort,
       round(CAST(act.n_active AS DOUBLE) / CAST(sz.n_cohort AS DOUBLE), 6) AS retention
FROM act JOIN sz USING (cohort)
ORDER BY act.cohort, act.week_offset
"""



def q_expectations(spark, sf_dir):
    """Data-quality contract gate (profile.validate_expectations): five
    expectations over events checked in ONE map-only pass (single-row
    shuffle), unpivoted to the per-expectation report."""
    from esa_pfa_spark.operators.profile import validate_expectations

    ev = _ld(spark, sf_dir, "events")
    return validate_expectations(
        ev,
        {
            "event_id_not_null": F.col("event_id").isNotNull(),
            "ts_in_2024": (F.col("ts") >= F.lit(dt.datetime(2024, 1, 1)))
            & (F.col("ts") < F.lit(dt.datetime(2025, 1, 1))),
            "user_id_nonneg": F.col("user_id") >= 0,
            "value_under_10k": F.col("value") < 10000,
            "known_event_type": F.col("event_type").isin(
                ["click", "view", "purchase", "signup", "error"]
            ),
        },
    )


SQL_EXPECTATIONS = """
WITH a AS (SELECT count(*) AS n_rows,
  sum(CASE WHEN coalesce(event_id IS NOT NULL, FALSE) THEN 0 ELSE 1 END) AS v0,
  sum(CASE WHEN coalesce(ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01', FALSE) THEN 0 ELSE 1 END) AS v1,
  sum(CASE WHEN coalesce(user_id >= 0, FALSE) THEN 0 ELSE 1 END) AS v2,
  sum(CASE WHEN coalesce(value < 10000, FALSE) THEN 0 ELSE 1 END) AS v3,
  sum(CASE WHEN coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE) THEN 0 ELSE 1 END) AS v4
  FROM events),
u AS (
  SELECT 'event_id_not_null' AS expectation, n_rows, v0 AS nv FROM a
  UNION ALL SELECT 'ts_in_2024', n_rows, v1 FROM a
  UNION ALL SELECT 'user_id_nonneg', n_rows, v2 FROM a
  UNION ALL SELECT 'value_under_10k', n_rows, v3 FROM a
  UNION ALL SELECT 'known_event_type', n_rows, v4 FROM a)
SELECT expectation, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(nv AS BIGINT) AS n_violations,
       round(CAST(nv AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS violation_rate,
       nv = 0 AS passed
FROM u ORDER BY expectation
"""



def q_entity_snapshot(spark, sf_dir):
    """Composed per-entity feature snapshot (plans/snapshot.py): trend x
    rhythm x diversity x seasonality in ONE lazy plan — every branch a
    key-hashed aggregate, full-outer co-partitioned joins."""
    from esa_pfa_spark.plans.snapshot import entity_feature_snapshot

    return entity_feature_snapshot(_ld(spark, sf_dir, "events"))


def _strip_order(sql: str) -> str:
    return sql.rsplit("ORDER BY", 1)[0]


SQL_ENTITY_SNAPSHOT = None  # assembled below from the component oracles


SQL_ENTITY_SNAPSHOT = f"""
WITH tr AS ({_strip_order(SQL_TREND_BY_USER)}),
gp AS ({_strip_order(SQL_GAP_STATS)}),
bp AS (SELECT user_id, n_events AS n_events_total, n_types, type_entropy,
              type_entropy_norm, top_type, top_share
       FROM ({_strip_order(SQL_BEHAVIOR_PROFILE)})),
ss AS (SELECT user_id, n_events AS n_events_seasonal, n_hours, eta2_hour
       FROM ({_strip_order(SQL_SEASONALITY_HOUR)}))
SELECT * FROM tr
FULL JOIN gp USING (user_id)
FULL JOIN bp USING (user_id)
FULL JOIN ss USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# r5 additions: distributed linear algebra, feature QA, changepoint
# localization, serving-cache economics.  Registered at the TAIL so the
# r5 driver rotation (first 50 slots) is undisturbed.
# ---------------------------------------------------------------------------


def q_embedding_gram(spark, sf_dir):
    """Exact Gram matrix over the embedding table's first 16 coordinates
    (linalg.gram_matrix): 136 decimal-exact column aggregates in ONE
    map-side-combinable pass, unpivoted in-plan to (i, j, gram) — the
    covariance/whitening precursor (Abbas et al. 2023 whiten before
    SemDeDup k-means).  Decimal accumulation makes the distributed float
    reduction order-independent, hence hash-equal to the oracle."""
    from esa_pfa_spark.operators.linalg import gram_matrix

    return gram_matrix(_ld(spark, sf_dir, "embeddings"), dims=16)


SQL_EMBEDDING_GRAM = """
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)
                     AS DECIMAL(38,18))) AS DOUBLE) + 0.0 AS gram
FROM embeddings, generate_series(1, 16) t1(i), generate_series(1, 16) t2(j)
WHERE j >= i AND embedding IS NOT NULL AND len(embedding) >= 16
GROUP BY i, j
"""


def q_pca_project(spark, sf_dir):
    """PCA fit + projection over the 64-d embedding table
    (linalg.pca_fit/pca_project): covariance from ONE mapInArrow pass of
    d×d partials (driver reduces exactly d²+d+1 doubles per partition),
    64×64 eigensolve driver-side, sign-canonicalized components, map-only
    projection to k=8.  Rows-only oracle: eigenvectors are not
    SQL-expressible; the orthonormality/variance-ordering/reconstruction
    contracts are pinned in tests/test_linalg.py."""
    from esa_pfa_spark.operators.linalg import pca_fit, pca_project

    emb = _ld(spark, sf_dir, "embeddings")
    model = pca_fit(emb, dim=64, k=8)
    return pca_project(emb, model, round_to=6).select(
        "vec_id", "label", F.col("pca").alias("pca8")
    )


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix over lineitem's four numeric
    measures (profile.corr_matrix): all k(k+1) moments decimal-exact in
    one map-side-combinable scan, corr evaluated in double from identical
    components both engines (the spearman_rho device, matrixed)."""
    from esa_pfa_spark.operators.profile import corr_matrix

    li = _ld(spark, sf_dir, "lineitem")
    return corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def _corr_pair_sql(a: str, b: str) -> str:
    both = f"{a} IS NOT NULL AND {b} IS NOT NULL"
    xa = f"CAST({a} AS DOUBLE)"
    xb = f"CAST({b} AS DOUBLE)"
    return f"""
SELECT '{a}' AS col_i, '{b}' AS col_j,
       CAST(count(CASE WHEN {both} THEN 1 END) AS BIGINT) AS n,
       round(
         (CAST(count(CASE WHEN {both} THEN 1 END) AS DOUBLE)
            * CAST(sum(CAST(CASE WHEN {both} THEN {xa} * {xb} END AS DECIMAL(38,8))) AS DOUBLE)
          - CAST(sum(CAST(CASE WHEN {both} THEN {xa} END AS DECIMAL(38,8))) AS DOUBLE)
            * CAST(sum(CAST(CASE WHEN {both} THEN {xb} END AS DECIMAL(38,8))) AS DOUBLE))
         / sqrt(
             (CAST(count(CASE WHEN {both} THEN 1 END) AS DOUBLE)
                * CAST(sum(CAST(CASE WHEN {both} THEN {xa} * {xa} END AS DECIMAL(38,8))) AS DOUBLE)
              - CAST(sum(CAST(CASE WHEN {both} THEN {xa} END AS DECIMAL(38,8))) AS DOUBLE)
                * CAST(sum(CAST(CASE WHEN {both} THEN {xa} END AS DECIMAL(38,8))) AS DOUBLE))
             * (CAST(count(CASE WHEN {both} THEN 1 END) AS DOUBLE)
                * CAST(sum(CAST(CASE WHEN {both} THEN {xb} * {xb} END AS DECIMAL(38,8))) AS DOUBLE)
              - CAST(sum(CAST(CASE WHEN {both} THEN {xb} END AS DECIMAL(38,8))) AS DOUBLE)
                * CAST(sum(CAST(CASE WHEN {both} THEN {xb} END AS DECIMAL(38,8))) AS DOUBLE))
           ), 6) + 0.0 AS corr
FROM lineitem"""


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
SQL_CORR_MATRIX = "\nUNION ALL\n".join(
    _corr_pair_sql(_CORR_COLS[a], _CORR_COLS[b])
    for a in range(len(_CORR_COLS))
    for b in range(a + 1, len(_CORR_COLS))
)


def q_changepoint_user(spark, sf_dir):
    """Per-entity mean-shift changepoint localization over purchase values
    (signal.changepoint_topk, w=8): decimal-exact two-sided frame sums +
    deterministic per-key argmax — CUSUM's *where* to cusum_by_user's
    *whether*.  One Exchange, two in-partition sorts."""
    from esa_pfa_spark.operators.signal import changepoint_topk

    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return changepoint_topk(
        ev, value="value", key="user_id", ts="ts", tiebreak="event_id", w=8
    )


SQL_CHANGEPOINT_USER = """
WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type='purchase'),
f AS (SELECT user_id, ts, event_id,
             sum(CAST(value AS DECIMAL(18,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS ls,
             count(value)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS ln,
             sum(CAST(value AS DECIMAL(18,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS rs,
             count(value)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS rn
      FROM p),
s AS (SELECT user_id, ts, event_id,
             abs(CAST(rs - ls AS DOUBLE)) / 8.0 AS score
      FROM f WHERE ln = 8 AND rn = 8),
r AS (SELECT user_id, ts, event_id, score,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY score DESC, ts, event_id) AS rk
      FROM s)
SELECT user_id, ts, event_id, round(score, 6) + 0.0 AS shift_score
FROM r WHERE rk = 1
"""


def q_prefix_cache(spark, sf_dir):
    """Prefix-cache economics per source (tokens.prefix_cache_stats,
    prefix_len=8): what token fraction an automatic-prefix-caching server
    (vLLM APC / SGLang RadixAttention) would serve from cache.  Shuffle
    key is the md5 digest of the 8-token prefix — fixed width at any
    scale; both aggregation levels map-side combinable; the digest is a
    token-array equality witness vs the oracle."""
    from esa_pfa_spark.operators.tokens import prefix_cache_stats

    return prefix_cache_stats(
        _tokenized_docs(spark, sf_dir), prefix_len=8, group_col="source"
    )


SQL_PREFIX_CACHE = f"""
WITH tok AS (SELECT source, {_TOK_SQL} AS toks FROM documents),
base AS (SELECT source,
                CASE WHEN len(toks) >= 8 THEN
                  md5(array_to_string(
                        list_transform(toks[1:8], t -> CAST(t AS VARCHAR)), ','))
                END AS pfx,
                CAST(len(toks) AS BIGINT) AS nt
         FROM tok),
g AS (SELECT source, pfx, count(*) AS gs, sum(nt) AS ts
      FROM base GROUP BY source, pfx)
SELECT source,
       CAST(sum(CASE WHEN pfx IS NOT NULL THEN gs ELSE 0 END) AS BIGINT) AS n_seq,
       CAST(sum(CASE WHEN pfx IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix_groups,
       CAST(sum(CASE WHEN pfx IS NOT NULL THEN (gs - 1) * 8 ELSE 0 END) AS BIGINT) AS cached_tokens,
       CAST(sum(ts) AS BIGINT) AS total_tokens,
       round(CAST(sum(CASE WHEN pfx IS NOT NULL THEN (gs - 1) * 8 ELSE 0 END) AS DOUBLE)
             / CAST(sum(ts) AS DOUBLE), 6) + 0.0 AS hit_frac
FROM g GROUP BY source
"""


def q_interval_overlap(spark, sf_dir):
    """Interval x interval overlap join (ranges.interval_overlap_join):
    per-user purchase attention windows [ts, ts + 1..7d] vs click
    windows [ts, ts + 1..3d], every overlapping pair counted EXACTLY
    once via bucket-ownership dedup (owner bucket = the one containing
    max(lo_a, lo_b)) — no theta-join BroadcastNestedLoop, no distinct.
    Window lengths derive deterministically from event_id; bounds compare
    as IEEE doubles computed identically in both engines (epoch-days),
    and the output is pure integer counts — hash-safe with no rounding."""
    from esa_pfa_spark.operators.ranges import interval_overlap_join

    from esa_pfa_spark.functions.time import epoch_s

    ev = _ld(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", "event_type",
        (epoch_s(F.col("ts")) / F.lit(86400.0)).alias("d"),
    )
    pur = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("aid"),
        F.col("d").alias("alo"),
        (F.col("d") + (F.col("event_id") % 7 + 1)).alias("ahi"),
    )
    clk = base.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("bid"),
        F.col("d").alias("blo"),
        (F.col("d") + (F.col("event_id") % 3 + 1)).alias("bhi"),
    )
    pairs = interval_overlap_join(
        pur, clk, key_cols=["user_id"],
        a_lo="alo", a_hi="ahi", b_lo="blo", b_hi="bhi", bucket_width=4.0,
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlaps"),
            F.countDistinct("aid").cast("long").alias("n_purchases_hit"),
            F.countDistinct("bid").cast("long").alias("n_clicks_hit"),
        )
        .orderBy("user_id")
    )


SQL_INTERVAL_OVERLAP = """
WITH e AS (SELECT user_id, event_id, event_type,
                  (epoch_us(ts) / 1000000.0) / 86400.0 AS d FROM events),
a AS (SELECT user_id, event_id AS aid, d AS alo,
             d + (event_id % 7 + 1) AS ahi
      FROM e WHERE event_type = 'purchase'),
b AS (SELECT user_id, event_id AS bid, d AS blo,
             d + (event_id % 3 + 1) AS bhi
      FROM e WHERE event_type = 'click'),
p AS (SELECT a.user_id, aid, bid FROM a JOIN b
      ON a.user_id = b.user_id AND alo <= bhi AND blo <= ahi)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(count(DISTINCT aid) AS BIGINT) AS n_purchases_hit,
       CAST(count(DISTINCT bid) AS BIGINT) AS n_clicks_hit
FROM p GROUP BY user_id ORDER BY user_id
"""


def q_pack_attention(spark, sf_dir):
    """Cross-document attention-contamination audit of packed windows
    (tokens.pack_attention_stats, capacity=128): per training window,
    the exact count and fraction of causal attention pairs that cross a
    document boundary — the sizing artifact for block-diagonal attention
    masks (Krell et al. 2021).  One map-side-combinable groupBy over the
    pack_offsets span table; integer pair counts are exact."""
    from esa_pfa_spark.operators.tokens import pack_attention_stats

    return pack_attention_stats(_tokenized_docs(spark, sf_dir), capacity=128)


SQL_PACK_ATTENTION = """
WITH tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
             FROM documents),
cum AS (SELECT source, doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY source, doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS gs
        FROM tok WHERE n_tok > 0),
sp AS (SELECT source, doc_id, n_tok, gs,
              unnest(generate_series(CAST(gs // 128 AS BIGINT),
                                     CAST((gs + n_tok - 1) // 128 AS BIGINT))) AS chunk_id
       FROM cum),
pieces AS (SELECT chunk_id,
                  least(chunk_id * 128 + 128 - gs, n_tok)
                  - greatest(chunk_id * 128 - gs, 0) AS t
           FROM sp)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tok,
       CAST((sum(t) * (sum(t) + 1) - sum(t * (t + 1))) / 2 AS BIGINT) AS cross_pairs,
       CAST(sum(t) * (sum(t) + 1) / 2 AS BIGINT) AS total_pairs,
       round(CAST(sum(t) * (sum(t) + 1) - sum(t * (t + 1)) AS DOUBLE)
             / (sum(t) * (sum(t) + 1)), 6) AS contamination_frac
FROM pieces GROUP BY chunk_id
"""


def q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM quality
    (textstats.kneser_ney_logprob, D=0.75): per-doc mean ln P_KN(w|v)
    with the continuation-probability correction — the KenLM-shaped
    upgrade of the stupid-backoff bigram gate.  Bigram table equi-joins
    back (never broadcast); context/continuation tables are
    vocab-bounded broadcasts; 6dp decimal term accumulation."""
    from esa_pfa_spark.operators.textstats import kneser_ney_logprob

    return kneser_ney_logprob(_ld(spark, sf_dir, "documents"))


SQL_KNESER_NEY = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pr AS (SELECT doc_id, len(ws) AS n_words,
              unnest(list_zip(ws[1:-2], ws[2:-1])) AS p
       FROM w WHERE len(ws) >= 2),
ex AS (SELECT doc_id, n_words, p[1] AS v, p[2] AS wd FROM pr),
bg AS (SELECT v, wd, count(*) AS c_vw FROM ex GROUP BY 1, 2),
ctx AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1_v FROM bg GROUP BY 1),
cont AS (SELECT wd, count(*) AS n1_w FROM bg GROUP BY 1),
bt AS (SELECT count(*) AS b_types FROM bg),
terms AS (
  SELECT ex.doc_id, ex.n_words,
         CAST(round(ln(
           (greatest(CAST(bg.c_vw AS DOUBLE) - 0.75, 0.0)
            + 0.75 * CAST(ctx.n1_v AS DOUBLE)
                   * (CAST(cont.n1_w AS DOUBLE) / bt.b_types))
           / CAST(ctx.c_v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
  FROM ex
  JOIN bg ON bg.v = ex.v AND bg.wd = ex.wd
  JOIN ctx ON ctx.v = ex.v
  JOIN cont ON cont.wd = ex.wd
  CROSS JOIN bt)
SELECT doc_id,
       CAST(max(n_words) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(term) AS DOUBLE) / count(*), 6) + 0.0 AS kn_logprob
FROM terms GROUP BY doc_id
"""


def q_sa_longest_dup(spark, sf_dir):
    """Exact longest duplicated token substring in the corpus
    (suffix.longest_duplicate_span over a prefix-doubling generalized
    suffix array — the Lee et al. 2022 exact-substring-dedup machinery;
    the fixed-n fingerprint spans answer one n, this answers ALL n).
    Engine: log(max_doc_len) doubling rounds of shifted self-joins +
    range-partitioned dense numbering (no global window, no suffix
    materialization), then adjacent-pair LCP via JVM zip_with.  Oracle:
    DuckDB sorts the materialized suffix lists directly (lexicographic
    list ORDER BY — the naive small-scale construction) and takes the
    max adjacent LCP; span_fp = min md5 across max-ties, well-defined
    under any tie arrangement between equal suffixes."""
    from esa_pfa_spark.operators.suffix import longest_duplicate_span

    from esa_pfa_spark.operators.tokens import DEFAULT_VOCAB

    # the portable tokenizer's vocab bound lets the doubling start from
    # 4-token packed keys (k0 = floor(62/log2(V+2))) instead of 2
    return longest_duplicate_span(
        _tokenized_docs_w(spark, sf_dir), max_token=DEFAULT_VOCAB - 1
    )


SQL_SA_LONGEST_DUP = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
pos0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS off FROM tok),
pos AS (SELECT doc_id, off, list_slice(toks, off, len(toks)) AS suf FROM pos0),
ord AS (SELECT doc_id, off, suf,
               lead(suf) OVER (ORDER BY suf, doc_id, off) AS nsuf
        FROM pos),
fb AS (SELECT suf, nsuf,
              list_position(list_transform(list_zip(suf, nsuf),
                            p -> p[1] IS DISTINCT FROM p[2]), true) AS fpos
       FROM ord WHERE nsuf IS NOT NULL),
lcps AS (SELECT suf,
                CASE WHEN fpos = 0 THEN least(len(suf), len(nsuf))
                     ELSE fpos - 1 END AS lcp
         FROM fb),
mx AS (SELECT max(lcp) AS m FROM lcps)
SELECT CAST(mx.m AS BIGINT) AS dup_len,
       min(md5(coalesce(array_to_string(
           list_transform(list_slice(suf, 1, mx.m), t -> CAST(t AS VARCHAR)),
           ','), ''))) AS span_fp
FROM lcps, mx WHERE lcp = mx.m GROUP BY mx.m
"""


def q_sa_dup_coverage(spark, sf_dir):
    """Exact per-document duplicate-token coverage at L=16
    (suffix.duplicate_coverage): positions inside ANY >= 16-token
    substring that recurs anywhere in the corpus — the Lee et al. 2022
    ExactSubstr statistic the fixed-n fingerprint mask approximates.
    LCP-interval property makes adjacent SA pairs sufficient; interval
    union per doc via a DOC-partitioned sweep window (never global)."""
    from esa_pfa_spark.operators.suffix import duplicate_coverage
    from esa_pfa_spark.operators.tokens import DEFAULT_VOCAB

    return duplicate_coverage(
        _tokenized_docs_w(spark, sf_dir), min_len=16,
        max_token=DEFAULT_VOCAB - 1,
    ).orderBy("doc_id")


SQL_SA_DUP_COVERAGE = f"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
pos0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS off FROM tok),
pos AS (SELECT doc_id, off, list_slice(toks, off, len(toks)) AS suf FROM pos0),
ord AS (SELECT doc_id, off, suf,
               lead(suf) OVER (ORDER BY suf, doc_id, off) AS nsuf,
               lead(doc_id) OVER (ORDER BY suf, doc_id, off) AS ndoc,
               lead(off) OVER (ORDER BY suf, doc_id, off) AS noff
        FROM pos),
fb AS (SELECT doc_id, off, ndoc, noff, suf, nsuf,
              list_position(list_transform(list_zip(suf, nsuf),
                            p -> p[1] IS DISTINCT FROM p[2]), true) AS fpos
       FROM ord WHERE nsuf IS NOT NULL),
lcps AS (SELECT doc_id, off, ndoc, noff,
                CASE WHEN fpos = 0 THEN least(len(suf), len(nsuf))
                     ELSE fpos - 1 END AS lcp
         FROM fb),
hits AS (SELECT * FROM lcps WHERE lcp >= 16),
iv AS (SELECT doc_id AS d, off AS s, off + lcp AS e FROM hits
       UNION ALL SELECT ndoc, noff, noff + lcp FROM hits),
sw AS (SELECT d, s, e,
              max(e) OVER (PARTITION BY d ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       FROM iv),
cov AS (SELECT d, sum(greatest(e - greatest(s, coalesce(pm, s)), 0)) AS dup
        FROM sw GROUP BY d)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
       CAST(coalesce(cov.dup, 0) AS BIGINT) AS dup_tokens,
       round(CAST(coalesce(cov.dup, 0) AS DOUBLE) / len(t.toks), 6) AS dup_frac
FROM tok t LEFT JOIN cov ON cov.d = t.doc_id
ORDER BY t.doc_id
"""


def q_rho_select(spark, sf_dir):
    """RHO-loss learnability selection (importance.rho_select, Mindermann
    et al. 2022): top-100 docs by reducible loss — weak-model (unigram)
    NLL minus reference-model (Kneser-Ney bigram) NLL.  Selects
    structured, learnable text; skips noise that is hard under BOTH
    models.  Composition of two already-oracled LM scorers + one
    TakeOrderedAndProject; the rounded score carries the signed-zero
    +0.0 normalization (a near-zero gap can round to -0.0 in exactly
    one engine)."""
    from esa_pfa_spark.operators.importance import rho_select

    return rho_select(_ld(spark, sf_dir, "documents"), k=100)


SQL_RHO_SELECT = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
uw AS (SELECT doc_id, unnest(ws) AS wd FROM w),
ufreq AS (SELECT wd, count(*) AS wc FROM uw GROUP BY 1),
utot AS (SELECT count(*) AS n_total FROM uw),
ul AS (SELECT doc_id,
              round(CAST(sum(CAST(ln(wc * 1.0 / n_total) AS DECIMAL(18,6)))
                         AS DOUBLE) / count(*), 6) AS u_logprob
       FROM uw JOIN ufreq USING (wd) CROSS JOIN utot GROUP BY doc_id),
pr AS (SELECT doc_id, len(ws) AS n_words,
              unnest(list_zip(ws[1:-2], ws[2:-1])) AS p
       FROM w WHERE len(ws) >= 2),
ex AS (SELECT doc_id, n_words, p[1] AS v, p[2] AS wd FROM pr),
bg AS (SELECT v, wd, count(*) AS c_vw FROM ex GROUP BY 1, 2),
ctx AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1_v FROM bg GROUP BY 1),
cont AS (SELECT wd, count(*) AS n1_w FROM bg GROUP BY 1),
bt AS (SELECT count(*) AS b_types FROM bg),
terms AS (
  SELECT ex.doc_id, ex.n_words,
         CAST(round(ln(
           (greatest(CAST(bg.c_vw AS DOUBLE) - 0.75, 0.0)
            + 0.75 * CAST(ctx.n1_v AS DOUBLE)
                   * (CAST(cont.n1_w AS DOUBLE) / bt.b_types))
           / CAST(ctx.c_v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
  FROM ex
  JOIN bg ON bg.v = ex.v AND bg.wd = ex.wd
  JOIN ctx ON ctx.v = ex.v
  JOIN cont ON cont.wd = ex.wd
  CROSS JOIN bt),
knd AS (SELECT doc_id,
               CAST(max(n_words) AS BIGINT) AS n_words,
               round(CAST(sum(term) AS DOUBLE) / count(*), 6) + 0.0 AS kn_logprob
        FROM terms GROUP BY doc_id)
SELECT knd.doc_id, knd.n_words, ul.u_logprob, knd.kn_logprob,
       round(knd.kn_logprob - ul.u_logprob, 6) + 0.0 AS rho_score
FROM knd JOIN ul USING (doc_id)
ORDER BY rho_score DESC, knd.doc_id ASC LIMIT 100
"""


def q_doremi(spark, sf_dir):
    """DoReMi domain-mixture reweighting (dataset.doremi_weights, Xie et
    al. 2023): 5 multiplicative-weights rounds over per-source excess
    loss (proxy loss = -unigram_logprob), uniform smoothing 0.1 — the
    trajectory of training-mixture weights a Group-DRO curation step
    emits.  One corpus-sized aggregate; every round after is k-row
    algebra on broadcast scalars (cost independent of corpus size)."""
    from esa_pfa_spark.operators.dataset import doremi_weights
    from esa_pfa_spark.operators.textstats import unigram_logprob

    docs = _ld(spark, sf_dir, "documents")
    loss = (
        unigram_logprob(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", (-F.col("avg_logprob")).alias("loss"))
    )
    return doremi_weights(
        loss, domain_col="source", loss_col="loss",
        iters=5, eta=1.0, smoothing=0.1,
    ).orderBy("iter", "source")


def _doremi_sql(iters: int = 5, eta: float = 1.0, s: float = 0.1) -> str:
    """Chained-CTE oracle mirroring dataset.doremi_weights bit-for-bit
    (the logreg/pagerank discipline): 9dp-decimal mixture-loss sums,
    12dp-decimal weight sums, alpha re-rounded to 9dp per round."""
    parts = ["""
uw AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM documents),
ufreq AS MATERIALIZED (SELECT w, count(*) AS wc FROM uw GROUP BY 1),
utot AS MATERIALIZED (SELECT count(*) AS n_total FROM uw),
ul AS MATERIALIZED (
  SELECT doc_id,
         round(CAST(sum(CAST(ln(wc * 1.0 / n_total) AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*), 6) AS avg_logprob
  FROM uw JOIN ufreq USING (w) CROSS JOIN utot GROUP BY doc_id),
uls AS MATERIALIZED (SELECT d.source, -ul.avg_logprob AS loss
                     FROM ul JOIN documents d USING (doc_id)),
dom AS MATERIALIZED (
  SELECT source, count(*) AS n_docs,
         round(CAST(sum(CAST(loss AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 9) AS loss
  FROM uls GROUP BY source),
kk AS MATERIALIZED (SELECT count(*) AS k FROM dom),
a0 AS MATERIALIZED (SELECT source, n_docs, loss, round(1.0 / kk.k, 9) AS alpha
                    FROM dom CROSS JOIN kk)"""]
    for t in range(1, iters + 1):
        parts.append(f"""
m{t} AS MATERIALIZED (
  SELECT CAST(sum(CAST(round(alpha * loss, 9) AS DECIMAL(20,9))) AS DOUBLE) AS mix
  FROM a{t - 1}),
w{t} AS MATERIALIZED (
  SELECT source, n_docs, loss,
         round(alpha * exp({eta!r} * (loss - m{t}.mix)), 12) AS wgt
  FROM a{t - 1} CROSS JOIN m{t}),
z{t} AS MATERIALIZED (
  SELECT CAST(sum(CAST(wgt AS DECIMAL(28,12))) AS DOUBLE) AS z FROM w{t}),
a{t} AS MATERIALIZED (
  SELECT source, n_docs, loss,
         round({1.0 - s!r} * (wgt / z{t}.z) + {s!r} / kk.k, 9) AS alpha
  FROM w{t} CROSS JOIN z{t} CROSS JOIN kk)""")
    snaps = "\n  UNION ALL ".join(
        f"SELECT {t} AS iter, source, n_docs, round(loss, 6) AS base_loss, alpha FROM a{t}"
        for t in range(0, iters + 1)
    )
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT CAST(iter AS INT) AS iter, source, CAST(n_docs AS BIGINT) AS n_docs,
       base_loss, alpha
FROM ({snaps})
ORDER BY iter, source
"""
    )


_REGISTRY: dict[str, tuple[Callable, str | None]] = {
    # Order matters: the driver correctness gate samples the FIRST 50 dict
    # entries.  ROUND-5 ROTATION (the final round): the first 50 slots are
    # (1) cyclical_time_features — the r4 signed-zero FAIL, re-sampled
    # post-fix — followed by 49 queries never driver-sampled in r1-r4,
    # prioritized by (a) float-parity risk (the +0.0 signed-zero wave:
    # woe/mi/cramers/trend/gap/acf/drift/logreg/pmi/spearman), (b) operator
    # classes with no driver row (sketches, PageRank, z-order, CDC diff,
    # winnowing, bitemporal as-of, curation v2/v3), and (c) north-rule core
    # (incremental as-of, purged folds, PIT decay).  Everything below slot
    # 50 was driver-green in r1-r4 or stays covered by the local mirror
    # (tests/test_entry_oracle.py runs ALL exact oracles bit-faithfully).
    "cyclical_time_features": (q_cyclical_time, SQL_CYCLICAL_TIME),
    "woe_event_type": (q_woe_encode, SQL_WOE_ENCODE),
    "mutual_information_rank": (q_mutual_information, SQL_MUTUAL_INFORMATION),
    "cramers_v_rank": (q_cramers_v, SQL_CRAMERS_V),
    "trend_by_user": (q_trend_by_user, SQL_TREND_BY_USER),
    "gap_stats_by_user": (q_gap_stats, SQL_GAP_STATS),
    "acf_by_user_lag12": (q_acf_by_user, SQL_ACF_BY_USER),
    "seasonality_hour_by_user": (q_seasonality_hour, SQL_SEASONALITY_HOUR),
    "behavior_profile_by_user": (q_behavior_profile, SQL_BEHAVIOR_PROFILE),
    "token_rank_drift": (q_token_rank_drift, SQL_TOKEN_RANK_DRIFT),
    "embedding_drift_by_label": (q_embedding_drift, SQL_EMBEDDING_DRIFT),
    "ks_value_drift": (q_ks_drift, SQL_KS_DRIFT),
    "logreg_train_gd6": (q_logreg_train, _logreg_sql()),
    "logreg_calibration_10": (q_logreg_calibration, _logreg_calibration_sql()),
    "bigram_pmi_top30": (q_bigram_pmi, SQL_BIGRAM_PMI),
    "bigram_logprob_quality": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "dsir_topk_sample_100": (q_dsir_sample, SQL_DSIR_SAMPLE),
    "bm25_topk_20": (q_bm25_topk, SQL_BM25_TOPK),
    "token_entropy_stats": (q_token_entropy, SQL_TOKEN_ENTROPY),
    "rfm_scores_5": (q_rfm_scores, SQL_RFM_SCORES),
    "novelty_curve_10": (q_novelty_curve, SQL_NOVELTY_CURVE),
    "cohort_retention_w": (q_cohort_retention, SQL_COHORT_RETENTION),
    "expectations_events": (q_expectations, SQL_EXPECTATIONS),
    "entity_feature_snapshot": (q_entity_snapshot, SQL_ENTITY_SNAPSHOT),
    "bitemporal_asof_3d": (q_bitemporal_asof, SQL_BITEMPORAL_ASOF),
    "hashed_cross_64": (q_hashed_cross, SQL_HASHED_CROSS),
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FPS),
    "winnow_dup_pairs": (q_winnow_dup_pairs, SQL_WINNOW_PAIRS),
    "hll_distinct_users": (q_hll_distinct, _hll_sql()),
    "pagerank_docs_top20": (q_pagerank_docs, _pagerank_sql()),
    "cms_word_counts_top30": (q_cms_word_counts, _cms_sql()),
    "zorder_pruning_64f": (q_zorder_pruning, _zorder_sql()),
    "bloom_prune_join": (q_bloom_prune, _bloom_sql()),
    "editdist_rerank_pairs": (q_editdist_rerank, SQL_EDITDIST_RERANK),
    "table_diff_cdc": (q_table_diff, SQL_TABLE_DIFF),
    "curation_v3_export": (q_curation_v3, _curation_v3_sql()),
    "quantile_normalize_by_type": (q_quantile_normalize, SQL_QUANTILE_NORMALIZE),
    "purged_time_folds_5": (q_purged_time_folds, SQL_PURGED_FOLDS),
    "gopher_quality_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "minhash_dedup_best_survivors": (q_dedup_best_survivors, SQL_DEDUP_BEST_SURVIVORS),
    "temperature_mixture_half": (q_temperature_mixture, SQL_TEMPERATURE_MIXTURE),
    "curriculum_order_4": (q_curriculum_order, SQL_CURRICULUM_ORDER),
    "ccnet_ppl_buckets": (q_ccnet_buckets, SQL_CCNET_BUCKETS),
    "asof_staleness_profile": (q_asof_staleness, SQL_ASOF_STALENESS),
    "curation_v2_survivors": (q_curation_v2, SQL_CURATION_V2),
    "cluster_safe_split": (q_cluster_safe_split, SQL_CLUSTER_SAFE_SPLIT),
    "pit_decay_multi_1d_7d": (q_pit_decay_multi, SQL_PIT_DECAY_MULTI),
    "vocab_coverage_curve": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "span_corruption_masks": (q_span_corruption, SQL_SPAN_CORRUPTION),
    "incremental_asof_features": (q_incremental_asof_features, SQL_INCREMENTAL_ASOF),
    # --- driver-green in earlier rounds / locally mirrored below ---
    "grid_adjacency_counts": (q_grid_adjacency, SQL_GRID_ADJACENCY),
    "grid_connectivity": (q_grid_connectivity, SQL_GRID_CONNECTIVITY),
    "zscore_by_user": (q_zscore_by_user, SQL_ZSCORE_BY_USER),
    "winsorize_by_type": (q_winsorize_by_type, SQL_WINSORIZE_BY_TYPE),
    "target_encode_expanding": (q_target_encode, SQL_TARGET_ENCODE),
    "robust_z_by_type": (q_robust_z, SQL_ROBUST_Z),
    "quantile_bins_10": (q_quantile_bins, SQL_QUANTILE_BINS),
    "pit_multi_window_1d_7d_30d": (q_pit_multi_window, SQL_PIT_MULTI_WINDOW),
    "ann_ivf_trained_topk": (q_ann_ivf_trained, SQL_ANN_IVF_TRAINED),
    "ann_ivf_multiprobe": (q_ann_ivf_multiprobe, _ivf_multiprobe_sql()),
    "ann_lsh_multiprobe_r1": (q_ann_lsh_multiprobe, _ann_lsh_multiprobe_sql()),
    "cv_grid_pick": (q_cv_grid_pick, _cv_grid_sql()),
    "token_loss_mask": (q_token_loss_mask, SQL_TOKEN_LOSS_MASK),
    "largest_component_grid": (q_largest_component, SQL_LARGEST_COMPONENT),
    "semantic_dedup_survivors": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "tumbling_rate_5m": (q_tumbling_rate, SQL_TUMBLING_RATE),
    "scd2_feature_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "ann_lsh_topk_batch": (q_ann_lsh_batch, _ann_lsh_batch_sql()),
    "most_ambiguous_pick": (q_most_ambiguous, _most_ambiguous_sql()),
    "asof_backward_multikey_3d": (q_asof_multikey, SQL_ASOF_MULTIKEY),
    "ann_ivf_topk": (q_ann_ivf_topk, _ivf_sql()),
    "kmeans_train_centroids": (q_kmeans_centroids, SQL_KMEANS_CENTROIDS),
    "kmeans_cluster_sizes": (q_kmeans_sizes, SQL_KMEANS_SIZES),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "c4_line_clean": (q_c4_line_clean, SQL_C4_LINE_CLEAN),
    "encoding_garbage": (q_encoding_garbage, SQL_ENCODING_GARBAGE),
    "stratified_sample_50": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "psi_value_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "salted_join_custorders": (q_salted_join, SQL_SALTED_JOIN),
    "mg_heavy_hitters_top20": (q_mg_heavy_hitters, SQL_MG_HEAVY_HITTERS),
    "negative_samples_2": (q_negative_samples, SQL_NEGATIVE_SAMPLES),
    "interval_lookup_tiers": (q_interval_lookup, SQL_INTERVAL_LOOKUP),
    "profile_events": (q_profile_events, SQL_PROFILE_EVENTS),
    "ewma_by_user": (q_ewma_by_user, SQL_EWMA_BY_USER),
    "token_budget_mix": (q_token_budget_mix, SQL_TOKEN_BUDGET_MIX),
    "cusum_by_user": (q_cusum_by_user, SQL_CUSUM_BY_USER),
    "funnel_signup_view_purchase": (q_funnel, SQL_FUNNEL),
    "rollup_source_lang": (q_rollup_source_lang, SQL_ROLLUP_SOURCE_LANG),
    "pivot_event_counts": (q_pivot_event_counts, SQL_PIVOT_EVENT_COUNTS),
    "flag_predicate_counts": (q_flag_predicate, SQL_FLAG_PREDICATE),
    "grid_transect_runs": (q_transect_runs, SQL_TRANSECT_RUNS),
    "grid_contagion_clumpiness": (q_contagion_clumpiness, SQL_CONTAGION_CLUMPINESS),
    "grid_patch_metrics": (q_patch_metrics, SQL_PATCH_METRICS),
    "grid_patch_rejection": (q_patch_rejection, SQL_PATCH_REJECTION),
    "grid_patch_connectivity": (q_patch_connectivity, SQL_PATCH_CONNECTIVITY),
    "diversity_pick_farthest": (q_diversity_pick, _diversity_pick_sql()),
    "token_chunk_windows": (q_token_chunks, SQL_TOKEN_CHUNKS),
    "token_pack_capacity": (q_token_packing, SQL_TOKEN_PACKING),
    "length_bucket_padding": (q_length_buckets, SQL_LENGTH_BUCKETS),
    "decontaminate_bloom_8g": (q_decontaminate_bloom, SQL_DECON_BLOOM),
    "incremental_state_roll": (q_incremental_state_roll, SQL_INCREMENTAL_ROLL),
    "token_pack_manifest": (q_pack_manifest, SQL_PACK_MANIFEST),
    "token_vocab_topk": (q_token_vocab, SQL_TOKEN_VOCAB),
    "token_bigrams_topk": (q_token_bigrams, SQL_TOKEN_BIGRAMS),
    "token_repetition_stats": (q_token_repetition, SQL_TOKEN_REPETITION),
    "token_dup_ngram_spans": (q_dup_ngram_spans, SQL_DUP_NGRAM),
    "token_decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "token_tfidf_topk": (q_tfidf_topk, SQL_TFIDF),
    "dataset_split_counts": (q_dataset_split, SQL_DATASET_SPLIT),
    "split_leakage_pairs": (q_split_leakage, SQL_SPLIT_LEAKAGE),
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "shuffle_order": (q_shuffle_order, SQL_SHUFFLE_ORDER),
    "bpe_merge_table": (q_bpe_merge_table, None),
    "bpe_sampled_apply_256": (q_bpe_sampled_apply, None),
    "bpe_encode_sampled_512": (q_bpe_encode_sampled, None),
    "flagship_feature_table_synth": (q_flagship_synth, None),
    "nonreuse_pairs_synth": (q_nonreuse_pairs_synth, None),
    "asof_backward_7d": (q_asof_backward, SQL_ASOF_BACKWARD),
    "asof_forward_1d": (q_asof_forward, SQL_ASOF_FORWARD),
    "asof_nearest_12h": (q_asof_nearest, SQL_ASOF_NEAREST),
    "pit_two_table_features": (q_pit_two_table, SQL_PIT_TWO_TABLE),
    "pit_window_agg_7d": (q_pit_window_agg, SQL_PIT_WINDOW_AGG),
    "window_ffill": (q_ffill, SQL_FFILL),
    "window_lag_lead": (q_lag_lead, SQL_LAG_LEAD),
    "window_rolling_mean": (q_rolling_mean, SQL_ROLLING),
    "window_rolling_median": (q_rolling_median, SQL_ROLLING_MEDIAN),
    "sessionize_30m": (q_sessionize, SQL_SESSIONIZE),
    "session_summary_30m": (q_session_summary, SQL_SESSION_SUMMARY),
    "run_length_type": (q_run_length, SQL_RUN_LENGTH),
    "stx_stats_by_type": (q_stx_by_type, SQL_STX),
    "interval_pairs_1h_24h": (q_interval_pairs, SQL_INTERVAL_PAIRS),
    "grid_bucket_counts": (q_grid_bucket, SQL_GRID_BUCKET),
    "topk_by_value": (q_topk, SQL_TOPK),
    "topk_per_source": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "deterministic_sample": (q_sample, SQL_SAMPLE),
    "json_extract_agg": (q_json_extract, SQL_JSON),
    "normalize_value": (q_normalize, SQL_NORMALIZE),
    "tpch_q1_pricing": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3_top10": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5_nation_revenue": (q_tpch_q5ish, SQL_TPCH_Q5),
    "broadcast_region_counts": (q_region_counts, SQL_REGION_COUNTS),
    "masked_counts": (q_masked_counts, SQL_MASKED_COUNTS),
    "custdist_outer_join": (q_custdist_outer, SQL_CUSTDIST),
    "semi_anti_join_counts": (q_semi_anti, SQL_SEMI_ANTI),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "minhash_dedup_survivors": (q_dedup_survivors, SQL_DEDUP_SURVIVORS),
    "minhash_jaccard_estimates": (q_minhash_estimates, SQL_MINHASH_ESTIMATES),
    "unigram_logprob_quality": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "source_kl_divergence": (q_source_kl, SQL_SOURCE_KL),
    "zipf_slope_by_source": (q_zipf_slope, SQL_ZIPF_SLOPE),
    "oov_rate_top1000": (q_oov_rate, SQL_OOV_RATE),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "lang_guess": (q_lang_guess, SQL_LANG_GUESS),
    "fingerprint_md5": (q_fingerprint, SQL_FINGERPRINT),
    "ngram_jaccard_pairs": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "curation_survivors": (q_curation, SQL_CURATION),
    "curation_decontaminated": (q_curation_decontaminated, SQL_CURATION_DECON),
    "training_windows_e2e": (q_training_windows, SQL_TRAINING_WINDOWS),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH_SIG),
    "minhash_band_candidates": (q_minhash_candidates, SQL_MINHASH_CAND),
    "simhash16": (q_simhash, _simhash_sql()),
    "embedding_cosine_topk": (q_embedding_topk, SQL_EMB_TOPK),
    "embedding_quantized_topk": (q_quantized_topk, SQL_QUANTIZED_TOPK),
    "embedding_neardup_pairs": (q_embedding_neardup, SQL_EMB_NEARDUP),
    "multimodal_decode_meta": (q_multimodal_meta, SQL_MULTIMODAL),
    "multimodal_frame_sample": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "window_bfill": (q_bfill, SQL_BFILL),
    "nsphere_decomposition": (q_nsphere, SQL_NSPHERE),
    "embedding_centroid": (q_embedding_centroid, SQL_EMB_CENTROID),
    "source_dictionary": (q_source_dictionary, SQL_SOURCE_DICT),
    "staircase_count": (q_staircase, SQL_STAIRCASE),
    "date_parse_roundtrip": (q_date_roundtrip, SQL_DATE_ROUNDTRIP),
    "linear_score": (q_linear_score, _linear_score_sql()),
    "rolling_time_range_1h": (q_rolling_time_range, SQL_ROLLING_TIME),
    "session_window_native": (q_session_window_native, SQL_SESSION_WINDOW_NATIVE),
    "salted_agg_by_user": (q_salted_agg, SQL_SALTED_AGG),
    "ann_lsh_topk": (q_ann_lsh_topk, _ann_lsh_sql()),
    "embedding_neardup_lsh": (q_embedding_neardup_lsh, _neardup_lsh_sql()),
    "nan_validity_filter": (q_nan_validity, SQL_NAN_VALIDITY),
    "pit_decay_features_1d": (q_pit_decay_features, SQL_PIT_DECAY),
    "asof_lag3_features": (q_asof_lag3, SQL_ASOF_LAG3),
    "ngram_containment_pairs": (q_ngram_containment, SQL_NGRAM_CONTAINMENT),
    "hard_negatives_top2": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "epoch_allocation_50k": (q_epoch_allocation, SQL_EPOCH_ALLOCATION),
    "pit_decay_prefix_1d": (q_pit_decay_prefix, SQL_PIT_DECAY_PREFIX),
    "block_dedup_16w": (q_block_dedup, SQL_BLOCK_DEDUP),
    "ddsketch_p50_p90_p99": (q_ddsketch_quantiles, SQL_DDSKETCH),
    "weighted_sample_50": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "pq_adc_topk_10": (q_pq_adc_topk, _pq_sql()),
    "ivfpq_adc_topk_10": (q_ivfpq_topk, _ivfpq_sql()),
    "pq_trained_adc_topk_10": (q_pq_trained_topk, None),
    "tokenizer_fertility": (q_tokenizer_fertility, SQL_TOKENIZER_FERTILITY),
    "bpe_roundtrip_256": (q_bpe_roundtrip, None),
    # -- r5 tail additions (never in the first-50 driver sample; exact
    #    oracles verified by the local mirror; r6 rotation candidates) --
    "embedding_gram_16": (q_embedding_gram, SQL_EMBEDDING_GRAM),
    "pca_project_k8": (q_pca_project, None),
    "corr_matrix_lineitem": (q_corr_matrix, SQL_CORR_MATRIX),
    "changepoint_user_w8": (q_changepoint_user, SQL_CHANGEPOINT_USER),
    "prefix_cache_share_8": (q_prefix_cache, SQL_PREFIX_CACHE),
    "interval_overlap_pairs": (q_interval_overlap, SQL_INTERVAL_OVERLAP),
    "pack_attention_stats_128": (q_pack_attention, SQL_PACK_ATTENTION),
    "kneser_ney_quality": (q_kneser_ney, SQL_KNESER_NEY),
    "doremi_domain_weights": (q_doremi, _doremi_sql()),
    "rho_select_top100": (q_rho_select, SQL_RHO_SELECT),
    "sa_longest_dup": (q_sa_longest_dup, SQL_SA_LONGEST_DUP),
    "sa_dup_coverage_16": (q_sa_dup_coverage, SQL_SA_DUP_COVERAGE),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: point-in-time correct
    as-of feature lookup (clicks -> latest prior purchase, 7d tolerance)."""
    return q_asof_backward(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
