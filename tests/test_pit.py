"""pit_window_agg: windowed PIT aggregation features.

Boundary semantics pinned by hand-built goldens (half-open window:
inclusive end, exclusive start; deterministic last under ts collisions),
equivalence vs a brute-force interval-join oracle on seeded random data,
and the plan shape (ONE exchange total: the fused fill hash-partitions
by the key and the closing hash agg reuses that distribution —
independent of window density and, for the multi-window form, of the
horizon count).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.operators.pit import pit_window_agg
from tests.test_plans import n_exchanges, plan_of

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _mk(spark, probes, obs):
    p = spark.createDataFrame(
        pd.DataFrame(probes, columns=["pid", "k", "query_ts"])
    )
    o = spark.createDataFrame(
        pd.DataFrame(obs, columns=["k", "ts", "value", "oid"])
    )
    return p, o


def _run(spark, probes, obs, window=dt.timedelta(hours=1)):
    p, o = _mk(spark, probes, obs)
    out = pit_window_agg(
        p, o, on="k", probe_ts="query_ts", obs_ts="ts",
        value="value", tiebreak="oid", window=window,
    )
    return {r["pid"]: r for r in out.collect()}


def test_half_open_boundaries(spark):
    # window (query_ts-1h, query_ts]: obs exactly at the end included,
    # exactly at the start excluded
    rows = _run(
        spark,
        probes=[(1, "a", T0)],
        obs=[
            ("a", T0, 10.0, 1),                          # at end -> in
            ("a", T0 - dt.timedelta(hours=1), 5.0, 2),   # at start -> OUT
            ("a", T0 - dt.timedelta(minutes=30), 2.0, 3),
            ("a", T0 + dt.timedelta(seconds=1), 99.0, 4),  # future -> out
        ],
    )
    r = rows[1]
    assert r["n_win"] == 2
    assert r["sum_win"] == pytest.approx(12.0)
    assert r["mean_win"] == pytest.approx(6.0)
    assert r["last_val"] == pytest.approx(10.0)


def test_empty_window_yields_nulls(spark):
    rows = _run(
        spark,
        probes=[(1, "a", T0), (2, "b", T0)],
        obs=[("a", T0 - dt.timedelta(days=2), 7.0, 1)],
    )
    for pid in (1, 2):
        r = rows[pid]
        assert r["n_win"] == 0
        assert r["sum_win"] is None and r["mean_win"] is None
        assert r["last_val"] is None and r["last_ts"] is None


def test_last_deterministic_under_ts_collision(spark):
    # two obs at the identical timestamp: last = the max tiebreak
    rows = _run(
        spark,
        probes=[(1, "a", T0)],
        obs=[("a", T0, 1.0, 10), ("a", T0, 2.0, 7), ("a", T0, 3.0, 12)],
    )
    assert rows[1]["last_val"] == pytest.approx(3.0)  # oid 12 wins
    assert rows[1]["n_win"] == 3


def test_stale_last_not_leaked(spark):
    # an obs BEFORE the window must not surface as last_val even though
    # the backward fill carries it to the end row
    rows = _run(
        spark,
        probes=[(1, "a", T0)],
        obs=[("a", T0 - dt.timedelta(hours=2), 42.0, 1)],
    )
    assert rows[1]["n_win"] == 0 and rows[1]["last_val"] is None


def test_matches_bruteforce_interval_join(spark):
    rng = np.random.default_rng(7)
    n_obs, n_probe = 2000, 400
    keys = rng.integers(0, 20, n_obs)
    obs = [
        (f"k{k}", T0 + dt.timedelta(seconds=int(s)), float(v), int(i))
        for i, (k, s, v) in enumerate(
            zip(keys, rng.integers(0, 86400, n_obs), rng.normal(50, 10, n_obs))
        )
    ]
    probes = [
        (int(i), f"k{int(k)}", T0 + dt.timedelta(seconds=int(s)))
        for i, (k, s) in enumerate(
            zip(rng.integers(0, 22, n_probe), rng.integers(0, 90000, n_probe))
        )
    ]
    w = dt.timedelta(hours=3)
    got = _run(spark, probes, obs, window=w)

    by_key: dict[str, list] = {}
    for k, ts, v, oid in obs:
        by_key.setdefault(k, []).append((ts, oid, v))
    for pid, k, qts in probes:
        hits = [
            (ts, oid, v)
            for ts, oid, v in by_key.get(k, [])
            if qts - w < ts <= qts
        ]
        r = got[pid]
        assert r["n_win"] == len(hits)
        if hits:
            # the operator accumulates decimal(18,6): each value quantized
            # at 1e-6, so the sum may drift up to 0.5e-6 * n from raw doubles
            q = 1e-6 * (len(hits) + 1)
            assert r["sum_win"] == pytest.approx(sum(h[2] for h in hits), abs=q)
            assert r["mean_win"] == pytest.approx(
                sum(h[2] for h in hits) / len(hits), abs=q
            )
            last = max(hits)  # (ts, oid) lexicographic = ts then tiebreak
            assert r["last_val"] == pytest.approx(last[2])
            assert r["last_ts"] == last[0]
        else:
            assert r["sum_win"] is None and r["last_val"] is None


def test_plan_single_exchange_and_no_join(spark):
    """The 100 TB shape: ONE Exchange total — the fused cumulative fill
    hash-partitions by the key, and the per-probe hash agg's group keys
    include that key, so its ClusteredDistribution is already satisfied
    (no re-shuffle).  No join node — cost is independent of
    observations-per-window (the interval-join alternative is O(pairs))."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("query_ts")
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("oid")
    )
    out = pit_window_agg(
        probes, obs, on="user_id", probe_ts="query_ts", obs_ts="ts",
        value="value", tiebreak="oid", window=dt.timedelta(days=7),
    )
    plan = plan_of(out)
    assert n_exchanges(plan) == 1, plan
    assert "Join" not in plan, "difference-of-cumulatives must not plan a join"


def test_multi_window_matches_single_per_horizon(spark):
    """Every horizon of the multi-window plan must equal the single-window
    operator run separately — and the fused plan must still be ONE
    exchange with no join."""
    import datetime as dt

    from esa_pfa_spark.operators.pit import pit_multi_window_agg

    rng = __import__("numpy").random.default_rng(9)
    obs_rows = [
        (f"k{int(k)}", T0 + dt.timedelta(minutes=int(m)), float(v), int(i))
        for i, (k, m, v) in enumerate(
            zip(rng.integers(0, 8, 600), rng.integers(0, 5000, 600),
                rng.normal(20, 5, 600))
        )
    ]
    probe_rows = [
        (int(i), f"k{int(k)}", T0 + dt.timedelta(minutes=int(m)))
        for i, (k, m) in enumerate(
            zip(rng.integers(0, 8, 150), rng.integers(0, 5200, 150))
        )
    ]
    p, o = _mk(spark, probe_rows, obs_rows)
    windows = {"1h": dt.timedelta(hours=1), "1d": dt.timedelta(days=1)}
    multi = {
        r["pid"]: r
        for r in pit_multi_window_agg(
            p, o, on="k", probe_ts="query_ts", obs_ts="ts",
            value="value", tiebreak="oid", windows=windows,
        ).collect()
    }
    for nme, w in windows.items():
        single = _run(spark, probe_rows, obs_rows, window=w)
        for pid, r in single.items():
            m = multi[pid]
            assert m[f"n_{nme}"] == r["n_win"], (nme, pid)
            if r["sum_win"] is None:
                assert m[f"sum_{nme}"] is None
            else:
                assert abs(m[f"sum_{nme}"] - r["sum_win"]) < 1e-9

    plan = plan_of(
        pit_multi_window_agg(
            p, o, on="k", probe_ts="query_ts", obs_ts="ts",
            value="value", tiebreak="oid", windows=windows,
        )
    )
    assert n_exchanges(plan) == 1, plan
    assert "Join" not in plan
