"""signal.py: EWMA fold vs a sequential Python oracle; CUSUM telescoped
window form vs the textbook recurrence."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from esa_pfa_spark.operators.signal import cusum_by_key, ewma_by_key

T0 = dt.datetime(2024, 1, 1)


def _df(spark, series: dict[str, list[float]]):
    rows = [
        (k, T0 + dt.timedelta(minutes=i), i, float(v))
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity_id", "ts", "rid", "value"])
    )


def test_ewma_matches_sequential(spark):
    rng = np.random.default_rng(2)
    series = {f"k{i}": rng.normal(10, 3, rng.integers(1, 40)).tolist() for i in range(12)}
    out = {
        r["entity_id"]: r
        for r in ewma_by_key(
            _df(spark, series), tiebreak="rid", alpha=0.25
        ).collect()
    }
    for k, vs in series.items():
        s = vs[0]
        for x in vs[1:]:
            s = s * 0.75 + 0.25 * x
        assert out[k]["ewma"] == pytest.approx(s, abs=1e-6)
        assert out[k]["n"] == len(vs)


def test_cusum_matches_recurrence(spark):
    rng = np.random.default_rng(4)
    series = {
        "flat": rng.normal(0, 1, 60).tolist(),
        "drift": (rng.normal(0, 1, 30).tolist() + rng.normal(3, 1, 30).tolist()),
        "single": [5.0],
    }
    out = {
        r["entity_id"]: r
        for r in cusum_by_key(
            _df(spark, series), tiebreak="rid", target=0.0, slack=0.5
        ).collect()
    }
    for k, vs in series.items():
        s, smax = 0.0, 0.0
        for x in vs:
            s = max(0.0, s + (x - 0.5))
            smax = max(smax, s)
        assert out[k]["cusum_max"] == pytest.approx(smax, abs=1e-4), k
    # the drifted series must alarm far above the flat one
    assert out["drift"]["cusum_max"] > out["flat"]["cusum_max"] + 10


def test_trend_matches_polyfit(spark):
    # slope/intercept/R^2 per key must match numpy's least squares on the
    # same (seconds-since-origin, value) points; degenerate keys drop or
    # null exactly as documented.
    rng = np.random.default_rng(7)
    series = {
        "lin": [2.0 + 0.5 * i for i in range(50)],               # exact line
        "noisy": (2.0 + 0.1 * np.arange(80) + rng.normal(0, 1, 80)).tolist(),
        "flat": [3.25] * 20,                                      # zero slope, R^2 undefined
        "single": [9.0],                                          # dropped (n < 2)
        "rand": rng.normal(0, 5, 40).tolist(),
    }
    df = _df(spark, series).withColumnRenamed("entity_id", "user_id")
    from esa_pfa_spark.operators.signal import trend_by_key

    out = {r["user_id"]: r for r in trend_by_key(df).collect()}
    assert "single" not in out  # n < 2: time-variance is zero, row dropped
    for k, vs in series.items():
        if k == "single":
            continue
        # x in DAYS since the origin, y rounded to the 6dp micro-unit grid
        x = np.array([(T0 - dt.datetime(2024, 1, 1)).total_seconds() + 60.0 * i
                      for i in range(len(vs))]) / 86400.0
        y = np.round(np.array(vs), 6)
        slope, intercept = np.polyfit(x, y, 1)
        r = out[k]
        assert r["n_events"] == len(vs)
        assert r["slope_per_day"] == pytest.approx(slope, abs=1e-4), k
        assert r["intercept"] == pytest.approx(intercept, abs=1e-4), k
        if k == "flat":
            assert r["r2"] is None
        else:
            ss_res = float(np.sum((y - (slope * x + intercept)) ** 2))
            ss_tot = float(np.sum((y - y.mean()) ** 2))
            assert r["r2"] == pytest.approx(1 - ss_res / ss_tot, abs=1e-6), k


def test_gap_stats_matches_numpy(spark):
    # per-key gap count/mean/min/max/std (population) + burstiness vs a
    # numpy oracle on irregular random timelines; single-event keys drop,
    # all-duplicate-timestamp keys null out burstiness.
    rng = np.random.default_rng(11)
    rows = []
    gaps_true: dict[str, np.ndarray] = {}
    for i, n in enumerate([1, 2, 5, 40, 40]):
        k = f"u{i}"
        secs = np.sort(rng.integers(0, 3_000_000, n))
        rows += [(k, T0 + dt.timedelta(seconds=int(s)), j, 0.0) for j, s in enumerate(secs)]
        if n >= 2:
            gaps_true[k] = np.diff(np.sort(secs)).astype(np.float64)
    rows += [("dup", T0, 0, 0.0), ("dup", T0, 1, 0.0), ("dup", T0, 2, 0.0)]
    gaps_true["dup"] = np.zeros(2)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value"])
    )
    from esa_pfa_spark.operators.signal import gap_stats_by_key

    out = {r["user_id"]: r for r in gap_stats_by_key(df).collect()}
    assert "u0" not in out  # single event: no gaps
    for k, g in gaps_true.items():
        r = out[k]
        assert r["n_gaps"] == len(g)
        assert r["gap_mean_s"] == pytest.approx(g.mean(), abs=1e-6)
        assert r["gap_min_s"] == pytest.approx(g.min(), abs=1e-6)
        assert r["gap_max_s"] == pytest.approx(g.max(), abs=1e-6)
        assert r["gap_std_s"] == pytest.approx(g.std(), abs=1e-6), k  # population
        mu, sd = g.mean(), g.std()
        if sd + mu == 0:
            assert r["burstiness"] is None
        else:
            assert r["burstiness"] == pytest.approx((sd - mu) / (sd + mu), abs=1e-6)


def test_acf_matches_numpy(spark):
    # ACF at lags 1..3 vs np.corrcoef on the ordered sequence; the
    # alternating series must be strongly negative at lag 1, positive at 2.
    rng = np.random.default_rng(21)
    series = {
        "alt": [float((-1) ** i) + rng.normal(0, 0.05) for i in range(60)],
        "walk": np.cumsum(rng.normal(0, 1, 80)).tolist(),
        "noise": rng.normal(0, 1, 70).tolist(),
        "const": [2.5] * 30,  # zero variance: dropped at every lag
    }
    df = _df(spark, series).withColumnRenamed("entity_id", "user_id")
    from esa_pfa_spark.operators.signal import acf_by_key

    out = {
        (r["user_id"], r["lag"]): r
        for r in acf_by_key(
            df, ts_col="ts", value_col="value", tiebreak="rid", lags=(1, 2, 3)
        ).collect()
    }
    assert not any(k == "const" for k, _ in out)
    for k, vs in series.items():
        if k == "const":
            continue
        y = np.round(np.array(vs), 6)  # the 6dp micro-unit grid
        for lag in (1, 2, 3):
            r = out[(k, lag)]
            assert r["n_pairs"] == len(vs) - lag
            expect = float(np.corrcoef(y[:-lag], y[lag:])[0, 1])
            assert r["acf"] == pytest.approx(expect, abs=1e-6), (k, lag)
    assert out[("alt", 1)]["acf"] < -0.9 and out[("alt", 2)]["acf"] > 0.9


def test_behavior_profile_hand_computed(spark):
    import math

    from esa_pfa_spark.operators.signal import behavior_profile_by_key

    rows = (
        [("a", "x")] * 6 + [("a", "y")] * 3 + [("a", "z")] * 1
        + [("b", "x")] * 4                      # single-type user
        + [("c", "p")] * 2 + [("c", "q")] * 2   # tie -> lexically smallest
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "event_type"]))
    out = {r["user_id"]: r for r in behavior_profile_by_key(df).collect()}
    h_a = sum(round(-(c / 10) * math.log(c / 10), 6) for c in (6, 3, 1))
    assert out["a"]["n_events"] == 10 and out["a"]["n_types"] == 3
    assert out["a"]["type_entropy"] == pytest.approx(h_a, abs=1e-9)
    assert out["a"]["type_entropy_norm"] == pytest.approx(h_a / math.log(3), abs=1e-6)
    assert out["a"]["top_type"] == "x" and out["a"]["top_share"] == 0.6
    assert out["b"]["type_entropy"] == 0.0 and out["b"]["type_entropy_norm"] is None
    assert out["c"]["top_type"] == "p"  # tie at 2-2 resolves lexically


def test_seasonality_strength_extremes(spark):
    from esa_pfa_spark.operators.signal import seasonality_strength_by_key

    rng = np.random.default_rng(9)
    rows = []
    # "daily": value is a pure function of hour -> eta2 == 1
    for d in range(5):
        for h in range(24):
            rows.append(("daily", dt.datetime(2024, 1, 1 + d, h), float(h % 4)))
    # "flat-ish": value independent of hour -> eta2 near 0
    for d in range(5):
        for h in range(24):
            rows.append(("noisy", dt.datetime(2024, 1, 1 + d, h), float(rng.normal(0, 1))))
    # "const": zero total variance -> dropped
    for h in range(10):
        rows.append(("const", dt.datetime(2024, 1, 1, h), 7.0))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts", "value"]))
    out = {r["user_id"]: r for r in seasonality_strength_by_key(df).collect()}
    assert "const" not in out
    assert out["daily"]["eta2_hour"] == 1.0
    assert out["noisy"]["eta2_hour"] < 0.35
    # numpy cross-check on the noisy one: eta2 = SSB/SST
    vals = [r[2] for r in rows if r[0] == "noisy"]
    hours = [r[1].hour for r in rows if r[0] == "noisy"]
    y = np.round(np.array(vals), 6)
    hh = np.array(hours)
    mean = y.mean()
    ssb = sum(
        len(y[hh == h]) * (y[hh == h].mean() - mean) ** 2 for h in set(hours)
    )
    sst = ((y - mean) ** 2).sum()
    assert out["noisy"]["eta2_hour"] == pytest.approx(ssb / sst, abs=1e-4)


def test_entity_snapshot_full_outer_semantics(spark):
    """A single-event entity has no trend/gaps but must still appear with
    its diversity block populated; the joins never drop entities."""
    from esa_pfa_spark.plans.snapshot import entity_feature_snapshot

    rows = [
        ("solo", T0, 0, 5.0, "click"),
        ("duo", T0, 1, 1.0, "click"),
        ("duo", T0 + dt.timedelta(hours=1), 2, 2.0, "view"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value", "event_type"])
    )
    out = {r["user_id"]: r for r in entity_feature_snapshot(df).collect()}
    assert set(out) == {"solo", "duo"}
    s = out["solo"]
    assert s["slope_per_day"] is None and s["n_gaps"] is None
    assert s["n_events_total"] == 1 and s["top_type"] == "click"
    d = out["duo"]
    assert d["n_gaps"] == 1 and d["slope_per_day"] is not None
    assert d["n_types"] == 2
