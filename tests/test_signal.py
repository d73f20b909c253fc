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
