"""Property tests for purged_time_folds and asof_lagk_join invariants on
arbitrary timelines (hypothesis-driven, small Spark jobs per example are
too slow — so examples are BATCHED: hypothesis generates the timeline,
a single parametrized Spark run per seed-set validates the invariant
against a pure-python mirror)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from esa_pfa_spark.operators.dataset import purged_time_folds

BASE = dt.datetime(2024, 1, 1)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k,embargo_s", [(2, 0), (3, 7), (5, 100)])
def test_purged_folds_invariants(spark, seed, k, embargo_s):
    """For random timelines (including duplicate and boundary timestamps):
    every row appears exactly k times; exactly ONE fold marks it 'test';
    the test fold matches the integer geometry; purged implies within
    embargo of the fold range; train implies outside."""
    rng = np.random.default_rng(seed)
    secs = rng.integers(0, 1000, size=40)
    secs[:2] = [0, 999]                      # pin the corpus bounds
    secs[2] = secs[3] = 500                  # duplicate ts
    rows = [(i, BASE + dt.timedelta(seconds=int(s))) for i, s in enumerate(secs)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rid", "ts"]))
    out = purged_time_folds(df, ts="ts", k=k,
                            embargo=dt.timedelta(seconds=embargo_s)).collect()
    assert len(out) == len(rows) * k

    min_us = min(int(ts.timestamp() * 1e6) for _, ts in rows)
    max_us = max(int(ts.timestamp() * 1e6) for _, ts in rows)
    span1 = max_us - min_us + 1
    e_us = embargo_s * 1_000_000
    by_row: dict[int, dict[int, str]] = {}
    for r in out:
        by_row.setdefault(r["rid"], {})[r["fold"]] = r["role"]
    for rid, ts in rows:
        eus = int(ts.timestamp() * 1e6)
        roles = by_row[rid]
        assert len(roles) == k
        tests = [f for f, role in roles.items() if role == "test"]
        assert len(tests) == 1
        assert tests[0] == ((eus - min_us) * k) // span1
        for f, role in roles.items():
            lo = min_us + (f * span1 + k - 1) // k
            hi = min_us + ((f + 1) * span1 + k - 1) // k - 1
            inside = lo - e_us <= eus <= hi + e_us
            if role == "purged":
                assert inside and f != tests[0]
            elif role == "train":
                assert not inside
