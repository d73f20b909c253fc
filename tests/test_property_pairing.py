"""Property tests for the non-reuse two-pointer pairing: the session-sliced
parallel decomposition must be EXACTLY the global sequential sweep on
arbitrary timelines — including adversarial ones with dense runs, exact
tolerance boundaries, and duplicate timestamps."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from esa_pfa_spark.operators.pairing import find_pairs, two_pointer_pairs

BASE = dt.datetime(2024, 1, 1)

# coarse second grid around the [10s, 60s] tolerance band -> boundary hits
obs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # entity
        st.integers(min_value=0, max_value=400),     # ts seconds
    ),
    min_size=0,
    max_size=35,
    unique=True,
)

MIN_TOL = dt.timedelta(seconds=10)
MAX_TOL = dt.timedelta(seconds=60)


def _obs_df(spark, rows):
    pdf = pd.DataFrame(
        [
            {
                "entity_id": f"e{e}",
                "ts": BASE + dt.timedelta(seconds=s),
                "doc_id": f"d{e}_{s}",
                "tokens": [s % 7, (s * 3) % 11, 5],
                "n_tok": 3,
            }
            for e, s in rows
        ],
        columns=["entity_id", "ts", "doc_id", "tokens", "n_tok"],
    )
    schema = "entity_id string, ts timestamp, doc_id string, tokens array<int>, n_tok int"
    return spark.createDataFrame(pdf, schema=schema) if len(pdf) else spark.createDataFrame([], schema)


def _pairs_set(df):
    return {(r.entity_id, r.doc_id1, r.doc_id2) for r in df.select("entity_id", "doc_id1", "doc_id2").collect()}


@given(rows=obs_strategy)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_session_chunked_equals_global_sweep(spark, rows):
    sdf = _obs_df(spark, rows)
    kw = dict(min_tol=MIN_TOL, max_tol=MAX_TOL, min_overlap=0.0)
    plain = _pairs_set(find_pairs(sdf, **kw))
    sliced = _pairs_set(find_pairs(sdf, chunk="session", **kw))
    assert plain == sliced


@given(rows=obs_strategy)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_sweep_matches_python_kernel(spark, rows):
    """Spark output == the pure-python reference kernel per entity."""
    sdf = _obs_df(spark, rows)
    got = _pairs_set(find_pairs(sdf, min_tol=MIN_TOL, max_tol=MAX_TOL, min_overlap=0.0))
    want = set()
    pdf = sdf.toPandas()
    for ent, g in pdf.groupby("entity_id"):
        g = g.sort_values("ts", kind="mergesort").reset_index(drop=True)
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        for i1, i2 in two_pointer_pairs(
            ts_us, int(MIN_TOL.total_seconds() * 1e6), int(MAX_TOL.total_seconds() * 1e6)
        ):
            want.add((ent, g["doc_id"][i1], g["doc_id"][i2]))
    assert got == want


def test_two_pointer_exact_boundaries():
    """dt == min_tol and dt == max_tol are both matches (inclusive bounds,
    FindPatchPairs.java:148-150 semantics)."""
    us = np.array([0, 10_000_000], dtype=np.int64)
    assert two_pointer_pairs(us, 10_000_000, 60_000_000) == [(0, 1)]
    us = np.array([0, 60_000_000], dtype=np.int64)
    assert two_pointer_pairs(us, 10_000_000, 60_000_000) == [(0, 1)]
    us = np.array([0, 60_000_001], dtype=np.int64)
    assert two_pointer_pairs(us, 10_000_000, 60_000_000) == []
