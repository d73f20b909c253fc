"""Property tests for the transect run-length sampler: the distributed
gaps-and-islands form must equal a direct numpy run-length oracle on
arbitrary sparse grids (missing cells, all-unset transects, singleton
runs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from esa_pfa_spark.operators.spatial import transect_max_runs

cells_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # x
        st.integers(min_value=0, max_value=9),   # y
        st.booleans(),                            # flag
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),
)


def _oracle(cells, step, row_off, col_off):
    """Sequential numpy oracle: max run of consecutive-position set cells
    per sampled transect; transects sampled from PRESENT cells only."""
    by_row, by_col = {}, {}
    for x, y, f in cells:
        if y % step == row_off:
            by_row.setdefault(y, {})[x] = f
        if x % step == col_off:
            by_col.setdefault(x, {})[y] = f
    out = {}
    for tid_prefix, axis in (("r", by_row), ("c", by_col)):
        for key, posmap in axis.items():
            best = run = 0
            prev = None
            for p in sorted(posmap):
                if posmap[p]:
                    run = run + 1 if prev is not None and p == prev + 1 else 1
                    best = max(best, run)
                    prev = p
                else:
                    prev = None  # unset cell breaks, as does a missing one
            out[f"{tid_prefix}{key}"] = best
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cells=cells_strategy)
def test_transect_max_runs_matches_oracle(spark, cells):
    if not cells:
        return
    pdf = pd.DataFrame(cells, columns=["x", "y", "flag"])
    got = {
        r["tid"]: r["max_run"]
        for r in transect_max_runs(
            spark.createDataFrame(pdf), step=3, row_off=1, col_off=2
        ).collect()
    }
    want = _oracle(cells, 3, 1, 2)
    assert got == want
