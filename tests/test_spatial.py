"""2-D grid metrics: hand-counted goldens in the reference's test style
(AggregationMetricsTest.java:27-120 / ConnectivityMetricsTest.java)."""

import pandas as pd
import pytest

from esa_pfa_spark.operators import spatial as SP


def _grid(spark, cells):
    pdf = pd.DataFrame(cells, columns=["x", "y", "flag"])
    return spark.createDataFrame(pdf)


def test_adjacency_counts_2x2_diagonal(spark):
    """Checkerboard 2x2: hand-counted ordered 8-neighbor pairs:
    n11=2 (the two set cells see each other), n00=2, n01=n10=4."""
    g = _grid(spark, [(0, 0, True), (1, 0, False), (0, 1, False), (1, 1, True)])
    row = SP.adjacency_counts(g).collect()[0]
    assert (row["n00"], row["n01"], row["n10"], row["n11"]) == (2, 4, 4, 2)
    # invariant: p01 == p10 (AggregationMetricsTest)
    assert row["n01"] == row["n10"]


def test_contagion_all_set_is_one(spark):
    g = _grid(spark, [(x, y, True) for x in range(3) for y in range(3)])
    m = SP.contagion_clumpiness(g)
    assert m["contagion"] == pytest.approx(1.0)
    assert m["n00"] == m["n01"] == m["n10"] == 0


def test_clumpiness_dispersed_negative(spark):
    g = _grid(spark, [(0, 0, True), (1, 0, False), (0, 1, False), (1, 1, True)])
    m = SP.contagion_clumpiness(g)
    # G = 2/6 = 1/3 < p = 1/2 -> clump = (1/3 - 1/2)/(1/2) = -1/3
    assert m["clumpiness"] == pytest.approx(-1 / 3)


def test_connectivity_3x3_full(spark):
    """3x3 all set: only the center has 4 set neighbors ->
    inside=1, border=8, fractal = 2 - 1/9 (ConnectivityMetrics golden)."""
    g = _grid(spark, [(x, y, True) for x in range(3) for y in range(3)])
    row = SP.connectivity_metrics(g).collect()[0]
    assert (row["occupied"], row["inside"], row["border"]) == (9, 1, 8)
    assert row["fractal_index"] == pytest.approx(2 - 1 / 9)


def test_connected_components_two_blobs(spark):
    g = _grid(
        spark,
        [(0, 0, True), (0, 1, True), (1, 1, True), (5, 5, True), (3, 3, False)],
    )
    cc = SP.connected_components(g).toPandas()
    assert len(cc) == 4
    assert cc.groupby("component").size().sort_values(ascending=False).tolist() == [3, 1]
    top = SP.largest_component(g).collect()[0]
    assert (top["max_cluster_size"], top["num_samples"]) == (3, 4)


def test_connected_components_snake(spark):
    """A long connected path must converge via label propagation."""
    cells = [(i, 0, True) for i in range(12)] + [(11, j, True) for j in range(1, 6)]
    cc = SP.connected_components(_grid(spark, cells)).toPandas()
    assert cc["component"].nunique() == 1
    assert len(cc) == 17


def test_transect_max_runs_hand_counted(spark):
    """5x5 grid, transects = row y=2 and column x=3 (step 5).
    Row y=2 set cells at x in {0,1,3} -> runs [2,1], max 2.
    Column x=3 set cells at y in {2,3,4} -> one run of 3, max 3."""
    cells = []
    for x in range(5):
        for y in range(5):
            flag = (y == 2 and x in (0, 1, 3)) or (x == 3 and y in (2, 3, 4))
            cells.append((x, y, flag))
    per = {r["tid"]: r["max_run"] for r in SP.transect_max_runs(_grid(spark, cells)).collect()}
    assert per == {"r2": 2, "c3": 3}


def test_transect_missing_cell_breaks_run(spark):
    """A missing cell (no row in the table) breaks a run exactly like an
    unset one: row y=2 has set cells at x=0,1 and x=3,4 with x=2 ABSENT."""
    cells = [(x, 2, True) for x in (0, 1, 3, 4)]
    per = {r["tid"]: r["max_run"] for r in
           SP.transect_max_runs(_grid(spark, cells), step=5, row_off=2, col_off=99).collect()}
    assert per == {"r2": 2}


def test_transect_empty_transect_counts_zero(spark):
    """Transects with no set cell appear with max_run=0 (the reference's
    mean/sigma includes empty transects)."""
    cells = [(x, 2, False) for x in range(4)] + [(x, 7, True) for x in range(4)]
    m = SP.transect_run_stats(_grid(spark, cells), step=5, row_off=2, col_off=99).collect()[0]
    assert m["n_transects"] == 2  # y=2 (all unset) and y=7 (run of 4)
    assert m["mean_max_run"] == pytest.approx(2.0)  # (0 + 4) / 2


def test_contagion_clumpiness_df_matches_dict(spark):
    """The oracle-checkable DataFrame form must equal the original
    driver-side dict computation on the same grid."""
    cells = [(x, y, (x * 3 + y * 5) % 4 == 0) for x in range(6) for y in range(5)]
    g = _grid(spark, cells)
    want = SP.contagion_clumpiness(g)
    row = SP.contagion_clumpiness_df(g).collect()[0]
    for k in ("n00", "n01", "n10", "n11"):
        assert row[k] == want[k]
    assert row["contagion"] == pytest.approx(want["contagion"])
    assert row["clumpiness"] == pytest.approx(want["clumpiness"])


def test_patch_metrics_boundary_exclusion(spark):
    """Two set cells adjacent ACROSS a patch boundary (x=1 vs x=2, patch=2)
    must not see each other — each patch is its own raster, as in the
    reference's per-patch AggregationMetrics."""
    cells = [(x, 0, x in (1, 2)) for x in range(4)]  # patches {0,1} and {2,3}
    rows = {(r["px"], r["py"]): r for r in
            SP.patch_metrics(_grid(spark, cells), patch=2).collect()}
    # patch 0: cells (0,F),(1,T) -> ordered pairs: (F,T),(T,F) -> n01=n10=1, n11=0
    p0 = rows[(0, 0)]
    assert (p0["n00"], p0["n01"], p0["n10"], p0["n11"]) == (0, 1, 1, 0)
    # patch 1: cells (2,T),(3,F) -> mirror
    p1 = rows[(1, 0)]
    assert (p1["n00"], p1["n01"], p1["n10"], p1["n11"]) == (0, 1, 1, 0)
    # no n11 anywhere: the set-set adjacency straddles the boundary
    assert all(r["n11"] == 0 for r in rows.values())


def test_patch_metrics_matches_global_when_one_patch(spark):
    """With the patch bigger than the grid, per-patch == global metrics."""
    cells = [(x, y, (x + y) % 3 == 0) for x in range(4) for y in range(4)]
    g = _grid(spark, cells)
    per = SP.patch_metrics(g, patch=100).collect()
    assert len(per) == 1
    want = SP.contagion_clumpiness_df(g).collect()[0]
    got = per[0]
    for k in ("n00", "n01", "n10", "n11"):
        assert got[k] == want[k]
    assert got["contagion"] == pytest.approx(want["contagion"])
    assert got["clumpiness"] == pytest.approx(want["clumpiness"])


def test_patch_rejection_ordering_semantics(spark):
    """The reference's rejection order: ratio < 0.2 rejects regardless of
    clumpiness; ratio in [0.2, 0.5) consults clumpiness; ratio >= 0.5
    accepts regardless."""
    # patch (0,0): 1/4 set, dispersed (clump < 0) -> rejected by the gate
    # patch (1,0): 4/4 set -> accepted (ratio >= 0.5)
    # patch (2,0): 0/4 set -> rejected (ratio < 0.2)
    cells = (
        [(0, 0, True), (1, 0, False), (0, 1, False), (1, 1, False)]
        + [(x, y, True) for x in (2, 3) for y in (0, 1)]
        + [(x, y, False) for x in (4, 5) for y in (0, 1)]
    )
    rows = {(r["px"], r["py"]): r for r in
            SP.patch_rejection(_grid(spark, cells), patch=2,
                               min_valid_ratio=0.2, min_clumpiness=0.0,
                               clumpiness_gate_ratio=0.5).collect()}
    assert not rows[(0, 0)]["accepted"]
    assert rows[(1, 0)]["accepted"]
    assert not rows[(2, 0)]["accepted"]


def test_patch_connectivity_edge_cells_not_inside(spark):
    """3x3 all-set patch alone: center is inside (8 occupied border);
    a second patch whose cells touch the first across the boundary must
    not gain inside cells from it."""
    cells = [(x, y, True) for x in range(3) for y in range(3)]
    cells += [(3, y, True) for y in range(3)]  # column in the next patch (patch=3)
    rows = {(r["px"], r["py"]): r for r in
            SP.patch_connectivity(_grid(spark, cells), patch=3).collect()}
    p0 = rows[(0, 0)]
    assert (p0["occupied"], p0["inside"], p0["border"]) == (9, 1, 8)
    assert p0["fractal_index"] == pytest.approx(2 - 1 / 9)
    p1 = rows[(1, 0)]
    assert (p1["occupied"], p1["inside"]) == (3, 0)  # a 1-wide strip has no inside
