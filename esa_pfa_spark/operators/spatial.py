"""2-D grid aggregation metrics over (x, y, flag) cell tables — the
relational re-expression of the reference's raster landscape metrics.

The reference computes these over in-memory boolean rasters; at lakehouse
scale the grid IS a table of cells, so neighbor access is a self-join on
(x±1, y±1) — hash-partitioned, no raster materialization:

* ``adjacency_counts`` / ``contagion`` / ``clumpiness`` — 8-neighbor
  pair counts n00/n01/n10/n11, contagion (entropy of the pair
  distribution, Li & Reynolds 1993) and the clumpiness index
  (pfa-algalblooms/.../AggregationMetrics.java:75-165, A5);
* ``connectivity_metrics`` — 4-neighbor occupied/border/inside counts and
  ``fractalIndex = 2 - inside/(inside + border)``
  (pfa-algalblooms/.../ConnectivityMetrics.java:44-126, A6);
* ``transect_max_runs`` / ``transect_run_stats`` — the transect
  max-run-length mean/σ half of A6
  (pfa-algalblooms/.../ConnectivityMetrics.java:127-164);
* ``connected_components`` — star contraction over the 4-neighbor edge
  list (pfa-sar-fex/.../RegionGrower.java:46-144, A7; shares
  dedup.graph_components — O(log n) rounds, diameter-independent);
  ``largest_component`` gives the reference's maxClusterSize.

Scale note: connected_components builds the neighbor edge list with one
shift-join (each undirected edge once) and contracts it in O(log n)
localCheckpointed rounds — min-label propagation (the earlier form) is
O(blob diameter) join rounds and degrades to minutes the moment one
blob spans the raster.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NEIGH8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
NEIGH4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]


def _neighbor_join(grid: DataFrame, offsets, key_cols=("x", "y")) -> DataFrame:
    """Pairs each cell with every existing neighbor at the given offsets.
    Returns columns (x, y, flag, nx, ny, nflag)."""
    x, y = key_cols
    right = grid.select(
        F.col(x).alias("nx"), F.col(y).alias("ny"), F.col("flag").alias("nflag")
    )
    shifted = grid.withColumn(
        "__off", F.explode(F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets]))
    ).select(
        x, y, "flag",
        (F.col(x) + F.col("__off.dx")).alias("nx"),
        (F.col(y) + F.col("__off.dy")).alias("ny"),
    )
    return shifted.join(right, ["nx", "ny"])


def adjacency_counts(grid: DataFrame) -> DataFrame:
    """Ordered 8-neighbor pair counts n00/n01/n10/n11 over a boolean grid
    (AggregationMetricsTest.java hand-count semantics: each ordered
    cell->neighbor pair counted once)."""
    pairs = _neighbor_join(grid, NEIGH8)
    a = F.col("flag").cast("int")
    b = F.col("nflag").cast("int")
    return pairs.agg(
        F.sum(((1 - a) * (1 - b))).alias("n00"),
        F.sum(((1 - a) * b)).alias("n01"),
        F.sum((a * (1 - b))).alias("n10"),
        F.sum((a * b)).alias("n11"),
    )


def contagion_clumpiness(grid: DataFrame) -> dict:
    """Contagion (1 + sum p*ln(p) / (2*ln 2)) over the 4-cell pair
    distribution and the clumpiness index
    (AggregationMetrics.java:131-164 semantics: clumpiness compares the
    observed like-adjacency G = n11/(n11+n10) against the class proportion
    P; +1 = maximally clumped, -1 = maximally dispersed)."""
    row = adjacency_counts(grid).collect()[0]
    n = {k: float(row[k]) for k in ("n00", "n01", "n10", "n11")}
    total = sum(n.values())
    contagion = 1.0
    if total > 0:
        s = 0.0
        for v in n.values():
            p = v / total
            if p > 0:
                s += p * math.log(p)
        contagion = 1.0 + s / (2.0 * math.log(2.0))
    # class proportion of set cells and like-adjacency
    cells = grid.agg(
        F.sum(F.col("flag").cast("int")).alias("set"), F.count(F.lit(1)).alias("all")
    ).collect()[0]
    p_cls = (cells["set"] or 0) / cells["all"] if cells["all"] else 0.0
    denom = n["n11"] + n["n10"]
    g = n["n11"] / denom if denom > 0 else 0.0
    if p_cls in (0.0, 1.0):
        clump = 0.0
    elif g >= p_cls:
        clump = (g - p_cls) / (1.0 - p_cls)
    else:
        clump = (g - p_cls) / p_cls
    return {"contagion": contagion, "clumpiness": clump, **{k: int(v) for k, v in n.items()}}


def connectivity_metrics(grid: DataFrame) -> DataFrame:
    """4-neighbor occupancy classes: occupied / border (occupied with a
    missing-or-unset neighbor) / inside; fractal = 2 - inside/(inside+border)
    (ConnectivityMetrics.java:44-126)."""
    occ = grid.filter(F.col("flag"))
    pairs = _neighbor_join(occ, NEIGH4)
    set_neigh = pairs.filter(F.col("nflag")).groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("n_set_neighbors")
    )
    classified = occ.join(set_neigh, ["x", "y"], "left").select(
        "x", "y", (F.coalesce(F.col("n_set_neighbors"), F.lit(0)) == 4).alias("is_inside")
    )
    agg = classified.agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.col("is_inside").cast("int")).alias("inside"),
    )
    return agg.select(
        "occupied",
        "inside",
        (F.col("occupied") - F.col("inside")).alias("border"),
        (F.lit(2.0) - F.col("inside") / (F.col("inside") + (F.col("occupied") - F.col("inside")))).alias("fractal_index"),
    )


def transect_max_runs(
    grid: DataFrame, step: int = 5, row_off: int = 2, col_off: int = 3
) -> DataFrame:
    """Per-transect maximum run length of set cells — the transect half of
    A6 (ConnectivityMetrics.java:127-164: the reference draws seeded random
    Bresenham lines across the raster and, per line, tracks the longest run
    of set pixels via MyLinePixelVisitor).  Here the sampler is
    seeded-DETERMINISTIC: every grid row ``y ≡ row_off (mod step)`` scanned
    along x, every column ``x ≡ col_off (mod step)`` scanned along y — and
    the per-transect max-run is the 1-D gaps-and-islands machinery (W3)
    applied along the transect axis.  A missing cell breaks a run exactly
    like an unset one (runs require CONSECUTIVE positions).

    Returns (tid, max_run); transects whose cells are all unset (or
    absent) appear with max_run = 0, matching the reference's inclusion of
    empty transects in the mean/σ.

    Scale shape: one filter + union (no shuffle), one window over
    hashpartitioning(tid) — transects are many and independent, so the
    partitioning is uniform by construction (the PatchCS grid analog)."""
    rows_t = grid.filter(F.pmod(F.col("y"), F.lit(step)) == row_off).select(
        F.concat(F.lit("r"), F.col("y").cast("string")).alias("tid"),
        F.col("x").alias("pos"),
        "flag",
    )
    cols_t = grid.filter(F.pmod(F.col("x"), F.lit(step)) == col_off).select(
        F.concat(F.lit("c"), F.col("x").cast("string")).alias("tid"),
        F.col("y").alias("pos"),
        "flag",
    )
    t = rows_t.unionByName(cols_t)
    w = Window.partitionBy("tid").orderBy("pos")
    runs = (
        t.filter(F.col("flag"))
        .withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("tid", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    max_runs = runs.groupBy("tid").agg(F.max("run_len").alias("max_run"))
    all_t = t.select("tid").distinct()
    return all_t.join(max_runs, "tid", "left").select(
        "tid", F.coalesce(F.col("max_run"), F.lit(0)).alias("max_run")
    )


def transect_run_stats(
    grid: DataFrame, step: int = 5, row_off: int = 2, col_off: int = 3
) -> DataFrame:
    """mean/σ of per-transect max run length over the deterministic transect
    sample — the aggregate the reference feeds into its feature vector
    (ConnectivityMetrics.java:127-164).  σ is the sample standard deviation
    (Spark/DuckDB ``stddev`` default); single-transect grids get σ = 0."""
    per = transect_max_runs(grid, step, row_off, col_off)
    return per.agg(
        F.count(F.lit(1)).cast("int").alias("n_transects"),
        F.avg("max_run").alias("mean_max_run"),
        F.coalesce(F.stddev("max_run"), F.lit(0.0)).alias("std_max_run"),
    )


def contagion_clumpiness_df(grid: DataFrame) -> DataFrame:
    """``contagion_clumpiness`` as a single-row DataFrame with pure column
    math — the oracle-checkable form (AggregationMetrics.java:131-164:
    contagion = 1 + Σ p·ln(p) / (2·ln 2) over the 4-class ordered-pair
    distribution, Li & Reynolds 1993; clumpiness compares the observed
    like-adjacency G = n11/(n11+n10) against the class proportion P).
    Entirely JVM expressions over two tiny single-row aggregates."""
    adj = adjacency_counts(grid)
    cells = grid.agg(
        F.sum(F.col("flag").cast("int")).alias("__set"),
        F.count(F.lit(1)).alias("__all"),
    )
    j = adj.crossJoin(cells)
    total = F.col("n00") + F.col("n01") + F.col("n10") + F.col("n11")

    def term(c):
        p = F.col(c) / total
        return F.when(F.col(c) > 0, p * F.log(p)).otherwise(F.lit(0.0))

    entropy = term("n00") + term("n01") + term("n10") + term("n11")
    contagion = F.when(
        total > 0, F.lit(1.0) + entropy / (2.0 * math.log(2.0))
    ).otherwise(F.lit(1.0))
    p_cls = F.col("__set") / F.col("__all")
    denom = F.col("n11") + F.col("n10")
    g = F.when(denom > 0, F.col("n11") / denom).otherwise(F.lit(0.0))
    clump = (
        F.when((p_cls == 0.0) | (p_cls == 1.0), F.lit(0.0))
        .when(g >= p_cls, (g - p_cls) / (1.0 - p_cls))
        .otherwise((g - p_cls) / p_cls)
    )
    return j.select(
        "n00", "n01", "n10", "n11",
        contagion.alias("contagion"),
        clump.alias("clumpiness"),
    )


def patch_metrics(grid: DataFrame, patch: int = 10) -> DataFrame:
    """Per-patch A5 metrics — the reference's actual consumption shape:
    AggregationMetrics runs on each PATCH raster independently (the
    rejection filter consumes per-patch clumpiness,
    AlgalBloomFeatureWriter.java:277-303), so the grouped form computes
    n00..n11 + contagion + clumpiness per (px, py) patch in ONE neighbor
    join + groupBy.  Neighbor pairs crossing a patch boundary are excluded
    — each patch is its own raster, exactly as in the reference.

    Scale shape: the neighbor equi-join is hash-partitioned on (nx, ny);
    the metric groupBy on (px, py) — patches are uniform by construction
    (the PatchCS grid), so no skew handling is needed, mirroring the
    reference's uniform grid keys."""
    px = F.floor(F.col("x") / patch)
    py = F.floor(F.col("y") / patch)
    pairs = _neighbor_join(grid, NEIGH8)
    same_patch = (F.floor(F.col("nx") / patch) == px) & (
        F.floor(F.col("ny") / patch) == py
    )
    a = F.col("flag").cast("int")
    b = F.col("nflag").cast("int")
    adj = (
        pairs.filter(same_patch)
        .groupBy(px.alias("px"), py.alias("py"))
        .agg(
            F.sum((1 - a) * (1 - b)).alias("n00"),
            F.sum((1 - a) * b).alias("n01"),
            F.sum(a * (1 - b)).alias("n10"),
            F.sum(a * b).alias("n11"),
        )
    )
    cells = grid.groupBy(px.alias("px"), py.alias("py")).agg(
        F.sum(F.col("flag").cast("int")).alias("__set"),
        F.count(F.lit(1)).alias("__all"),
    )
    j = cells.join(adj, ["px", "py"], "left").na.fill(
        0, ["n00", "n01", "n10", "n11"]
    )
    total = F.col("n00") + F.col("n01") + F.col("n10") + F.col("n11")

    def term(c):
        p = F.col(c) / total
        return F.when(F.col(c) > 0, p * F.log(p)).otherwise(F.lit(0.0))

    entropy = term("n00") + term("n01") + term("n10") + term("n11")
    contagion = F.when(
        total > 0, F.lit(1.0) + entropy / (2.0 * math.log(2.0))
    ).otherwise(F.lit(1.0))
    p_cls = F.col("__set") / F.col("__all")
    denom = F.col("n11") + F.col("n10")
    g = F.when(denom > 0, F.col("n11") / denom).otherwise(F.lit(0.0))
    clump = (
        F.when((p_cls == 0.0) | (p_cls == 1.0), F.lit(0.0))
        .when(g >= p_cls, (g - p_cls) / (1.0 - p_cls))
        .otherwise((g - p_cls) / p_cls)
    )
    return j.select(
        F.col("px").cast("int").alias("px"),
        F.col("py").cast("int").alias("py"),
        "n00", "n01", "n10", "n11",
        contagion.alias("contagion"),
        clump.alias("clumpiness"),
    )


def patch_connectivity(grid: DataFrame, patch: int = 10) -> DataFrame:
    """Per-patch A6 connectivity (ConnectivityMetrics.java:44-126 evaluated
    on each patch raster): occupied / inside / border counts and the
    fractal index per (px, py), with neighbor relations confined to the
    patch (a set cell on the patch edge cannot be 'inside' — its
    cross-boundary neighbors belong to another raster).  Same grouped
    neighbor-join shape as ``patch_metrics``."""
    px = F.floor(F.col("x") / patch)
    py = F.floor(F.col("y") / patch)
    occ = grid.filter(F.col("flag"))
    pairs = _neighbor_join(occ, NEIGH4)
    same_patch = (F.floor(F.col("nx") / patch) == px) & (
        F.floor(F.col("ny") / patch) == py
    )
    set_neigh = (
        pairs.filter(same_patch & F.col("nflag"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_set_neighbors"))
    )
    classified = occ.join(set_neigh, ["x", "y"], "left").select(
        px.cast("int").alias("px"),
        py.cast("int").alias("py"),
        (F.coalesce(F.col("n_set_neighbors"), F.lit(0)) == 4).alias("is_inside"),
    )
    agg = classified.groupBy("px", "py").agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.col("is_inside").cast("int")).alias("inside"),
    )
    return agg.select(
        "px", "py", "occupied", "inside",
        (F.col("occupied") - F.col("inside")).alias("border"),
        (F.lit(2.0) - F.col("inside") / F.col("occupied")).alias("fractal_index"),
    )


def patch_rejection(
    grid: DataFrame,
    patch: int = 10,
    min_valid_ratio: float = 0.2,
    min_clumpiness: float = 0.0,
    clumpiness_gate_ratio: float = 0.5,
) -> DataFrame:
    """P3 in the reference's composed form (AlgalBloomFeatureWriter.java:
    277-303): a patch is rejected when its set-cell ratio is below
    ``min_valid_ratio``, or when the ratio is below
    ``clumpiness_gate_ratio`` AND its clumpiness is below
    ``min_clumpiness`` (cheap ratio test first, clumpiness only consulted
    in the uncertain band — the reference's exact ordering).  Returns all
    patches with (ratio, clumpiness, accepted); filter on ``accepted`` for
    the reference's surviving set."""
    m = patch_metrics(grid, patch)
    px = F.floor(F.col("x") / patch)
    py = F.floor(F.col("y") / patch)
    cells = grid.groupBy(px.alias("px"), py.alias("py")).agg(
        (F.sum(F.col("flag").cast("int")) / F.count(F.lit(1))).alias("valid_ratio")
    )
    j = m.join(cells.withColumn("px", F.col("px").cast("int")).withColumn("py", F.col("py").cast("int")), ["px", "py"])
    rejected = (F.col("valid_ratio") < min_valid_ratio) | (
        (F.col("valid_ratio") < clumpiness_gate_ratio)
        & (F.col("clumpiness") < min_clumpiness)
    )
    return j.select(
        "px", "py", "valid_ratio", "clumpiness", (~rejected).alias("accepted")
    )


def connected_components(grid: DataFrame, max_iter: int = 25) -> DataFrame:
    """4-neighbor connected components via alternating large-star /
    small-star contraction over the grid's neighbor edge list
    (``dedup.graph_components``), O(log n) rounds.  Returns
    (x, y, component) for set cells; the component id is the minimum cell
    key of the blob (deterministic — same label as min-label propagation
    and the recursive-CTE oracle).

    Previously iterative min-label propagation: O(blob diameter) join
    rounds, which measured fine on sparse grids (small blobs) but
    pathological the moment one blob spans the raster — a dense sf0.1
    grid (1842/2000 cells set, diameter ~90) needed 90 rounds and minutes
    of stacked-plan analysis.  Star contraction converges on the same
    grid in a handful of rounds.  Isolated cells (no set neighbor) never
    enter the edge list and come back as their own component via the
    left join."""
    from esa_pfa_spark.operators.dedup import graph_components

    occ = grid.filter(F.col("flag")).select("x", "y")
    ids = occ.withColumn("id", F.col("x") * F.lit(1_000_000) + F.col("y"))
    # each undirected 4-neighbor edge emitted once: right + down shifts
    shifted = ids.select(
        F.col("id").alias("u"),
        F.explode(
            F.array(
                F.struct((F.col("x") + 1).alias("nx"), F.col("y").alias("ny")),
                F.struct(F.col("x").alias("nx"), (F.col("y") + 1).alias("ny")),
            )
        ).alias("__n"),
    ).select("u", F.col("__n.nx").alias("nx"), F.col("__n.ny").alias("ny"))
    edges = shifted.join(
        ids.select(F.col("x").alias("nx"), F.col("y").alias("ny"), F.col("id").alias("v")),
        ["nx", "ny"],
    ).select("u", "v")
    comp = graph_components(edges, src="u", dst="v", max_iter=max_iter)
    return ids.join(comp, "id", "left").select(
        "x", "y", F.coalesce(F.col("component"), F.col("id")).alias("component")
    )


def largest_component(grid: DataFrame) -> DataFrame:
    """maxClusterSize + numSamples (RegionGrower consumers, e.g.
    ChangeDetectionFeatureWriter.java:106-131)."""
    cc = connected_components(grid)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.max("size").alias("max_cluster_size"), F.sum("size").alias("num_samples")
    )
