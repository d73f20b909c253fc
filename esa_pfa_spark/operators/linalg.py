"""Distributed dense linear algebra over embedding columns: Gram matrix
accumulation and PCA projection/whitening.

The two ops are the scale pattern behind embedding-pipeline preprocessing
(SemDeDup-style clustering works markedly better on whitened vectors;
Abbas et al. 2023 run PCA before k-means) and dimensionality reduction
for ANN indexes (Jégou et al. recommend PCA to m·k dims before PQ).

``gram_matrix``: exact upper-triangle X^T X over selected coordinates.
One map-only pass, d·(d+1)/2 decimal-exact column aggregates (map-side
combinable; the shuffle is the aggregate buffer, never the rows), then an
in-plan unpivot of the single aggregate row to (i, j, gram) tuples.
Decimal accumulation makes the sums order-independent — bit-identical
across partitionings AND engines (the house `_dsum` device), which is
what lets a DuckDB oracle hash-match a distributed float reduction.

``pca_fit`` / ``pca_project``: full-dimension covariance via ONE
``mapInArrow`` pass that emits a d×d partial Gram + d-vector sum + count
per Arrow batch (numpy ``V.T @ V`` — the MLlib RowMatrix Gramian shape);
partials are summed by Spark (d² rows per partition, independent of row
count), the d×d eigenproblem solved driver-side with numpy, components
broadcast back, projection map-only.  Nothing driver-side ever scales
with the table: the collect is exactly d²+d+1 doubles.  Eigenvector sign
is canonicalized (largest-|coordinate| positive) so output is stable
across partitionings up to float-reduction noise (tested with allclose;
the registry entry is rows-only for this reason).

Reference anchor: the reference's feature post-processing normalizes and
linearly transforms STX feature vectors before classifier training
(pfa-core FeatureWriter / ClassifierModel pipeline); PCA is that
transform generalized to learned axes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fan_out(df: DataFrame) -> DataFrame:
    """Raise scan parallelism for wide decimal aggregations when the
    input has fewer splits than the cluster has slots (the small-file /
    small-SF regime: one ~25 MB parquet file scans as 2-3 partitions, so
    a 36-column decimal agg runs 3-way on a 32-slot session — measured
    7.8s -> <1s at sf0.1).  Only fires when partitions < parallelism:
    at production scale the scan has thousands of natural splits and
    this is a no-op.  Caller must project FIRST so the reshuffled rows
    are just the aggregated columns; decimal accumulation is
    order-independent, so the repartition cannot change the result."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 16,
    decimal: str = "decimal(38,18)",
    exact: bool = True,
) -> DataFrame:
    """Exact upper-triangle Gram matrix over the first ``dims`` coordinates.

    Returns (i INT, j INT, gram DOUBLE) with 1 <= i <= j <= dims; gram =
    sum over rows of v[i]*v[j], accumulated in decimal so the result is
    order-independent (cross-engine / cross-partitioning bit-identical).
    Rows whose vector is NULL or shorter than ``dims`` are skipped (both
    engines agree: element_at past the end is NULL and sum skips NULLs —
    we filter explicitly to keep the contract visible).

    Scale: map-only; dims*(dims+1)/2 aggregate columns, partial-aggregated
    map-side, single-row reduce.  For full-dimension Gram at large d use
    ``pca_fit``'s Arrow path (this form's expression count is O(d²) and is
    meant for the exact-oracle regime, d <= ~24).

    ``exact=True`` (default) accumulates in decimal — BigDecimal-backed
    per row, ~10-30x the cost of a double sum, the price of the
    cross-engine hash gate.  ``exact=False`` is the production path:
    plain double partial sums (whole-stage codegen, hardware adds) whose
    result is reduction-order-dependent in the last ulps — fine for
    every numeric consumer (PCA, whitening, covariance), not for
    bit-equality audits.
    """
    if dims < 1:
        raise ValueError("dims must be >= 1")
    v = F.col(vec_col)
    # project each coordinate ONCE before the agg: d simple columns feed
    # d(d+1)/2 product sums instead of every agg re-deriving two
    # element_at casts — the flat tree codegens ~5x faster (measured
    # 5.6s -> 1.2s cold at d=16) and evaluates each extraction once/row
    src = _fan_out(
        df.filter(v.isNotNull() & (F.size(v) >= dims)).select(
            *[F.element_at(v, i).cast("double").alias(f"e{i}")
              for i in range(1, dims + 1)]
        )
    )
    aggs = []
    for i in range(1, dims + 1):
        xi = F.col(f"e{i}")
        for j in range(i, dims + 1):
            xj = F.col(f"e{j}")
            s = F.sum((xi * xj).cast(decimal)) if exact else F.sum(xi * xj)
            aggs.append(s.alias(f"g_{i}_{j}"))
    one = src.agg(*aggs)
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("i"),
            F.lit(j).alias("j"),
            (F.col(f"g_{i}_{j}").cast("double") + F.lit(0.0)).alias("gram"),
        )
        for i in range(1, dims + 1)
        for j in range(i, dims + 1)
    ])
    return one.select(F.inline(cells))


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
) -> dict:
    """Fit PCA over a vector column: returns {"mean": [d], "components":
    [k][d], "explained_variance": [k], "n": int} as plain Python lists
    (broadcastable / JSON-serializable — composes with the classifier
    session artifact).

    One distributed Arrow pass accumulates per-batch (V.T @ V, colsum, n)
    partials; the driver reduces exactly d*d + d + 1 doubles per partition
    and solves the d×d symmetric eigenproblem with numpy.  Eigenvector
    sign is canonicalized: the coordinate with the largest magnitude is
    made positive (ties to the lowest index), so the fit is reproducible
    across partitionings up to float-sum noise.
    """
    import numpy as np
    import pyarrow as pa

    if k < 1 or k > dim:
        raise ValueError("need 1 <= k <= dim")

    out_schema = (
        f"part struct<gram: array<double>, colsum: array<double>, n: bigint>"
    )

    def _partials(batches):
        gram = np.zeros((dim, dim), dtype=np.float64)
        colsum = np.zeros(dim, dtype=np.float64)
        n = 0
        for batch in batches:
            col = batch.column(0)
            arrs = col.to_pylist()
            rows = [a[:dim] for a in arrs if a is not None and len(a) >= dim]
            if rows:
                m = np.asarray(rows, dtype=np.float64)
                gram += m.T @ m
                colsum += m.sum(axis=0)
                n += m.shape[0]
        yield pa.RecordBatch.from_pylist(
            [{"part": {
                "gram": gram.ravel().tolist(),
                "colsum": colsum.tolist(),
                "n": n,
            }}],
            schema=pa.schema([pa.field("part", pa.struct([
                pa.field("gram", pa.list_(pa.float64())),
                pa.field("colsum", pa.list_(pa.float64())),
                pa.field("n", pa.int64()),
            ]))]),
        )

    parts = (
        df.select(F.col(vec_col).alias("v"))
        .mapInArrow(_partials, schema=out_schema)
        .collect()
    )
    gram = np.zeros((dim, dim), dtype=np.float64)
    colsum = np.zeros(dim, dtype=np.float64)
    n = 0
    for row in parts:
        p = row["part"]
        gram += np.asarray(p["gram"], dtype=np.float64).reshape(dim, dim)
        colsum += np.asarray(p["colsum"], dtype=np.float64)
        n += p["n"]
    if n < 2:
        raise ValueError("need at least 2 usable vectors to fit PCA")
    mean = colsum / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x d
    evs = evals[order]
    # sign canonicalization: largest-|coord| positive, ties lowest index
    for r in range(comps.shape[0]):
        idx = int(np.argmax(np.abs(comps[r])))
        if comps[r, idx] < 0:
            comps[r] = -comps[r]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": [float(x) for x in evs],
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """Project vectors onto fitted components: out = (v - mean) @ W^T,
    optionally whitened (each axis divided by sqrt(explained_variance)).
    Map-only; the k×d model rides the closure (a few KB — broadcast by
    the task serializer, no join).  Vectors NULL or shorter than the
    model's d project to NULL.
    """
    import numpy as np
    import pyarrow as pa

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    if whiten:
        scale = np.sqrt(np.asarray(model["explained_variance"], dtype=np.float64))
        scale[scale == 0.0] = 1.0
        comps = comps / scale[:, None]
    d = mean.shape[0]

    cols = df.columns
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols]
        + [f"`{out_col}` array<double>"]
    )

    def _proj(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            vecs = tbl.column(vec_col).to_pylist()
            outs = []
            for a in vecs:
                if a is None or len(a) < d:
                    outs.append(None)
                    continue
                x = np.asarray(a[:d], dtype=np.float64) - mean
                p = comps @ x
                if round_to is not None:
                    p = np.round(p, round_to) + 0.0
                outs.append(p.tolist())
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(outs, type=pa.list_(pa.float64()))],
                names=list(cols) + [out_col],
            )

    return df.mapInArrow(_proj, schema=out_schema)
