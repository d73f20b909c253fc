"""Batch model scoring over feature-vector columns.

The reference scores every feature vector with a trained SVM inside the
active-learning loop (pfa-database/.../activelearning/SVM.java:122-132,
consumed at ActiveLearning.java:176-190).  Training is out of the engine's
scope (SURVEY.md §3.3 note); the engine provides the scoring surface: an
Arrow-vectorized linear scorer (weights broadcast as literals inside the
UDF closure) and the [0,1] rescale that precedes it
(ActiveLearning.java:285-339).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def score_linear(
    df: DataFrame,
    weights: np.ndarray,
    bias: float = 0.0,
    vec_col: str = "embedding",
    out_col: str = "decision",
) -> DataFrame:
    """Append ``out_col`` = w . x + b, vectorized (one matmul per Arrow
    batch).  NaN-containing vectors score null (the reference filters
    NaN vectors before training/classification,
    ActiveLearning.java:218-245, P6)."""
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    @F.pandas_udf(T.DoubleType())
    def scorer(v: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        scores = m @ w + b
        bad = np.isnan(m).any(axis=1)
        scores[bad] = np.nan
        return pd.Series(scores)

    return df.withColumn(out_col, scorer(F.col(vec_col)))


def cv_grid_scores(
    df: DataFrame,
    weights: np.ndarray,
    grid: list[tuple[float, float]],
    label_col: str = "y",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_folds: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Distributed hyperparameter-grid scoring with k-fold CV in ONE data
    pass — the engine analog of the reference's 11x10 SVM grid search with
    5-fold cross-validation (pfa-database/.../activelearning/SVM.java:
    219-260; training itself is out of engine scope per SURVEY §3.3, the
    grid/CV SELECTION machinery is what this provides).

    Each grid point (scale s, bias b) parameterizes a linear scorer
    ``s * (w . x) + b`` over the shared base direction ``w``; its loss on
    a row is the squared error vs ``label_col``; fold assignment is the
    deterministic md5 bucket of the row id (portable to the SQL oracle).
    cv_loss(g) = mean over folds of the fold-mean loss — folds weigh
    equally regardless of size, the standard k-fold estimator.

    Scale shape: ONE dot product per row (JVM left-fold — bit-identical
    to DuckDB's list_dot_product), the grid rides as an exploded literal
    (|grid| rows per input row INSIDE the map task; map-side partial agg
    means the shuffle carries |grid| x n_folds rows, then |grid|), never
    a per-model pass over the data.  Output: one row per grid point with
    ``cv_loss`` (rounded 1e-6) and deterministic ``rank`` (cv_loss asc,
    scale asc, bias asc) — rank 1 is the pick."""
    from pyspark.sql import Window

    from esa_pfa_spark.operators.dataset import _hash_bucket
    from esa_pfa_spark.operators.similarity import _dot

    w_lit = F.array(*[F.lit(float(x)) for x in np.asarray(weights, dtype=np.float64)])
    fold = (_hash_bucket(id_col, seed) % n_folds).alias("fold")
    base = df.select(
        fold,
        _dot(F.col(vec_col), w_lit).alias("__d"),
        F.col(label_col).cast("double").alias("__y"),
    )
    grid_lit = F.array(*[
        F.struct(F.lit(float(s)).alias("scale"), F.lit(float(b)).alias("bias"))
        for s, b in grid
    ])
    exploded = base.select("fold", "__d", "__y", F.explode(grid_lit).alias("g"))
    err = F.col("g.scale") * F.col("__d") + F.col("g.bias") - F.col("__y")
    per_fold = (
        exploded.groupBy("g.scale", "g.bias", "fold")
        .agg(F.avg(err * err).alias("__fold_loss"))
    )
    cv = per_fold.groupBy("scale", "bias").agg(
        F.round(F.avg("__fold_loss"), 6).alias("cv_loss")
    )
    rank_w = Window.orderBy(
        F.col("cv_loss").asc(), F.col("scale").asc(), F.col("bias").asc()
    )
    # the window is partition-less but runs over |grid| rows only
    return cv.withColumn("rank", F.row_number().over(rank_w).cast("int"))


def classify_threshold(df: DataFrame, decision_col: str = "decision", threshold: float = 0.0) -> DataFrame:
    """Label from decision value: RELEVANT(1) / IRRELEVANT(0) / NONE(-1 for
    null) — the Patch label enum (Patch.java:26-40)."""
    return df.withColumn(
        "label",
        F.when(F.col(decision_col).isNull() | F.isnan(decision_col), F.lit(-1))
        .when(F.col(decision_col) > threshold, F.lit(1))
        .otherwise(F.lit(0))
        .cast("byte"),
    )


def logreg_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    positive: int = 0,
    dims: int = 4,
    lr: float = 0.5,
    iters: int = 6,
    round_to: int = 6,
):
    """Distributed batch-gradient logistic regression (the quality-
    classifier trainer of a data-curation pipeline — FineWeb-style
    educational-value gates are exactly this shape): ``iters`` rounds of
    one full-corpus aggregation each, weights carried as plan literals
    between rounds (the ``kmeans_fit`` driver-loop shape — no Python
    closure over data, no collect beyond ``dims + 2`` scalars/round).

    Engine-exact by the repo's standard devices: per-row gradient terms
    ``(p - y) * x_j`` are 6dp-rounded then decimal-summed (partition-
    order-independent), and the weight update ``w - lr * (s / n)`` runs
    the identical operation order driver-side as the oracle runs in SQL.
    (exp() may differ by 1 ulp across libms; the 6dp rounding absorbs it
    — the same tolerance the plogp/entropy family already relies on.)

    Returns ``(weights: list[float], bias: float, n_rows: int)``.

    Scale shape (100 TB): each round is ONE map-side-combinable
    aggregation (shuffle = a single row of dims+2 decimal sums); the
    driver holds dims+1 floats.  A 1000-executor cluster runs each round
    as a full scan + tree-reduce — the textbook distributed-GD plan.
    """
    x = [F.col(vec_col).getItem(j).cast("double").alias(f"x{j}") for j in range(dims)]
    y = F.when(F.col(label_col) == positive, F.lit(1.0)).otherwise(F.lit(0.0))
    # cache the dims+1-column projection once; each GD round rescans it
    # (the kmeans_fit device — at 100 TB this is the narrow table, not
    # the corpus)
    base = df.select(*x, y.alias("y")).persist()
    w = [0.0] * dims
    b = 0.0
    n = 0
    try:
        for _ in range(iters):
            z = F.lit(w[0]) * F.col("x0")
            for j in range(1, dims):
                z = z + F.lit(w[j]) * F.col(f"x{j}")
            z = z + F.lit(b)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            aggs = [F.count(F.lit(1)).alias("n")]
            for j in range(dims):
                aggs.append(
                    F.sum(
                        F.round((p - F.col("y")) * F.col(f"x{j}"), round_to).cast(
                            "decimal(18,6)"
                        )
                    ).alias(f"s{j}")
                )
            aggs.append(
                F.sum(F.round(p - F.col("y"), round_to).cast("decimal(18,6)")).alias("sb")
            )
            row = base.agg(*aggs).first()
            n = row["n"]
            # one IEEE double op chain, identical order to the SQL oracle:
            # w - lr * (CAST(s AS DOUBLE) / n)
            w = [w[j] - lr * (float(row[f"s{j}"]) / n) for j in range(dims)]
            b = b - lr * (float(row["sb"]) / n)
    finally:
        base.unpersist()
    return w, b, n


def logreg_summary(
    spark,
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    positive: int = 0,
    dims: int = 4,
    lr: float = 0.5,
    iters: int = 6,
) -> DataFrame:
    """Fit + evaluate, reported as a (name, value) summary table: the
    learned coefficients, bias, corpus size, and training accuracy at the
    0.5 threshold — the registry/oracle surface for ``logreg_fit``.

    All rounding happens ENGINE-side (``F.round`` here, ``ROUND`` in the
    SQL oracle) — Python's ``round()`` is half-even and would diverge
    from both engines' half-up on boundary values."""
    w, b, _ = logreg_fit(
        df, vec_col=vec_col, label_col=label_col, positive=positive,
        dims=dims, lr=lr, iters=iters,
    )
    x = [F.col(vec_col).getItem(j).cast("double") for j in range(dims)]
    y = F.when(F.col(label_col) == positive, F.lit(1.0)).otherwise(F.lit(0.0))
    z = F.lit(w[0]) * x[0]
    for j in range(1, dims):
        z = z + F.lit(w[j]) * x[j]
    z = z + F.lit(b)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    row = df.select(p.alias("p"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("p") >= 0.5) == (F.col("y") == 1.0), 1).otherwise(0)
        ).alias("c"),
    ).first()
    rows = (
        [(f"w{j}", w[j]) for j in range(dims)]
        + [("bias", b), ("n_rows", float(row["n"])),
           ("accuracy", row["c"] / row["n"])]
    )
    return (
        spark.createDataFrame(rows, "name string, value double")
        .select("name", F.round("value", 6).alias("value"))
        .orderBy("name")
    )


def logreg_calibration(
    spark,
    df: DataFrame,
    n_bins: int = 10,
    vec_col: str = "embedding",
    label_col: str = "label",
    positive: int = 0,
    dims: int = 4,
    lr: float = 0.5,
    iters: int = 6,
) -> DataFrame:
    """Reliability diagram for the trained classifier: fixed-width bins
    over predicted p, per-bin count / mean confidence / observed positive
    rate / |gap| (the per-bin ECE term) — run this BEFORE a curation gate
    trusts classifier scores as sampling weights (an over-confident gate
    silently skews the mixture).

    Scale shape: ONE map pass over the corpus + an ``n_bins``-group
    partial agg (shuffle = n_bins rows).  Engine parity: conf means are
    6dp-decimal sums (order-free), acc means are exact 0/1 integer sums,
    and the final divisions/rounds run the identical IEEE op order as
    the SQL oracle."""
    w, b, _ = logreg_fit(
        df, vec_col=vec_col, label_col=label_col, positive=positive,
        dims=dims, lr=lr, iters=iters,
    )
    x = [F.col(vec_col).getItem(j).cast("double") for j in range(dims)]
    y = F.when(F.col(label_col) == positive, F.lit(1.0)).otherwise(F.lit(0.0))
    z = F.lit(w[0]) * x[0]
    for j in range(1, dims):
        z = z + F.lit(w[j]) * x[j]
    z = z + F.lit(b)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    scored = df.select(
        F.least(F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)).alias("bin"),
        F.round(p, 6).cast("decimal(18,6)").alias("rp"),
        y.alias("y"),
    )
    ag = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rp").alias("sp"),
        F.sum("y").alias("sy"),
    )
    conf = F.col("sp").cast("double") / F.col("n")
    acc = F.col("sy") / F.col("n")
    return ag.select(
        "bin",
        "n",
        F.round(conf, 6).alias("conf"),
        F.round(acc, 6).alias("acc"),
        F.round(F.abs(acc - conf), 6).alias("gap"),
    ).orderBy("bin")
