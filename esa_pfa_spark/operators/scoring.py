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
