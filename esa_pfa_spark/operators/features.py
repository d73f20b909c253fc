"""STX summary-statistics feature vectors.

Parity target: the reference's canonical per-patch feature vector
(pfa-core/.../op/FeatureWriter.java:159-176, computed at :363-383):
``mean, stdev, cvar = stdev/mean, min, max, p10, p50, p90,
skewness = (p90 - 2*p50 + p10)/(p90 - p10), count``.

Two physical forms:
  * ``stx_aggregate`` — native groupBy aggregation (JVM, codegen) with exact
    interpolated percentiles (``F.percentile``, not percentile_approx — the
    parity contract is numpy.allclose, SURVEY.md §4 note 4);
  * ``token_stats`` — per-row statistics over an ``array<int>`` token column
    as ONE Arrow-vectorized pandas_udf returning a struct (the reference's
    per-patch path, FeatureWriter.processPatch, computed per row here).

Percentile convention everywhere (engine, oracle, SQL oracles): linear
interpolation at ``p*(n-1)`` — numpy ``method='linear'``, Spark
``percentile``, DuckDB ``quantile_cont`` all agree.  stdev is the sample
standard deviation (ddof=1) to match Spark/DuckDB ``stddev`` defaults.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STAT_NAMES = ["mean", "stdev", "cvar", "min", "max", "p10", "p50", "p90", "skewness", "count"]

_STATS_STRUCT = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("stdev", T.DoubleType()),
        T.StructField("cvar", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("p10", T.DoubleType()),
        T.StructField("p50", T.DoubleType()),
        T.StructField("p90", T.DoubleType()),
        T.StructField("skewness", T.DoubleType()),
        T.StructField("count", T.IntegerType()),
    ]
)


def stx_columns(value: str) -> list:
    """The STX vector as native aggregate Column expressions over ``value``."""
    c = F.col(value)
    mean = F.avg(c)
    std = F.stddev(c)  # sample stddev (ddof=1)
    p10 = F.percentile(c, F.lit(0.1))
    p50 = F.percentile(c, F.lit(0.5))
    p90 = F.percentile(c, F.lit(0.9))
    return [
        mean.alias("mean"),
        std.alias("stdev"),
        (std / mean).alias("cvar"),
        F.min(c).cast("double").alias("min"),
        F.max(c).cast("double").alias("max"),
        p10.alias("p10"),
        p50.alias("p50"),
        p90.alias("p90"),
        ((p90 - 2 * p50 + p10) / (p90 - p10)).alias("skewness"),
        F.count(c).cast("int").alias("count"),
    ]


def stx_aggregate(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """GroupBy STX aggregation — one row per key tuple with the 10-stat
    vector.  Pure JVM: partial aggregation map-side, exact percentiles."""
    return df.groupBy(*keys).agg(*stx_columns(value))


def stats_kernel(arr: np.ndarray) -> tuple:
    """The shared numpy kernel: STX vector of one 1-D array.
    FeatureWriter.java:363-383 formula set, exactly."""
    n = arr.size
    if n == 0:
        return (None,) * 9 + (0,)
    a = arr.astype(np.float64)
    mean = float(a.mean())
    std = float(a.std(ddof=1)) if n > 1 else 0.0
    cvar = std / mean if mean != 0.0 else float("nan")
    p10, p50, p90 = (float(x) for x in np.percentile(a, [10, 50, 90]))
    denom = p90 - p10
    skew = (p90 - 2 * p50 + p10) / denom if denom != 0.0 else float("nan")
    return (mean, std, cvar, float(a.min()), float(a.max()), p10, p50, p90, skew, n)


def batch_stats(arrs: list) -> pd.DataFrame:
    """Segmented (ragged-array) STX stats for one Arrow batch — fully
    vectorized: one global concat + reduceat/lexsort, NO per-row Python.

    Matches ``stats_kernel`` to allclose (pairwise vs sequential summation
    differ at ~1e-12 relative; the parity contract is rtol 1e-7)."""
    n = np.array([0 if a is None else len(a) for a in arrs], dtype=np.int64)
    out = pd.DataFrame(index=range(len(arrs)), columns=STAT_NAMES, dtype="float64")
    nz = n > 0
    if not nz.any():
        out["count"] = 0
        return out
    flat = np.concatenate([np.asarray(a, dtype=np.float64) for a, m in zip(arrs, nz) if m])
    nn = n[nz]
    off = np.concatenate([[0], np.cumsum(nn)[:-1]])
    sums = np.add.reduceat(flat, off)
    mean = sums / nn
    sumsq = np.add.reduceat(flat * flat, off)
    var = np.where(nn > 1, (sumsq - nn * mean * mean) / np.maximum(nn - 1, 1), 0.0)
    std = np.sqrt(np.maximum(var, 0.0))
    mn = np.minimum.reduceat(flat, off)
    mx = np.maximum.reduceat(flat, off)
    # per-segment sort (one global lexsort), then vectorized linear interp
    rows = np.repeat(np.arange(len(nn)), nn)
    seg_sorted = flat[np.lexsort((flat, rows))]
    def pct(q: float) -> np.ndarray:
        pos = off + q * (nn - 1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, off + nn - 1)
        frac = pos - lo
        return seg_sorted[lo] * (1 - frac) + seg_sorted[hi] * frac
    p10, p50, p90 = pct(0.1), pct(0.5), pct(0.9)
    with np.errstate(divide="ignore", invalid="ignore"):
        cvar = np.where(mean != 0.0, std / mean, np.nan)
        denom = p90 - p10
        skew = np.where(denom != 0.0, (p90 - 2 * p50 + p10) / denom, np.nan)
    for name, vals in zip(
        STAT_NAMES[:-1], [mean, std, cvar, mn, mx, p10, p50, p90, skew]
    ):
        col = np.full(len(arrs), np.nan)
        col[nz] = vals
        out[name] = col
    out["count"] = n
    return out


@F.pandas_udf(returnType=_STATS_STRUCT)
def _token_stats_udf(tokens: pd.Series) -> pd.DataFrame:
    return batch_stats(tokens.tolist())


def token_stats(df: DataFrame, tokens_col: str = "tokens", prefix: str = "") -> DataFrame:
    """Append the 10 STX stat columns computed over each row's token array.

    One Arrow batch crosses the JVM/Python boundary per ~10k rows
    (spark.sql.execution.arrow.maxRecordsPerBatch); the kernel itself is
    numpy — no per-row Python in the dataframe sense beyond the row loop
    inside one batch, which is unavoidable for ragged arrays."""
    s = _token_stats_udf(F.col(tokens_col)).alias("__stx")
    out = df.withColumn("__stx", s)
    for name in STAT_NAMES:
        out = out.withColumn(prefix + name, F.col("__stx")[name])
    return out.drop("__stx")


def normalize_bounds(df: DataFrame, cols: list[str]) -> DataFrame:
    """Global per-column min/max (normalization bounds) — parity with the
    active-learning rescale (ActiveLearning.java:285-339, A8)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.agg(*aggs)


def rescale_unit(df: DataFrame, cols: list[str], bounds: dict[str, float]) -> DataFrame:
    """Rescale columns to [0,1] with precomputed bounds (broadcast to tasks
    as literals — no join needed)."""
    out = df
    for c in cols:
        lo, hi = bounds[f"{c}_min"], bounds[f"{c}_max"]
        rng = (hi - lo) or 1.0
        out = out.withColumn(c, (F.col(c) - F.lit(lo)) / F.lit(rng))
    return out
