"""Scalar expression library — the engine's equivalent of the reference's
band-arithmetic expression language (SURVEY.md §2.8).

Every function returns a Column built from pure built-in functions (JVM,
whole-stage codegen).  Reference semantics cited per function.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def valid_mask(*conditions: Column) -> Column:
    """Conjunction of validity predicates — '(e1)&&(e2)' composition
    (AlgalBloomFeatureWriter.java:401-406, P2)."""
    out = None
    for c in conditions:
        out = c if out is None else (out & c)
    return out


def masked(value: Column, mask: Column) -> Column:
    """Value where mask holds, else null (invalid -> NaN-early semantics,
    SpectralFeaturesOp.java:82-85)."""
    return F.when(mask, value)


def flag_set(flags: Column, bit: int) -> Column:
    """Bitmask flag test — 'l1_flags.INVALID' analog ((flags & lit) != 0)."""
    return flags.bitwiseAND(F.lit(1 << bit)) != 0


def fneq(c: Column, nodata: float) -> Column:
    """float != with nodata semantics (ForestChangeFeatureWriter.java:185-187):
    true when the value is a real measurement."""
    return (~F.isnan(c)) & (c != F.lit(nodata))


def log_ratio(a: Column, b: Column, eps: float = 1e-15) -> Column:
    """log(max(a/b, eps)) — the SAR change detector's log-ratio
    (ForestChangeFeatureWriter.java:174-194)."""
    return F.log(F.greatest(a / b, F.lit(eps)))


def baseline_difference(l1: Column, l2: Column, l3: Column, f: float, c: float = 1.0) -> Column:
    """3-band baseline difference 'l2 - c*(l1 + (l3-l1)*f)' — the MCI/FLH
    feature shape (AlgalBloomFeatureWriter.java:416-463)."""
    return l2 - F.lit(c) * (l1 + (l3 - l1) * F.lit(f))


def clamp(c: Column, lo: float, hi: float) -> Column:
    """'x > hi ? hi : x' staircase clamp (AlgalBloomFeatureWriter.java:224-225)."""
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def staircase_count(v: Column, lo: float, hi: float, step: float) -> Column:
    """The cloud-filter threshold staircase (FrontsCloudMaskOperator.java:
    117-163, W5): how many thresholds in [lo, hi) (step) the value exceeds —
    closed form floor((v - lo)/step) clamped to [0, n]."""
    n = int(round((hi - lo) / step))
    raw = F.floor((v - F.lit(lo)) / F.lit(step)) + 1
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n)).cast("int")


def ts_from_name(name: Column, pattern: str = r"T(\d{12})", fmt: str = "yyyyMMddHHmm") -> Column:
    """Timestamp parse from an encoded name — 'X%04dY%04d_T<yyyyMMddHHmm>'
    (FindPatchPairs.java:45,85-91; BiTempPreprocessor.java:43)."""
    return F.to_timestamp(F.regexp_extract(name, pattern, 1), fmt)


def dated_path(ts: Column, name: Column) -> Column:
    """'${yyyy}/${MM}/${dd}/${name}' layout (ExtractFexApp.java:275-287)."""
    return F.concat_ws("/", F.date_format(ts, "yyyy"), F.date_format(ts, "MM"),
                       F.date_format(ts, "dd"), name)


def nsphere_magnitude(*ds: Column) -> Column:
    """sqrt(sum d_i^2) (SpectralFeaturesOp.java:86-141)."""
    s = None
    for d in ds:
        t = d * d
        s = t if s is None else s + t
    return F.sqrt(s)


def nsphere_angle(i: int, *ds: Column) -> Column:
    """angle_i = acos(d_i / sqrt(sum_{j>=i} d_j^2)), last angle reflected to
    2*pi - angle when the final component is negative.  Zero tail -> 0
    (degenerate direction); the acos argument is clamped to [-1, 1] against
    float drift."""
    tail = None
    for d in ds[i:]:
        t = d * d
        tail = t if tail is None else tail + t
    ratio = F.least(F.greatest(ds[i] / F.sqrt(tail), F.lit(-1.0)), F.lit(1.0))
    base = F.when(tail == 0, F.lit(0.0)).otherwise(F.acos(ratio))
    if i == len(ds) - 2:
        return F.when(ds[-1] < 0, F.lit(2 * math.pi) - base).otherwise(base)
    return base
