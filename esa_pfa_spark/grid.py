"""Deterministic global grid bucketing — the PatchCS / PatchGrid analog.

Semantics (pfa-bitemp-fex/.../PatchCS.java:57-61; pfa-core/.../op/
PatchGrid.java:51-64): ``patchX = floor((lon + 180) / extent)``,
``patchY = floor((90 - lat) / extent)``; patch names formatted
``x%03dy%03d`` (Patch.java:80-82) / ``X%04dY%04d`` (PatchCS.java:25-27).

These bucketing expressions are the engine's range-partitioning basis:
equal keys land in equal buckets with no resampling at join time — the
reference's manual co-partitioning trick (SURVEY.md §4), free here as a
Column expression usable in repartition()/partitionBy().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_x(lon: Column, extent_deg: float) -> Column:
    return F.floor((lon + F.lit(180.0)) / F.lit(extent_deg)).cast("int")


def bucket_y(lat: Column, extent_deg: float) -> Column:
    return F.floor((F.lit(90.0) - lat) / F.lit(extent_deg)).cast("int")


def bucket_value(v: Column, width: float, offset: float = 0.0) -> Column:
    """Generic 1-D grid bucketing: floor((v + offset) / width)."""
    return F.floor((v + F.lit(offset)) / F.lit(width)).cast("int")


def patch_name(x: Column, y: Column) -> Column:
    """'x%03dy%03d' (Patch.java:80-82)."""
    return F.format_string("x%03dy%03d", x, y)


def patch_name_wide(x: Column, y: Column) -> Column:
    """'X%04dY%04d' (PatchCS.java:25-27)."""
    return F.format_string("X%04dY%04d", x, y)
