"""Sink registry — the PatchWriter plugin surface re-expressed.

The reference selects sinks by factory class name and composes several
per run (pfa-core/.../op/out/PatchWriterFactory.java; DefaultPatchWriter
composes XML/HTML/KML/CSV, DefaultPatchWriter.java:79-85).  Here a sink is
a named strategy over DataFrameWriter; the primary sink is partitioned
Parquet (Iceberg-shaped), CSV/JSON exist for debug parity with the
reference's CsvPatchWriter/PropertiesPatchWriter (S5/S7).  The dated
layout (S9: ${outputDir}/${yyyy}/${MM}/${dd}) maps to partitionBy on
derived date columns — partition pruning replaces directory walking.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_dated(df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite") -> None:
    """S9 dated layout: partition columns y/m/d derived from the timestamp —
    time-range queries prune to the matching directories."""
    dated = (
        df.withColumn("y", F.date_format(ts_col, "yyyy"))
        .withColumn("m", F.date_format(ts_col, "MM"))
        .withColumn("d", F.date_format(ts_col, "dd"))
    )
    dated.write.mode(mode).partitionBy("y", "m", "d").parquet(path)


def write_bucketed(
    df: DataFrame,
    path: str,
    key: str,
    n_partitions: int = 16,
    mode: str = "overwrite",
) -> None:
    """One-time layout for resumable runs: materialize the manifest's
    partition id (``pmod(xxhash64(key), n)``) as a PHYSICAL partition
    column ``part_id`` and write partitioned parquet.  A subsequent
    ``ManifestedRun.run_bucketed`` pass filters on ``part_id`` and the scan
    prunes to that partition's files (PartitionFilters) instead of
    rescanning the full source per resume slice — the layout promise in
    manifest.py's scale note, delivered."""
    from esa_pfa_spark.manifest import BUCKET_COL, partition_id_col

    bucketed = df.withColumn(BUCKET_COL, partition_id_col(key, n_partitions))
    bucketed.write.mode(mode).partitionBy(BUCKET_COL).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 debug sink: tab-separated with header (CsvPatchWriter shape).
    Complex columns must be projected/serialized first."""
    df.write.mode(mode).option("sep", "\t").option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 analog: line-JSON golden dumps for fixtures."""
    df.write.mode(mode).json(path)


SINKS: dict[str, Callable] = {
    "parquet": write_parquet,
    "dated_parquet": write_dated,
    "bucketed_parquet": write_bucketed,
    "csv": write_csv,
    "json": write_json,
}


def write(df: DataFrame, sink: str, path: str, **kwargs) -> None:
    """Factory-style dispatch (PatchWriterFactory analog)."""
    try:
        fn = SINKS[sink]
    except KeyError:
        raise ValueError(f"unknown sink '{sink}'; available: {sorted(SINKS)}") from None
    fn(df, path, **kwargs)
