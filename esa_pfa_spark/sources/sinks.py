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


def write_bucketed_table(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    data_path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed catalog table (``bucketBy`` + optional in-bucket
    ``sortBy``): the co-located-join layout.  A scan of a bucketed table
    reports hash partitioning on ``keys``, so joins between two tables
    bucketed the same way — and groupBy / cogroup on the bucket keys —
    satisfy their distribution requirement WITHOUT an Exchange: the
    cluster's biggest repeated shuffle (re-partitioning a 100 TB fact
    table by entity for every run) is paid once at write time instead of
    per query.  ``sort_cols`` pre-orders within buckets (e.g. ``ts``) so
    as-of / merge consumers start from near-sorted runs.  With
    ``data_path`` the table is external (data there, metadata in the
    session catalog); plan effects are asserted in tests/test_plans.py.  (The
    registry's positional destination is the TABLE name for this sink;
    the external data location is ``data_path``.)"""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    if data_path is not None:
        w = w.option("path", data_path)
    w.format("parquet").saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 debug sink: tab-separated with header (CsvPatchWriter shape).
    Complex columns must be projected/serialized first."""
    df.write.mode(mode).option("sep", "\t").option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 analog: line-JSON golden dumps for fixtures."""
    df.write.mode(mode).json(path)


def _xml_escape(c):
    """Minimal XML text escaping (&, <, > — the characters the reference's
    XStream output escapes), as pure column expressions (codegen)."""
    out = F.regexp_replace(c.cast("string"), "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")


def write_xml(df: DataFrame, path: str, row_tag: str = "patch", mode: str = "overwrite") -> None:
    """S8 XML sink (XmlPatchWriter analog, pfa-core/.../out/XmlPatchWriter
    composed by DefaultPatchWriter.java:79-85): one ``<row_tag>`` element
    per row, fields as child elements.  Fully distributed — the element is
    built as ONE string column inside codegen and written via the text
    sink; no driver-side formatting, no coalesce(1)."""
    parts = [F.lit(f"<{row_tag}>")]
    for name in df.columns:
        parts.append(F.lit(f"<{name}>"))
        parts.append(F.coalesce(_xml_escape(F.col(name)), F.lit("")))
        parts.append(F.lit(f"</{name}>"))
    parts.append(F.lit(f"</{row_tag}>"))
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)


def write_kml(
    df: DataFrame,
    path: str,
    name_col: str = "name",
    lat_col: str = "lat",
    lon_col: str = "lon",
    mode: str = "overwrite",
) -> None:
    """S8 KML sink (KmlPatchWriter analog): one Placemark per row with a
    Point at (lon, lat).  Same distributed string-column shape as
    ``write_xml`` (a KML viewer concatenates the part files under one
    Document wrapper — the wrapper is presentation, the placemarks are
    the data)."""
    pm = F.concat(
        F.lit("<Placemark><name>"),
        F.coalesce(_xml_escape(F.col(name_col)), F.lit("")),
        F.lit("</name><Point><coordinates>"),
        F.col(lon_col).cast("string"),
        F.lit(","),
        F.col(lat_col).cast("string"),
        F.lit("</coordinates></Point></Placemark>"),
    )
    df.select(pm.alias("value")).write.mode(mode).text(path)


def write_html_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8 HTML sink (HtmlPatchWriter analog): one ``<tr>`` per row (cells
    escaped); the page shell around the rows is presentation, left to the
    consumer.  Distributed string build, text sink."""
    parts = [F.lit("<tr>")]
    for name in df.columns:
        parts.append(F.lit("<td>"))
        parts.append(F.coalesce(_xml_escape(F.col(name)), F.lit("")))
        parts.append(F.lit("</td>"))
    parts.append(F.lit("</tr>"))
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)


SINKS: dict[str, Callable] = {
    "parquet": write_parquet,
    "dated_parquet": write_dated,
    "bucketed_parquet": write_bucketed,
    # (df, table_name, keys=...) — catalog table, co-located-join layout
    "bucketed_table": write_bucketed_table,
    "csv": write_csv,
    "json": write_json,
    "xml": write_xml,
    "kml": write_kml,
    "html": write_html_table,
}


def write(df: DataFrame, sink: str, path: str, **kwargs) -> None:
    """Factory-style dispatch (PatchWriterFactory analog)."""
    try:
        fn = SINKS[sink]
    except KeyError:
        raise ValueError(f"unknown sink '{sink}'; available: {sorted(SINKS)}") from None
    fn(df, path, **kwargs)
