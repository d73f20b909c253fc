"""Iceberg integration surface — SKIPPED unless the Iceberg runtime jar
is on the classpath (this sandbox ships none; the test lights up the
moment it does, so the S2/S6/S9 Iceberg mappings in SURVEY §2.1 get
runtime coverage without any code change).

Covers the three paths the engine maps onto Iceberg:
  * hidden-partitioned write (``partitionedBy(days(ts))`` — the
    ${yyyy}/${MM}/${dd} dated-layout analog, ExtractFexApp.java:275-287),
  * snapshot-isolated read + partition-pruned scan,
  * time travel (VERSION AS OF) across an append.
"""

from __future__ import annotations

import datetime as dt

import pytest

from esa_pfa_spark.sources.tables import iceberg_available, load_table


@pytest.fixture()
def iceberg_spark(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the classpath")
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    return spark


def test_iceberg_hidden_partition_write_snapshot_read_time_travel(iceberg_spark):
    spark = iceberg_spark
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("e1", t0, [1, 2, 3], 3, "src0"),
        ("e2", t0 + dt.timedelta(days=1), [4], 1, "src1"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, ts timestamp, tokens array<int>, n_tok int, source string",
    )
    # hidden partitioning: days(ts) — no explicit partition column in data
    from pyspark.sql.functions import days

    df.writeTo("it.db.seq").partitionedBy(days("ts")).createOrReplace()
    v1 = spark.read.format("iceberg").load("it.db.seq")
    assert v1.count() == 2

    # snapshot id before the append
    snap = spark.sql(
        "SELECT snapshot_id FROM it.db.seq.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).collect()[0][0]

    more = spark.createDataFrame(
        [("e3", t0 + dt.timedelta(days=2), [7, 8], 2, "src0")],
        "doc_id string, ts timestamp, tokens array<int>, n_tok int, source string",
    )
    more.writeTo("it.db.seq").append()
    assert spark.read.format("iceberg").load("it.db.seq").count() == 3

    # time travel back to the pre-append snapshot
    back = (
        spark.read.format("iceberg")
        .option("snapshot-id", snap)
        .load("it.db.seq")
    )
    assert back.count() == 2

    # partition-pruned scan: the day filter must prune to one partition
    pruned = spark.read.format("iceberg").load("it.db.seq").filter(
        "ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'"
    )
    assert pruned.count() == 1

    # the engine's loader path resolves identifiers through the catalog
    assert load_table(spark, "it.db.seq").count() == 3
