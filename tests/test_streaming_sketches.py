"""Streaming CMS cells / HLL registers: multi-micro-batch streaming
state must equal the batch sketch of the whole corpus (mergeability,
enforced by the engine's own partial-agg machinery), with bounded
state and no watermark."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from esa_pfa_spark.operators.profile import cms_build, hll_registers
from esa_pfa_spark.streaming.sketches import stream_cms, stream_hll_registers


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["grp", "v"]), schema="grp string, v long"
    ).repartition(1).write.mode("append").parquet(str(path))


def _rows(lo, hi):
    return [("g" + str(v % 3), v % 500) for v in range(lo, hi)]


def test_stream_cms_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(spark, src, _rows(0, 700))
    _write_batch(spark, src, _rows(700, 1500))
    stream = (
        spark.readStream.schema("grp string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_cms(stream, "v", width=64, depth=3)
        .writeStream.format("memory").queryName("cms_sink")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from cms_sink").collect()))
    whole = spark.createDataFrame(
        pd.DataFrame(_rows(0, 1500), columns=["grp", "v"]),
        schema="grp string, v long",
    )
    want = sorted(map(tuple, cms_build(whole, "v", width=64, depth=3).collect()))
    assert got == want


def test_stream_hll_registers_equal_batch(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(spark, src, _rows(0, 400))
    _write_batch(spark, src, _rows(400, 900))
    _write_batch(spark, src, _rows(900, 1200))
    stream = (
        spark.readStream.schema("grp string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_hll_registers(stream, "v", group_col="grp", p=6)
        .writeStream.format("memory").queryName("hll_sink")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from hll_sink").collect()))
    whole = spark.createDataFrame(
        pd.DataFrame(_rows(0, 1200), columns=["grp", "v"]),
        schema="grp string, v long",
    )
    want = sorted(
        map(tuple, hll_registers(whole, "v", group_col="grp", p=6).collect())
    )
    assert got == want
    # bounded state: never more than 2^p registers per group
    per_group = spark.sql(
        "select grp, count(*) n from hll_sink group by grp"
    ).collect()
    assert all(r["n"] <= 64 for r in per_group)
