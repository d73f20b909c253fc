"""operators/layout.py — Morton key exactness vs a Python bit-weave
reference, and the pruning property the layout exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from esa_pfa_spark.operators.layout import (
    file_minmax_stats,
    files_scanned,
    morton_key,
    morton_sql,
)


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_reference(spark):
    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y"), 6).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y, 6), (x, y, z)


def test_morton_sql_matches_spark_expression(spark):
    df = spark.createDataFrame([(13, 57), (255, 0), (0, 255), (200, 201)], "x long, y long")
    via_sql = df.selectExpr(f"{morton_sql('x', 'y', 8)} AS z").collect()
    via_col = df.select(morton_key(F.col("x"), F.col("y"), 8).alias("z")).collect()
    assert [r["z"] for r in via_sql] == [r["z"] for r in via_col]


def test_zorder_prunes_2d_box_better_than_linear(spark):
    # uniform 128x128 grid: the 2-D box must touch fewer z-ordered
    # files than x-ordered files; the pure x-band goes the other way
    pts = [(x, y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(pts, "x int, y int").withColumn(
        "rid", F.col("x") * 128 + F.col("y")
    )
    lin = file_minmax_stats(df, [F.col("x"), F.col("rid")], 64, ["x", "y"])
    zo = file_minmax_stats(
        df, [morton_key(F.col("x"), F.col("y"), 7), F.col("rid")], 64, ["x", "y"]
    )
    box = {"x": (32, 47), "y": (96, 111)}
    n_lin = lin and files_scanned(lin, box).collect()[0]["files_scanned"]
    n_zo = files_scanned(zo, box).collect()[0]["files_scanned"]
    assert n_zo < n_lin, (n_zo, n_lin)
    xband = {"x": (32, 39)}
    assert (
        files_scanned(lin, xband).collect()[0]["files_scanned"]
        <= files_scanned(zo, xband).collect()[0]["files_scanned"]
    )
