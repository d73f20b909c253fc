"""Snapshot-versioned parquet tables: time travel, snapshot isolation,
optimistic commit conflict, manifest envelope pruning, hidden
partitioning, CDC between versions — the Iceberg-semantics fallback
(sources/versioned.py) that runs WITHOUT the runtime jar, mirroring what
tests/test_iceberg_gated.py covers when a jar is present."""

from __future__ import annotations

import datetime as dt
import json
import re

import pytest
from pyspark.sql import functions as F

from esa_pfa_spark.sources.versioned import (
    CommitConflict,
    diff_versions,
    read_versioned,
    versions,
    write_versioned,
)

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(days=d), v) for i, d, v in rows],
        "id bigint, ts timestamp, v double",
    )


def test_append_time_travel_and_snapshot_isolation(spark, tmp_path):
    root = tmp_path / "t"
    v1 = write_versioned(_df(spark, [(1, 0, 1.0), (2, 1, 2.0)]), root)
    v2 = write_versioned(_df(spark, [(3, 2, 3.0)]), root, mode="append")
    assert (v1, v2) == (1, 2)
    assert versions(root) == [1, 2]
    latest = read_versioned(spark, root)
    assert sorted(r["id"] for r in latest.collect()) == [1, 2, 3]
    asof1 = read_versioned(spark, root, version=1)
    assert sorted(r["id"] for r in asof1.collect()) == [1, 2]
    # overwrite publishes a new snapshot but never rewrites old ones
    write_versioned(_df(spark, [(9, 5, 9.0)]), root, mode="overwrite")
    assert [r["id"] for r in read_versioned(spark, root).collect()] == [9]
    assert sorted(r["id"] for r in read_versioned(spark, root, 2).collect()) == [1, 2, 3]


def test_commit_conflict_is_detected(spark, tmp_path):
    root = tmp_path / "t"
    write_versioned(_df(spark, [(1, 0, 1.0)]), root)
    # this writer read v1 as its base; another writer wins the race for v2
    (root / "snapshots" / "v2.json").write_text(
        json.dumps({"version": 2, "parent": 1, "operation": "append",
                    "columns": ["id", "ts", "v"], "schema_ddl": "id bigint",
                    "data": []})
    )
    with pytest.raises(CommitConflict):
        write_versioned(_df(spark, [(2, 0, 2.0)]), root, mode="append",
                        expected_parent=1)
    # no stray temp manifests left behind
    leftovers = [p.name for p in (root / "snapshots").iterdir()
                 if p.name.startswith(".tmp")]
    assert leftovers == []
    # without the base-snapshot predicate, the late writer re-reads the
    # log and appends as v3 (last-writer-appends, never silent overwrite)
    assert write_versioned(
        _df(spark, [(2, 0, 2.0)]), root, mode="append"
    ) == 3


def test_schema_mismatch_rejected(spark, tmp_path):
    root = tmp_path / "t"
    write_versioned(_df(spark, [(1, 0, 1.0)]), root)
    other = spark.createDataFrame([(1, "x")], "id bigint, name string")
    with pytest.raises(ValueError, match="schema mismatch"):
        write_versioned(other, root, mode="append")


def test_envelope_pruning_skips_dirs(spark, tmp_path):
    root = tmp_path / "t"
    jan = _df(spark, [(i, i % 20, float(i)) for i in range(40)])        # days 0-19
    jun = _df(spark, [(100 + i, 150 + i % 20, float(i)) for i in range(40)])  # days 150-169
    write_versioned(jan.coalesce(1), root, prune_cols=["ts"])
    write_versioned(jun.coalesce(1), root, mode="append", prune_cols=["ts"])

    pruned = read_versioned(
        spark, root,
        prune={"ts": (T0 + dt.timedelta(days=140), T0 + dt.timedelta(days=200))},
    )
    full = read_versioned(spark, root)
    # the pruned scan plans files from ONE data dir, the full scan from two
    dirs = {re.sub(r"/part-[^/]+$", "", f) for f in pruned.inputFiles()}
    assert len(dirs) == 1
    assert len({re.sub(r"/part-[^/]+$", "", f) for f in full.inputFiles()}) == 2
    assert sorted(r["id"] for r in pruned.collect()) == list(range(100, 140))
    # disjoint range prunes everything and still returns the right schema
    none = read_versioned(
        spark, root,
        prune={"ts": (T0 + dt.timedelta(days=400), T0 + dt.timedelta(days=500))},
    )
    assert none.count() == 0
    assert none.columns == ["id", "ts", "v"]


def test_hidden_partitioning_round_trip(spark, tmp_path):
    root = tmp_path / "t"
    df = _df(spark, [(i, i % 3, float(i)) for i in range(30)])
    write_versioned(
        df, root,
        partition_transforms={"__day": F.to_date(F.col("ts"))},
    )
    back = read_versioned(spark, root)
    # readers see exactly the user schema — the transform column is hidden
    assert back.columns == ["id", "ts", "v"]
    assert back.count() == 30
    # the physical layout IS partitioned by the hidden column
    day_dirs = [p for p in (root.glob("data/*/__day=*"))]
    assert len(day_dirs) == 3


def test_diff_versions_cdc(spark, tmp_path):
    root = tmp_path / "t"
    write_versioned(_df(spark, [(1, 0, 1.0), (2, 0, 2.0), (3, 0, 3.0)]), root)
    write_versioned(
        _df(spark, [(2, 0, 2.0), (3, 0, 30.0), (4, 0, 4.0)]), root,
        mode="overwrite",
    )
    out = {r["id"]: r["change_type"]
           for r in diff_versions(spark, root, 1, 2, key_cols=["id"]).collect()}
    assert out == {1: "delete", 2: "unchanged", 3: "update", 4: "insert"}
