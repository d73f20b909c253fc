"""Snapshot-versioned parquet tables: the Iceberg read/write surface the
north rule names — snapshot isolation, time travel (VERSION AS OF),
optimistic-concurrency commits, manifest-level min/max file pruning, and
hidden partitioning — implemented over plain parquet + JSON manifests
for environments without the Iceberg runtime jar (this sandbox: no jar
on disk, no network; see COVERAGE.md "Iceberg runtime status").

Layout (all relative to the table root):

    data/s{version}-{uuid}/        one directory of parquet part-files
                                   per COMMIT (never rewritten, never
                                   shared between snapshots)
    snapshots/v{version}.json      immutable manifest: the full list of
                                   data dirs visible in that snapshot,
                                   per-dir min/max column envelopes,
                                   schema, parent pointer, operation

Commit protocol: the manifest is staged to a temp file and published
with ``os.link`` (hard link), which FAILS with EEXIST if another writer
already committed that version — Iceberg's optimistic-concurrency
conflict, surfaced as ``CommitConflict`` so the caller re-reads and
retries.  Readers only ever see fully-committed manifests, and a
manifest's data dirs are immutable, so reads are snapshot-isolated
without any locking.

What this intentionally does NOT replicate: Iceberg's avro manifest
lists, file-level (vs dir-level) stats granularity, and metadata
compaction — at 100 TB you run real Iceberg (the engine's query code is
format-agnostic via ``tables.load_table``); this module exists so the
lakehouse SEMANTICS the pipelines depend on (resume against a pinned
snapshot, CDC between versions, envelope pruning) are runtime-tested in
the sandbox rather than skipped.

Reference anchor: the reference's dated output layout + re-read cycle
(ExtractFexApp.java:275-287 ${yyyy}/${MM}/${dd}) is the manual form of
hidden partitioning; its "Simple DB" random-access re-reads are the
manual form of snapshot reads.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


_SNAP_RE = re.compile(r"^v(\d+)\.json$")


def _snap_dir(root: str | Path) -> Path:
    return Path(root) / "snapshots"


def versions(root: str | Path) -> list[int]:
    """Committed versions, ascending (empty list: table does not exist)."""
    d = _snap_dir(root)
    if not d.is_dir():
        return []
    out = []
    for name in os.listdir(d):
        m = _SNAP_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_manifest(root: str | Path, version: int | None = None) -> dict:
    vs = versions(root)
    if not vs:
        raise FileNotFoundError(f"no snapshots under {root}")
    v = max(vs) if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    return json.loads((_snap_dir(root) / f"v{v}.json").read_text())


def _column_envelopes(df: DataFrame, cols: list[str]) -> dict:
    """One tiny agg: per-column min/max as JSON-safe strings."""
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("string").alias(f"__min_{c}"),
                 F.max(c).cast("string").alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {
        c: {"min": row[f"__min_{c}"], "max": row[f"__max_{c}"]}
        for c in cols
    }


def write_versioned(
    df: DataFrame,
    root: str | Path,
    mode: str = "append",
    partition_transforms: dict[str, object] | None = None,
    prune_cols: list[str] | None = None,
    expected_parent: int | None = None,
) -> int:
    """Commit ``df`` as a new snapshot; returns the committed version.

    ``expected_parent``: optimistic-concurrency predicate — the version
    this writer READ before preparing the commit (Iceberg's base-snapshot
    check).  The commit targets ``expected_parent + 1`` and raises
    ``CommitConflict`` if any other writer published first — whether the
    interloper's manifest landed before this call (detected up front,
    before the parquet write) or mid-commit (detected by the atomic
    ``os.link`` publish).  Default ``None`` keeps last-writer-appends
    semantics: parent is re-read at commit time, conflicts only on the
    link race itself.

    mode="append": the new snapshot sees the parent's data dirs plus this
    commit's.  mode="overwrite": the new snapshot sees only this commit's
    (old snapshots remain readable — nothing is deleted).

    ``partition_transforms``: hidden partitioning — {"__day":
    F.to_date("ts")} writes the derived column as a directory partition
    and records it in the manifest so readers DROP it (queries never see
    or manage it, Iceberg's headline trick; dir-level pruning on the
    transform comes free from parquet partition discovery, and envelope
    pruning on the SOURCE column comes from ``prune_cols``).

    ``prune_cols``: record this commit's min/max envelope for these
    columns in the manifest; ``read_versioned(..., prune={col: (lo,
    hi)})`` skips whole data dirs whose envelope misses the range —
    Iceberg's manifest-level file pruning at dir granularity.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be append or overwrite")
    root = Path(root)
    transforms = partition_transforms or {}
    prune_cols = prune_cols or []
    user_cols = list(df.columns)

    vs = versions(root)
    if expected_parent is not None:
        parent = expected_parent
        version = parent + 1
        if parent and parent not in vs:
            raise FileNotFoundError(f"expected_parent {parent} not in {vs}")
        if version in vs:
            raise CommitConflict(
                f"version {version} was committed concurrently; retry"
            )
    else:
        parent = max(vs) if vs else 0
        version = parent + 1
    if parent:
        pman = read_manifest(root, parent)
        if pman["columns"] != user_cols:
            raise ValueError(
                f"schema mismatch: table has {pman['columns']}, "
                f"commit has {user_cols}"
            )

    out = df
    for name, expr in transforms.items():
        out = out.withColumn(name, expr)
    rel = f"data/s{version}-{uuid.uuid4().hex[:8]}"
    data_dir = root / rel
    writer = out.write.mode("error")
    if transforms:
        writer = writer.partitionBy(*transforms.keys())
    writer.parquet(str(data_dir))

    entry = {
        "dir": rel,
        "envelopes": _column_envelopes(df, prune_cols),
        "partition_cols": list(transforms.keys()),
    }
    dirs = [entry]
    if mode == "append" and parent:
        dirs = read_manifest(root, parent)["data"] + dirs

    manifest = {
        "version": version,
        "parent": parent or None,
        "operation": mode,
        "columns": user_cols,
        "schema_ddl": ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ),
        "data": dirs,
    }
    snap = _snap_dir(root)
    snap.mkdir(parents=True, exist_ok=True)
    tmp = snap / f".tmp-v{version}-{uuid.uuid4().hex[:8]}.json"
    tmp.write_text(json.dumps(manifest, indent=1))
    final = snap / f"v{version}.json"
    try:
        os.link(tmp, final)  # atomic publish; EEXIST = lost the race
    except FileExistsError as e:
        raise CommitConflict(
            f"version {version} was committed concurrently; retry"
        ) from e
    finally:
        tmp.unlink(missing_ok=True)
    return version


def _envelope_overlaps(env: dict | None, lo, hi) -> bool:
    """Conservative overlap test on stringified envelopes: numeric when
    both sides parse as float, lexicographic otherwise (matches how the
    envelope was cast); missing/NULL envelope = cannot prune = keep."""
    if not env or env["min"] is None or env["max"] is None:
        return True
    try:
        emin, emax = float(env["min"]), float(env["max"])
        qlo, qhi = float(lo), float(hi)
    except (TypeError, ValueError):
        emin, emax, qlo, qhi = env["min"], env["max"], str(lo), str(hi)
    return not (emax < qlo or emin > qhi)


def read_versioned(
    spark: SparkSession,
    root: str | Path,
    version: int | None = None,
    prune: dict[str, tuple] | None = None,
) -> DataFrame:
    """Snapshot read (latest, or VERSION AS OF ``version``), with optional
    manifest-envelope pruning: prune={"ts": (lo, hi)} skips data dirs
    whose recorded [min, max] for ``ts`` cannot intersect [lo, hi].
    Hidden-partition columns are dropped — readers see exactly the
    committed user schema.  Pruning is advisory (dirs without an
    envelope are kept); the caller still applies its own filters.
    """
    root = Path(root)
    man = read_manifest(root, version)
    keep = []
    part_cols: set[str] = set()
    for entry in man["data"]:
        part_cols.update(entry.get("partition_cols", []))
        if prune:
            envs = entry.get("envelopes", {})
            if not all(
                _envelope_overlaps(envs.get(c), lo, hi)
                for c, (lo, hi) in prune.items()
            ):
                continue
        keep.append(str(root / entry["dir"]))
    if not keep:
        return spark.createDataFrame([], man["schema_ddl"])
    df = spark.read.parquet(*keep)
    for c in sorted(part_cols):
        if c in df.columns:
            df = df.drop(c)
    return df.select(*man["columns"])


def diff_versions(
    spark: SparkSession,
    root: str | Path,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
):
    """CDC between two snapshots of the same table: insert / delete /
    update / unchanged per key (plans/diff.table_diff over two snapshot
    reads — the Iceberg changelog analog computed from state)."""
    from esa_pfa_spark.plans.diff import table_diff

    old = read_versioned(spark, root, v_from)
    new = read_versioned(spark, root, v_to)
    return table_diff(old, new, key_cols=key_cols, compare_cols=compare_cols)
