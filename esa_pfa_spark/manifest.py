"""Checkpoint manifest: per-partition lineage + metrics + resume.

Modeled on the reference's executor->driver result records
(pfa-core/.../op/FeatureWriterResult.java:13-35, PatchResult.java:10-35)
and the BiTempPreprocessor per-patch metrics CSV
(pfa-bitemp-fex/.../BiTempPreprocessor.java:72-80,174-182), generalized to
Spark: work is split into deterministic key-range partitions
(``pmod(xxhash64(key), n_partitions)``); each partition is processed and
committed as one job with a manifest record
(run_id, partition_id, key range, rows_in/out, checksum, status, wall_ms);
an interrupted run resumes by skipping partitions whose records say "done"
— byte-identical output, zero recomputation of finished partitions.

The checksum is an order-independent fold: ``sum(xxhash64(all columns))``
over output rows — comparable across runs regardless of task scheduling.

Scale note: each partition pass filters the source by the partition id.
On a real lakehouse the source table is WRITTEN partitioned/bucketed by
this id (one-time layout choice), so each pass prunes to its own files
instead of rescanning — the filter is on the partition column.  The
manifest itself is a driver-side JSONL append (one record per partition,
tiny), mirroring how the reference collects FeatureWriterResult on the
driver.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path
from typing import Callable

import inspect

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

PART_COL = "__part_id"
BUCKET_COL = "part_id"  # physical layout column (write_bucketed / run_bucketed)


def _wants_pid(transform: Callable) -> bool:
    """A transform receives the partition id iff it declares a parameter
    named ``pid`` (or sets ``wants_pid = True``).  Arity counting misfires
    on defaulted second params / **kwargs and signature() raises for some
    builtins/partials — an explicit name check does not."""
    if getattr(transform, "wants_pid", False):
        return True
    try:
        params = inspect.signature(transform).parameters
    except (TypeError, ValueError):
        return False
    return "pid" in params


def partition_id_col(key: str, n_partitions: int):
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_partitions)).cast("int")


def output_checksum(df: DataFrame) -> int:
    """Order-independent content checksum of all columns (decimal-summed so
    ANSI mode never overflows; folded back to 64 bits driver-side)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
    row = df.agg(F.sum(h).alias("c")).collect()[0]
    return int(row["c"] or 0) % (1 << 64)


class ManifestedRun:
    """Resumable partitioned execution of ``transform`` over ``source``."""

    def __init__(
        self,
        out_dir: str,
        key: str,
        n_partitions: int = 16,
        run_id: str | None = None,
    ):
        self.out_dir = Path(out_dir)
        self.key = key
        self.n_partitions = n_partitions
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.manifest_path = self.out_dir / "manifest.jsonl"
        self.out_dir.mkdir(parents=True, exist_ok=True)

    # -- manifest I/O --------------------------------------------------
    def completed_partitions(self) -> set[int]:
        done = set()
        if self.manifest_path.exists():
            for line in self.manifest_path.read_text().splitlines():
                rec = json.loads(line)
                if rec["status"] == "done":
                    done.add(rec["partition_id"])
        return done

    def _append(self, rec: dict) -> None:
        with self.manifest_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- execution ------------------------------------------------------
    def run(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        fail_after: int | None = None,
    ) -> int:
        """Process every not-yet-done partition.  ``fail_after`` aborts after
        N newly-completed partitions (resume tests).  Returns the number of
        partitions processed in this invocation.

        Each pass re-filters ``source`` by the computed hash — a full
        rescan per partition unless the source is physically laid out by
        the id.  For the pruned path, write the source once with
        ``sources.sinks.write_bucketed`` and use ``run_bucketed``."""
        tagged = source.withColumn(PART_COL, partition_id_col(self.key, self.n_partitions))
        return self._run_slices(
            lambda pid: tagged.filter(F.col(PART_COL) == pid).drop(PART_COL),
            transform,
            fail_after,
        )

    def run_bucketed(
        self,
        spark,
        source_path: str,
        transform: Callable[[DataFrame], DataFrame],
        fail_after: int | None = None,
    ) -> int:
        """``run`` over a layout produced by ``sinks.write_bucketed(...,
        key=self.key, n_partitions=self.n_partitions)``: ``part_id`` is a
        physical partition column, so each pass's filter becomes a
        PartitionFilter — the scan prunes to that partition's files instead
        of rescanning the full source (at 100 TB the difference between
        O(data) and O(data/n) input per resume slice)."""
        src = spark.read.parquet(source_path)
        return self._run_slices(
            lambda pid: src.filter(F.col(BUCKET_COL) == pid).drop(BUCKET_COL),
            transform,
            fail_after,
        )

    def _run_slices(
        self,
        slice_of: Callable[[int], DataFrame],
        transform: Callable[[DataFrame], DataFrame],
        fail_after: int | None = None,
    ) -> int:
        done = self.completed_partitions()
        processed = 0
        for pid in range(self.n_partitions):
            if pid in done:
                continue
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"simulated failure after {processed} partitions")
            t0 = time.time()
            sub = slice_of(pid)
            # rows_in + key range ride the WRITE job via an Observation on
            # the input slice — no separate count/min-max scans of the
            # source (3 rescans per partition in the naive form; the slice
            # must flow into the output query, which every transform does)
            obs = Observation(f"manifest_{self.run_id}_p{pid}")
            sub = sub.observe(
                obs,
                F.count(F.lit(1)).alias("rows_in"),
                F.min(self.key).alias("lo"),
                F.max(self.key).alias("hi"),
            )
            # a transform taking (df, pid) gets the partition id so it can
            # co-partition SECONDARY inputs (e.g. probes) by the same key
            # hash — filtering them against the slice's keys instead would
            # silently drop rows of keys absent from this slice
            out = transform(sub, pid) if _wants_pid(transform) else transform(sub)
            part_path = str(self.out_dir / f"part={pid}")
            out.write.mode("overwrite").parquet(part_path)
            metrics = obs.get
            committed = out.sparkSession.read.parquet(part_path)
            # rows_out + checksum in ONE action over the (columnar, small)
            # committed output
            h = F.xxhash64(*[F.col(c) for c in committed.columns]).cast("decimal(38,0)")
            orow = committed.agg(
                F.count(F.lit(1)).alias("n"), F.sum(h).alias("c")
            ).collect()[0]
            self._append(
                {
                    "run_id": self.run_id,
                    "partition_id": pid,
                    "key_range_lo": str(metrics["lo"]),
                    "key_range_hi": str(metrics["hi"]),
                    "rows_in": metrics["rows_in"],
                    "rows_out": orow["n"],
                    "checksum": str(int(orow["c"] or 0) % (1 << 64)),
                    "status": "done",
                    "wall_ms": int((time.time() - t0) * 1000),
                }
            )
            processed += 1
        return processed

    def read_output(self, spark) -> DataFrame:
        return spark.read.parquet(str(self.out_dir / "part=*"))
