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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PART_COL = "__part_id"


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
        partitions processed in this invocation."""
        done = self.completed_partitions()
        processed = 0
        tagged = source.withColumn(PART_COL, partition_id_col(self.key, self.n_partitions))
        for pid in range(self.n_partitions):
            if pid in done:
                continue
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"simulated failure after {processed} partitions")
            t0 = time.time()
            sub = tagged.filter(F.col(PART_COL) == pid).drop(PART_COL)
            rows_in = sub.count()
            # a transform taking (df, pid) gets the partition id so it can
            # co-partition SECONDARY inputs (e.g. probes) by the same key
            # hash — filtering them against the slice's keys instead would
            # silently drop rows of keys absent from this slice
            import inspect

            if len(inspect.signature(transform).parameters) >= 2:
                out = transform(sub, pid)
            else:
                out = transform(sub)
            part_path = str(self.out_dir / f"part={pid}")
            out.write.mode("overwrite").parquet(part_path)
            committed = out.sparkSession.read.parquet(part_path)
            rows_out = committed.count()
            krange = sub.agg(
                F.min(self.key).alias("lo"), F.max(self.key).alias("hi")
            ).collect()[0]
            self._append(
                {
                    "run_id": self.run_id,
                    "partition_id": pid,
                    "key_range_lo": str(krange["lo"]),
                    "key_range_hi": str(krange["hi"]),
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "checksum": str(output_checksum(committed)),
                    "status": "done",
                    "wall_ms": int((time.time() - t0) * 1000),
                }
            )
            processed += 1
        return processed

    def read_output(self, spark) -> DataFrame:
        return spark.read.parquet(str(self.out_dir / "part=*"))
