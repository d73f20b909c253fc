"""Data-layout optimization: Morton (z-order) clustering keys and
min-max pruning statistics.

At 100 TB the fastest scan is the one that never happens: Parquet /
Iceberg row-group pruning skips files whose min-max envelope misses the
predicate.  A table sorted on ONE column prunes that column only;
interleaving the bits of several columns (z-ordering — what Delta
`OPTIMIZE ZORDER BY` and Iceberg sort orders do) gives every
interleaved dimension partial locality, so multi-dimensional boxes
prune on all of them at once.  SURVEY §4's "Parquet/Iceberg min-max +
sketch skipping" is the consuming context; the reference's analog is
the uniform PatchCS cell grid (pfa-bitemp-fex PatchCS.java) that makes
spatial queries block-local by construction.

Everything here is exact integer bit algebra (unrolled shift/mask
terms — identical expressions in Spark and the SQL oracle), so layout
quality is measured, not asserted: ``file_minmax_stats`` simulates the
write (ntile buckets over the cluster order = files), and the query
counts which files a box predicate would actually touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def morton_terms(bits: int) -> list[tuple[int, int, int]]:
    """(source_shift, select_from_x, out_shift) triples for a 2-D
    interleave — shared by the Spark expression and the SQL oracle
    builder so both engines compute the identical key."""
    out = []
    for i in range(bits):
        out.append((i, 1, 2 * i))      # bit i of x -> bit 2i
        out.append((i, 0, 2 * i + 1))  # bit i of y -> bit 2i+1
    return out


def morton_key(x, y, bits: int = 8):
    """Z-order key of two non-negative ints with ``bits`` significant
    bits each: bit i of x lands at 2i, bit i of y at 2i+1.  Pure JVM
    integer algebra (whole-stage codegen), exact in any engine."""
    x = x.cast("long")
    y = y.cast("long")
    key = F.lit(0).cast("long")
    for src_shift, from_x, out_shift in morton_terms(bits):
        bit = F.shiftright(x if from_x else y, src_shift).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(bit, out_shift)
    return key


def morton_sql(x_sql: str, y_sql: str, bits: int = 8) -> str:
    """The identical interleave as a SQL expression string."""
    # each term fully parenthesized: SQL's << binds looser than +
    terms = [
        f"(((({x_sql if from_x else y_sql}) >> {s}) & 1) << {o})"
        for s, from_x, o in morton_terms(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def file_minmax_stats(
    df: DataFrame,
    order_cols: list,
    n_files: int,
    stat_cols: list[str],
) -> DataFrame:
    """Simulate a clustered write: rank rows by ``order_cols`` (a total
    order — pass tie-breakers), cut into ``n_files`` equal ntile
    buckets ("files"), and report each file's min-max envelope over
    ``stat_cols`` — exactly the footer stats a reader would prune on.

    The global ntile window is the SIMULATION device (test-scale);
    a production write gets the same layout from write-time range
    partitioning / Iceberg sort orders — no global window exists there.
    """
    w = Window.orderBy(*order_cols)
    tiled = df.select(
        F.ntile(n_files).over(w).alias("file_id"), *stat_cols
    )
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return tiled.groupBy("file_id").agg(*aggs)


def files_scanned(stats: DataFrame, box: dict[str, tuple[int, int]]):
    """Count files whose min-max envelope intersects the box
    ``{col: (lo, hi)}`` — the files a pruning reader must open."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    return stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(cond.cast("int")).alias("files_scanned"),
    )
