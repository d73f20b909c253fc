"""Query layer over the feature table — replaces the reference's Lucene /
SimpleDB stack (SURVEY.md §3.2: pfa-database/.../db/DsQueryTool.java,
LucenePatchQuery.java, SimplePatchQuery.java).

The reference parses ``field:term | field:[a TO b]`` strings into Lucene
query trees; here the query language IS Spark SQL: a predicate string goes
through ``F.expr`` into Catalyst, which pushes range predicates to the
Parquet/Iceberg scan (min-max + dictionary skipping replace Lucene's
numeric-trie index).  Random access (SimplePatchQuery.readPatch O(1)
positioned reads) maps to deterministic hash-ordered sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query(df: DataFrame, predicate: str, limit: int | None = None,
          order_by: str | None = None, descending: bool = False) -> DataFrame:
    """Boolean/range predicate query with optional deterministic top-k.
    Examples: ``"mean > 100 AND source = 'web'"``,
    ``"p90 BETWEEN 10 AND 20"`` (DsQueryTool range-syntax analog)."""
    out = df.filter(F.expr(predicate))
    if order_by is not None:
        c = F.col(order_by).desc() if descending else F.col(order_by).asc()
        out = out.orderBy(c)
    if limit is not None:
        out = out.limit(limit)
    return out


def top_k(df: DataFrame, col: str, k: int, descending: bool = True,
          tiebreak: str | None = None) -> DataFrame:
    """O2/O3: top-k with deterministic tiebreak (TakeOrderedAndProject)."""
    cols = [F.col(col).desc() if descending else F.col(col).asc()]
    if tiebreak:
        cols.append(F.col(tiebreak).asc())
    return df.orderBy(*cols).limit(k)


def most_ambiguous(df: DataFrame, decision_col: str, k: int,
                   tiebreak: str | None = None) -> DataFrame:
    """ActiveLearning.java:483-493 analog: the k rows with the smallest
    |decision value| (the uncertainty-sampling pick)."""
    scored = df.withColumn("__amb", F.abs(F.col(decision_col)))
    cols = [F.col("__amb").asc()]
    if tiebreak:
        cols.append(F.col(tiebreak).asc())
    return scored.orderBy(*cols).limit(k).drop("__amb")


def deterministic_sample(df: DataFrame, n: int, key_cols: list[str],
                         seed: int = 0) -> DataFrame:
    """O4: seeded, reproducible n-row sample — ORDER BY hash LIMIT n.
    (The reference's Math.random() sampling, DsIndexer.java:164-169, is
    deliberately NOT reproduced: every sample here is a pure function of
    (data, seed).)"""
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])
    return df.orderBy(h.asc()).limit(n)


def sample_fraction(df: DataFrame, pct: int, key_cols: list[str]) -> DataFrame:
    """Deterministic percentage gate (portable integer arithmetic)."""
    h = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(100))
    return df.filter(h < pct)


def valid_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """P6 NaN validity filter: drop rows whose feature vector contains any
    NaN, before training/scoring (pfa-database/.../activelearning/
    ActiveLearning.java:218-245).  Pure column expression — the existence
    scan runs inside codegen, no Python."""
    has_nan = F.exists(F.col(vec_col), lambda x: F.isnan(x.cast("double")))
    return df.filter(~has_nan)
