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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def diversity_pick(
    df: DataFrame,
    decision_col: str,
    vec_col: str,
    k: int = 15,
    n_pick: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Uncertainty ranking THEN diversity selection — the reference's full
    getMostAmbiguous (ActiveLearning.java:116-149, 501-532 hands the
    q-ambiguous set to KernelKmeansClusterer.java:67-106 for a diversity
    pass).  Here the diversity stage is deterministic greedy farthest-point:
    seed = the single most ambiguous vector, then repeatedly add the
    candidate maximizing the MIN squared Euclidean distance to the selected
    set (ties -> lowest id).  Returns (id_col, pick_order 1..n_pick).

    Scale shape: the ranking is distributed (TakeOrderedAndProject merges
    per-partition k-heaps); the greedy pass sees only the k survivors in
    ONE tiny applyInPandas group — mirroring the reference, which also
    clusters the ambiguous set driver-side, but without collect()."""
    cand = most_ambiguous(
        df.select(id_col, decision_col, vec_col), decision_col, k, tiebreak=id_col
    )
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [id_field, T.StructField("pick_order", T.IntegerType(), False)]
    )

    def picker(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["__a"] = pdf[decision_col].abs()
        pdf = pdf.sort_values(["__a", id_col]).reset_index(drop=True)
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        ids = pdf[id_col].to_numpy()
        m = min(n_pick, len(pdf))
        sq = (V * V).sum(axis=1)
        sel = [0]
        d = sq + sq[0] - 2.0 * (V @ V[0])
        for _ in range(1, m):
            d[sel] = -np.inf
            best = int(np.lexsort((ids, -d))[0])  # max min-dist, tie lowest id
            sel.append(best)
            d = np.minimum(d, sq + sq[best] - 2.0 * (V @ V[best]))
        return pd.DataFrame(
            {id_col: ids[sel], "pick_order": np.arange(1, m + 1, dtype=np.int32)}
        )

    # a materialized constant grouping column (groupBy(lit(1)) resolves as a
    # GROUP BY ordinal and fails analysis)
    return (
        cand.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(picker, schema=out_schema)
    )


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


def top_k_per_group(
    df: DataFrame,
    group: str,
    col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k WITHIN each group — the partitioned-window form (adds
    ``rank`` 1..k per group).  Unlike global top-k (which must avoid the
    partition-less window and compile to TakeOrderedAndProject — see
    ``top_k``), a window partitioned by the group key IS the scale-safe
    plan: ranking parallelizes across groups, one Exchange on the group
    hash.  Per-group cardinality is the only skew axis; a hot group
    sorts in one task — the same bound as any per-key window here."""
    cols = [F.col(col).desc() if descending else F.col(col).asc()]
    if tiebreak:
        cols.append(F.col(tiebreak).asc())
    w = Window.partitionBy(group).orderBy(*cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
