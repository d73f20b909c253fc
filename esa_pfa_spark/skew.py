"""Hot-key (skew) handling: salted repartitioning + two-phase aggregation
+ AQE configuration.

The reference never handles skew — its grid keys are uniform by
construction (PatchCS.java:57-61).  Real entity keys are Zipfian, so the
engine ships explicit remedies (SURVEY.md §4 custom-work item 2):

* ``with_salt`` — deterministic salt from row content (never rand()).
* ``salted_agg`` — two-phase algebraic aggregation: partial on
  (key, salt) then final merge on key; turns one giant reduce group into
  n_salt bounded ones.  Supported: count/sum/min/max/avg.
* AQE skew-join splitting is enabled session-wide in session.py
  (spark.sql.adaptive.skewJoin.enabled) for join-side skew.
* For order-sensitive per-key scans (as-of, pairing) salting is invalid;
  those use time-slicing instead (asof_join_pandas(chunk=...),
  find_pairs(chunk="session")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salt: int, from_cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salt): hash of ``from_cols`` (default:
    all columns).  Deterministic => re-runs produce identical partitions."""
    cols = from_cols or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs``: output_name -> (function, column); function in
    {count,sum,min,max,avg}.  Example::

        salted_agg(df, "entity_id", {"n": ("count", "*"),
                                     "total": ("sum", "value"),
                                     "mean": ("avg", "value")})
    """
    salted = with_salt(df, n_salt)
    partial_cols, final_cols = [], []
    needs_count = any(fn == "avg" for fn, _ in aggs.values())
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_cols.append(F.count(F.lit(1)).alias(f"__p_{name}"))
            final_cols.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "sum":
            partial_cols.append(F.sum(col).alias(f"__p_{name}"))
            final_cols.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "min":
            partial_cols.append(F.min(col).alias(f"__p_{name}"))
            final_cols.append(F.min(f"__p_{name}").alias(name))
        elif fn == "max":
            partial_cols.append(F.max(col).alias(f"__p_{name}"))
            final_cols.append(F.max(f"__p_{name}").alias(name))
        elif fn == "avg":
            partial_cols.append(F.sum(col).alias(f"__ps_{name}"))
            partial_cols.append(F.count(col).alias(f"__pc_{name}"))
            final_cols.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        else:
            raise ValueError(f"unsupported aggregate: {fn}")
    del needs_count
    partial = salted.groupBy(key, SALT_COL).agg(*partial_cols)
    return partial.groupBy(key).agg(*final_cols)


def explain_skew(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-frequency diagnostic: the top-N heaviest keys and their share."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(float(total)), 6))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-remedy equi-join: salt the (big, skewed) left side with a
    deterministic content hash and EXPLODE-replicate every right row
    across all ``n_salt`` salts, joining on (key, salt) — a hot key's
    left rows spread over ``n_salt`` tasks instead of one straggler.
    Output is row-identical to the plain join (property-tested).

    When to use: the right side is too large (or itself hot) to
    broadcast, and AQE skew-split can't help — e.g. a single key holding
    >2 GB where even a split task pairs the full right group.  Cost is
    deliberate: right side shuffles n_salt copies; pick n_salt ~= the
    straggler factor, not larger.  ``how`` supports inner/left — the
    replicated-right construction preserves unmatched LEFT rows (each
    left row still meets exactly one replica set), but NOT right/full
    outer (an unmatched right row would surface n_salt times)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {inner, left}")
    keys = [on] if isinstance(on, str) else list(on)
    l = with_salt(left, n_salt, from_cols=list(left.columns))
    r = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, keys + [SALT_COL], how).drop(SALT_COL)
