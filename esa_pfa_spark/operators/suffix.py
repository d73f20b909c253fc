"""Distributed generalized suffix array over a tokenized corpus —
prefix doubling with a shrinking refinement set — and the exact
maximal-duplicate-substring query it unlocks.

This is the machinery behind exact-substring deduplication (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better", whose
dedup tool builds a corpus suffix array): the engine's fixed-n
fingerprint spans (``tokens.dup_ngram_spans``) answer "where do
duplicated n-grams sit" for ONE n; the suffix array answers the exact
question — the longest duplicated token substring of ANY length, and
suffix order itself.

Why prefix doubling (Manber & Myers 1990) and not "sort the suffixes":
materializing suffixes costs O(T * avg_len) bytes; doubling keeps ONE
rank per position (O(T) rows) and refines it over log rounds.  Two
scale devices on top of the textbook recurrence:

  * **Rank-by-count semantics** (rank = number of strictly-smaller
    suffixes, ties share a rank): the initial ranking is ONE global
    pass (groupBy key -> range-partitioned cumulative-count numbering,
    the dense_ids/pack_offsets pattern — no global window); every
    subsequent round updates ranks with a WINDOW PARTITIONED BY THE TIE
    GROUP (never partition-less), because a tied group's members can
    only move within the group's own rank span.
  * **Shrinking refinement set**: positions whose rank is already
    unique are final and leave the working set; each round touches only
    still-tied positions.  For natural corpora the tied mass collapses
    to the true duplicate mass after the first round (k0-token packed
    keys), so total work is O(T + dup_mass * log(max_len)) rather than
    O(T log(max_len)).  Using already-refined neighbor ranks as the
    secondary key (over-refinement) is sound — it only splits ties
    earlier — and accelerates convergence.

Suffixes are document-local (a generalized suffix array: they end at
their document's end — the Lee et al. corpus shape, no separator
tokens needed).  Round state is ``localCheckpoint``-ed (the pagerank
lineage-cut discipline).  Distributed doubling at cluster scale is
textbook (Flick & Aluru 2015); the refinement-set form is the same
recurrence restricted to unresolved groups.

Token values MUST be non-negative (vocabulary ids are): the "suffix
ended" sentinel is -1 / packed 0, which must sort strictly below every
real rank so shorter suffixes order first.  Violations raise at
execution time rather than mis-sorting.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark import TaskContext
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cumcount_rank(
    counts: DataFrame,
    key_col: str,
    cnt_col: str,
    out_col: str,
    n_partitions: int,
):
    """rank-by-count over distinct sorted keys: for each key, the total
    count of all strictly-smaller keys.  Range-partition + in-partition
    sort, one n_partitions-row action for per-partition count sums ->
    cumulative offsets, one zero-copy mapInArrow running-sum pass (the
    pack_offsets pattern).  Returns (mapping_df, pinned_cache)."""
    ranged = (
        counts.repartitionByRange(n_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .persist()  # pin ONE sampled partitioning for both passes
    )
    sums = (
        ranged.select(F.spark_partition_id().alias("__pid"), cnt_col)
        .groupBy("__pid")
        .agg(F.sum(cnt_col).alias("__s"))
        .collect()
    )
    totals = np.zeros(n_partitions, dtype=np.int64)
    for r in sums:
        totals[r["__pid"]] = r["__s"]
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])

    out_schema = T.StructType(
        [
            counts.schema[key_col],
            counts.schema[cnt_col],
            T.StructField(out_col, T.LongType(), False),
        ]
    )

    def number(batches):
        import pyarrow as pa

        running = int(offsets[TaskContext.get().partitionId()])
        for b in batches:
            c = b.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ranks = running + np.concatenate([[0], np.cumsum(c)[:-1]])
            running += int(c.sum())
            yield pa.RecordBatch.from_arrays(
                [b.column(key_col), b.column(cnt_col),
                 pa.array(ranks, type=pa.int64())],
                [key_col, cnt_col, out_col],
            )

    return ranged.mapInArrow(number, schema=out_schema), ranged


def suffix_order(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    max_token: int = 2**31 - 1,
    fanout: int = 8,
) -> DataFrame:
    """Generalized suffix array of the corpus: one row per (document,
    offset) suffix with ``sa_idx`` — the suffix's 0-based position in
    global lexicographic suffix order (shorter-prefix-first; ties
    between byte-identical suffixes broken by (id_col, off), making the
    order total and engine-portable).

    Initial keys pack k0 = floor(62 / log2(max_token + 2)) leading
    tokens into one int64 (absent slots = 0, so shorter prefixes sort
    first).  Each round widens the compared prefix by ``fanout``x (a-ary
    refinement, not plain doubling: the fanout-1 neighbor-rank lookups
    are doc-local leads sharing ONE window exchange, so a wider round
    costs the same two exchanges as a binary one), giving
    ceil(log_fanout(max_len / k0)) rounds; only still-tied positions
    re-rank (module docstring).  Returns (id_col, off, sa_idx); ``off``
    is 0-based."""
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    k0 = max(1, int(62 // math.log2(max_token + 2)))
    base = int(max_token) + 2  # +1 for the value shift, +1 so 0 = absent

    toks = F.col(tokens_col)
    guarded = F.transform(
        toks,
        lambda t: F.when((t >= 0) & (t <= max_token), t.cast("long") + 1).otherwise(
            F.raise_error(
                F.lit(
                    "suffix_order: token outside [0, max_token] breaks "
                    "sentinel ordering; remap ids or raise max_token"
                )
            )
        ),
    )
    # packed key per position: sum_{i<k0} shifted[p+i] * base^(k0-1-i);
    # try_element_at (1-based) returns NULL past the end under ANSI mode,
    # and the coalesce(0) encodes "suffix ended" below every real token
    packed = F.expr(
        f"transform(sequence(1, size(__t1)), p -> "
        f"aggregate(sequence(0, {k0} - 1), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc * CAST({base} AS BIGINT)"
        f" + coalesce(try_element_at(__t1, p + i), CAST(0 AS BIGINT))))"
    )
    pos = (
        df.select(F.col(id_col).alias("__d"), guarded.alias("__t1"))
        .select("__d", F.posexplode(packed).alias("off", "__key"))
        .localCheckpoint()  # consumed twice (counts + rank join): compute
        # the tokenize/pack/explode lineage once, not per consumer
    )

    counts = pos.groupBy("__key").agg(F.count(F.lit(1)).alias("__c"))
    mapping, pin = _cumcount_rank(counts, "__key", "__c", "__r", n_partitions)
    ranks = (
        pos.join(mapping, "__key")
        .select("__d", "off", "__r", (F.col("__c") > 1).alias("__tied"))
        .localCheckpoint()
    )
    pin.unpersist()

    max_len = df.select(F.max(F.size(toks))).first()[0] or 0
    span = k0
    # resolved rows never change rank again: accumulate them as a lazy
    # union of checkpointed pieces and checkpoint ONLY the shrinking
    # active set each round — writes total O(T + sum active_t) instead
    # of O(T * rounds)
    resolved = ranks.filter(~F.col("__tied")).drop("__tied")
    active = ranks.filter("__tied").drop("__tied")
    w_doc = Window.partitionBy("__d").orderBy("off")
    r2s = [f"__r{i}" for i in range(1, fanout)]
    w_grp = Window.partitionBy("__r").orderBy(*r2s)
    while span < max_len and not active.isEmpty():
        # the neighbor ranks at off + i*span are DOC-LOCAL (suffixes
        # never cross documents) and offsets are dense, so lead(i*span)
        # over the doc partition replaces self-equi-joins — and ALL
        # fanout-1 leads ride ONE exchange on __d, which is why a-ary
        # refinement (span *= fanout per round) costs the same per round
        # as classic doubling while needing log_fanout rounds.  Computed
        # for all rows because a led row may itself be resolved.
        full = resolved.select(
            "__d", "off", "__r", F.lit(False).alias("__tied")
        ).unionByName(
            active.select("__d", "off", "__r", F.lit(True).alias("__tied"))
        )
        withr2 = full.select(
            "__d", "off", "__r", "__tied",
            *[
                F.coalesce(F.lead("__r", i * span).over(w_doc), F.lit(-1))
                .alias(f"__r{i}")
                for i in range(1, fanout)
            ],
        )
        # both windows below share one exchange: HashPartitioning(__r)
        # satisfies the (__r, __r1..) clustering of the count window
        upd = (
            withr2.filter("__tied")
            .select(
                "__d", "off",
                (F.col("__r") + F.rank().over(w_grp) - 1).alias("__r"),
                (F.count(F.lit(1)).over(
                    Window.partitionBy("__r", *r2s)
                ) > 1).alias("__tied"),
            )
            .localCheckpoint()  # materializes; lineage cut per round
        )
        resolved = resolved.unionByName(upd.filter(~F.col("__tied")).drop("__tied"))
        active = upd.filter("__tied").drop("__tied")
        span *= fanout

    # final index: rank-by-count + (doc, off) tie-break inside identical-
    # suffix groups — a window partitioned by the (small) tie group
    w_tie = Window.partitionBy("__r").orderBy("__d", "off")
    return resolved.unionByName(active).select(
        F.col("__d").alias(id_col),
        "off",
        (F.col("__r") + F.row_number().over(w_tie) - 1).alias("sa_idx"),
    )


def _adjacent_lcp(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    n_partitions: int | None,
    max_token: int,
    fanout: int,
):
    """Shared tail of the SA queries: build the suffix array, pair each
    suffix with its successor in suffix order, and compute the exact LCP
    of every adjacent pair directly on the two suffix slices with JVM
    higher-order functions (zip_with + first mismatch position) — no
    per-row Python; work is O(min suffix len) per pair, embarrassingly
    parallel (an all-levels rank-table greedy descent is the
    asymptotically tighter alternative at extreme document lengths; at
    LM context sizes the direct compare wins on constant factor and
    memory).  Returns (pairs_df, src): pairs carry
    (__da, __oa, __db, __ob, __ta, __lcp)."""
    # one materialization of the (id, tokens) projection feeds the
    # suffix-array build AND both per-side token lookups below — the
    # upstream lineage (scan + tokenizer) runs once, not four times
    src = df.select(id_col, tokens_col).localCheckpoint()
    sa = suffix_order(
        src, tokens_col=tokens_col, id_col=id_col, n_partitions=n_partitions,
        max_token=max_token, fanout=fanout,
    ).localCheckpoint()  # consumed twice (rank i and rank i+1 sides)
    docs = src.select(
        F.col(id_col).alias("__doc"), F.col(tokens_col).alias("__toks")
    )
    a = sa.select(
        F.col(id_col).alias("__da"), F.col("off").alias("__oa"),
        F.col("sa_idx").alias("__ia"),
    )
    b = sa.select(
        F.col(id_col).alias("__db"), F.col("off").alias("__ob"),
        (F.col("sa_idx") - 1).alias("__ia"),
    )
    pairs = (
        a.join(b, "__ia")
        .join(docs.withColumnRenamed("__doc", "__da")
                  .withColumnRenamed("__toks", "__ta"), "__da")
        .join(docs.withColumnRenamed("__doc", "__db")
                  .withColumnRenamed("__toks", "__tb"), "__db")
        # the zip_with below is compute-dense per row while the frame is
        # small in bytes: pin the parallelism so AQE coalescing cannot
        # serialize the comparison work
        .repartition(
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
        )
    )
    suf_a = F.slice(F.col("__ta"), F.col("__oa") + 1, F.size("__ta") - F.col("__oa"))
    suf_b = F.slice(F.col("__tb"), F.col("__ob") + 1, F.size("__tb") - F.col("__ob"))
    # zip_with pads the shorter side with NULL; (x = NULL) is NULL ->
    # coalesce(false) marks the first past-the-end slot as a mismatch, so
    # prefix-of-the-other pairs resolve to min length without a branch
    z = F.zip_with(suf_a, suf_b, lambda x, y: F.coalesce(x == y, F.lit(False)))
    first_bad = F.array_position(z, False)
    lcp = F.when(
        first_bad == 0, F.least(F.size(suf_a), F.size(suf_b))
    ).otherwise(first_bad - 1)
    return pairs.select(
        "__da", "__oa", "__db", "__ob", "__ta", lcp.cast("long").alias("__lcp")
    ), src


def longest_duplicate_span(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    max_token: int = 2**31 - 1,
    fanout: int = 8,
) -> DataFrame:
    """The longest token substring occurring at two distinct (document,
    offset) positions in the corpus — exact, any length (the statistic
    that motivates Lee et al.'s >= 50-token dedup threshold).  One row:
    ``dup_len`` and ``span_fp`` (md5 of the comma-joined span; when
    several distinct spans tie at the max, the lexicographically least
    fingerprint — well-defined regardless of suffix-order tie
    arrangement between equal suffixes).

    Classic reduction: the pair achieving the global max longest-common-
    prefix is ADJACENT in suffix order, so only T-1 adjacent pairs are
    examined (``_adjacent_lcp``).  A corpus with no repeated token at
    all yields dup_len = 0 with the empty-span fingerprint (md5 of "");
    fewer than two suffixes -> no adjacent pair -> empty result."""
    pairs, _ = _adjacent_lcp(
        df, tokens_col, id_col, n_partitions, max_token, fanout
    )
    scored = pairs.select(
        F.col("__ta").alias("__t"), F.col("__oa").alias("__o"), "__lcp"
    )
    mx = scored.agg(F.max("__lcp").alias("__m"))
    span = F.slice(F.col("__t"), F.col("__o") + 1, F.col("__m"))
    fp = F.md5(F.array_join(F.transform(span, lambda x: x.cast("string")), ","))
    return (
        scored.crossJoin(F.broadcast(mx))
        .filter(F.col("__lcp") == F.col("__m"))
        .select(F.col("__m").alias("dup_len"), fp.alias("__fp"))
        .groupBy("dup_len")
        .agg(F.min("__fp").alias("span_fp"))
    )


def duplicate_coverage(
    df: DataFrame,
    min_len: int = 16,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
    n_partitions: int | None = None,
    max_token: int = 2**31 - 1,
    fanout: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Exact per-document duplicate-token coverage at threshold
    ``min_len`` — the Lee et al. 2022 ExactSubstr statistic: for each
    document, how many of its token positions sit inside SOME substring
    of >= ``min_len`` tokens that also occurs elsewhere in the corpus
    (a second (document, offset) position — including elsewhere in the
    same document)?  This is the exact quantity the fixed-n fingerprint
    mask (``tokens.token_loss_mask``) approximates with one n; the
    dedup decision "drop/mask spans of >= 50 duplicated tokens" reads
    directly off it.

    Correctness rests on the LCP-interval property: suffixes sharing a
    >= L prefix form a CONTIGUOUS block in suffix order, and a suffix's
    longest prefix shared with ANY other suffix equals the max of its
    two adjacent LCPs — so emitting BOTH sides' intervals
    ``[off, off + lcp)`` of every adjacent pair with lcp >= L and
    unioning per document covers exactly the duplicated positions.

    Shape: ``_adjacent_lcp`` (suffix array + adjacent LCP) -> filter to
    lcp >= L (the frame collapses to the duplicate mass) -> 2 interval
    rows per surviving pair -> classic sweep-line union per document
    (running-max window over a DOC-partitioned frame — never global) ->
    one row per document joined back so dup-free docs report 0.
    Returns (id_col, n_tok, dup_tokens, dup_frac)."""
    pairs, src = _adjacent_lcp(
        df, tokens_col, id_col, n_partitions, max_token, fanout
    )
    hits = pairs.filter(F.col("__lcp") >= min_len)
    iv = hits.select(
        F.col("__da").alias("__doc"), F.col("__oa").alias("__s"),
        (F.col("__oa") + F.col("__lcp")).alias("__e"),
    ).unionByName(
        hits.select(
            F.col("__db").alias("__doc"), F.col("__ob").alias("__s"),
            (F.col("__ob") + F.col("__lcp")).alias("__e"),
        )
    )
    w = Window.partitionBy("__doc").orderBy("__s", "__e")
    prev_max = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    covered = F.greatest(
        F.col("__e") - F.greatest(F.col("__s"), F.coalesce(prev_max, F.col("__s"))),
        F.lit(0),
    )
    per_doc = (
        iv.select("__doc", covered.alias("__cov"))
        .groupBy("__doc")
        .agg(F.sum("__cov").alias("__dup"))
    )
    return (
        src.select(
            id_col, F.size(tokens_col).cast("long").alias(n_tok_col)
        )
        .join(per_doc.withColumnRenamed("__doc", id_col), id_col, "left")
        .select(
            id_col,
            n_tok_col,
            F.coalesce("__dup", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("__dup", F.lit(0)).cast("double") / F.col(n_tok_col),
                round_to,
            ).alias("dup_frac"),
        )
    )
