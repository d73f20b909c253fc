"""Deduplication operators for training-data pipelines.

Exact dedup (hash-groupBy), n-gram Jaccard near-dup, MinHash signatures +
LSH banding, SimHash.  Everything is built-in DataFrame functions; the
hashing primitive is md5 (bit-identical across Spark / DuckDB / Python,
so every operator here has an exact SQL oracle).

Scale notes (100 TB): exact dedup is one hash-partitioned groupBy on the
digest.  The shingle self-join is quadratic ONLY within a shingle bucket —
identical to the LSH-banding shape production systems use; hot shingles
(stop-shingles) should be dropped with a frequency cap before the join
(df filter on shingle doc-frequency), which keeps bucket sizes bounded.
MinHash banding reduces the join to signature-equality buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 6  # two bands of three
SHINGLE_K = 3


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content digest."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


def shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Distinct k-word shingles per doc: (doc_id, shingle).
    Word split: single space (portability contract with the SQL oracle).

    The split is materialized ONCE per row before the shingle transform —
    a lambda that re-splits the text per shingle index is O(words²) string
    work per document (measured ~25% of the whole near-dup query)."""
    ws = F.split(F.col(text_col), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(F.col("__ws")) - k),
        lambda i: F.concat_ws(" ", F.slice(F.col("__ws"), i + F.lit(1), k)),
    )
    return (
        df.withColumn("__ws", ws)
        .filter(F.size(F.col("__ws")) >= k)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


MAX_SHINGLE_FREQ = 1000


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.2,
    max_shingle_freq: int | None = MAX_SHINGLE_FREQ,
    skew_safe: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by k-shingle Jaccard >= threshold.

    Plan shape: shingle table -> ONE doc-frequency pass fusing the
    stop-shingle cap AND the singleton prune -> self equi-join on shingle
    -> count intersections -> join per-doc sizes -> ratio filter.  The
    equi-join is hash-partitioned by shingle; the frequency cap bounds
    per-bucket fan-out, so the plan scales linearly in total shingle count.

    NOT a silent cap: shingles appearing in more than ``max_shingle_freq``
    docs ("of the and"-style stop-shingles) are EXCLUDED from both the
    intersection AND the per-doc sizes — the Jaccard is computed over the
    capped shingle sets, a deliberate, documented semantic (the SQL oracle
    applies the identical cap).  Without it a hot shingle's bucket emits
    O(df^2) pairs — at web scale a single stop-shingle with df=10^8 would
    attempt 10^16 pairs.  Pass ``max_shingle_freq=None`` to uncap (only
    sane for small oracle runs).

    Singleton shingles (df=1) cannot contribute to any intersection, so
    they are dropped before the self-join; the per-doc sizes keep them for
    the union term, so the result is identical.  On web corpora most
    shingles are singletons — this prunes the join's dominant cost.

    ``skew_safe`` picks how doc-frequency is computed:
      * True (default): groupBy(shingle) partial-agg + equi-join back —
        a hot stop-shingle is counted map-side (tiny shuffle) and streams
        through the join probe (AQE-skew-splittable, no per-key state).
        The right default when mega-df shingles are expected, i.e. any
        uncurated web corpus.
      * False: partition-by-shingle window count — halves scans/shuffles
        (14 Exchanges/8 scans -> 10/4; 3.7s -> 1.7s warm at sf0.1) but a
        df=10^8 shingle then SORTS in a single window task (spill /
        straggler).  Only for corpora with known-bounded shingle df."""
    from pyspark.sql import Window as W

    sh = shingles(df, text_col)
    cap = max_shingle_freq
    if skew_safe:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        if cap is not None:
            freq = freq.filter(F.col("__df") <= cap)
        shj = sh.join(freq, "shingle")
    else:
        shj = sh.withColumn("__df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        if cap is not None:
            shj = shj.filter(F.col("__df") <= cap)
    sizes = shj.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    core = shj.filter(F.col("__df") >= 2).select("doc_id", "shingle")
    a = core.select(F.col("doc_id").alias("doc_id_a"), "shingle")
    b = core.select(F.col("doc_id").alias("doc_id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("s").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("s").alias("sb"))
    jac = F.col("i") * 1.0 / (F.col("sa") + F.col("sb") - F.col("i"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .filter(jac >= threshold)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", n_hashes: int = N_MINHASH) -> DataFrame:
    """MinHash signature per doc: the k-th hash function is
    ``min(md5('s<k>:' || shingle))`` — min over hex digests is a valid
    permutation-min and is engine-portable (md5 is bit-identical)."""
    sh = shingles(df, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{k}:"), F.col("shingle")))).alias(f"mh{k}")
        for k in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_candidates(
    df: DataFrame, text_col: str = "text", max_band_freq: int | None = None
) -> DataFrame:
    """LSH banding over the 6-hash signature (2 bands x 3 rows): candidate
    pairs agree on ALL hashes of at least one band.  The band join is an
    equi-join on the concatenated band key — the bucket-join scale path.

    Hot-bucket caveat (same class as the n-gram stop-shingle blowup): an
    EXACT-duplicate cluster of n docs shares every band, so its bucket
    emits O(n²) pairs.  The standard pipeline order is exact_dedup FIRST
    (collapsing identical docs to one canonical id), after which band
    buckets hold only near-dups and stay small.  ``max_band_freq`` is the
    belt-and-braces cap for corpora where that ordering can't be assumed:
    buckets with more than that many docs are dropped (and should be
    routed to exact dedup instead) — mirror any cap in the oracle."""
    sig = minhash_signatures(df, text_col)
    bands = [("band0", ["mh0", "mh1", "mh2"]), ("band1", ["mh3", "mh4", "mh5"])]
    outs = []
    for name, cols in bands:
        keyed = sig.select("doc_id", F.concat_ws("|", *cols).alias("bk"))
        if max_band_freq is not None:
            freq = keyed.groupBy("bk").agg(F.count(F.lit(1)).alias("__bf"))
            keyed = keyed.join(
                freq.filter(F.col("__bf") <= max_band_freq).select("bk"), "bk"
            )
        l = keyed.select(F.col("doc_id").alias("doc_id_a"), "bk")
        r = keyed.select(F.col("doc_id").alias("doc_id_b"), "bk")
        outs.append(
            l.join(r, "bk").filter(F.col("doc_id_a") < F.col("doc_id_b")).select("doc_id_a", "doc_id_b")
        )
    return outs[0].unionByName(outs[1]).distinct()


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over distinct words: bit b is the sign of
    sum(+1/-1 for bit b of md5(word)[0:4]).  Portable: hex->int via
    conv(), bit ops via shiftright/&."""
    words = df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("int")
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(16)
        ]
    )
    sim = None
    for b in range(16):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.cast("int").alias("simhash"))
