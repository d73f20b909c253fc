"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169): score every raw document by how target-domain-like its
hashed n-gram profile is, then resample toward the target distribution.
The standard pre-training curation move when you have a small high-quality
target corpus (wiki/books/eval-adjacent) and a huge raw crawl: estimate
bag-of-hashed-ngrams unigram models p_target and p_raw, weight each doc by
its log importance ratio, and Gumbel-top-k sample (equivalent to sampling
without replacement proportionally to the softmax of the weights).

Reference parity note: the reference engine's per-product feature+query
pipeline has no curation analog — this module is part of the repo's
LLM-training-data surface (SURVEY.md "beyond the reference" mandate).

Scale shape (100 TB raw corpus):
  * Feature extraction is map-only column math (split + slice/zip_with +
    the portable md5 bucket hash) — no Python, no shuffle.
  * The two distributions are groupBy(bucket) partial aggregations whose
    result is m rows (m = 4096 buckets) — map-side combine does the work,
    the reduce side is tiny, and the log-ratio table broadcasts.
  * Per-doc weights: one groupBy(doc) sum — the only real shuffle, keyed
    by the natural output key.
  * Top-k selection: TakeOrderedAndProject on the rounded Gumbel key —
    no global sort.

Exactness (the oracle witness): the log-ratio per bucket is rounded to 6
decimals and multiplied by the doc's INTEGER bucket count, accumulated as
decimal(18,6) — an order-independent exact sum, so weights hash-match a
direct SQL evaluation at any parallelism (same trick as
textstats.unigram_logprob).  The Gumbel key derives from md5(doc_id) —
membership in the sample is a property of the row, not of the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BUCKETS = 4096
# 24 hex chars would overflow; 6 hex chars (24 bits) keep the uniform
# granular enough for a tie-free Gumbel at corpus scale after 6dp rounding.
_U_DENOM = float(1 << 24)


def _bucket(col, m: int):
    """Portable string -> bucket id (tokens.word_token idiom): md5 is
    bit-identical across Spark / DuckDB / Python."""
    return (F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("int") % m).cast("int")


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    m: int = M_BUCKETS,
) -> DataFrame:
    """Append ``__feat array<int>``: hashed unigram + bigram buckets of the
    whitespace words (DSIR's feature map).  Map-only."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = F.concat(
        F.transform(words, lambda w: _bucket(w, m)),
        F.transform(bigrams, lambda g: _bucket(g, m)),
    )
    return df.withColumn("__feat", feats)


def _bucket_counts(df: DataFrame, m: int) -> DataFrame:
    """(bucket, cnt) over the exploded feature stream — m-bounded output,
    map-side partial agg does the heavy lifting."""
    return (
        hashed_ngram_features(df, m=m)
        .select(F.explode("__feat").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_logratio_table(
    raw: DataFrame,
    target: DataFrame = None,
    text_col: str = "text",
    m: int = M_BUCKETS,
    round_to: int = 6,
    target_predicate=None,
) -> DataFrame:
    """Per-bucket importance log-ratio ``ln p_target(b) - ln p_raw(b)``
    with Laplace (+1) smoothing over ``m`` buckets: an m-row table meant
    to be broadcast.  The ratio is rounded to ``round_to`` decimals HERE,
    once per bucket, so downstream per-doc sums are decimal-exact.

    When the target corpus is a SUBSET of ``raw`` selected by a boolean
    column expression, pass ``target_predicate`` instead of ``target``:
    both distributions then come out of ONE feature-extraction pass
    (explode once, conditional count for the target side) — at 100 TB the
    n-gram explode over the raw corpus is the dominant cost and this
    halves it."""
    if (target is None) == (target_predicate is None):
        raise ValueError("pass exactly one of target / target_predicate")
    if target_predicate is not None:
        both = (
            hashed_ngram_features(
                raw.select(F.col(text_col).alias("text"),
                           target_predicate.alias("__is_t")),
                m=m,
            )
            .select(F.col("__is_t"), F.explode("__feat").alias("bucket"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.count(F.when(F.col("__is_t"), 1)).alias("tcnt"),
            )
        )
        rc = both.select("bucket", "cnt")
        tc = both.select("bucket", F.col("tcnt").alias("cnt")).filter(F.col("cnt") > 0)
    else:
        rc = _bucket_counts(raw.select(F.col(text_col).alias("text")), m)
        tc = _bucket_counts(target.select(F.col(text_col).alias("text")), m)
    rt = rc.agg(F.sum("cnt").alias("nr"))
    tt = tc.agg(F.sum("cnt").alias("nt"))
    full = (
        raw.sparkSession.range(m).select(F.col("id").cast("int").alias("bucket"))
        .join(rc.withColumnRenamed("cnt", "cr"), "bucket", "left")
        .join(tc.withColumnRenamed("cnt", "ct"), "bucket", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
    )
    cr = F.coalesce(F.col("cr"), F.lit(0))
    ct = F.coalesce(F.col("ct"), F.lit(0))
    logratio = (
        F.log((ct + 1).cast("double") / (F.col("nt") + m))
        - F.log((cr + 1).cast("double") / (F.col("nr") + m))
    )
    return full.select(
        "bucket", F.round(logratio, round_to).alias("logratio")
    )


def dsir_weights(
    raw: DataFrame,
    logratio: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = M_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight: sum over the doc's hashed
    n-gram occurrences of the bucket log-ratio.  Returns
    ``(id_col, n_feat, log_weight)``; decimal-exact accumulation."""
    ex = (
        hashed_ngram_features(raw, text_col=text_col, m=m)
        .select(id_col, F.explode("__feat").alias("bucket"))
    )
    j = ex.join(F.broadcast(logratio), "bucket")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_feat"),
        F.sum(F.col("logratio").cast("decimal(18,6)"))
        .cast("double")
        .alias("log_weight"),
    )


def dsir_topk_sample(
    raw: DataFrame,
    target: DataFrame = None,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = M_BUCKETS,
    seed: int = 1,
    temperature: float = 1.0,
    round_to: int = 6,
    target_predicate=None,
) -> DataFrame:
    """Gumbel-top-k DSIR sample: key = log_weight/temperature + Gumbel
    noise; the top-``k`` keys are a without-replacement sample with
    inclusion odds softmax(log_weight/temperature).  The Gumbel uniform
    comes from md5(seed:doc_id) (deterministic, engine-portable); the key
    is rounded and tie-broken by ``id_col`` so the cut is stable across
    engines.  Returns ``(id_col, n_feat, log_weight, gumbel_key)``.
    ``target_predicate`` (target-as-subset fast path) is forwarded to
    ``dsir_logratio_table`` — one corpus explode instead of two."""
    lr = dsir_logratio_table(
        raw, target, text_col=text_col, m=m, round_to=round_to,
        target_predicate=target_predicate,
    )
    w = dsir_weights(raw, lr, text_col=text_col, id_col=id_col, m=m)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"dsir:{seed}:"), F.col(id_col).cast("string"))),
                1, 6,
            ),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_U_DENOM)
    gumbel = -F.log(-F.log(u))
    key = F.round(
        F.col("log_weight") / F.lit(float(temperature)) + gumbel, round_to
    )
    return (
        w.select(id_col, "n_feat", "log_weight", key.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def rho_select(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """RHO-loss-style learnability selection (Mindermann et al. 2022,
    "Prioritized training on points that are learnable, worth learning,
    and not yet learnt"): rank examples by REDUCIBLE loss — the gap
    between the training model's loss and a stronger reference
    (holdout) model's loss — and keep the top ``k``.  High train loss
    with LOW reference loss marks a learnable, not-yet-learnt example;
    high loss under BOTH models marks noise the selection correctly
    skips (where plain hard-example mining fails).

    This engine's deterministic analog scores both sides with its own
    already-oracled LMs: the weak "training" proxy is the order-blind
    unigram model (``textstats.unigram_logprob``) and the stronger
    reference is the interpolated Kneser-Ney bigram model
    (``textstats.kneser_ney_logprob``), so

        rho_score = NLL_unigram - NLL_KN = kn_logprob - avg_logprob

    is large exactly where word ORDER makes the doc much more
    predictable than its vocabulary alone — structured, learnable text —
    and negative for scrambled/boilerplate-atypical docs.

    Scale shape: both scorers are corpus aggregates + equi-joins (see
    their docstrings; nothing new shuffles here), the score is map-only
    column math over their inner join (docs with >= 2 words — the KN
    domain), and the cut is a deterministic top-k
    (TakeOrderedAndProject; score DESC, id ASC).  The rounded score
    carries the repo's signed-zero normalization (+ 0.0) since a
    near-zero gap can round to -0.0 in exactly one engine."""
    from esa_pfa_spark.operators.textstats import (
        kneser_ney_logprob,
        unigram_logprob,
    )

    u = unigram_logprob(docs, text_col=text_col).select(
        id_col, F.col("avg_logprob").alias("u_logprob")
    )
    kn = kneser_ney_logprob(docs, text_col=text_col).select(
        id_col, "n_words", F.col("kn_logprob")
    )
    rho = (
        F.round(F.col("kn_logprob") - F.col("u_logprob"), round_to)
        + F.lit(0.0)
    ).alias("rho_score")
    scored = kn.join(u, id_col).select(id_col, "n_words", "u_logprob",
                                       "kn_logprob", rho)
    return (
        scored.orderBy(F.col("rho_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
