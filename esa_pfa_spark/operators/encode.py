"""Feature-transform operators: per-group normalization, outlier
winsorization, leakage-free target encoding, and cyclical time encodings
— the standard transforms between raw PIT features and a training matrix.

Reference analog: the per-feature min/max rescale of the reference's
feature normalization (SURVEY §2.4 A8, Normalizer usage in
ActiveLearning.java) generalized to the transforms a tabular/LLM feature
pipeline actually ships.  All pure JVM window/column math with exact
DuckDB oracles; the only leakage-sensitive transform (target encoding)
is EXPANDING — strictly-past rows only — by construction.

Scale notes: every per-group transform here is one Exchange on the group
key (window specs share it); cyclical encodings are map-only.  Group
cardinality bounds the window task size — same bound as every per-key
window in the engine (hot groups: see skew.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def zscore_by_group(
    df: DataFrame,
    value: str = "value",
    group: str = "entity_id",
    out_col: str = "z",
) -> DataFrame:
    """Per-group standardization: (v - mean_g) / stddev_g (sample stddev;
    null when the group is constant or a singleton).  One window over the
    full group frame — a single Exchange on the group key."""
    w = Window.partitionBy(group)
    mean = F.mean(value).over(w)
    std = F.stddev_samp(value).over(w)
    return df.withColumn(
        out_col, F.when(std > 0, (F.col(value) - mean) / std)
    )


def winsorize_by_group(
    df: DataFrame,
    value: str = "value",
    group: str = "entity_id",
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str = "value_w",
) -> DataFrame:
    """Per-group winsorization: clamp to the group's [lo, hi] interpolated
    percentiles (Spark ``percentile`` == DuckDB ``quantile_cont``, the
    repo's exact-parity pair).  Robust-feature staple — keeps fat tails
    from dominating normalization."""
    w = Window.partitionBy(group)
    p_lo = F.percentile(F.col(value), F.lit(lo)).over(w)
    p_hi = F.percentile(F.col(value), F.lit(hi)).over(w)
    return df.withColumn(
        out_col, F.least(F.greatest(F.col(value), p_lo), p_hi)
    )


def target_encode_expanding(
    df: DataFrame,
    category: str = "cat",
    target: str = "y",
    ts: str = "ts",
    tiebreak: str | None = None,
    out_prefix: str = "te",
) -> DataFrame:
    """Leakage-free target encoding: for each row, the mean target of the
    SAME category over STRICTLY EARLIER TIMESTAMPS (RANGE frame ending at
    1 PRECEDING over epoch micros).  The first timestamp of a category
    gets null — there is no past.  The classic leaky form (whole-dataset
    category mean) trains on the label; this expanding form is the
    PIT-correct one, same contract as the engine's as-of core (zero
    temporal leakage).

    RANGE, not ROWS: a ROWS frame ordered by (ts, tiebreak) would include
    same-timestamp rows that merely sort earlier — equal-ts label leakage
    (and a nondeterministic encoding with no tiebreak).  The RANGE frame
    is a pure function of ts, so it is deterministic by construction;
    ``tiebreak`` is kept for signature compatibility but no longer
    affects the result.

    Sums accumulate as decimal(18,6) (exact, order-independent) so the
    encoding is bit-stable under any partitioning and matches the SQL
    oracle."""
    del tiebreak  # RANGE frame is ts-determined; see docstring
    w = (
        Window.partitionBy(category)
        .orderBy(F.unix_micros(F.col(ts).cast("timestamp")))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.count(target).over(w)
    s = F.sum(F.col(target).cast("decimal(18,6)")).over(w)
    return df.withColumn(f"{out_prefix}_n", cnt.cast("long")).withColumn(
        f"{out_prefix}_mean",
        F.when(cnt > 0, s.cast("double") / cnt),
    )


def cyclical_time_features(
    df: DataFrame, ts: str = "ts", round_to: int = 6
) -> DataFrame:
    """Cyclical calendar encodings: hour-of-day and day-of-week as
    (sin, cos) pairs — distance-preserving across the wrap (23h is close
    to 0h), plus the raw ordinals.  ``dow`` is 0=Sunday..6=Saturday
    (DuckDB's convention; Spark's dayofweek is 1-based, shifted here).
    Map-only column math.

    The ``+ 0.0`` after each round normalizes IEEE signed zero: at e.g.
    hour=18, cos() is a tiny negative (-1.84e-16) that rounds to -0.0 in
    sign-preserving engines (DuckDB) but +0.0 through Spark's BigDecimal
    round — bit-hash gates would mismatch without it (-0.0 + 0.0 = +0.0)."""
    hour = F.hour(ts)
    dow = F.dayofweek(ts) - 1
    def enc(val, period):
        ang = val.cast("double") * (TWO_PI / period)
        return (
            F.round(F.sin(ang), round_to) + F.lit(0.0),
            F.round(F.cos(ang), round_to) + F.lit(0.0),
        )
    h_sin, h_cos = enc(hour, 24.0)
    d_sin, d_cos = enc(dow, 7.0)
    return (
        df.withColumn("hour", hour)
        .withColumn("dow", dow)
        .withColumn("hour_sin", h_sin)
        .withColumn("hour_cos", h_cos)
        .withColumn("dow_sin", d_sin)
        .withColumn("dow_cos", d_cos)
    )


def robust_z_by_group(
    df: DataFrame,
    value: str = "value",
    group: str = "entity_id",
    out_col: str = "robust_z",
    round_to: int = 6,
) -> DataFrame:
    """Outlier score robust to the outliers themselves: per-group
    0.6745 * (v - median) / MAD (median absolute deviation, interpolated
    percentiles — Spark percentile == DuckDB quantile_cont).  The 0.6745
    factor rescales MAD to sigma-equivalents for normal data, so the
    usual |z| > 3.5 gate applies (Iglewicz & Hoaglin 1993).  Null when
    MAD is 0 (constant-majority group).  Two window passes over one
    group Exchange: median first, then the MAD over |v - median|."""
    w = Window.partitionBy(group)
    med = F.percentile(F.col(value), F.lit(0.5)).over(w)
    with_med = df.withColumn("__med", med)
    mad = F.percentile(
        F.abs(F.col(value) - F.col("__med")), F.lit(0.5)
    ).over(w)
    out = with_med.withColumn("__mad", mad)
    z = F.lit(0.6745) * (F.col(value) - F.col("__med")) / F.col("__mad")
    return out.withColumn(
        out_col, F.round(F.when(F.col("__mad") > 0, z), round_to)
    ).drop("__med", "__mad")


def quantile_bins(
    df: DataFrame,
    value: str = "value",
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency discretization: assign each row the index of its
    corpus quantile bucket (0..n_bins-1), bin i covering
    [q_{i/n}, q_{(i+1)/n}).  The naive form is ``ntile() OVER (ORDER BY
    v)`` — a partition-less global window, one task sees every row.  The
    scale form here: ONE aggregate computes the n_bins-1 interior edges
    (exact interpolated percentiles), a single tiny action ships them to
    the driver, and assignment is a map-only "count of edges <= v" over
    the edge array as a plan literal.  Ties sit in the HIGHER bin
    (v == edge counts the edge), mirrored by the oracle."""
    fracs = [i / n_bins for i in range(1, n_bins)]
    row = df.agg(
        F.percentile(F.col(value), F.array(*[F.lit(f) for f in fracs])).alias("e")
    ).first()
    edges = [float(x) for x in row["e"]]
    arr = F.array(*[F.lit(e) for e in edges])
    bin_ = F.size(F.filter(arr, lambda e: F.col(value) >= e))
    return df.withColumn(out_col, bin_.cast("int"))


def hashed_cross(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    n_buckets: int = 1024,
    seed: int = 0,
    out_col: str = "cross_bucket",
) -> DataFrame:
    """The feature-hashing trick for categorical CROSSES: bucket the
    concatenation of ``cols`` into ``n_buckets`` via a portable md5 hash —
    the bounded-cardinality stand-in for one-hot crossing when the raw
    cross (|A|x|B|x...) would explode the feature space (Weinberger et
    al. 2009).  NULL components encode as a sentinel so (NULL, x) and
    ("", x) land in different buckets; a unit separator (0x1f) between
    components keeps ("ab", "c") and ("a", "bc") apart.

    Deterministic in (seed, values): partitioning/engine invariant —
    training and serving compute identical buckets with no vocabulary to
    ship.  Map-only (0 exchanges); the md5 is one JVM expression, no UDF.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    key = F.concat_ws("\x1f", F.lit(f"{seed}"), *parts)
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("int")
        % F.lit(int(n_buckets))
    ).cast("int")
    return df.withColumn(out_col, bucket)


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col,
    smooth: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Weight-of-Evidence categorical encoding + Information Value — the
    credit-scoring-standard complement of ``target_encode_expanding``
    for NON-temporal categoricals:

      WoE(c)  = ln( ((pos_c + s) / (pos + s)) / ((neg_c + s) / (neg + s)) )
      IV(c)   = ((pos_c + s)/(pos + s) - (neg_c + s)/(neg + s)) * WoE(c)

    with additive smoothing ``s`` so empty cells stay finite.  Unlike
    target encoding this is a GLOBAL statistic (no leakage concern for
    i.i.d. rows — for temporal data use the expanding encoder), and the
    whole table is one partial-agg groupBy: the shuffle carries one row
    per category, then two scalar totals broadcast back as literals via
    a second tiny agg — never a per-row window.

    ``label_col`` may be a column name or boolean Column.  Engine
    parity: counts are exact ints, the ratio arithmetic is a fixed IEEE
    chain, ln is libm (6dp rounding absorbs the ulp — the plogp-family
    tolerance).  Returns (category, n, n_pos, n_neg, woe, iv).
    """
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "boolean"
    )
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(y, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~y, 1).otherwise(0)).alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").alias("__tp"), F.sum("n_neg").alias("__tn")
    ).first()
    tp, tn = int(tot["__tp"]), int(tot["__tn"])
    s = float(smooth)
    pp = (F.col("n_pos").cast("double") + F.lit(s)) / F.lit(float(tp) + s)
    pn = (F.col("n_neg").cast("double") + F.lit(s)) / F.lit(float(tn) + s)
    woe = F.log(pp / pn)
    return per.select(
        "category", "n", "n_pos", "n_neg",
        F.round(woe, round_to).alias("woe"),
        F.round((pp - pn) * woe, round_to).alias("iv"),
    ).orderBy("category")


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cross-source quantile normalization (batch-effect correction):
    replace each value by the GLOBAL distribution's value at the row's
    within-group percentile — after which every group's feature
    distribution matches the corpus, so a model can't exploit
    per-source calibration drift (the multi-instrument harmonization
    step; the reference's per-product normalizeFeatures analog across
    products rather than within one).

    Mechanics (exact, both engines): within-group percent_rank over the
    total order (value, id); global position ``pr * (N-1)``; the output
    linearly interpolates between the global sorted values at
    floor/ceil of that position — two equi-joins against the indexed
    global order.  Ranks and interpolation are fixed IEEE chains, so
    the SQL oracle is bit-exact.

    Scale note (documented trade): the global sorted index is a global
    sort — the simulation device at test scale (same as layout.py's
    ntile files).  At 100 TB swap the indexed-order join for a
    ddsketch_quantiles table (bounded bins, mergeable) and interpolate
    against bin midpoints: same shape, sketch-bounded accuracy.
    Returns the input columns + ``qnorm``.
    """
    v = F.col(value_col).cast("double")
    wg = Window.partitionBy(group_col).orderBy(v.asc(), F.col(id_col).asc())
    ng = Window.partitionBy(group_col)
    ranked = df.select(
        group_col, id_col, v.alias("__v"),
        (F.row_number().over(wg) - 1).cast("double").alias("__rk"),
        (F.count(F.lit(1)).over(ng) - 1).cast("double").alias("__ng"),
    )
    pr = F.when(F.col("__ng") == 0, F.lit(0.5)).otherwise(
        F.col("__rk") / F.col("__ng")
    )

    wglob = Window.orderBy(v.asc(), F.col(group_col).asc(), F.col(id_col).asc())
    idx = df.select(
        (F.row_number().over(wglob) - 1).alias("__gi"), v.alias("__gv")
    )
    n_total = df.count()
    pos = pr * F.lit(float(n_total - 1))
    lo = F.floor(pos).cast("long")
    based = ranked.select(
        group_col, id_col, "__v",
        pos.alias("__pos"), lo.alias("__lo"),
        F.least(lo + 1, F.lit(n_total - 1)).alias("__hi"),
    )
    j = (
        based.join(idx.withColumnRenamed("__gi", "__lo").withColumnRenamed("__gv", "__vlo"), "__lo")
        .join(idx.withColumnRenamed("__gi", "__hi").withColumnRenamed("__gv", "__vhi"), "__hi")
    )
    out = F.col("__vlo") + (F.col("__pos") - F.col("__lo")) * (
        F.col("__vhi") - F.col("__vlo")
    )
    return j.select(
        group_col, id_col, F.col("__v").alias(value_col),
        F.round(out, round_to).alias("qnorm"),
    )


def mutual_information(
    df: DataFrame,
    features: dict,
    label_col,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information I(feature; label) for several categorical
    features in ONE corpus pass — the model-free feature-selection
    ranking (which columns are worth a model's capacity), complementing
    ``woe_encode`` (per-category strength of one feature).

    ``features`` maps feature name -> categorical Column (cast to
    string; NULL is its own category in both engines).  The corpus
    explodes to one row per (feature, value, label) — the shuffle then
    carries only the distinct cells (sum over features of |categories|
    x |labels|; map-side partial agg), never the corpus.  MI per
    feature is ``sum_cells (nxy/n) * ln(nxy*n / (nx*ny))`` with the
    repo's decimal-sum device (9dp-rounded terms, order-free); ln ulps
    are absorbed by the 6dp output rounding (the plogp family).

    Returns (feature, n_cells, mi) — mi >= 0 up to rounding, 0 iff
    independent.
    """
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "string"
    )
    cells = F.explode(
        F.array(*[
            F.struct(F.lit(n).alias("feat"), c.cast("string").alias("fv"))
            for n, c in features.items()
        ])
    ).alias("p")
    pairs = df.select(cells, y.alias("__y")).select("p.feat", "p.fv", "__y")
    joint = pairs.groupBy("feat", "fv", "__y").agg(
        F.count(F.lit(1)).alias("nxy")
    )
    nx = pairs.groupBy("feat", "fv").agg(F.count(F.lit(1)).alias("nx"))
    ny = pairs.groupBy("feat", "__y").agg(F.count(F.lit(1)).alias("ny"))
    n = pairs.groupBy("feat").agg(F.count(F.lit(1)).alias("n"))
    full = (
        joint.join(nx, ["feat", "fv"])
        .join(ny, ["feat", "__y"])
        .join(n, "feat")
    )
    term = (F.col("nxy").cast("double") / F.col("n")) * F.log(
        F.col("nxy").cast("double") * F.col("n")
        / (F.col("nx").cast("double") * F.col("ny"))
    )
    dec = "decimal(18,9)"
    return (
        full.groupBy("feat")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(
                F.sum(F.round(term, 9).cast(dec)).cast("double"), round_to
            ).alias("mi"),
        )
        .orderBy("feat")
    )


def cramers_v(
    df: DataFrame,
    features: dict,
    label_col,
    round_to: int = 6,
) -> DataFrame:
    """Chi-square independence test + Cramér's V per categorical
    feature against a label — the bounded-[0,1] effect-size companion
    of ``mutual_information`` (V is comparable across features with
    different cardinalities; MI is not).

    Same one-pass cell shape as MI.  Zero cells are handled by algebra,
    not enumeration: over ALL r x c cells,
    ``chi2 = sum (nxy - E)^2 / E = sum_observed nxy^2 * n/(nx*ny) - n``
    (absent cells contribute exactly their E, which telescopes into the
    identity), so the plan never materializes the full cross product.
    ``V = sqrt((chi2/n) / (min(r,c) - 1))``; NULL when a feature or the
    label is constant (min(r,c) = 1).  Decimal-sum parity as usual.
    Returns (feature, dof, chi2, cramers_v)."""
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "string"
    )
    cells = F.explode(
        F.array(*[
            F.struct(F.lit(n).alias("feat"), c.cast("string").alias("fv"))
            for n, c in features.items()
        ])
    ).alias("p")
    pairs = df.select(cells, y.alias("__y")).select("p.feat", "p.fv", "__y")
    joint = pairs.groupBy("feat", "fv", "__y").agg(
        F.count(F.lit(1)).alias("nxy")
    )
    nx = pairs.groupBy("feat", "fv").agg(F.count(F.lit(1)).alias("nx"))
    ny = pairs.groupBy("feat", "__y").agg(F.count(F.lit(1)).alias("ny"))
    nn = pairs.groupBy("feat").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("fv").alias("r"),
        F.count_distinct("__y").alias("c"),
    )
    full = (
        joint.join(nx, ["feat", "fv"])
        .join(ny, ["feat", "__y"])
        .join(nn, "feat")
    )
    term = (
        F.col("nxy").cast("double") * F.col("nxy")
        / (F.col("nx").cast("double") * F.col("ny"))
    ) * F.col("n")
    dec = "decimal(28,9)"
    agg = full.groupBy("feat", "n", "r", "c").agg(
        F.sum(F.round(term, 9).cast(dec)).cast("double").alias("__s")
    )
    chi2 = F.col("__s") - F.col("n")
    kmin = F.least(F.col("r"), F.col("c")) - 1
    # greatest(chi2, 0) before the sqrt: chi2 >= 0 mathematically, but the
    # floating finish can land at a tiny negative, and sqrt(-1e-16) is NaN
    # in exactly one engine for exactly one data draw.  Same guard, same op
    # order (x / n / kmin) as the DuckDB oracle.
    v = F.when(
        kmin > 0,
        F.sqrt(F.greatest(chi2, F.lit(0.0)) / F.col("n") / kmin),
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(
        F.col("feat"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        (F.round(chi2, round_to) + F.lit(0.0)).alias("chi2"),
        (F.round(v, round_to) + F.lit(0.0)).alias("cramers_v"),
    ).orderBy("feat")
