"""Table profiling: the per-column audit report a data platform runs on
every new ingest (the reference's per-feature STX report generalized to
arbitrary columns — SURVEY §2.4 A1's consumer-facing sibling).

One distributed pass computes, per profiled column: row count, null
count, EXACT distinct count, numeric min/max/mean (decimal-exact mean)
or string lexicographic min/max.  Output is one ROW per column (melted
from the single aggregate row), so the report composes with sinks and
diffing like any other table.

Scale note (documented trade): multiple exact count-distincts in one
aggregate plan an Expand — input multiplied by the number of distinct
aggs before the shuffle.  Right for audit-sized passes and exactness;
for routine monitoring at 100 TB swap ``approx_count_distinct`` (same
code path, HLL-based, no Expand) via ``exact_distinct=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Per-column profile rows: ``(column, n, n_null, n_distinct,
    num_min, num_max, num_mean, str_min, str_max)``.  Numeric columns
    fill the num_* fields (mean via decimal-exact sum), string columns
    the str_* fields; timestamps profile as unix microseconds (numeric).
    Unsupported types raise — profile what you can compare."""
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    aggs = []
    kinds: dict[str, str] = {}
    for c in columns:
        dt_ = df.schema[c].dataType
        if isinstance(dt_, (T.TimestampType, T.TimestampNTZType)):
            # NTZ-safe: cast through LTZ (session TZ pinned UTC) so
            # unix_micros resolves for parquet written by other engines
            col, kind = (
                F.unix_micros(F.col(c).cast("timestamp_ltz")).cast("double"),
                "num",
            )
        elif isinstance(dt_, _NUMERIC):
            col, kind = F.col(c).cast("double"), "num"
        elif isinstance(dt_, T.StringType):
            col, kind = F.col(c), "str"
        else:
            raise ValueError(f"unsupported profile type for {c}: {dt_}")
        kinds[c] = kind
        nd = (
            F.count_distinct(col) if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs.append(F.count(F.lit(1)).alias(f"__n_{c}"))
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        aggs.append(nd.alias(f"__nd_{c}"))
        if kind == "num":
            aggs.append(F.round(F.min(col), round_to).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(col), round_to).alias(f"__mx_{c}"))
            aggs.append(
                F.round(
                    F.sum(col.cast("decimal(28,6)")).cast("double") / F.count(col),
                    round_to,
                ).alias(f"__mean_{c}")
            )
        else:
            aggs.append(F.min(col).alias(f"__smn_{c}"))
            aggs.append(F.max(col).alias(f"__smx_{c}"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in columns:
        is_num = kinds[c] == "num"
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").cast("long").alias("n"),
                F.col(f"__nn_{c}").cast("long").alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"__mn_{c}") if is_num else null_d).alias("num_min"),
                (F.col(f"__mx_{c}") if is_num else null_d).alias("num_max"),
                (F.col(f"__mean_{c}") if is_num else null_d).alias("num_mean"),
                (null_s if is_num else F.col(f"__smn_{c}")).alias("str_min"),
                (null_s if is_num else F.col(f"__smx_{c}")).alias("str_max"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def ddsketch_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    group_col: str | None = None,
    alpha: float = 0.01,
    round_to: int = 6,
) -> DataFrame:
    """Mergeable relative-error quantile sketch (DDSketch, Masson et al.
    VLDB'19): bucket every positive value into log-spaced bins
    ``b = ceil(ln(v) / ln(gamma))`` with ``gamma = (1+alpha)/(1-alpha)``,
    count per bin, and answer quantile q with the bin whose cumulative
    count first reaches ``ceil(q * n)`` — the bin midpoint
    ``2 * gamma^b / (gamma + 1)`` is within relative error alpha of the
    exact quantile, GUARANTEED, regardless of the distribution.

    Why this beats exact percentiles at 100 TB: exact interpolated
    percentiles (features.percentiles) need the values co-located and
    sorted per group; the sketch is a bounded-size bin histogram —
    partial aggregation combines map-side, the shuffle carries at most
    O(groups x log_gamma(vmax/vmin)) rows (~1400 bins covering 12 orders
    of magnitude at alpha=0.01), and sketches for different partitions /
    days / tables MERGE by adding counts, so it composes with incremental
    maintenance (operators/incremental.py) where exact quantiles cannot.

    Determinism contract: the bin index is ``floor(round(ln(v)/ln(gamma),
    9))`` + 1-at-exact-boundary semantics via ceil — engines agree unless
    a value's log ratio sits within ~1e-16 of the 1e-9 rounding grid
    (the oracle gate would surface it).  Zero / negative / NULL values
    are excluded from the sketch (DDSketch's documented domain is
    v > 0); ``n_pos`` in the output reports how many rows were sketched.

    Returns one row per (group, q) with the bin-midpoint estimate.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)
    v = F.col(value_col).cast("double")
    gcols = [group_col] if group_col else []
    gexpr = [F.col(group_col)] if group_col else [F.lit("all").alias("grp")]
    gname = group_col if group_col else "grp"

    pos = df.filter(v > 0).select(
        *gexpr,
        # ceil(x) as floor(round(x,9)) + (1 if not integer): implemented
        # as -floor(-x) on the rounded quotient (exact ceil of the
        # 9dp-rounded value, no double re-rounding)
        (-F.floor(-F.round(F.log(v) / F.lit(lg), 9))).cast("long").alias("__b"),
    )
    bins = pos.groupBy(gname, "__b").agg(F.count("*").alias("__c"))

    from pyspark.sql import Window

    wcum = Window.partitionBy(gname).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy(gname)
    cum = bins.select(
        gname, "__b",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wtot).alias("__n"),
    )
    qlit = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    hit = (
        cum.select(gname, "__b", "__cum", "__n")
        .select("*", qlit)
        .filter(F.col("__cum") >= F.ceil(F.col("q") * F.col("__n")))
        .groupBy(gname, "q")
        .agg(F.min("__b").alias("__b"), F.max("__n").alias("n_pos"))
    )
    est = F.lit(2.0) * F.pow(F.lit(gamma), F.col("__b")) / F.lit(gamma + 1.0)
    return hit.select(
        gname,
        F.col("q"),
        F.col("n_pos"),
        F.round(est, round_to).alias("q_est"),
    )


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    unit_days: int = 7,
    origin: str = "2024-01-01",
    round_to: int = 6,
) -> DataFrame:
    """Cohort retention matrix: entities grouped by the period of their
    FIRST event (cohort), and for each later period offset the share of
    the cohort still active — the classic engagement decay table, and a
    data-ops tool here (source cohorts decaying early = an ingest or
    dedup regression).

    Exactness: period index = floor(datediff(ts, origin) / unit_days) —
    pure integer/floor arithmetic, engine-identical; retention is one
    rounded division of exact counts.

    Plan shape (100 TB): distinct (key, period) + min-period per key both
    hash on the key (the join after them is co-partitioned — no third
    row-scale exchange); the (cohort, offset) agg output is
    |periods|^2/2 rows.  week_offset 0 is every cohort's own size by
    construction, so retention at week_offset 0 is exactly 1.0 (tested).
    """
    b = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.lit(origin).cast("date"))
        / F.lit(float(unit_days))
    ).cast("int")
    ua = df.select(F.col(key_col), b.alias("period")).distinct()
    cohort = ua.groupBy(key_col).agg(F.min("period").alias("cohort"))
    j = ua.join(cohort, key_col).select(
        "cohort", (F.col("period") - F.col("cohort")).alias("week_offset"), key_col
    )
    act = j.groupBy("cohort", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    size = act.filter(F.col("week_offset") == 0).select(
        "cohort", F.col("n_active").alias("n_cohort")
    )
    return (
        act.join(size, "cohort")
        .select(
            "cohort",
            F.col("week_offset").cast("int").alias("week_offset"),
            "n_active",
            "n_cohort",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double"),
                round_to,
            ).alias("retention"),
        )
        .orderBy("cohort", "week_offset")
    )


def validate_expectations(
    df: DataFrame,
    expectations: dict[str, "F.Column"],
    round_to: int = 6,
) -> DataFrame:
    """Data-quality expectation gate: each named expectation is a boolean
    Column that should hold for EVERY row; the report gives per-
    expectation violation counts and rates (NULL predicate results count
    as violations — an expectation that cannot be evaluated is not met).
    The pre-ingest contract check a pipeline runs before it pollutes a
    feature table with a bad batch.

    Plan shape (100 TB): all expectations evaluate in ONE map-only pass
    (each becomes a conditional-sum aggregate — map-side combine, the
    shuffle is a single row); unpivot to the long report happens on that
    one row.  No per-expectation scans.
    """
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = list(expectations)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(F.coalesce(expectations[k], F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, k in enumerate(names)
    ]
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("expectation"),
                F.col(f"__v_{i}").cast("long").alias("n_violations"),
            )
            for i, k in enumerate(names)
        ]
    )
    ex = one.select(F.col("__n").alias("n_rows"), F.explode(pairs).alias("p"))
    return ex.select(
        F.col("p.expectation").alias("expectation"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("p.n_violations").alias("n_violations"),
        F.round(
            F.col("p.n_violations").cast("double") / F.col("n_rows").cast("double"),
            round_to,
        ).alias("violation_rate"),
        (F.col("p.n_violations") == 0).alias("passed"),
    ).orderBy("expectation")


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """The mergeable core of the HLL: per (group, register) the max rank
    ``__m`` and the row count ``__c``.  max/sum are both engine-native
    streaming-capable aggregates with state bounded by 2^p rows per
    group, so the SAME expression tree runs batch (hll_distinct) and as
    a Structured Streaming stateful aggregation (streaming/sketches.py).
    Register-wise max merges sketches from any split of the data."""
    m = 1 << p
    w = 60 - p
    gexpr = [F.col(group_col)] if group_col else [F.lit("all").alias("grp")]
    gname = group_col if group_col else "grp"
    key = F.concat(F.lit(f"{seed}:"), F.col(value_col).cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")

    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *gexpr,
        (h % m).cast("int").alias("__reg"),
        F.shiftright(h, p).alias("__rest"),
    )
    rho = (
        F.when(F.col("__rest") == 0, F.lit(w + 1))
        .otherwise(F.lit(w + 1) - F.length(F.bin(F.col("__rest"))))
        .cast("int")
    )
    return (
        hashed.select(gname, "__reg", rho.alias("__rho"), F.lit(1).alias("__one"))
        .groupBy(gname, "__reg")
        .agg(F.max("__rho").alias("__m"), F.sum("__one").alias("__c"))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Mergeable approximate distinct count (HyperLogLog, Flajolet et
    al. 2007) — THE 100-TB distinct-count tool: exact countDistinct
    must co-locate every distinct value on the shuffle (O(distinct)
    rows), while HLL reduces to ``m = 2^p`` max-registers that combine
    map-side, so the shuffle carries m rows per group no matter how
    many trillions of values stream through, and sketches from
    different days / partitions / tables MERGE by register-wise max
    (composing with incremental maintenance like ddsketch_quantiles).

    Portable-determinism contract (the oracle device): the 60-bit hash
    is the first 15 hex chars of ``md5(seed || ':' || value)`` — the
    _hash_bucket convention — so both engines see identical registers
    (low p bits) and identical rank ``rho = (60-p) + 1 -
    bit_length(rest)`` (exact via ``length(bin(x))``, no float log).
    The harmonic denominator is an EXACT int64 sum ``T = sum_j
    2^(w+1-M_j) + empty * 2^(w+1)`` with ``w = 60-p`` (max 2^61 at
    p=8, no float-order dependence);
    the estimate then runs a fixed IEEE op chain, and the
    small-range/linear-counting branch condition compares bit-identical
    doubles, so the branch itself can never diverge between engines.
    Standard bias terms: alpha_m for p>=7; linear counting below 2.5m
    with empty registers.  (The 60-bit-hash large-range correction is
    omitted: it matters past ~2^30 distincts per group — at that
    cardinality production raises p, not the correction.)

    Returns one row per group: ``n_rows``, ``hll_est`` (rounded 6dp).
    Pair with an exact countDistinct in a demonstration query to report
    observed error; the sketch alone is the scale path.
    """
    if not (4 <= p <= 14):
        raise ValueError("p must be in [4, 14] (m = 2^p registers)")
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    gname = group_col if group_col else "grp"
    regs = hll_registers(df, value_col, group_col=group_col, p=p, seed=seed)
    per_group = regs.groupBy(gname).agg(
        # SQL-function form: the Python shiftleft wrapper only takes a
        # literal int for numBits
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - __m)")
        ).alias("__t_ne"),
        F.count(F.lit(1)).alias("__v"),
        F.sum("__c").alias("n_rows"),
    )
    empty = F.lit(m) - F.col("__v")
    t = F.col("__t_ne") + empty.cast("long") * F.shiftleft(
        F.lit(1).cast("long"), w + 1
    )
    z = t.cast("double") / F.lit(float(1 << (w + 1)))
    e_raw = F.lit(alpha) * F.lit(float(m * m)) / z
    # linear counting when E <= 2.5m and some register is empty —
    # the branch condition compares bit-identical doubles in both engines
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double"))
    est = F.when((e_raw <= F.lit(2.5 * m)) & (empty > 0), lc).otherwise(e_raw)
    return per_group.select(
        gname,
        F.col("n_rows"),
        F.round(est, 6).alias("hll_est"),
    ).orderBy(gname)


def _cms_hash(col, row: int, seed: int, width: int):
    key = F.concat(F.lit(f"{seed}:{row}:"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("int") % width
    ).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a value stream
    — the mergeable point-frequency companion of ``hll_distinct``
    (cardinality) and the Misra-Gries heavy hitters (top-k): estimates
    ANY key's count within ``eps*N`` (eps ~ e/width) NEVER
    underestimating, from ``depth x width`` counters that merge by
    addition across partitions / days / tables.

    ONE corpus scan: each record explodes to ``depth`` (row, col) cells
    (md5 of ``seed:row:value`` — the _hash_bucket convention, so both
    engines land identical cells), then a single partial-agg groupBy —
    the shuffle carries at most depth*width rows no matter the corpus.
    Returns the sparse sketch (row, col, cnt); absent cells are zero.
    """
    v = F.col(value_col)
    cells = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("row"), _cms_hash(v, i, seed, width).alias("col")
            )
            for i in range(depth)
        ])
    ).alias("c")
    return (
        df.filter(v.isNotNull())
        .select(cells)
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Point-estimate each key against a cms_build sketch: min over the
    ``depth`` counters the key hashes to (absent cell = 0).  The keys
    frame is the small side (broadcast); the sketch is depth*width rows
    at most.  Appends ``cms_est``."""
    k = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_hash(F.col(key_col), i, seed, width).alias("col"),
                )
                for i in range(depth)
            ])
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    joined = k.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def bloom_positions(col, i: int, m: int, seed: int):
    """Bit position of hash i for a key — md5 convention, identical in
    both engines."""
    key = F.concat(F.lit(f"{seed}:{i}:"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("int") % m
    ).cast("int")


def bloom_build(
    keys: DataFrame, key_col: str, m: int = 8192, k: int = 4, seed: int = 0
) -> DataFrame:
    """Bloom filter of a key set as a DISTINCT bit-position table
    (<= m rows) — the runtime-filter device: joins at 100 TB ship this
    BOUNDED table to every task instead of the full key set (which can
    be millions of rows), so the big side is pruned map-side before the
    real join's shuffle.  One pass over the keys: explode to k
    positions, distinct."""
    c = F.col(key_col)
    pos = F.explode(
        F.array(*[bloom_positions(c, i, m, seed) for i in range(k)])
    ).alias("pos")
    return keys.filter(c.isNotNull()).select(pos).distinct()


def bloom_prune(
    df: DataFrame,
    key_col: str,
    positions: DataFrame,
    m: int = 8192,
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Keep rows whose key MIGHT be in the built set (all k bit
    positions present): k broadcast LEFT SEMI joins — every one
    map-side, ZERO shuffles of the big table.  False positives pass
    (callers still run the real join — pruning only shrinks its input,
    never changes its result); true keys always pass (no false
    negatives, the bloom guarantee)."""
    c = F.col(key_col)
    out = df
    for i in range(k):
        probe = out.withColumn("__bp", bloom_positions(c, i, m, seed))
        out = probe.join(
            F.broadcast(positions.withColumnRenamed("pos", "__bp")),
            "__bp",
            "left_semi",
        ).drop("__bp")
    return out


def corr_matrix(
    df: DataFrame,
    columns: list[str],
    decimal: str = "decimal(38,8)",
    round_to: int = 6,
    exact: bool = True,
) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric columns in ONE
    distributed pass.

    Returns (col_i, col_j, n, corr) for every i < j pair (column-name
    order as given).  All moments — n, Σx, Σx², Σxy — accumulate in
    decimal, so they are order-independent and bit-identical across
    engines and partitionings; corr is then the textbook
        (nΣxy − ΣxΣy) / sqrt((nΣx² − Σx²ₜ)(nΣy² − Σy²ₜ))
    evaluated in double from those identical decimal components (same
    device as encode.spearman_rho).  Rows with a NULL in either column of
    a pair are excluded PER PAIR (pairwise deletion — each pair's n is
    reported so downstream can see the divergence).

    Scale: map-side-combinable aggregate of k(k+1)/2 + k moment columns
    over one scan; the shuffle is the aggregate buffer.  Zero-variance
    columns yield NULL corr (0/0), never a crash.

    ``exact=True`` (default) pays the BigDecimal accumulation cost
    (~10-30x a double sum per moment) for the cross-engine hash gate;
    ``exact=False`` is the production path — double partial sums in
    whole-stage codegen, identical formula, result order-dependent in
    the last ulps (irrelevant after ``round_to``, but not guaranteed
    bit-equal to a serial oracle).
    """
    k = len(columns)
    if k < 2:
        raise ValueError("need at least 2 columns")
    from esa_pfa_spark.operators.linalg import _fan_out

    df = _fan_out(df.select(*columns))

    def _acc(col):
        return col.cast(decimal) if exact else col

    aggs = []
    for a in range(k):
        x = F.col(columns[a]).cast("double")
        for b in range(a + 1, k):
            y = F.col(columns[b]).cast("double")
            both = x.isNotNull() & y.isNotNull()
            xx = F.when(both, x)
            yy = F.when(both, y)
            p = f"{a}_{b}"
            aggs += [
                F.count(F.when(both, F.lit(1))).alias(f"n_{p}"),
                F.sum(_acc(xx)).alias(f"sx_{p}"),
                F.sum(_acc(yy)).alias(f"sy_{p}"),
                F.sum(_acc(xx * xx)).alias(f"sxx_{p}"),
                F.sum(_acc(yy * yy)).alias(f"syy_{p}"),
                F.sum(_acc(xx * yy)).alias(f"sxy_{p}"),
            ]
    one = df.agg(*aggs)
    cells = []
    for a in range(k):
        for b in range(a + 1, k):
            p = f"{a}_{b}"
            n = F.col(f"n_{p}").cast("double")
            sx = F.col(f"sx_{p}").cast("double")
            sy = F.col(f"sy_{p}").cast("double")
            sxx = F.col(f"sxx_{p}").cast("double")
            syy = F.col(f"syy_{p}").cast("double")
            sxy = F.col(f"sxy_{p}").cast("double")
            num = n * sxy - sx * sy
            den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            corr = F.when(den > 0, num / den)
            cells.append(F.struct(
                F.lit(columns[a]).alias("col_i"),
                F.lit(columns[b]).alias("col_j"),
                F.col(f"n_{p}").cast("bigint").alias("n"),
                (F.round(corr, round_to) + F.lit(0.0)).alias("corr"),
            ))
    return one.select(F.inline(F.array(*cells)))
