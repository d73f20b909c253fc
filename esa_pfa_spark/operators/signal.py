"""Sequential signal features over entity timelines: EWMA state summaries
and CUSUM changepoint scores — the monitoring/feature ops that need
ORDER, not just frames.

``ewma_by_key``: the exponentially weighted state a feature store keeps
per entity.  Recursive (s = (1-a)s + a·x), so no window frame expresses
it; instead of a Python UDF the fold runs JVM-side with ``F.aggregate``
over the entity's time-sorted value array — and because the DuckDB
oracle's ``list_reduce`` executes the IDENTICAL operation sequence on
doubles, the result is bit-exact across engines (same trick as the
engine's decimal sums, but for an order-DEPENDENT recurrence).

``cusum_by_key``: one-sided CUSUM drift score.  The textbook recurrence
S_i = max(0, S_{i-1} + x_i - c) looks sequential, but telescoping gives
  S_i = (P_i - i·c) - min_{j<=i}(P_j - j·c),   P = running sum
so the max score is pure window algebra over ONE sort: cumulative sum,
running min, max — no fold at all.  (The same de-recursion the engine
uses for difference-of-cumulatives in pit.py.)

Scale: both are one Exchange on the key; per-key array size bounds the
EWMA task (same bound as every per-key collect in the engine); CUSUM
never materializes an array at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_by_key(
    df: DataFrame,
    value: str = "value",
    key: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    alpha: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Final EWMA state per key: fold s := (1-alpha)*s + alpha*x over the
    time-sorted values, seeded with the FIRST value (the standard
    adjust=False form).  Returns (key, n, ewma)."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    grouped = (
        df.select(key, F.struct(F.col(ts).alias("t"),
                                *( [F.col(tiebreak).alias("tb")] if tiebreak else [] ),
                                F.col(value).cast("double").alias("v")).alias("__e"))
        .groupBy(key)
        .agg(F.sort_array(F.collect_list("__e")).alias("__evs"))
    )
    vals = F.transform(F.col("__evs"), lambda e: e["v"])
    head = F.element_at(vals, 1)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    folded = F.aggregate(
        rest,
        head,
        lambda acc, x: acc * F.lit(1.0 - alpha) + F.lit(alpha) * x,
    )
    return grouped.select(
        key,
        F.size("__evs").cast("long").alias("n"),
        F.round(folded, round_to).alias("ewma"),
    )


def cusum_by_key(
    df: DataFrame,
    value: str = "value",
    key: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    target: float = 0.0,
    slack: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """One-sided CUSUM drift score per key: max_i S_i with
    S_i = max(0, S_{i-1} + (x_i - target - slack)), computed WITHOUT the
    recurrence via the telescoped window form (module docstring).
    Returns (key, n, cusum_max); flag rows upstream with
    ``cusum_max > h`` for the drift alarm."""
    c = float(target) + float(slack)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w_cum = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    # d_i = P_i - i*c as an exact decimal cumulative (order-independent
    # addition; the subtraction of running-min then happens in double)
    d = F.sum((F.col(value) - F.lit(c)).cast("decimal(18,6)")).over(w_cum)
    scored = df.withColumn("__d", d.cast("double"))
    run_min = F.min(F.least(F.col("__d"), F.lit(0.0))).over(w_cum)
    s_i = F.col("__d") - run_min
    per_row = scored.withColumn("__s", s_i)
    return (
        per_row.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("__s"), round_to).alias("cusum_max"),
        )
    )


def trend_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    origin_ts: str = "2024-01-01",
    round_to: int = 6,
) -> DataFrame:
    """Per-entity OLS trend features: slope (value per DAY), intercept (at
    ``origin_ts``), and R^2 of value vs. time — the classic point-in-time
    trend triple a feature store derives per entity timeline.

    Exactness across engines: the closed-form normal equations need sums
    of x, x^2, y, y^2, xy.  Doubles summed in different partition orders
    diverge in the last bits, so BOTH engines are made to accumulate exact
    INTEGERS — x as epoch-microseconds relative to ``origin_ts`` and y in
    micro-units (value rounded to 6dp via the engine-portable
    decimal(18,6) cast, then scaled by 10^6).  The final slope /
    intercept / R^2 arithmetic is double, but it consumes identical
    integers with an identical operation order, so the rounded outputs
    match cell-for-cell.  Magnitude headroom: sum(x^2) at decimal(38,0)
    holds ~10 years of micros squared times 10^9 rows per key.

    Rows with fewer than 2 events or zero time-variance are dropped (the
    slope is undefined); constant-value keys keep slope 0 and a NULL R^2.

    Plan shape (100 TB): one map-side-combinable partial agg keyed on the
    entity — the 5 sums travel, never the rows; no window, no sort, no
    second pass.  (Contrast: a window-based regression would shuffle AND
    sort every observation.)
    """
    # timestamp_ntz columns need the ltz hop before unix_micros (session tz
    # is UTC); same device as pit.py's bucket math.
    x = (
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
        - F.unix_micros(F.lit(origin_ts).cast("timestamp_ltz"))
    ).cast("decimal(20,0)")
    y_u = (
        (F.col(value_col).cast("decimal(18,6)") * F.lit(1000000).cast("decimal(7,0)"))
        .cast("decimal(38,0)")
    )
    a = (
        df.select(F.col(key_col).alias("key"), x.alias("x"), y_u.alias("yu"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum("yu").alias("syu"),
            F.sum(F.col("yu") * F.col("yu")).alias("syy"),
            F.sum(F.col("x") * F.col("yu")).alias("sxy"),
        )
    )
    # exact-integer degeneracy tests (identical row-drop set in the oracle)
    denx_exact = F.col("n").cast("decimal(38,0)") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny_exact = F.col("n").cast("decimal(38,0)") * F.col("syy") - F.col("syu") * F.col("syu")
    nD = F.col("n").cast("double")
    sxD, sxxD = F.col("sx").cast("double"), F.col("sxx").cast("double")
    syD, syyD = F.col("syu").cast("double"), F.col("syy").cast("double")
    sxyD = F.col("sxy").cast("double")
    num = nD * sxyD - sxD * syD
    denx = nD * sxxD - sxD * sxD
    deny = nD * syyD - syD * syD
    slope_day = F.round(num * F.lit(86400.0) / denx, round_to)
    intercept = F.round((syD - num / denx * sxD) / nD / F.lit(1000000.0), round_to)
    r2 = F.when(
        deny_exact > 0, F.round(num * num / (denx * deny), round_to)
    ).otherwise(F.lit(None).cast("double"))
    return (
        a.filter(denx_exact > 0)
        .select(
            F.col("key").alias(key_col),
            F.col("n").cast("long").alias("n_events"),
            slope_day.alias("slope_per_day"),
            intercept.alias("intercept"),
            r2.alias("r2"),
        )
        .orderBy(key_col)
    )


def gap_stats_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Inter-event-time features per entity: count, mean/min/max/std of the
    gaps between consecutive events (seconds), plus the Goh-Barabasi
    burstiness coefficient B = (sigma - mu) / (sigma + mu) over the gap
    distribution — B -> -1 for a metronome, 0 for a Poisson process,
    +1 for extreme bursts.  The timeline-shape trio (how often / how
    regular / how bursty) a feature store derives next to the EWMA and
    trend state.

    Exactness across engines: gaps are exact INTEGER microsecond
    differences (lag over the (ts, tiebreak) total order); the aggregate
    carries n, sum(g), sum(g^2), min, max with decimal sums, and only the
    final mean/std/burstiness arithmetic is double — identical integer
    inputs through an identical operation order, so the rounded outputs
    match cell-for-cell (sqrt on equal doubles is IEEE-exact in both
    engines).  Population (1/n) variance so single-gap keys get std 0.

    Keys with a single event (no gaps) are dropped; burstiness is NULL
    when sigma + mu == 0 (all gaps zero, e.g. duplicate timestamps only).

    Plan shape (100 TB): ONE Exchange — the lag window hash-partitions on
    the key and the follow-up groupBy reuses that partitioning (no second
    shuffle; plan-asserted in tests/test_plans.py).  Per-key state is five
    scalars; nothing buffers the timeline.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    x = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    g = (x - F.lag(x).over(w)).cast("decimal(20,0)")
    # group on the ORIGINAL key attribute — aliasing it first would break
    # attribute identity with the window's hashpartitioning and cost a
    # second Exchange (plan-asserted single shuffle in tests/test_plans.py)
    a = (
        df.select(F.col(key_col), g.alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("g").alias("sg"),
            F.sum(F.col("g") * F.col("g")).alias("sg2"),
            F.min("g").alias("gmin"),
            F.max("g").alias("gmax"),
        )
    )
    nD = F.col("n").cast("double")
    sgD = F.col("sg").cast("double")
    sg2D = F.col("sg2").cast("double")
    num = nD * sg2D - sgD * sgD          # n^2 * population variance (µs^2)
    mean_us = sgD / nD
    std_us = F.sqrt(F.greatest(num, F.lit(0.0))) / nD
    burst = F.when(
        std_us + mean_us > 0,
        F.round((std_us - mean_us) / (std_us + mean_us), round_to),
    ).otherwise(F.lit(None).cast("double"))
    return a.select(
        F.col(key_col),
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mean_us / F.lit(1e6), round_to).alias("gap_mean_s"),
        F.round(F.col("gmin").cast("double") / F.lit(1e6), round_to).alias("gap_min_s"),
        F.round(F.col("gmax").cast("double") / F.lit(1e6), round_to).alias("gap_max_s"),
        F.round(std_us / F.lit(1e6), round_to).alias("gap_std_s"),
        burst.alias("burstiness"),
    ).orderBy(key_col)


def acf_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = "event_id",
    lags: tuple[int, ...] = (1, 2),
    round_to: int = 6,
) -> DataFrame:
    """Per-entity autocorrelation of the value sequence at each requested
    lag: Pearson r between (v_t, v_{t+lag}) over the (ts, tiebreak)-ordered
    events — long output (key, lag, n_pairs, acf).  The memory/periodicity
    feature next to trend and burstiness: near +1 = persistent level,
    near -1 = alternating, ~0 = no sequential structure.

    Exactness across engines: values ride as exact micro-unit INTEGERS
    (decimal(18,6) cast * 10^6, the trend_by_key device) and each (key,
    lag) cell accumulates n, Σx, Σy, Σx², Σy², Σxy as decimals; only the
    final correlation is double, from identical integers through an
    identical operation order.  Degenerate cells (either side constant —
    zero variance) are dropped by an EXACT integer test, so both engines
    drop the same rows.

    Plan shape (100 TB): ONE ordered window computes every lead in a
    single pass (k columns, one sort), the lag structs explode map-side,
    and the (key, lag) partial agg ships 6 scalars per cell — the shuffle
    after the window is |keys|*|lags| rows, never the events.
    """
    if not lags:
        raise ValueError("lags must be non-empty")
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    yu = (
        (F.col(value_col).cast("decimal(18,6)") * F.lit(1000000).cast("decimal(7,0)"))
        .cast("decimal(38,0)")
    )
    # leads materialize in their own projection first — Spark forbids
    # window expressions inside a generator (explode)
    led = df.select(
        F.col(key_col),
        F.col(ts_col),
        *([F.col(tiebreak)] if tiebreak else []),
        yu.alias("_yu"),
    ).select(
        F.col(key_col),
        F.col("_yu"),
        *[F.lead("_yu", int(k)).over(w).alias(f"_y{k}") for k in lags],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(k)).alias("lag"),
                F.col("_yu").alias("x"),
                F.col(f"_y{k}").alias("y"),
            )
            for k in lags
        ]
    )
    exploded = (
        led.select(F.col(key_col), F.explode(pairs).alias("p"))
        .select(key_col, "p.lag", "p.x", "p.y")
        .filter(F.col("y").isNotNull())
    )
    a = exploded.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nE = F.col("n").cast("decimal(38,0)")
    denx_exact = nE * F.col("sxx") - F.col("sx") * F.col("sx")
    deny_exact = nE * F.col("syy") - F.col("sy") * F.col("sy")
    nD = F.col("n").cast("double")
    sxD, syD = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxD, syyD = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyD = F.col("sxy").cast("double")
    acf = (nD * sxyD - sxD * syD) / F.sqrt(
        (nD * sxxD - sxD * sxD) * (nD * syyD - syD * syD)
    )
    return (
        a.filter((denx_exact > 0) & (deny_exact > 0))
        .select(
            F.col(key_col),
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("long").alias("n_pairs"),
            F.round(acf, round_to).alias("acf"),
        )
        .orderBy(key_col, "lag")
    )


def behavior_profile_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """Behavioral-diversity profile per entity: event count, distinct
    event types, Shannon entropy of the type mix (+ normalized form),
    and the dominant type with its share — the "does this user do one
    thing or many" feature block.

    Exactness: per-type plogp terms are 6dp-rounded then summed as
    decimal (token_entropy's device — order-independent), the dominant
    type is the exact mode with ties to the LEXICALLY SMALLEST type
    (min over (-count, type) structs, total order).

    Plan shape (100 TB): groupBy(key, type) then groupBy(key) — both
    exchanges hash on the key (subset clustering), so the second collapses
    into the first's partitioning; per-key state is |types| rows.
    """
    ex = (
        df.groupBy(F.col(key_col), F.col(type_col).alias("__ty"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wsum = Window.partitionBy(key_col)
    ex = ex.withColumn("__n", F.sum("cnt").over(wsum))
    p = F.col("cnt").cast("double") / F.col("__n").cast("double")
    plogp = F.round(-(p * F.log(p)), round_to)
    best = F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("__ty").alias("ty")))
    agg = ex.groupBy(key_col).agg(
        F.max("__n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(plogp.cast("decimal(18,6)")).cast("double").alias("__h"),
        best.alias("__best"),
    )
    return agg.select(
        F.col(key_col),
        "n_events",
        "n_types",
        F.round(F.col("__h"), round_to).alias("type_entropy"),
        F.round(
            F.when(
                F.col("n_types") > 1,
                F.col("__h") / F.log(F.col("n_types").cast("double")),
            ),
            round_to,
        ).alias("type_entropy_norm"),
        F.col("__best.ty").alias("top_type"),
        F.round(
            (-F.col("__best.nc")).cast("double") / F.col("n_events").cast("double"),
            round_to,
        ).alias("top_share"),
    ).orderBy(key_col)


def seasonality_strength_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int = 6,
) -> DataFrame:
    """Hour-of-day seasonality strength per entity: eta^2 = between-hour
    variance / total variance of the value — 0 when the hour explains
    nothing, 1 when value is a pure function of hour.  The "does this
    entity have a daily rhythm" feature next to trend/ACF/burstiness.

    Exactness: per-(key, hour) cells carry exact integer micro-unit sums
    (n_h, s_h, q_h); the between-group term sums 6dp-rounded
    ``s_h^2 / n_h`` contributions as decimal (order-independent), and
    the final eta^2 is one double expression over identical inputs.
    Entities whose value is constant (exact integer total-variance test
    n*q - s^2 <= 0) are dropped — eta^2 is undefined there.

    Plan shape (100 TB): groupBy(key, hour) with map-side combine (cell
    count is |keys|*24), then groupBy(key) on the same hash subset — the
    value rows shuffle once at most; no window, no sort.
    """
    yu = (
        (F.col(value_col).cast("decimal(18,6)") * F.lit(1000000).cast("decimal(7,0)"))
        .cast("decimal(38,0)")
    )
    cells = (
        df.select(
            F.col(key_col),
            F.hour(F.col(ts_col)).alias("__h"),
            yu.alias("__yu"),
        )
        .groupBy(key_col, "__h")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.sum("__yu").alias("sh"),
            F.sum(F.col("__yu") * F.col("__yu")).alias("qh"),
        )
    )
    term = F.round(
        F.col("sh").cast("double") * F.col("sh").cast("double")
        / F.col("nh").cast("double"),
        round_to,
    ).cast("decimal(38,6)")
    a = cells.groupBy(key_col).agg(
        F.sum("nh").alias("n"),
        F.sum("sh").alias("s"),
        F.sum("qh").alias("q"),
        F.sum(term).alias("bsum"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    sst_exact = (
        F.col("n").cast("decimal(38,0)") * F.col("q") - F.col("s") * F.col("s")
    )
    nD, sD, qD = (F.col(c).cast("double") for c in ("n", "s", "q"))
    b = sD * sD / nD
    eta2 = (F.col("bsum").cast("double") - b) / (qD - b)
    return (
        a.filter(sst_exact > 0)
        .select(
            F.col(key_col),
            F.col("n").cast("long").alias("n_events"),
            "n_hours",
            F.round(F.greatest(F.least(eta2, F.lit(1.0)), F.lit(0.0)), round_to).alias(
                "eta2_hour"
            ),
        )
        .orderBy(key_col)
    )


def changepoint_topk(
    df: DataFrame,
    value: str = "value",
    key: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    w: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Per-entity mean-shift changepoint: at each event, score the split
    |mean(next w values incl. this one) − mean(previous w values)| and
    return each entity's single highest-scoring timestamp (CUSUM's
    localization sibling: cusum_by_key says *whether* a shift happened,
    this says *where*).  Only positions with FULL w-windows on both sides
    score, so entities with < w+w events return no row.

    One Exchange on the key, two in-partition sorts (time order for the
    frame sums, then score order for the per-key argmax — same hash
    partitioning, so the second window adds a sort, not a shuffle).
    Frame sums accumulate in decimal: the score is bit-identical across
    engines/partitionings; the argmax tie rule is (score DESC, ts ASC,
    tiebreak ASC) — fully deterministic.

    Scale: shuffle is |events| rows on the entity key (same bound as
    every per-entity window in the engine); nothing per-key collects.
    """
    if w < 1:
        raise ValueError("w must be >= 1")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    base = Window.partitionBy(key).orderBy(*order)
    left_f = base.rowsBetween(-w, -1)
    right_f = base.rowsBetween(0, w - 1)
    dec = F.col(value).cast("decimal(18,6)")
    scored = (
        df.withColumn("__ls", F.sum(dec).over(left_f))
        .withColumn("__ln", F.count(F.col(value)).over(left_f))
        .withColumn("__rs", F.sum(dec).over(right_f))
        .withColumn("__rn", F.count(F.col(value)).over(right_f))
        .filter((F.col("__ln") == w) & (F.col("__rn") == w))
        .withColumn(
            "__score",
            F.abs((F.col("__rs") - F.col("__ls")).cast("double")) / F.lit(float(w)),
        )
    )
    pick = Window.partitionBy(key).orderBy(
        F.col("__score").desc(), *[c.asc() for c in order]
    )
    out_cols = [key, ts] + ([tiebreak] if tiebreak else [])
    return (
        scored.withColumn("__rn2", F.row_number().over(pick))
        .filter(F.col("__rn2") == 1)
        .select(
            *out_cols,
            (F.round(F.col("__score"), round_to) + F.lit(0.0)).alias("shift_score"),
        )
    )
