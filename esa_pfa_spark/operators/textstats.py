"""Text-analysis operators for training-data pipelines: tokenization
counts, quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in `pyspark.sql.functions` (JVM, whole-stage codegen) — no
Python in the hot path.  Each has an exactly-equivalent DuckDB SQL oracle
in __spark_entry__.py; portability contract: split on single space,
md5 for hashing, regexp '[a-z0-9]+' for alnum tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for")


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + alnum-run count + BPE-ish piece count."""
    return df.select(
        "doc_id",
        F.size(_words(text_col)).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit("[a-z0-9]+")).alias("alnum_tokens"),
        F.regexp_count(F.col(text_col), F.lit("[a-z]+|[0-9]|[^a-z0-9 ]")).alias("bpe_ish_tokens"),
    )


def tokenizer_fertility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer fertility by (source, lang): corpus-level chars-per-token
    and subword fan-out — the standard budgeting metric for how expensive
    a slice of corpus is to tokenize (high chars/token flags scripts or
    domains the tokenizer underserves; fan-out = BPE-ish pieces per
    whitespace word is the "fertility" of multilingual-tokenizer papers).

    Scale shape: ONE map-side-combinable hash aggregation over (source,
    lang) — token counting stays in JVM regex codegen, the shuffle is
    |sources|x|langs| rows.  Ratios are computed from exact integer SUMS
    (not per-doc ratio averages), so the result is partitioning-invariant
    and the DuckDB oracle exact."""
    ws = F.size(_words(text_col))
    bpe = F.regexp_count(F.col(text_col), F.lit("[a-z]+|[0-9]|[^a-z0-9 ]"))
    return (
        df.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(F.col(text_col))).alias("sum_chars"),
            F.sum(ws).alias("sum_ws_tokens"),
            F.sum(bpe).alias("sum_bpe_tokens"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            F.round(
                F.col("sum_chars") * F.lit(1.0) / F.col("sum_ws_tokens"), 6
            ).alias("chars_per_ws_token"),
            F.round(
                F.col("sum_chars") * F.lit(1.0) / F.col("sum_bpe_tokens"), 6
            ).alias("chars_per_bpe_token"),
            F.round(
                F.col("sum_bpe_tokens") * F.lit(1.0) / F.col("sum_ws_tokens"), 6
            ).alias("subword_fanout"),
        )
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / word-length / stopword-ratio quality features.
    Rejection-filter analog of the reference's patch quality gates
    (AlgalBloomFeatureWriter.java:277-303, P3)."""
    w = _words(text_col)
    in_set = ",".join(f"'{s}'" for s in STOPWORDS)
    stop_n = F.expr(f"size(filter(split({text_col}, ' '), w -> w in ({in_set})))")
    n_words = F.size(w)
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        F.round(
            (F.length(F.regexp_replace(F.col(text_col), " ", "")) * F.lit(1.0)) / n_words, 6
        ).alias("avg_word_len"),
        F.round(stop_n * F.lit(1.0) / n_words, 6).alias("stopword_ratio"),
        (F.length(F.col(text_col)) < 100).cast("int").alias("is_short"),
    )


def lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic (n-gram-lite).  Deterministic and
    cheap; a real model would slot into the same column contract."""
    en_markers = F.regexp_count(F.col(text_col), F.lit(r"\b(the|is|and|a)\b"))
    guess = F.when(en_markers >= 2, F.lit("en")).otherwise(F.lit("other"))
    return df.select(
        "doc_id",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).cast("int").alias("matches_label"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed
    text (the Lucene2Simple name-dictionary analog, Lucene2Simple.java:64-91)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select("doc_id", F.md5(norm).alias("fp"))


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc mean log-probability of its words under the CORPUS unigram
    distribution — the LM-scoring quality proxy (perplexity-lite; the
    cheap stand-in for a KenLM gate in production curation).

    Plan: explode words -> one corpus word-frequency agg -> equi-join
    words⋈freq on word -> per-doc avg.  The frequency table is
    vocab-sized (≪ corpus), so AQE broadcasts it; the corpus total rides
    a 1-row crossJoin (broadcast nested loop) — no driver-side action.
    Hot words are join PROBES against a broadcast build side: no skew.

    Determinism contract: the per-word term ln(wc/total) is IEEE-stable;
    the per-doc mean is an exact decimal(18,6) sum / count, so Spark's
    partial-agg order can't wiggle the 6-decimal output vs the oracle."""
    words = df.select("doc_id", F.explode(_words(text_col)).alias("w"))
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    total = words.agg(F.count(F.lit(1)).alias("n_total"))
    term = F.log(F.col("wc") * F.lit(1.0) / F.col("n_total"))
    return (
        words.join(freq, "w")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.sum(term.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


def source_kl(df: DataFrame, text_col: str = "text") -> DataFrame:
    """KL(source ‖ corpus) over word distributions, per source — the
    drift/contamination monitor a mixture pipeline runs per ingest batch
    (is this crawl slice's vocabulary shifting from the corpus?).

    KL = Σ_w p_src(w)·ln(p_src(w)/p_corpus(w)); p_corpus(w) > 0 wherever
    p_src(w) > 0 by construction (the corpus includes the source), so the
    sum is always finite.  Shape: two hash aggs (source×word, word) + a
    join on word (frequency side broadcast-small) + per-source exact
    decimal sum.  No window, no skew: per-source totals join on source
    (tiny), corpus totals ride a 1-row crossJoin."""
    words = df.select("source", F.explode(_words(text_col)).alias("w"))
    sw = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("swc"))
    stot = sw.groupBy("source").agg(F.sum("swc").alias("sn"))
    cw = sw.groupBy("w").agg(F.sum("swc").alias("cwc"))
    ctot = stot.agg(F.sum("sn").alias("cn"))
    p_s = F.col("swc") * F.lit(1.0) / F.col("sn")
    p_c = F.col("cwc") * F.lit(1.0) / F.col("cn")
    term = p_s * F.log(p_s / p_c)
    return (
        sw.join(stot, "source")
        .join(cw, "w")
        .crossJoin(ctot)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.round(
                F.sum(term.cast("decimal(18,6)")).cast("double"), 6
            ).alias("kl_vs_corpus"),
        )
    )


def zipf_slope(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source Zipf fit: least-squares slope of ln(freq) over ln(rank)
    on the source's word rank-frequency spectrum — the corpus-health
    diagnostic (natural text tracks slope ≈ -1; boilerplate/spam and
    template farms bend it).  Closed-form OLS in pure column math:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²).

    Ranking runs in a window PARTITIONED by source — per-partition work
    is vocab-sized (bounded by language, not corpus), so the plan holds
    at 100 TB; ties rank deterministically (freq desc, word asc).  The
    four OLS sums are exact decimal(18,6) sums for engine parity."""
    from pyspark.sql import Window as W

    freq = (
        df.select("source", F.explode(_words(text_col)).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.partitionBy("source").orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = freq.withColumn("r", F.row_number().over(w))
    x, y = F.log(F.col("r") * 1.0), F.log(F.col("c") * 1.0)

    def dsum(col):
        return F.sum(col.cast("decimal(18,6)")).cast("double")

    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_vocab"),
        dsum(x).alias("sx"), dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"), dsum(x * x).alias("sxx"),
    )
    n = F.col("n_vocab") * 1.0
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "source", "n_vocab", F.round(slope, 6).alias("zipf_slope")
    )


def oov_rate(df: DataFrame, text_col: str = "text", vocab_size: int = 1000) -> DataFrame:
    """Per-doc out-of-vocabulary ratio against the corpus top-``vocab_size``
    words — the tokenizer-coverage / gibberish gate (docs whose words a
    fixed vocabulary mostly can't cover are noise or the wrong language).

    The vocabulary is corpus-derived (freq desc, word asc ties) — a
    global top-V, computed as orderBy().limit(V) (TakeOrderedAndProject,
    no partition-less window) and BROADCAST to the membership join; the
    corpus side never shuffles."""
    words = df.select("doc_id", F.explode(_words(text_col)).alias("w"))
    vocab = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w", F.lit(1).alias("__iv"))
    )
    joined = words.join(F.broadcast(vocab), "w", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(
            F.sum(F.when(F.col("__iv").isNull(), 1).otherwise(0))
            * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("oov_ratio"),
    )


# PII patterns: the portable subset of Java regex / RE2 (no lookaround,
# no backreferences) so Spark and the DuckDB oracle match byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{4}",
}
PII_ORDER = ("email", "ipv4", "phone")  # email first: it may contain dots


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub for training corpora: replace emails / IPv4 addresses /
    international phone numbers with typed placeholders and count each
    per document.  Pure JVM codegen (regexp_replace + regexp_count) —
    map-only, no shuffle, scales linearly; patterns applied in a FIXED
    order (email before ipv4: an address inside an email must count as
    email, not as dotted digits).  Returns doc_id, clean_text, n_<type>
    columns."""
    out = df
    clean = F.col(text_col)
    for name in PII_ORDER:
        pat = PII_PATTERNS[name]
        out = out.withColumn(f"n_{name}", F.regexp_count(clean, F.lit(pat)))
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    return out.withColumn("clean_text", clean)


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    ban_words: tuple[str, ...] = ("lorem ipsum", "javascript", "{"),
) -> DataFrame:
    """C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2): keep
    only lines with >= ``min_words`` words, ending in terminal punctuation,
    and containing none of ``ban_words`` (case-insensitive).  Emits per-doc
    ``n_lines`` / ``n_kept`` and the newline-rejoined ``clean_text`` — the
    dropped ratio is the cleaning audit a curation report needs.

    Map-only higher-order array functions (split -> filter -> array_join),
    pure JVM codegen: no explode shuffle, no Python — at corpus scale this
    is a single scan.
    """
    lines = F.split(F.col(text_col), "\n")

    def keep(line):
        cond = F.size(F.split(F.trim(line), " +")) >= min_words
        if require_terminal_punct:
            cond = cond & line.rlike('[.!?"]\\s*$')
        low = F.lower(line)
        for b in ban_words:
            cond = cond & ~low.contains(b)
        return cond

    kept = F.filter(lines, keep)
    return df.withColumn("n_lines", F.size(lines)).withColumn(
        "n_kept", F.size(kept)
    ).withColumn("clean_text", F.array_join(kept, "\n"))


def encoding_garbage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mojibake / encoding-damage gate: per-doc counts of Unicode
    replacement chars (U+FFFD — the scar a bad decode leaves), C0/C1
    control chars (excluding \\t \\n \\r), and the non-ASCII ratio.  A
    corpus ingested through mixed encodings shows up here before it
    poisons tokenization.  Pure JVM regexp counts — map-only."""
    t = F.col(text_col)
    n = F.length(t)
    n_ascii = F.regexp_count(t, F.lit(r"[\x20-\x7E\t\n\r]"))
    return df.withColumn(
        "n_replacement", F.regexp_count(t, F.lit("�"))
    ).withColumn(
        "n_control", F.regexp_count(t, F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"))
    ).withColumn(
        "nonascii_ratio",
        F.when(n > 0, F.round((n - n_ascii).cast("double") / n, 6)).otherwise(F.lit(0.0)),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """BM25 ranking of documents against a bag-of-terms query (Robertson &
    Sparck Jones; the Lucene-default scoring the reference's Lucene query
    layer ultimately rides, re-expressed relationally):

        score(d) = sum_t idf(t) * tf(t,d)*(k1+1) /
                                (tf(t,d) + k1*(1 - b + b*dl(d)/avgdl))
        idf(t)   = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

    over whitespace words.  Returns the top-``k`` docs:
    ``(id_col, dl, n_hit, score)``, ties broken by id.

    Scale shape: the corpus stats (N, avgdl — one tiny agg; df(t) — an
    aggregation over ONLY rows matching the query terms) are broadcast;
    per-doc term frequencies filter BEFORE the shuffle, so the exchange
    carries |query_terms| x matching-docs rows, not the corpus; top-k is
    TakeOrderedAndProject.  Per-term scores are 6dp-rounded and accumulated
    as decimal(18,6) — the engine-exact oracle witness."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    words = F.split(F.col(text_col), " ")
    base = df.select(id_col, words.alias("__w"), F.size(words).alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    hits = (
        base.select(id_col, "dl", F.explode("__w").alias("__t"))
        .filter(F.col("__t").isin(terms))
        .groupBy(id_col, "dl", "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = hits.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    term_score = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, round_to)
    return (
        scored.groupBy(id_col, "dl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hit"),
            F.sum(term_score.cast("decimal(18,6)")).cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def token_entropy(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution plus its
    normalized form — the standard gibberish/boilerplate gate (near-zero
    entropy = one token repeated; entropy ~ ln(n_distinct) = no reuse
    structure):

        H(d)    = -sum_v p_v ln p_v ,  p_v = tf(v,d)/n_tok(d)
        Hnorm   = H / ln(n_distinct)      (null when n_distinct = 1)

    Returns ``(id_col, n_tok, n_distinct, entropy, entropy_norm)``.

    Scale shape: explode -> groupBy(id, token) -> groupBy(id) — both
    exchanges hash on the doc id, so AQE coalesces them into one effective
    repartition; no UDF, no driver state.  Per-token plogp terms are
    6dp-rounded and summed as decimal (engine-exact)."""
    ex = (
        df.select(id_col, F.size(F.col(tokens_col)).alias("n_tok"),
                  F.explode(F.col(tokens_col)).alias("__t"))
        .groupBy(id_col, "n_tok", "__t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    p = F.col("tf").cast("double") / F.col("n_tok").cast("double")
    plogp = F.round(-(p * F.log(p)), round_to)
    agg = ex.groupBy(id_col, "n_tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(plogp.cast("decimal(18,6)")).cast("double").alias("entropy"),
    )
    return agg.select(
        id_col,
        F.col("n_tok").cast("long").alias("n_tok"),
        "n_distinct",
        F.round(F.col("entropy"), round_to).alias("entropy"),
        F.round(
            F.when(F.col("n_distinct") > 1,
                   F.col("entropy") / F.log(F.col("n_distinct").cast("double"))),
            round_to,
        ).alias("entropy_norm"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText repetition-independent document gates (Rae et
    al. 2021 Table A1) as one composed rule vector: word-count bounds,
    mean-word-length band, symbol-to-word ratio (# and ellipsis), fraction
    of words with an alphabetic character, and required-stopword hits.
    Returns per-doc rule flags (1 = violation), ``n_failed`` and ``keep`` —
    downstream filters read the flags, audits read the counts.  (The
    repetition gates — dup line/para fractions, top-ngram char share —
    live in tokens.repetition_stats / dup_ngram_summary; this is the
    document-shape half.)  Map-only JVM column math, no shuffle."""
    w = _words(text_col)
    n_words = F.size(w)
    mean_len = F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_words
    symbols = (
        F.regexp_count(F.col(text_col), F.lit(r"#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
    )
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))) / n_words
    )
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    stop_hits = F.expr(
        f"size(filter(array({stops}), s -> array_contains(split({text_col}, ' '), s)))"
    )
    r_count = ((n_words < min_words) | (n_words > max_words)).cast("int")
    r_len = ((mean_len < min_mean_len) | (mean_len > max_mean_len)).cast("int")
    r_sym = (symbols / n_words > max_symbol_ratio).cast("int")
    r_alpha = (alpha_frac < min_alpha_frac).cast("int")
    r_stop = (stop_hits < min_stop_hits).cast("int")
    n_failed = r_count + r_len + r_sym + r_alpha + r_stop
    return df.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        r_count.alias("fail_word_count"),
        r_len.alias("fail_mean_len"),
        r_sym.alias("fail_symbol_ratio"),
        r_alpha.alias("fail_alpha"),
        r_stop.alias("fail_stopwords"),
        n_failed.cast("int").alias("n_failed"),
        (n_failed == 0).cast("int").alias("keep"),
    )


def ccnet_ppl_buckets(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
    ``group_col`` slice, split documents into head / middle / tail thirds
    by LM quality score — head = the best-scoring third (kept outright in
    CCNet), middle = kept-or-LM-filtered, tail = usually dropped.  Score
    is ``unigram_logprob``'s per-doc mean ln p(word) (higher = more
    corpus-typical, the perplexity-lite proxy); bucketing PER group keeps
    a hard domain from being wholly condemned by a global threshold.

    Returns ``(doc_id, group, n_words, avg_logprob, ppl_bucket)``.

    Scale shape: the score pass is unigram_logprob's (vocab-bounded
    broadcast); the per-group tercile edges are ONE tiny agg
    (|groups| x 2 values) broadcast back; assignment is map-only.  Ties
    sit in the better bucket (score >= edge), mirroring quantile_bins."""
    scored = unigram_logprob(df, text_col=text_col).join(
        df.select("doc_id", group_col), "doc_id"
    )
    edges = scored.groupBy(group_col).agg(
        F.percentile(F.col("avg_logprob"), F.lit(1.0 / 3)).alias("__e1"),
        F.percentile(F.col("avg_logprob"), F.lit(2.0 / 3)).alias("__e2"),
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.col("__e2"), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("__e1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(edges), group_col)
        .select("doc_id", group_col, "n_words", "avg_logprob",
                bucket.alias("ppl_bucket"))
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    backoff: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """Bigram-LM quality score with stupid backoff (Brants et al. 2007 —
    the web-scale LM recipe: no discounting to fit, just
    ``p(w|v) = c(vw)/c(v)`` when the bigram was seen, else
    ``0.4 * c(w)/N``): per-doc mean ln-probability under the corpus's own
    bigram statistics — a strictly sharper quality/typicality proxy than
    ``unigram_logprob`` (word order now matters: scrambled text scores
    like unseen bigrams).  The first word scores as its unigram.
    Returns ``(doc_id, n_words, avg_logprob)``.

    Shape: word pairs built map-side (zip_with over the split — no
    positional self-join); the bigram count table joins back by EQUI-join
    on the pair (corpus-sized, hash-partitioned, AQE-splittable — NOT
    broadcast; at web scale the bigram vocabulary outgrows any broadcast);
    unigram counts and the corpus total ride vocab-bounded/1-row
    broadcasts.  Per-term 6dp decimal accumulation (engine-exact)."""
    words = _words(text_col)
    n = F.size(words)
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("v"), b.alias("w")),
    )
    first = F.element_at(words, 1)

    uni = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    n_tot = uni.agg(F.sum("c").alias("n_total"))
    big = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
        .groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    )

    ex = df.select(
        "doc_id",
        F.explode(pairs).alias("p"),
    ).select(
        "doc_id",
        F.col("p.v").alias("v"), F.col("p.w").alias("w"),
    )
    uv = uni.select(F.col("w").alias("v"), F.col("c").alias("c_v"))
    uw = uni.select(F.col("w"), F.col("c").alias("c_w"))
    scored = (
        ex.join(big, ["v", "w"], "left")
        .join(F.broadcast(uv), "v")
        .join(F.broadcast(uw), "w")
        .crossJoin(F.broadcast(n_tot))
    )
    term = F.when(
        F.col("c_vw").isNotNull(),
        F.log(F.col("c_vw").cast("double") / F.col("c_v")),
    ).otherwise(
        F.log(F.lit(float(backoff)) * F.col("c_w").cast("double") / F.col("n_total"))
    )
    pair_terms = scored.groupBy("doc_id").agg(
        F.sum(F.round(term, round_to).cast("decimal(18,6)")).alias("__s"),
        F.count(F.lit(1)).alias("__np"),
    )

    # anchor on the first-word term: it exists for EVERY doc (single-word
    # docs have no pairs and must not drop out of the output)
    first_term = (
        df.select("doc_id", n.alias("__n"), first.alias("w"))
        .join(F.broadcast(uw), "w")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id", "__n",
            F.round(
                F.log(F.col("c_w").cast("double") / F.col("n_total")), round_to
            ).cast("decimal(18,6)").alias("__f"),
        )
    )
    out = first_term.join(pair_terms, "doc_id", "left")
    s_all = F.coalesce(F.col("__s"), F.lit("0").cast("decimal(18,6)")) + F.col("__f")
    np_all = F.coalesce(F.col("__np"), F.lit(0)) + 1
    return out.select(
        "doc_id",
        F.col("__n").cast("long").alias("n_words"),
        F.round(s_all.cast("double") / np_all, round_to).alias("avg_logprob"),
    )


def kneser_ney_logprob(
    df: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality score (Kneser & Ney
    1995; Chen & Goodman 1999, the fixed-discount interpolated form):
    per-doc mean ``ln P_KN(w|v)`` over the doc's bigram positions, where

        P_KN(w|v) = (max(c(v,w) - D, 0) + D * N1+(v,*) * Pcont(w)) / c(v,*)
        Pcont(w)  = N1+(*,w) / B

    with ``c(v,*)`` = total bigram occurrences with context ``v``,
    ``N1+(v,*)`` = distinct continuations of ``v``, ``N1+(*,w)`` =
    distinct contexts preceding ``w``, ``B`` = distinct bigram TYPES.
    The continuation probability is exactly what raises KN above stupid
    backoff (``bigram_logprob``): a word frequent only inside one
    collocation gets a LOW continuation score even though its raw
    unigram count is high — the classic "Francisco" correction.  This is
    the KenLM-shaped gate CCNet-style curation uses where
    ``unigram_logprob`` is the cheap stand-in.

    Scoring the training corpus itself guarantees every scored ``(v,w)``
    was counted, so ``c(v,*) >= c(v,w) >= 1`` and the ln argument is
    > 0; held-out scoring falls back through the same expression with
    the unseen-bigram term ``D * N1+(v,*) * Pcont(w) / c(v,*)`` and, for
    an unseen CONTEXT, plain ``Pcont(w)`` (left joins + coalesce below).
    Single-word docs have no bigram position and are excluded (n >= 2).

    Shape (the bigram_logprob scale discipline): pairs built map-side
    via ``zip_with`` — no positional self-join; the bigram count table
    joins back by EQUI-join on ``(v, w)`` (corpus-sized,
    hash-partitioned, NOT broadcast — the bigram vocabulary outgrows
    any broadcast at web scale); the per-context table ``(c_v, n1_v)``
    and the per-continuation table ``n1_w`` are vocab-bounded
    broadcasts; ``B`` rides a 1-row crossJoin.  Per-term 6dp decimal
    accumulation keeps the distributed per-doc sum order-independent
    (engine-exact vs the DuckDB oracle).

    Reference anchor: the per-product statistical descriptors of
    pfa-core's FexOperator are the same compute-over-own-corpus shape
    (derive the model from the data being scored)."""
    words = _words(text_col)
    n = F.size(words)
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("v"), b.alias("w")),
    )
    ex = (
        df.filter(n >= 2)
        .select("doc_id", n.alias("__n"), F.explode(pairs).alias("p"))
        .select(
            "doc_id", "__n", F.col("p.v").alias("v"), F.col("p.w").alias("w")
        )
    )
    big = ex.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    ctx = big.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"), F.count(F.lit(1)).alias("n1_v")
    )
    cont = big.groupBy("w").agg(F.count(F.lit(1)).alias("n1_w"))
    btot = big.agg(F.count(F.lit(1)).alias("b_types"))

    d = F.lit(float(discount))
    scored = (
        ex.join(big, ["v", "w"], "left")
        .join(F.broadcast(ctx), "v", "left")
        .join(F.broadcast(cont), "w", "left")
        .crossJoin(F.broadcast(btot))
    )
    pcont = (
        F.coalesce(F.col("n1_w"), F.lit(0)).cast("double") / F.col("b_types")
    )
    p_seen = (
        F.greatest(
            F.coalesce(F.col("c_vw"), F.lit(0)).cast("double") - d, F.lit(0.0)
        )
        + d * F.col("n1_v").cast("double") * pcont
    ) / F.col("c_v").cast("double")
    p = F.when(F.col("c_v").isNotNull(), p_seen).otherwise(pcont)
    term = F.round(F.log(p), round_to).cast("decimal(18,6)")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.max("__n").alias("__nw"),
            F.sum(term).alias("__s"),
            F.count(F.lit(1)).alias("__np"),
        )
        .select(
            "doc_id",
            F.col("__nw").cast("long").alias("n_words"),
            F.col("__np").cast("long").alias("n_pairs"),
            F.round(F.col("__s").cast("double") / F.col("__np"), round_to).alias(
                "kn_logprob"
            ),
        )
    )
