"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed (random
hyperplane signs) as the scale path.  Dot products run JVM-side via
``aggregate(zip_with(...))`` — a left-to-right double fold, bit-identical
to the SQL oracle's list_dot_product.  ``cosine_scores`` is the
Arrow/numpy pandas_udf variant for wide fan-out (one matmul per batch;
~15x faster than the interpreted higher-order fold on large scans, same
values to allclose — the oracle-checked queries keep the fold for
bit-identity with DuckDB).

At 100 TB the brute-force path is a broadcast of the (small) probe set
against a scan of the embedding table: linear, no shuffle.  The LSH path
buckets both sides by signature so candidate generation is an equi-join.
Top-k ranking everywhere is ``orderBy(...).limit(k)`` — Spark compiles it
to TakeOrderedAndProject (per-partition k-heaps merged on one reducer over
k·n_partitions rows, never a global sort/shuffle of the scored set);
row_number assignment happens AFTER the limit, over k rows only.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_scores(probe_vec, dim: int = 64):
    """Vectorized numpy cosine scorer: returns a pandas_udf computing the
    cosine of each row's embedding against the fixed ``probe_vec`` (a
    python/numpy vector shipped to executors as a literal inside the UDF).
    One Arrow batch -> one matmul; use for wide fan-out scoring where the
    JVM fold's per-element interpretation dominates."""
    q = np.asarray(probe_vec, dtype=np.float64).reshape(-1)
    qn = float(np.sqrt(q @ q))

    @F.pandas_udf(T.DoubleType())
    def score(v: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series((m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn))

    return score


def _rank_topk(scored: DataFrame, k: int, id_col: str = "vec_id") -> DataFrame:
    """Deterministic top-k of a scored frame (columns: id_col, cos) WITHOUT
    a global window: ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject (map-side k-heaps, one tiny merge), then
    row_number runs over only the k survivors.  The previous
    ``row_number() OVER (ORDER BY ...)`` form funneled EVERY scored row
    through a single task — a straggler/OOM bug at 100x scale."""
    top = scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        top.withColumn("rank", F.row_number().over(w)).select(id_col, "rank")
    )


def cosine_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a single probe row (columns: ``q``).
    Probe is broadcast; ranking is deterministic (cos desc, id asc)."""
    joined = embeddings.crossJoin(F.broadcast(probe))
    scored = joined.select(
        F.col(id_col),
        cosine(F.col(vec_col), F.col("q")).alias("cos"),
    )
    return _rank_topk(scored, k, id_col)


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold.  ``block_col`` restricts the
    self-join to equal blocks (LSH-bucket analog) — REQUIRED at scale; the
    unblocked form is quadratic and only for oracle-checkable small runs."""
    l = embeddings.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("__va"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    r = embeddings.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("__vb"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    cond = F.col("vec_id_a") < F.col("vec_id_b")
    j = l.join(r, on="__blk") if block_col else l.crossJoin(r)
    return (
        j.filter(cond)
        .withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_id_a", "vec_id_b")
    )


def lsh_signature(
    embeddings: DataFrame,
    n_planes: int = 16,
    seed: int = 7,
    dim: int = 64,
    id_col: str | None = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (int bitmask of dot-sign bits).
    Planes are a deterministic seeded numpy matrix broadcast as literals
    via a vectorized pandas_udf (Arrow batches, numpy matmul inside).
    With ``id_col=None`` returns only the signature column (probe side)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def sig(v: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (m @ planes.T) > 0
        out = np.zeros(len(v), dtype=np.int32)
        for b in range(n_planes):
            out |= bits[:, b].astype(np.int32) << b
        return pd.Series(out)

    cols = [id_col] if id_col is not None else []
    return embeddings.select(*cols, sig(F.col(vec_col)).alias("lsh_sig"))


def ann_topk_lsh(
    embeddings: DataFrame,
    probe: DataFrame,
    k: int = 20,
    n_planes: int = 8,
    seed: int = 7,
    dim: int = 64,
    hamming_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share the probe's LSH bucket, then exact
    cosine rank within candidates.  The scale path: the probe bucket prunes
    the scan to ~1/2^n_planes of the table.

    ``hamming_radius=1`` is the multi-probe form: near neighbors that land
    just across ONE hyperplane (the dominant miss mode — a vector close to
    the probe differs in few sign bits) are recovered by also searching
    every bucket at Hamming distance 1 from the probe's signature —
    n_planes+1 buckets instead of 1, still ~(n_planes+1)/2^n_planes of the
    table.  Deterministic, so exactly oracle-able; recall vs exact
    cosine_topk is contract-tested at radius 0 and 1
    (tests/test_similarity.py)."""
    if hamming_radius not in (0, 1):
        raise ValueError("hamming_radius must be 0 or 1")
    sigs = lsh_signature(embeddings, n_planes, seed, dim)
    withsig = embeddings.join(sigs, "vec_id")
    psig = lsh_signature(
        probe.withColumnRenamed("q", "embedding"), n_planes, seed, dim, id_col=None
    )
    base = F.col("lsh_sig")
    if hamming_radius == 1:
        expanded = F.array(base, *[
            base.bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)
        ])
    else:
        expanded = F.array(base)
    probe2 = probe.crossJoin(
        F.broadcast(psig.select(F.explode(expanded).alias("__psig")))
    )
    # buckets in the expansion are distinct, so each candidate row matches
    # at most one probe bucket — no dedup needed
    cand = withsig.crossJoin(F.broadcast(probe2)).filter(F.col("lsh_sig") == F.col("__psig"))
    scored = cand.select("vec_id", cosine(F.col("embedding"), F.col("q")).alias("cos"))
    return _rank_topk(scored, k, "vec_id")


def ann_topk_lsh_batch(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    dim: int = 64,
    probe_id: str = "probe_id",
) -> DataFrame:
    """Batch-probe ANN — the production shape: EVERY probe searches its own
    LSH bucket in one pass.  Candidate generation is an equi-join on the
    signature (hash-partitioned by bucket); ranking is ``row_number() OVER
    (PARTITION BY probe_id ...)`` — partitioned by probe, so the rank
    shuffle scales with the probe count and per-task work is one probe's
    candidate list, never a global sort.  Returns (probe_id, vec_id, rank).

    Contrast with ``ann_topk_lsh`` (single probe): there the k survivors
    come from TakeOrderedAndProject; here the per-probe partition IS the
    correct parallel decomposition."""
    sigs = lsh_signature(embeddings, n_planes, seed, dim)
    withsig = embeddings.join(sigs, "vec_id")
    psigs = lsh_signature(
        probes.select(probe_id, F.col("q").alias("embedding")),
        n_planes, seed, dim, id_col=probe_id,
    )
    pside = probes.join(psigs, probe_id)
    cand = withsig.join(pside, "lsh_sig")
    scored = cand.select(
        probe_id, "vec_id", cosine(F.col("embedding"), F.col("q")).alias("cos")
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "vec_id", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str | None = "vec_id",  # kept for call-site symmetry; unused
) -> DataFrame:
    """IVF coarse quantizer: append ``ivf_cluster`` = nearest centroid by
    inner product (argmax dot; ties -> lowest index; 1-based to match the
    SQL oracle's list_position).  Centroids ride to executors as literals
    inside one vectorized pandas_udf (numpy matmul per Arrow batch) — at
    scale this is the cell assignment that turns ANN into an equi-join on
    (cluster), pruning the scan to ~1/n_cells of the table."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        d = m @ cents.T
        return pd.Series((d.argmax(axis=1) + 1).astype(np.int32))

    return df.withColumn("ivf_cluster", assign(F.col(vec_col)))


def ivf_assign_topp(
    df: DataFrame,
    centroids,
    nprobe: int,
    vec_col: str = "q",
    out_col: str = "ivf_cells",
) -> DataFrame:
    """Multi-probe IVF quantizer for the QUERY side: append ``out_col`` =
    the 1-based indices of the ``nprobe`` nearest centroids by inner
    product, ordered dot desc with ties to the lowest index (stable
    argsort) — the P cells the probe will search.  Data vectors stay
    single-cell (``ivf_assign``): multi-probe widens the QUERY's candidate
    set, never duplicates storage."""
    cents = np.asarray(centroids, dtype=np.float64)
    p = int(min(nprobe, len(cents)))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(v: pd.Series) -> pd.Series:
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        d = m @ cents.T
        order = np.argsort(-d, axis=1, kind="stable")  # ties -> lower index
        return pd.Series([(row[:p] + 1).astype(np.int32).tolist() for row in order])

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ann_topk_ivf(
    embeddings: DataFrame,
    probe: DataFrame,
    centroids,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with multi-probe: data vectors live in their single nearest
    cell; the probe searches its ``nprobe`` nearest cells (union of cells,
    exact cosine re-rank inside).  nprobe=1 is the classic single-cell
    IVF; production ANN at 10^12 vectors runs nprobe>1 to hit recall
    targets — a vector whose nearest centroid differs from its probe's is
    the dominant single-cell miss mode, recovered by widening the probe.

    Scale shape: candidates = scan pruned to ~nprobe/n_cells of the table
    (cell filter pushes to the scan when cells are a partition/cluster
    key); ranking is TakeOrderedAndProject.  Deterministic (stable
    centroid order, ties to lowest index) => exactly oracle-able."""
    assigned = ivf_assign(embeddings, centroids, vec_col=vec_col)
    pcells = ivf_assign_topp(probe, centroids, nprobe, vec_col="q")
    cand = assigned.crossJoin(F.broadcast(pcells)).filter(
        F.array_contains(F.col("ivf_cells"), F.col("ivf_cluster"))
    )
    scored = cand.select(
        id_col, cosine(F.col(vec_col), F.col("q")).alias("cos")
    )
    return _rank_topk(scored, k, id_col)


def quantize_int8(df: DataFrame, vec_col: str = "embedding", out_col: str = "q8") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(x_i·127/m +
    0.5)`` with ``m = max|x_i|`` — the 4×-smaller storage/bandwidth form
    production ANN serves from (scale cancels in cosine, so ranking needs
    no dequantization).  ``floor(x+0.5)`` instead of round(): floor is
    IEEE-exact and identical across engines, where HALF_UP/HALF_EVEN
    round() conventions differ.  Zero vectors quantize to zeros (the
    1e-30 guard), not NaN.  Map-only column math."""
    absmax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    m = F.greatest(absmax, F.lit(1e-30))
    q8 = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 127.0 / m + 0.5).cast("int"),
    )
    return df.withColumn(out_col, q8)


def quantized_cosine_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``cosine_topk`` over int8-quantized vectors: scores are computed on
    the quantized representation (per-vector scales cancel), so this IS
    the accuracy/throughput trade production makes — and because the
    quantized components are small integers, the cosine is bit-exact
    reproducible across engines (integer products sum exactly in
    doubles), giving the quantization path a value-level oracle, not
    just a rank-level one.  Same TakeOrderedAndProject shape as
    cosine_topk (no global window)."""
    qe = quantize_int8(embeddings, vec_col, "q8")
    qp = quantize_int8(probe.select(F.col("q").alias("embedding")), "embedding", "pq8")
    joined = qe.crossJoin(F.broadcast(qp.select("pq8")))
    qa, qb = F.col("q8"), F.col("pq8")
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = joined.select(
        F.col(id_col), (dot / (nrm(qa) * nrm(qb))).alias("cos")
    )
    top = scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", F.round("cos", 6).alias("qcos")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.3,
    k: int | None = None,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_cluster_rows: int = 100,
    k_min: int = 4,
    max_cluster_rows: int | None = 100_000,
    n_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    near-duplicate removal — k-means the embeddings, compare pairs ONLY
    within each cluster (cosine >= threshold), union matched pairs into
    components (dedup.graph_components) and keep each component's minimum
    id as canonical.  Returns (id, canonical id, survives) for every row.

    Scale shape: the all-pairs search is confined to clusters, so the
    quadratic term is (n/k)^2 per cluster.  That only holds if k GROWS
    with the corpus (the paper runs ~110k clusters at web scale), so the
    rule is ENFORCED, not documented: when ``k`` is None (default),
    ``k = max(k_min, ceil(n / target_cluster_rows))`` — expected cluster
    size stays ~target_cluster_rows and the pair term stays
    ~n * target_cluster_rows / 2, linear in n.  Pass ``n_rows`` (e.g.
    manifest counts) to skip the count job, or an explicit ``k`` to
    pin it (tests / oracle parity).

    k-means can still leave a pathological cluster far above the mean, so
    ``max_cluster_rows`` is a hard safety valve: oversized clusters are
    deterministically sub-sharded (xxhash64(id) mod ceil(size/cap)) and
    pairs are generated within (cluster, shard) — bounding any single
    task's quadratic term at cap^2 regardless of how badly Lloyd
    converged.  Cross-shard pairs are DROPPED, so recall inside an
    oversized cluster degrades gracefully instead of the job dying; the
    exact dropped-pair count is computed and logged (never silent).  The
    cap never triggers when clustering is balanced (target 100 rows vs
    cap 100k = a 1000x blowout before it engages).

    Training is Lloyd over exact scaled ints (clustering.kmeans_fit —
    integer-exact, oracle-parity), assignment is map-only plan literals,
    and the pair join is an equi-join on the cluster id
    (hash-partitioned, no broadcast of the corpus)."""
    from esa_pfa_spark.operators.clustering import (
        _scaled,
        assign_clusters,
        kmeans_fit,
    )
    from esa_pfa_spark.operators.dedup import dedup_survivors

    if k is None:
        n = n_rows if n_rows is not None else emb.count()
        k = max(k_min, math.ceil(n / target_cluster_rows))

    cents = kmeans_fit(emb, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col)
    scaled = emb.select(id_col, vec_col, _scaled(emb, vec_col).alias("__xs"))
    assigned = assign_clusters(scaled, cents).drop("__xs")

    pair_keys = ["cluster"]
    if max_cluster_rows is not None:
        # k-row collect (bounded by the k rule, ~n/target): only clusters
        # above the cap pay anything; the common case adds no plan nodes.
        sizes = {
            r["cluster"]: r["n"]
            for r in assigned.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        over = {c: s for c, s in sizes.items() if s > max_cluster_rows}
        if over:
            shard_of = F.create_map(
                *[
                    x
                    for c, s in over.items()
                    for x in (F.lit(c), F.lit(int(math.ceil(s / max_cluster_rows))))
                ]
            )
            n_shards = F.coalesce(
                shard_of[F.col("cluster")], F.lit(1)
            ).cast("long")
            assigned = assigned.withColumn(
                "__shard", F.pmod(F.xxhash64(F.col(id_col)), n_shards)
            )
            pair_keys = ["cluster", "__shard"]
            # exact dropped-pair accounting: C(size,2) - sum_shard C(s,2)
            shard_sizes = (
                assigned.filter(F.col("cluster").isin(list(over)))
                .groupBy("cluster", "__shard")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            kept = sum(r["n"] * (r["n"] - 1) // 2 for r in shard_sizes)
            total = sum(s * (s - 1) // 2 for s in over.values())
            logger.warning(
                "semantic_dedup: %d cluster(s) exceed max_cluster_rows=%d "
                "(sizes %s); sub-sharded — dropping %d of %d within-cluster "
                "candidate pairs (%.2f%%)",
                len(over), max_cluster_rows,
                sorted(over.values(), reverse=True)[:5],
                total - kept, total,
                100.0 * (total - kept) / total if total else 0.0,
            )

    a = assigned.select(
        F.col(id_col).alias(f"{id_col}_a"), *pair_keys, F.col(vec_col).alias("__va")
    )
    b = assigned.select(
        F.col(id_col).alias(f"{id_col}_b"), *pair_keys, F.col(vec_col).alias("__vb")
    )
    pairs = (
        a.join(b, pair_keys)
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .select(
            f"{id_col}_a",
            f"{id_col}_b",
            cosine(F.col("__va"), F.col("__vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return dedup_survivors(emb.select(id_col), pairs, id_col=id_col)


def hard_negatives_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Hard-negative mining for metric learning / contrastive training:
    for each probe vector, the ``k`` most cosine-similar corpus vectors
    whose ``label_col`` DIFFERS from the probe's — the near-miss examples
    that carry the training signal (random negatives are trivially easy;
    the hardest non-matching neighbors define the decision boundary).
    Probes: ``(probe_id, q array, probe_label)``.  Returns
    ``(probe_id, rank, neg id)`` with rank 1..k per probe.

    Shape: the probe batch is broadcast (bounded, like
    ``ann_topk_lsh_batch``'s probe side); scoring is map-only JVM fold;
    per-probe ranking partitions by ``probe_id`` — the shuffle carries the
    scored stream partitioned across probes, never through one task.  At
    corpus scale, prune candidates first with the IVF/LSH machinery
    (``ivf_assign`` / LSH buckets as ``block_col``) exactly as the ANN
    queries do — this exact form is the correctness baseline the pruned
    form is measured against."""
    p = probes.select(
        F.col(probe_id), F.col("q"), F.col("probe_label"),
    )
    j = embeddings.select(
        F.col(id_col), F.col(vec_col), F.col(label_col)
    ).crossJoin(F.broadcast(p)).filter(F.col(label_col) != F.col("probe_label"))
    scored = j.select(
        probe_id,
        F.col(id_col),
        cosine(F.col(vec_col), F.col("q")).alias("cos"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", id_col)
    )


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encoding (Jégou et al. TPAMI'11, the FAISS
    storage path): split each D-dim vector into m contiguous subvectors
    and store, per subspace, the index of the nearest of ks codewords —
    m small ints instead of D floats (64 floats -> 8 bytes here, a 32x
    compression of the candidate set that IVF/LSH variants can then scan
    cheaply).

    ``codebooks`` is an (m, ks, D/m) int64 array on the same 10^6 SCALE
    grid as operators/clustering.py; vectors are scaled with the
    identical floor(x*1e6 + 0.5) rule, so every distance is EXACT int64
    arithmetic — bit-identical across Spark, numpy, and the DuckDB
    oracle, argmin ties resolved to the lowest codeword index on all
    three.

    Scale shape: one zero-copy Arrow pass (mapInArrow, vectorized numpy
    per batch), no shuffle; the codebook rides task state (m*ks*D/m
    int64s — KBs).
    """
    import numpy as np

    from esa_pfa_spark.operators.clustering import _scaled

    C = np.asarray(codebooks, dtype=np.int64)
    m, ks, subdim = C.shape
    dim = m * subdim

    scaled = df.select(
        F.col(id_col), _scaled(df, vec_col).alias("__xs")
    )
    out_schema = T.StructType([
        scaled.schema[id_col],
        T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
    ])

    def enc(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                yield pa.RecordBatch.from_arrays(
                    [b.column(0), pa.array([], type=pa.list_(pa.int32()))],
                    names=[id_col, "codes"],
                )
                continue
            col = b.column(1)
            if col.null_count:
                raise ValueError("pq_encode: NULL vector row")
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            if flat.size != b.num_rows * dim:
                raise ValueError(f"pq_encode: ragged vector (expected dim={dim})")
            X = flat.reshape(-1, m, subdim)
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for j in range(m):
                d2 = ((X[:, j, :, None] - C[j].T[None, :, :]) ** 2).sum(axis=1)
                codes[:, j] = d2.argmin(axis=1)      # first-min tie rule
            yield pa.RecordBatch.from_arrays(
                [b.column(0),
                 pa.array(list(codes), type=pa.list_(pa.int32()))],
                names=[id_col, "codes"],
            )

    return scaled.mapInArrow(enc, schema=out_schema)


def pq_adc_topk(
    embeddings: DataFrame,
    probe: DataFrame,
    codebooks,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_col: str = "q",
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): the probe stays EXACT — it
    precomputes its int64 squared distance to every codeword (an m x ks
    table, KBs) — and each stored vector's approximate distance is m
    table lookups at its codes, never a touch of the original floats.
    The classic memory-bound ANN scan: at 100 TB the candidate side
    reads 8 bytes/vector instead of 256.

    Plan shape: codes come from ONE Arrow encode pass (pq_encode); the
    probe's lookup table comes from a second TINY Arrow pass on the
    probe side (FAISS precomputes tables query-side the same way — a
    JVM expression form needed m*ks generated aggregate expressions,
    whose per-invocation Catalyst analysis alone cost ~6s); ADC is a
    built-in F.aggregate over the code array (whole-stage codegen, no
    per-candidate Python); top-k is orderBy(...).limit(k) =
    TakeOrderedAndProject.  All arithmetic is exact int64 on the SCALE
    grid => deterministic ranks, exact oracle.
    """
    import numpy as np

    from esa_pfa_spark.operators.clustering import _scaled

    C = np.asarray(codebooks, dtype=np.int64)
    m, ks, subdim = C.shape

    coded = pq_encode(embeddings, C, vec_col=vec_col, id_col=id_col)

    qscaled = probe.select(_scaled(probe, probe_col).alias("__qs"))

    def ptbl(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], type=pa.list_(pa.int64()))], names=["__tbl"]
                )
                continue
            flat = b.column(0).flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            Q = flat.reshape(-1, m, subdim)
            # t[n, j, c] = ||Q[n, j] - C[j, c]||^2, exact int64
            t = ((Q[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)
            yield pa.RecordBatch.from_arrays(
                [pa.array([row.ravel() for row in t], type=pa.list_(pa.int64()))],
                names=["__tbl"],
            )

    ptab = qscaled.mapInArrow(
        ptbl,
        schema=T.StructType(
            [T.StructField("__tbl", T.ArrayType(T.LongType(), False), False)]
        ),
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.get(F.col("__tbl"), j * ks + F.get(F.col("codes"), j)),
    )
    scored = coded.crossJoin(F.broadcast(ptab)).select(
        id_col, adc.alias("adc_d2")
    )
    top = scored.orderBy(F.col("adc_d2").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("adc_d2").asc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "adc_d2"
    )


def _pq_train_codebooks_subspace(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Reference PQ trainer: one independent clustering.kmeans_fit per
    SLICED subspace (Jégou et al. TPAMI'11 §III trains each
    sub-quantizer separately).  Semantically the ground truth, but the
    job shape is m separate 2-iteration k-means runs = ~m * (n_iter + 1)
    Spark jobs over the same table — kept ONLY as the parity oracle for
    the fused trainer below (tests/test_similarity.py pins bit-equality).
    """
    import numpy as np

    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("__sv"),
        )
        from esa_pfa_spark.operators.clustering import kmeans_fit

        books.append(kmeans_fit(sliced, k=ks, n_iter=n_iter, vec_col="__sv"))
    return np.asarray(books, dtype=np.int64)


def pq_train_codebooks(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train PQ codebooks — FUSED: all m sub-quantizers advance together,
    ONE corpus pass per Lloyd iteration instead of m independent k-means
    runs (_pq_train_codebooks_subspace, the parity oracle, is ~m*(n_iter+1)
    jobs over the same cached table; this is n_iter+1).  Per iteration a
    single mapInArrow kernel assigns every row in every subspace (exact
    int64 |x|^2 - 2<x,c> + |c|^2, argmin ties -> lowest codeword — the
    same contract as clustering.assign_clusters' Arrow path) and emits
    per-partition PARTIAL sums, so the shuffle is m*ks*(D/m) rows per
    partition regardless of corpus size; the driver folds floor(s/n+0.5)
    exactly as clustering.kmeans_fit does.

    Bit-identical to the per-subspace composition (pinned in
    tests/test_similarity.py::test_pq_fused_trainer_parity): seeds are
    the lowest-`ks` ids' vector slices (every subspace sees the same id
    order), integer sums are associative, and the centroid update is the
    same single IEEE double division of exact ints.  Returns an
    (m, ks, D/m) int64 array on the SCALE grid for pq_encode /
    pq_adc_topk.  At 100 TB: train on a deterministic sample, exactly as
    bpe_train_sampled does for merges.
    """
    import math

    import numpy as np

    from esa_pfa_spark.operators.clustering import _scaled

    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    scaled = df.select(
        F.col(id_col).alias("__id"), _scaled(df, vec_col).alias("__xs")
    ).persist()
    try:
        init = scaled.orderBy("__id").limit(ks).collect()
        if len(init) < ks:
            raise ValueError(f"ks={ks} but only {len(init)} rows")
        books = np.asarray(
            [
                [list(r["__xs"])[j * sub : (j + 1) * sub] for r in init]
                for j in range(m)
            ],
            dtype=np.int64,
        )
        # flat (j, cluster, dim) key columns for the partial-sum emit,
        # C-order matched to s_acc.ravel()
        jj, cc, dd = np.meshgrid(
            np.arange(m, dtype=np.int32),
            np.arange(1, ks + 1, dtype=np.int32),
            np.arange(sub, dtype=np.int32),
            indexing="ij",
        )
        jj, cc, dd = jj.ravel(), cc.ravel(), dd.ravel()

        def make_kernel(B):
            def partials(batches):
                import pyarrow as pa

                s_acc = np.zeros((m, ks, sub), dtype=np.int64)
                n_acc = np.zeros((m, ks), dtype=np.int64)
                seen = False
                for b in batches:
                    if b.num_rows == 0:
                        continue
                    col = b.column(1)
                    if col.null_count:
                        raise ValueError("pq_train_codebooks: NULL vector row")
                    flat = col.flatten().to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64)
                    if flat.size != b.num_rows * dim:
                        raise ValueError(
                            f"pq_train_codebooks: ragged vector (dim={dim})"
                        )
                    X = flat.reshape(-1, m, sub)
                    seen = True
                    for j in range(m):
                        Xj = X[:, j, :]
                        Cj = B[j]
                        # exact int64 (terms < 2^53; clustering.py headroom)
                        d2 = (
                            (Xj * Xj).sum(axis=1)[:, None]
                            - 2 * (Xj @ Cj.T)
                            + (Cj * Cj).sum(axis=1)[None, :]
                        )
                        cl = d2.argmin(axis=1)  # first-min = lowest index
                        np.add.at(s_acc[j], cl, Xj)
                        n_acc[j] += np.bincount(cl, minlength=ks)
                if seen:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(jj),
                            pa.array(cc),
                            pa.array(dd),
                            pa.array(s_acc.ravel()),
                            pa.array(np.repeat(n_acc.ravel(), sub)),
                        ],
                        names=["j", "cluster", "dim", "s", "n"],
                    )

            return partials

        for _ in range(n_iter):
            agg = (
                scaled.mapInArrow(
                    make_kernel(books),
                    schema="j int, cluster int, dim int, s long, n long",
                )
                .groupBy("j", "cluster", "dim")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
            nxt = books.copy()
            for r in agg:
                if r.n:  # empty clusters keep their previous centroid
                    nxt[r.j, r.cluster - 1, r.dim] = int(
                        math.floor(r.s / r.n + 0.5)
                    )
            books = nxt
        return books
    finally:
        scaled.unpersist()


def embedding_drift(
    df: DataFrame,
    group_col: str = "label",
    period_col: str = "period",
    base: str = "base",
    current: str = "cur",
    emb_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space drift monitor: per group, the cosine between the
    BASE-period centroid and the CURRENT-period centroid, reported as
    ``drift = 1 - cos`` — the semantic companion to the numeric gates
    (psi_drift / ks_drift): a source whose meaning shifts moves its
    centroid even when every scalar stat holds still.

    Exactness across engines: element values snap to the 6dp decimal grid
    and accumulate as EXACT decimal sums (order-independent, unlike a
    float mean); per-dim centroids round at 6dp and re-enter decimal, so
    the dot products and squared norms are again exact decimal sums over
    dims — one double expression (num / (sqrt(na) * sqrt(nb))) at the
    very end.  No fold order anywhere.

    Plan shape (100 TB): posexplode is map-side; the only row-scale
    shuffle is the (group, period, dim) partial agg — downstream tables
    are |groups| * dims * 2 rows, then |groups|.  Groups with either
    period empty or a zero-norm centroid are dropped (cosine undefined).
    """
    per = F.col(period_col)
    v6 = F.col("v").cast("double").cast("decimal(18,6)")
    cells = (
        df.filter(per.isin([base, current]))
        .select(group_col, per.alias("__p"), F.posexplode(emb_col).alias("dim", "v"))
        .groupBy(group_col, "__p", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(v6).alias("s"))
        .select(
            group_col,
            "__p",
            "dim",
            F.round(F.col("s").cast("double") / F.col("n").cast("double"), round_to)
            .cast("decimal(18,6)")
            .alias("m"),
        )
    )
    both = cells.groupBy(group_col, "dim").agg(
        F.max(F.when(F.col("__p") == base, F.col("m"))).alias("ma"),
        F.max(F.when(F.col("__p") == current, F.col("m"))).alias("mb"),
    )
    a = (
        both.filter(F.col("ma").isNotNull() & F.col("mb").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dims"),
            F.sum(F.col("ma") * F.col("mb")).alias("num"),
            F.sum(F.col("ma") * F.col("ma")).alias("na"),
            F.sum(F.col("mb") * F.col("mb")).alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
    )
    cos = F.col("num").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return a.select(
        F.col(group_col),
        "n_dims",
        F.round(cos, round_to).alias("centroid_cos"),
        F.round(F.lit(1.0) - cos, round_to).alias("drift"),
    ).orderBy(group_col)
