"""Link-graph centrality for corpus quality weighting.

Web-scale curation weights documents by the link structure of their
hosts (Common Crawl pipelines rank domains by harmonic/PageRank
centrality before sampling) — the graph-side complement of the content
gates in textstats.py.  The reference's closest analog is the
patch-adjacency connectivity family (ConnectivityMetrics.java), which
``dedup.graph_components`` already re-expresses; PageRank adds the
weighted-centrality form over an explicit edge list.

Distributed shape (the Pregel decomposition): per iteration ONE
edges⋈ranks equi-join partitioned by src, ONE groupBy(dst) partial-agg
shuffle, ONE tiny dangling-mass aggregate (scalar to the driver, like
logreg/kmeans round state), and a vertices-left-join to rebuild the
rank vector.  Lineage is cut per iteration (localCheckpoint) so the
plan stays O(1) deep regardless of iteration count.  At 100 TB the
edge list is the big table; it is joined on its natural src key and
never re-shuffled after the one persist.

Cross-engine exactness (the oracle contract): per-edge contributions
``r/outdeg`` are 9dp-rounded then decimal-summed per dst
(partition-order-free); the dangling mass is the decimal sum of
9dp-rounded ranks; the rank update
``(1-d)/n + d * (in_sum + dangling/n)`` runs a fixed IEEE op chain —
so a chained-CTE SQL oracle reproduces every iteration bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_to: int = 9,
) -> DataFrame:
    """PageRank over an edge list; returns (v, r) with the raw double
    rank (callers round for display).  Duplicate edges contribute
    multiplicity (standard multigraph semantics); dangling vertices
    (no out-edges) redistribute their mass uniformly each iteration.
    """
    ev = F.col(src).alias("v")
    verts = (
        edges.select(ev)
        .unionByName(edges.select(F.col(dst).alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        raise ValueError("empty edge list")
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__od"))
    e = (
        edges.join(outdeg, src)
        .select(F.col(src).alias("__es"), F.col(dst).alias("__ed"), "__od")
        .persist()
    )
    dangling = verts.join(
        outdeg.select(F.col(src).alias("v")), "v", "left_anti"
    ).persist()
    base = (1.0 - damping) / n
    ranks = verts.select("v", F.lit(1.0 / n).alias("r"))
    dec = f"decimal(18,{round_to})"
    try:
        for _ in range(iters):
            contrib = e.join(ranks, e["__es"] == ranks["v"]).select(
                "__ed",
                F.round(F.col("r") / F.col("__od"), round_to).cast(dec).alias("__c"),
            )
            sums = contrib.groupBy("__ed").agg(F.sum("__c").alias("__s"))
            drow = (
                dangling.join(ranks, "v")
                .agg(F.sum(F.round(F.col("r"), round_to).cast(dec)))
                .first()[0]
            )
            dshare = (float(drow) if drow is not None else 0.0) / n
            ranks = (
                verts.join(sums, verts["v"] == sums["__ed"], "left")
                .select(
                    "v",
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__s").cast("double"), F.lit(0.0))
                            + F.lit(dshare)
                        )
                    ).alias("r"),
                )
                .localCheckpoint()
            )
        return ranks
    finally:
        verts.unpersist()
        e.unpersist()
        dangling.unpersist()


def demo_link_graph(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic out-link graph over a document table —
    the demo stand-in for the host link graph a production pipeline
    takes as an input (reference analog: the fixed patch-adjacency
    neighborhoods of ConnectivityMetrics.java, likewise derived from
    the data rather than supplied).

    Three link maps per doc (a quadratic map and a mod-97 hub map skew
    in-degree; an affine map keeps connectivity), self-loops dropped.
    The vertex-count modulus is computed IN-PLAN: a 1-row count
    aggregate broadcast-cross-joined onto the scan, so building the
    graph triggers no driver action — plan builders stay lazy
    end-to-end and the count is evaluated once, inside the same job
    that consumes the edges.
    """
    nn = docs.agg(F.count(F.lit(1)).alias("__n"))
    base = docs.select(id_col).crossJoin(F.broadcast(nn))
    d, n = F.col(id_col), F.col("__n")
    e = None
    for dst in [(d * d + 1) % n, (d * 13 + 5) % n, d % 97]:
        t = base.select(d.alias("src"), dst.alias("dst"))
        e = t if e is None else e.unionByName(t)
    return e.filter(F.col("src") != F.col("dst"))
