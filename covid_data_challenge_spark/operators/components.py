"""Distributed connected components — the clustering stage of near-dedup.

Pair-finding (``dedup.jaccard_pairs`` / ``minhash_lsh_pairs`` /
``simhash_neardup_pairs`` / ``similarity`` cosine pairs) yields an EDGE
LIST; an actual dedup pipeline must then group transitively-connected
docs into clusters and pick one canonical survivor per cluster. The
reference has no notion of this (its dedup surface is row-identity
`drop_duplicates`); at 100 TB it is the step that makes near-dedup
usable.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame ops only — each half-round is one ``groupBy`` (min per
neighborhood) plus one shuffle join back to the edges. Converges in
O(log²  n) rounds to a star graph whose centers are the per-component
minimum ids; no ``collect_list`` (hub neighborhoods never have to fit in
one task's memory) and no driver-side graph state — the driver loop only
compares 16-byte checksums per round. Lineage is truncated per round via
``localCheckpoint`` (on a real cluster: ``checkpoint`` to reliable
storage), which is what keeps the iterative plan from blowing up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Drop self-loops + exact duplicate edges (keys are src/dst)."""
    return edges.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor to the
    minimum of Γ(u) ∪ {u}."""
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        und.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select("src", F.least(F.col("__mn"), F.col("src")).alias("__m"))
    )
    out = (
        und.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
    )
    return _canon(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large→small; for every node u connect each smaller
    neighbor AND u itself to the minimum of those neighbors."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = directed.groupBy("src").agg(F.min("dst").alias("__m"))
    out = (
        directed.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
        .union(mins.select("src", F.col("__m").alias("dst")))
    )
    return _canon(out)


def _checksum(edges: DataFrame) -> tuple:
    # bit_xor (not sum): order-independent and can't overflow under ANSI mode
    row = edges.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("src", "dst")).alias("h")
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label every node in the edge list with its component's minimum id.

    Returns ``(id, component)`` for every node that appears in ``pairs``
    (callers left-join and ``coalesce(component, own_id)`` to cover
    singletons). The edge ids may be any orderable type.
    """
    edges = _canon(
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
            F.col(src).isNotNull() & F.col(dst).isNotNull()
        )
    ).localCheckpoint()
    prev = _checksum(edges)
    if prev[0] == 0:
        return edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint()
        cur = _checksum(nxt)
        edges.unpersist()
        edges = nxt
        if cur == prev:  # fixpoint: edge set is a union of min-centered stars
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    roots = edges.select(F.col("dst").alias("id"), F.col("dst").alias("component")).distinct()
    return edges.select(F.col("src").alias("id"), F.col("dst").alias("component")).union(roots)


def cluster_assignments(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Assign every doc a ``cluster_id`` (= min doc id of its near-dup
    component; docs in no pair are their own cluster) and the cluster
    size. One broadcast-sized label join at test SF; at 100 TB the label
    table is |docs-in-pairs| rows — orders of magnitude below the corpus —
    so the join stays cheap and the corpus itself is scanned once."""
    labels = connected_components(pairs, src=a, dst=b)
    assigned = (
        docs.select(F.col(id_col))
        .join(labels, F.col(id_col) == F.col("id"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return assigned.join(sizes, "cluster_id").select(id_col, "cluster_id", "cluster_size")


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Near-dedup survivors: one doc per connected component — the minimum
    id, so survivor choice is deterministic under any partitioning."""
    clusters = cluster_assignments(docs, pairs, id_col, a, b)
    keep = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    return docs.join(keep, id_col, "left_semi")
