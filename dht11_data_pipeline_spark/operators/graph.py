"""Iterative graph operators — connected components for dedup
clustering.

Near-duplicate pairs are edges; the duplicate *groups* a curation
pipeline actually needs are the transitive closure (A~B, B~C puts A
and C in one group even if they never matched directly). Component id
= the minimum doc id reachable, so the canonical representative of a
cluster is its smallest id — deterministic in any engine.

Algorithm: min-label propagation to fixpoint. Each round is
join(labels, edges) + groupBy-min — two shuffles on the node id —
and rounds = graph diameter. Near-dup graphs are shallow (clusters
are cliques-ish, diameter 2-4), so propagation converges in a few
rounds; for adversarial long-chain graphs swap in the large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce"), which is O(log² n) rounds of the same two shuffles —
same plan shape, different edge rewriting. ``localCheckpoint``
truncates the lineage each round so the plan doesn't grow with the
iteration count (the classic iterative-algorithm trap on Spark).

This is deliberately a driver-side loop over declarative steps — the
reference has no iterative computation at all (SURVEY §4.3); this is
the one extension operator whose control flow can't be a single plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_components(edge_rows: list[tuple],
                           spark) -> DataFrame:
    """Driver-side union-find over a collected edge list; returns the
    same (node, cluster_id=min member) frame as the distributed path.
    O(E α(E)) — microseconds per edge — versus one Spark job round per
    graph-diameter step."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    rows = [(n, comp_min[find(n)]) for n in parent]
    return spark.createDataFrame(rows, "node bigint, cluster_id bigint")


# near-dup edge lists are the REDUCED output of a dedup pass — usually
# tiny next to the corpus. Below this count (≈32 MB of driver memory)
# union-find on the driver beats diameter-many Spark job rounds; above
# it the distributed propagation loop takes over.
SMALL_EDGE_LIMIT = 2_000_000


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iterations: int = 25,
                         small_edge_limit: int = SMALL_EDGE_LIMIT) -> DataFrame:
    """Resolve undirected edges (a, b) to (node, cluster_id) where
    cluster_id = min node id in the component. Only nodes that appear
    in at least one edge are returned (callers union in singletons).

    Hybrid execution: if the DISTINCT edge count is under
    ``small_edge_limit`` the closure runs as driver-side union-find
    (one collect of the reduced edge list — the same O(small) driver
    contract as kmeans centroids / PQ codebooks); otherwise iterative
    min-label propagation runs fully distributed."""
    # pairs feeds both union branches — persist or the (possibly
    # expensive: LSH bucket joins) pair computation runs twice
    pairs = pairs.select(a_col, b_col).persist()
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.union(rev).distinct().persist()

    n_edges = edges.count()
    if n_edges <= small_edge_limit:
        rows = [(r["src"], r["dst"]) for r in edges.collect()]
        edges.unpersist()
        pairs.unpersist()
        return _union_find_components(rows, pairs.sparkSession)
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())
    for _ in range(max_iterations):
        candidates = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
        )
        # lazy checkpoint: the convergence count below is the action
        # that materializes it — one job per round, not two
        new_labels = (
            labels.union(candidates)
            .groupBy("node").agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds")
    edges.unpersist()
    pairs.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def cluster_documents(docs: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """Assign every document a cluster id: transitive near-dup closure
    for matched docs, own id for singletons; flag the canonical
    (minimum-id) member per cluster."""
    comp = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(comp, docs[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "is_canonical",
            F.when(F.col(id_col) == F.col("cluster_id"), "Y").otherwise("N"))
    )
