"""Graph operators: connected components over an edge list.

Extension surface (no reference counterpart — the reference's only graph
construct is the parent/child tree walk, SQLiteDirectImporter.java:902-912,
handled by operators/hierarchy.py). Connected components is the missing
LAST step of every near-duplicate pipeline: pair detection (dedup.py /
similarity.py) yields edges; clustering those edges yields one canonical
document per duplicate group, which is what actually gets dropped from a
training corpus.

Algorithm: iterative min-label propagation — every node repeatedly adopts
the smallest label in its closed neighborhood until fixpoint. Each round
is one equi join (labels ⋈ edges) plus one min-aggregate, i.e. two
shuffles keyed on node id; `localCheckpoint` per round truncates lineage.
Rounds needed = graph diameter. Near-dup graphs are dense star-like
clusters (a duplicated document matches most of its copies directly), so
the diameter is small — typically 2-4 — independent of corpus size; this
is why plain propagation is the right scale choice here over the
O(log² n)-round large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which pays ~2×
per-round cost to win only on high-diameter graphs (paths/meshes) that
near-dup workloads never produce. A `max_iterations` guard bounds the
worst case; hitting it raises rather than returning a half-converged
clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int = 50,
    checkpoint: bool = True,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Cluster an undirected edge list; returns (id, component) where
    ``component`` is the smallest node id in the node's component —
    deterministic canonical representative, no randomness.

    Only nodes that appear in at least one edge are returned (isolated
    documents are trivially their own component; callers left-join this
    result and coalesce to the doc's own id).

    Size-adaptive execution: the edge list must be materialized anyway
    (it is re-joined every round), and its count is then free — when it
    is at most ``driver_threshold`` edges the component labels come from
    a driver-side union-find instead of iterative label propagation.
    Near-dup graphs hold only the documents that HAVE a duplicate, so at
    every tested scale they are thousands of edges while each distributed
    propagation round costs ~1-2 s of pure job/shuffle overhead
    (measured: 920 edges took ~9 s of rounds, <1 ms of union-find). The
    distributed path is the 100 TB fallback, taken automatically the
    moment the dup graph outgrows the gate; the result is IDENTICAL
    (min-id representative is union-order-independent)."""
    directed = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if checkpoint:
        # materialize the DIRECTED list BEFORE symmetrizing: the union
        # with its own swap would otherwise evaluate the (expensive
        # upstream pair-detection) lineage twice in one pass, and the
        # per-round re-joins re-run it every round
        directed = directed.localCheckpoint(eager=True)
    sym = directed.union(directed.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if checkpoint and directed.count() <= driver_threshold // 2:
        return _driver_union_find(directed)

    # label(u) starts as min(u, min direct neighbor) — one propagation
    # round folded into initialization
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("u"), F.col("_mv")).alias("comp"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # candidate labels: own label ∪ each neighbor's label. The own-label
        # row is tagged so the SAME aggregation that picks the new label also
        # recovers the old one — convergence is then a cheap scan-count over
        # the materialized result instead of a per-round shuffle join.
        nbr = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "comp", F.lit(None).cast(labels.schema["comp"].dataType).alias("own"))
        )
        new_labels = (
            nbr.unionByName(labels.select("u", "comp", F.col("comp").alias("own")))
            .groupBy("u")
            .agg(F.min("comp").alias("comp"), F.min("own").alias("_old"))
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        converged = new_labels.filter(F.col("comp") != F.col("_old")).isEmpty()
        labels = new_labels.select("u", "comp")
        if converged:
            return labels.select(F.col("u").alias("id"), F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Union-find with path compression over a SMALL (size-gated,
    already-materialized) edge list; returns the same (id, component)
    contract as the distributed propagation. collect(), not
    toLocalIterator: the gate bounds the size, and toLocalIterator runs
    one sequential job per partition (measured ~4 s for 32 near-empty
    partitions vs one ~0.1 s collect job)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in sym.collect():
        u, v = row[0], row[1]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        m = comp_min.get(r)
        if m is None or node < m:
            comp_min[r] = node
    rows = [(node, comp_min[find(node)]) for node in parent]
    schema = sym.schema["u"].dataType
    return sym.sparkSession.createDataFrame(
        rows, f"id {schema.simpleString()}, component {schema.simpleString()}"
    )


def cluster_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Join a near-dup pair list back onto the corpus: every row of ``df``
    gains (cluster_id, keep) — cluster_id is the component representative
    (the row's own id when it has no duplicates), keep=1 exactly for the
    representative. Dropping keep=0 rows deduplicates the corpus while
    retaining one member per duplicate group.

    The component table holds only docs with at least one near-dup —
    small relative to the corpus but it SCALES with duplicate mass, so
    the join carries no broadcast hint (AQE broadcasts it while small).
    """
    comp = connected_components(pairs, src, dst).withColumnRenamed("id", id_col)
    return (
        df.join(comp, id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("keep", (F.col(id_col) == F.col("cluster_id")).cast("long"))
        .drop("component")
    )
