"""Distributed connected components + duplicate-cluster resolution.

The dedup operators (operators/dedup.py) emit near-duplicate PAIRS; a
real training-data pipeline must turn those pairs into CLUSTERS and keep
one canonical document per cluster — pairs alone under-delete (A~B, B~C
but A!~C still means keep only one of {A,B,C}).

``connected_components`` is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014): each round is two shuffle stages keyed on node id,
and the edge set converges to per-component stars rooted at the minimum
node id in O(log^2 n) rounds (2-3 rounds in practice on dedup graphs,
whose components are small and dense). This is the 100 TB-safe choice —
label-propagation needs O(diameter) rounds and GraphFrames is not a
dependency here. No ``collect_set`` adjacency lists: per-node minima come
from ``groupBy().min()`` + an equi-join back to the edge list, so a
high-degree node never materializes its neighborhood in one task.

Each iteration ends in ``localCheckpoint(eager=True)`` to truncate
lineage (iterative DataFrame plans otherwise grow exponentially); on a
real cluster with reliable storage, ``spark.sparkContext.setCheckpointDir``
+ ``checkpoint()`` is the durable variant. Convergence is detected with a
(count, xor-of-hashes) fingerprint — one scalar action per round, no
edge-set subtract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge form: u < v, deduped, no self-loops."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _swap(e: DataFrame) -> DataFrame:
    return e.select(F.col("v").alias("u"), F.col("u").alias("v"))


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    """Order-insensitive edge-set fingerprint: one aggregate action."""
    # modulus keeps the sum inside BIGINT under ANSI mode (2^63/1e9 ~ 9e9
    # edges of headroom; collisions would only delay convergence one round)
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v") % F.lit(1_000_000_007)), F.lit(0)).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"])


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(id_a, id_b) pair list -> (node, cluster_id) with cluster_id = the
    minimum node id in the node's connected component.

    Nodes that appear in no pair are absent from the output (callers
    union singletons back; see ``dup_clusters``).
    """
    e = _canon(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    ).localCheckpoint(eager=True)
    prev = _fingerprint(e)
    for _ in range(max_iter):
        # large-star: every neighbor v > u connects to m = min(N(u) + {u})
        adj = e.unionByName(_swap(e))
        m_large = adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = _canon(
            adj.join(m_large, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: orient hi->lo; all lo-neighbors of hi (and hi itself)
        # connect to the smallest lo
        hi = large.select(F.col("v").alias("h"), F.col("u").alias("l"))  # v>u
        m_small = hi.groupBy("h").agg(F.min("l").alias("m"))
        small = _canon(
            hi.join(m_small, "h")
            .select(F.col("l").alias("u"), F.col("m").alias("v"))
            .unionByName(m_small.select(F.col("h").alias("u"), F.col("m").alias("v")))
        )
        e = small.localCheckpoint(eager=True)
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    # converged edges are stars rooted at component minima: a node's label
    # is its smallest neighbor (roots label themselves via least(u, ...))
    adj = e.unionByName(_swap(e))
    return adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("cluster_id")).select(
        F.col("u").alias("node"), "cluster_id"
    )


def dup_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Resolve near-dup pairs into clusters over the full corpus.

    Output per document: ``cluster_id`` (min doc_id of its component —
    singletons cluster with themselves), ``cluster_size``, and
    ``is_canonical`` (the keep verdict: exactly one per cluster). The
    final join back to docs is keyed on doc_id (the table's natural key);
    the cluster-size aggregation shuffles on cluster_id, whose cardinality
    ~= corpus size, so no skew beyond the largest duplicate cluster.
    """
    cc = connected_components(pairs)
    lab = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
        )
    )
    sizes = lab.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )
