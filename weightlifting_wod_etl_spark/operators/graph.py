"""Connected components over a pair list — duplicate-cluster canonicalization.

Near-dup detection (MinHash LSH, SimHash, embedding cosine) emits PAIRS;
a training-data pipeline needs CLUSTERS: every document labeled with one
canonical id (keep-one-per-cluster dedup). That closure step is a
connected-components computation — inherently iterative, outside single-pass
SQL, and the reference has nothing like it (its dedup is per-record
idempotency, `services/idempotency_service.py:49-75`).

Algorithm: iterative min-label propagation. Every node starts labeled with
itself; each round every node takes the min of its own label and its
neighbors' labels; fixpoint = every node carries the min id of its component.
Rounds needed = graph diameter — near-dup clusters are small and dense
(diameter ≤ ~3), so this converges in 2-4 rounds. For adversarial
long-chain graphs at 100 TB, swap the body for the large-star/small-star
contraction (Kiveris et al., "Connected Components in MapReduce"), which is
O(log n) rounds of the same join+min primitive — the driver loop and
convergence test stay identical.

Scale notes:
  - each round is one shuffle (groupBy node) plus one co-partitioned join;
    both key on the node id, so AQE reuses the partitioning across rounds;
  - ``localCheckpoint`` truncates lineage every round — without it the plan
    doubles per iteration and Catalyst analysis time explodes by round ~8;
  - the convergence probe (``isEmpty`` on changed labels) is a cheap action
    short-circuited by AQE; no ``collect`` of data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum node id
    of its connected component.

    Returns ``(node, component)`` for every node appearing in the edge list
    (undirected; isolated nodes never appear in a pair list and are their
    own singleton clusters by definition — union them in afterwards if the
    full vertex set is needed).
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # NULL node ids break the closure SILENTLY (review r13, reproduced):
    # the null-unsafe neighbor join never propagates labels across a NULL
    # node — [(NULL,'a'), (NULL,'b')] converges with 'a' and 'b' in two
    # different clusters although they are one component through the NULL
    # node, and the null-unsafe != convergence probe masks the split.
    # Wrong answers must be loud: one cheap action on the checkpointed
    # frame before the loop.
    if not und.filter(F.col("u").isNull() | F.col("v").isNull()).isEmpty():
        raise ValueError(
            "connected_components: edge list contains NULL node ids — a "
            "NULL cannot join to itself, so components linked through it "
            "would silently split; filter or key NULL-id rows first"
        )
    labels = und.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )

    converged = False
    for _ in range(max_iter):
        neighbor = und.join(
            labels.select(F.col("node").alias("v"), "component"), "v"
        ).select(F.col("u").alias("node"), "component")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        labels = new_labels
        if changed.isEmpty():
            converged = True
            break
    if not converged:
        # Min-label propagation needs ~diameter rounds. Returning the
        # intermediate labels would silently split one true component into
        # several clusters (dedup then keeps extra duplicates) — wrong
        # answers must be loud, not quiet.
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds — the graph's diameter exceeds it; "
            "raise max_iter"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank by fixed-round power iteration.

    Returns ``(node, r)`` for every node in the edge list. Each round is
    the same two-shuffle primitive as :func:`connected_components`: join
    ranks onto edges by src (contribution = r·w/wout), re-aggregate by
    dst. Both shuffles key on the node id, so AQE reuses the exchange
    layout across rounds; ``localCheckpoint`` truncates the per-round
    lineage growth. No dangling-mass redistribution: callers on graphs
    with sink nodes should add the uniform-teleport term themselves —
    keeping the operator a pure expression of the iteration makes its
    semantics portable (the SQL oracle unrolls the identical formula).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:  # empty edge frame: no nodes, no ranks (not a 1/n crash)
        return nodes.withColumn("r", F.lit(0.0))
    out_w = e.groupBy("src").agg(F.sum("w").alias("wout"))
    # non-positive out-weight sums corrupt ranks SILENTLY (review r13):
    # under ANSI-off, w/0 is NULL, the NULL p nulls every contribution
    # through that source, and F.sum skips them — the node's entire
    # out-mass quietly vanishes (and a SQL oracle computing 0.0/0.0
    # propagates NaN instead, splitting engine parity). Weights are
    # transition counts in every current caller; anything else is a
    # caller bug worth a loud stop.
    if not out_w.filter(F.col("wout") <= 0).isEmpty():
        raise ValueError(
            "pagerank: a source node's out-edge weights sum to <= 0 — "
            "its contributions would silently vanish; use positive "
            "weights (e.g. counts)"
        )
    norm = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("wout")).alias("p")
    ).localCheckpoint(eager=False)

    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .select("dst", (F.col("r") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("in_r", F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
