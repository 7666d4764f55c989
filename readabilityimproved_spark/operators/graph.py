"""Near-duplicate CLUSTERS from near-duplicate PAIRS: connected
components + representative-based dedup.

Every near-dup family in operators/dedup.py / operators/similarity.py
emits verified PAIRS; a training pipeline then needs the transitive
groups ("A~B and B~C means A,B,C are one document") and one surviving
representative per group. Spark has no recursive CTE, so components
are computed by ITERATIVE MIN-LABEL PROPAGATION -- the standard
distributed formulation (Hash-Min; see also the large-star/small-star
refinement of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14, which bounds rounds to O(log^2 n) on adversarial
graphs):

* every node starts labeled with itself;
* each round, every node takes the min of its own label, its
  neighbors' labels, AND its label's label (pointer jumping) -- two
  joins + one groupBy per round, shuffling only (node, label) longs;
* the pointer-jump branch makes the reachable-min distance roughly
  DOUBLE per round, so convergence is O(log diameter) rounds even on
  path-shaped components (plain neighbor propagation is O(diameter) --
  a 10^6-long chain would need 10^6 rounds; doubling needs ~20). The
  loop early-exits on the first round with no label change, detected
  by the label-sum invariant (one narrow aggregate, no data collect).

Each round's result is localCheckpoint()ed: iterative DataFrame loops
otherwise double the lineage per round (exponential planning time),
and checkpoint blocks are ContextCleaner-managed -- no CacheManager
residue (same discipline as minhash_verified_pairs).

The DuckDB oracle for the driver row replays the same semantics as a
recursive-CTE transitive closure -- exact equality, no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neardup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id) for every document appearing in ``pairs``;
    ``cluster_id`` is the minimum doc id of the connected component.

    Raises if ``max_rounds`` is hit before convergence (a silent
    partial closure would merge fewer duplicates than claimed)."""
    fwd = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    edges = fwd.unionByName(
        fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # convergence via the label-sum invariant: labels only ever DECREASE
    # (min of self and neighbors), so sum(label) is unchanged iff no
    # label changed -- one narrow aggregate on the already-checkpointed
    # table per round, no compare-join
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):
        prop = edges.alias("e").join(
            labels.alias("l"), F.col("e.d") == F.col("l.node")
        ).select(F.col("e.s").alias("node"), F.col("l.label").alias("label"))
        # pointer jump: my label's label (labels only decrease, so this
        # keeps the min-monotonicity the sum-convergence test relies on)
        jump = labels.alias("a").join(
            labels.alias("b"), F.col("a.label") == F.col("b.node")
        ).select(F.col("a.node").alias("node"), F.col("b.label").alias("label"))
        labels = (
            labels.unionByName(prop)
            .unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        converged, prev_sum = new_sum == prev_sum, new_sum
        if converged:
            return labels.select(
                F.col("node").alias("doc_id"),
                F.col("label").alias("cluster_id"),
            )
    raise RuntimeError(
        f"neardup_clusters did not converge in {max_rounds} rounds -- "
        "component diameter exceeds the cap (raise max_rounds, or switch "
        "to large-star/small-star for adversarial graphs)"
    )


def dedup_keep_representative(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The cluster-level dedup a pipeline actually applies: drop every
    clustered document EXCEPT its component's representative (minimum
    id). Documents in no pair survive untouched; the anti join keys on
    the (small) loser list, which Catalyst/AQE broadcasts."""
    clusters = neardup_clusters(pairs, id_a=id_a, id_b=id_b)
    losers = clusters.filter(
        F.col("cluster_id") != F.col("doc_id")
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
