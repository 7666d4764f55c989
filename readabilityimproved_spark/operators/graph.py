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
* round 1 is FUSED into initialization: min(self, neighbors) is just a
  groupBy over the symmetrized edge list -- no join at all;
* each later round, every node takes the min of its neighbors' labels
  AND its label's label (pointer jumping). Both arrive through ONE
  join: the propagation graph is the real edge set UNION the pointer
  edges (node -> label), so joining that graph against the label table
  delivers neighbor labels and label-of-label in the same shuffle --
  one join + one groupBy per round, moving only (node, label) longs
  (round 4 ran two separate joins plus a three-way union);
* the pointer-jump branch makes the reachable-min distance roughly
  DOUBLE per round, so convergence is O(log diameter) rounds even on
  path-shaped components (plain neighbor propagation is O(diameter) --
  a 10^6-long chain would need 10^6 rounds; doubling needs ~20). The
  loop early-exits on the first round with no label change, detected
  by the label-sum invariant (one narrow aggregate, no data collect).

Driver-action discipline: each round issues exactly ONE action. The
round's labels are checkpointed LAZILY and the convergence aggregate
runs on top of them, so the same job both materializes the checkpoint
blocks and returns the sum (round 4 ran two blocking round-trips per
round: eager checkpoint, then a separate aggregate job).

Durability: by default rounds are localCheckpoint()ed -- lineage is
truncated onto EXECUTOR-LOCAL blocks, which is the right call for the
bench and for short jobs but means an executor loss mid-iteration
kills the job (no lineage left to recompute from). For long cluster
runs pass ``checkpoint_dir``: every ``checkpoint_interval``-th round
is written through reliable ``DataFrame.checkpoint`` to that
(HDFS/object-store) path instead, so recovery replays at most
``checkpoint_interval - 1`` rounds. The caller owns the directory
(Spark only auto-deletes reliable checkpoints when
``spark.cleaner.referenceTracking.cleanCheckpoints`` is set).

Iterative loops must truncate lineage one way or the other: otherwise
the plan doubles per round (exponential planning time). Checkpoint
blocks are ContextCleaner-managed -- no CacheManager residue (same
discipline as minhash_verified_pairs).

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
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """(doc_id, cluster_id) for every document appearing in ``pairs``;
    ``cluster_id`` is the minimum doc id of the connected component.

    ``checkpoint_dir``: optional reliable-checkpoint location (see
    module docstring) -- every ``checkpoint_interval``-th round is
    persisted there so an executor loss cannot kill a long job.

    Raises if ``max_rounds`` is hit before convergence (a silent
    partial closure would merge fewer duplicates than claimed)."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame, rnd: int) -> DataFrame:
        # lazy in both branches: the convergence aggregate below is the
        # single action that materializes the blocks/files
        if checkpoint_dir is not None and rnd % checkpoint_interval == 0:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    fwd = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    edges = (
        fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # fused round 1: label = min(self, neighbors). The symmetrized edge
    # list contains every node as `s`, so one groupBy covers the whole
    # node set -- no join, and it doubles as label initialization.
    labels = _ckpt(
        edges.groupBy("s").agg(F.min("d").alias("m")).select(
            F.col("s").alias("node"),
            F.least(F.col("s"), F.col("m")).alias("label"),
        ),
        1,
    )
    # convergence via the label-sum invariant: labels only ever DECREASE
    # (min of self and neighbors), so sum(label) is unchanged iff no
    # label changed. One narrow aggregate per round, and because the
    # checkpoint above is lazy, this SAME action materializes it.
    first = labels.agg(
        F.sum("label").alias("new"), F.sum("node").alias("prev")
    ).collect()[0]
    prev_sum, new_sum = first["prev"], first["new"]
    for rnd in range(2, max_rounds + 2):
        if new_sum == prev_sum:
            return labels.select(
                F.col("node").alias("doc_id"),
                F.col("label").alias("cluster_id"),
            )
        if rnd == max_rounds + 1:
            break
        prev_sum = new_sum
        # propagation graph: real edges + pointer edges (s -> label(s)).
        # The single join then hands every node its neighbors' labels
        # (via the real edges) and its label's label (via the pointer
        # edge -- the jump). No explicit self branch is needed: the
        # jump value label(label(s)) <= label(s) because labels only
        # ever decrease, so the min stays monotone -- the property the
        # sum-convergence test relies on.
        g = edges.unionByName(
            labels.select(F.col("node").alias("s"), F.col("label").alias("d"))
        )
        labels = _ckpt(
            g.join(labels.withColumnRenamed("node", "d"), "d")
            .groupBy("s")
            .agg(F.min("label").alias("label"))
            .select(F.col("s").alias("node"), "label"),
            rnd,
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
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
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The cluster-level dedup a pipeline actually applies: drop every
    clustered document EXCEPT its component's representative (minimum
    id). Documents in no pair survive untouched; the anti join keys on
    the (small) loser list, which Catalyst/AQE broadcasts.
    ``checkpoint_dir`` passes through to neardup_clusters for reliable
    checkpoints on long cluster runs."""
    clusters = neardup_clusters(
        pairs, id_a=id_a, id_b=id_b, checkpoint_dir=checkpoint_dir
    )
    losers = clusters.filter(
        F.col("cluster_id") != F.col("doc_id")
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
