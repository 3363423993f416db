"""Connected components over an edge list — duplicate-CLUSTER labeling.

Pair-emitting dedup operators (minhash_lsh_pairs, simhash_hamming_pairs,
embedding_cosine_pairs) stop at candidate PAIRS; a real dedup pass must
collapse pairs into clusters and elect one survivor per cluster (keeping one
doc per transitive near-dup group — the reference has no graph notion at all;
its corpus-level dedup is Python set arithmetic, marmot/evaluation/
evaluation_utils.py [R — SURVEY.md §0]).

Algorithm: iterative MIN-LABEL PROPAGATION. Every node starts labeled with
itself; each round a node's label becomes the min over its own and all
neighbors' labels; convergence = a fixpoint (no label changed). Each round is
one equi-join (edges x labels, both keyed by node id) plus one groupBy(id) —
two hash exchanges on the node id, both AQE-coalescible, nothing driver-side
except the 1-row convergence probe.

Scale posture (100 TB): rounds = graph DIAMETER. Near-duplicate clusters are
dense (a web boilerplate cluster is near-clique), so diameters are small
single digits and this shape is the practical choice — the same join pattern
at any corpus size, edge lists shuffle only (a, b, label) triples. The known
upgrade for adversarial long-chain graphs is alternating large-star/
small-star (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) with O(log^2 n) rounds; the loop below is deliberately the simple
monotone iteration whose per-round plan Catalyst fully owns. Lineage is
truncated every ``checkpoint_every`` rounds (localCheckpoint) so the plan
does not deepen with iteration count — same treatment as operators/bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marmot_spark.operators.iterative import gc_hint


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 30,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every node of the undirected graph with its component's MIN node
    id. Returns (id, comp). Deterministic for any edge order (min is
    commutative); self-loops are dropped; isolated nodes do not appear in an
    edge list, so callers wanting singleton clusters union them in afterward.

    Raises RuntimeError if ``max_iter`` rounds pass without convergence —
    a silent early stop would mislabel components.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    labels = und.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).persist()
    labels.count()
    try:
        for it in range(max_iter):
            prop = und.join(labels.withColumnRenamed("id", "a"), "a").select(
                F.col("b").alias("id"), "comp"
            )
            new = (
                labels.unionByName(prop)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
            )
            if checkpoint_every and (it + 1) % checkpoint_every == 0:
                new = new.localCheckpoint(eager=True)
                # DataFrame.unpersist is a no-op on a checkpointed frame's
                # internal RDD; dropping the python ref alone leaves each
                # full label-set copy in the block manager until the
                # ContextCleaner's next periodic GC. A driver-side GC hint at
                # checkpoint boundaries (every k rounds, not per round) lets
                # the cleaner reclaim the previous copies promptly.
                gc_hint(new)
            else:
                new = new.persist()
                new.count()
            # convergence probe: min-label only ever DECREASES, so one changed
            # row existing is the exact "not yet fixpoint" predicate; limit(1)
            # stops the scan at the first hit
            changed = (
                new.join(labels.withColumnRenamed("comp", "__old"), "id")
                .filter(F.col("comp") < F.col("__old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "graph diameter exceeds max_iter (use alternating-star for chain graphs)"
        )
    finally:
        und.unpersist()
