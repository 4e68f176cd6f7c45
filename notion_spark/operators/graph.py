"""Iterative graph algorithms on DataFrames — engine-exact by
construction.

PageRank here is INTEGER-SCALED: scores live in units of 1/SCALE
(default 1e-12), every per-iteration op is integer (floor division for
the out-degree split and the damping factor, exact integer sums for the
incoming mass), so the scores after k iterations are an exact function
of the edge set — bit-identical on any engine, any partitioning, any
join order. The float formulation would be none of those (summation
order changes the low bits every run). Floor-division remainders and
dangling-node mass leak deterministically (total mass decays slightly);
rankings are unaffected and exactness is what makes the operator
oracle-checkable (graph_pagerank_event_types unrolls the same
iterations in SQL).

Scale shape: one shuffle per iteration (the incoming-mass groupBy on
dst); the scores⋈edges join broadcasts while scores are driver-sized
and flips to sort-merge on real graphs automatically. Lineage is cut
with localCheckpoint every few rounds exactly like
`dedup.connected_components` — iteration count is the user's knob, so
plans never grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_scaled(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, score) after ``iterations`` rounds of integer-scaled
    PageRank over the DISTINCT directed edge set. score is bigint in
    1/SCALE units; damping is a percentage so it stays integer too.

    Recurrence (all integer):
        contrib(e)   = score(src) div outdeg(src)
        score'(node) = (SCALE * (100 - damping_pct)) div (100 * n)
                     + (damping_pct * sum(contrib(in-edges))) div 100
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # n is a scalar of the (bounded) node universe, not the data — the
    # one count() here is the same driver-sized step connected
    # components takes
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("score", F.lit(0).cast("bigint"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = (SCALE * (100 - damping_pct)) // (100 * n)
    scores = nodes.withColumn("score", F.lit(SCALE // n).cast("bigint"))
    for i in range(iterations):
        contrib = (
            e.join(scores, e["src"] == scores["node"])
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("score div deg").alias("c"))
        )
        inc = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        scores = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(inc, 0)) div 100")
            ).cast("bigint").alias("score"),
        )
        if (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint(eager=False)
    return scores


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, label) communities by DETERMINISTIC synchronous label
    propagation (Raghavan et al. 2007's LPA, made engine-exact): every
    node starts labelled with its own id; each round, every node
    simultaneously adopts the most frequent label among its neighbors
    (the edge set is symmetrized and deduplicated first), frequency
    ties breaking to the SMALLEST label. Canonical LPA randomizes visit
    order and tie-breaks — fine for exploration, useless for a
    hash-checked pipeline; the synchronous + smallest-label variant is
    a pure integer function of the edge set, bit-identical on any
    engine/partitioning (same reformulation move as `pagerank_scaled`,
    and the oracle unrolls the identical rounds in SQL —
    graph_label_propagation). Fixed ``iterations`` keeps determinism:
    synchronous LPA can oscillate on bipartite structures, and a
    run-to-convergence loop would make the output depend on detecting
    that oscillation; k rounds is the contract.

    A node keeps its current label when no neighbor beats it only via
    the count itself (its own label is not a vote); isolated nodes
    cannot occur (the node set is derived from the edges).

    Scale shape: per round, ONE edge⋈labels equi-join (shuffle keyed on
    the neighbor id, linear in |E|), one map-side-combined
    (node, label) count, and a per-node top-1 window over that node's
    distinct neighbor labels (frame bounded by degree). Lineage is cut
    with localCheckpoint every ``checkpoint_every`` rounds, same as
    `pagerank_scaled`."""
    from pyspark.sql.window import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels = (
        und.select(F.col("src").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for i in range(iterations):
        nb = und.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counts = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels
