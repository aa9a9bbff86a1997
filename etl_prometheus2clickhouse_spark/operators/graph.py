"""Iterative graph analytics as join/agg rounds — the Pregel shape
expressed in plain DataFrame ops.

The dedup layer already runs one iterative algorithm (connected
components by contraction, operators/dedup.py); :func:`pagerank` adds
the other canonical one — power iteration — whose per-round data flow
is the template for any message-passing computation at 100 TB:

- one equi-join of the edge list with the current rank frame on the
  source key (co-partitioned with the previous round's shuffle);
- one map-side-combining aggregation of messages per destination;
- a slim per-round carry frame (one row per node), re-materialized
  with ``localCheckpoint`` so the plan doesn't re-execute earlier
  rounds (rank_i feeds three consumers per round — without the cut,
  work would double every iteration).

Cross-engine exactness (the catalog's oracle discipline): the one
shuffle-order-sensitive step is the per-destination SUM of double
contributions. Each contribution (``rank / out_degree``) is computed
per edge in double — identical inputs, identical IEEE result — then
cast to DECIMAL(38,18) and summed EXACTLY (decimal addition is
associative, so partition order can't perturb it). The new rank is
then a fixed double expression over the identical decimal sums.
Dangling-node mass (nodes with no out-edges) redistributes uniformly,
summed through the same decimal path and broadcast as a one-row frame
(never a per-iteration driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,18)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 5,
    round_digits: int = 12,
    materialize: bool = True,
) -> DataFrame:
    """PageRank by ``n_iter`` rounds of power iteration.

    ``PR₀ = 1/N``; each round::

        PR(v) = (1−d)/N + d · ( Σ_{u→v} PR(u)/outdeg(u) + D/N )

    where ``D`` is the total rank parked on dangling nodes. Total rank
    sums to 1 every round (pinned by tests). Output: ``node_id`` +
    ``pagerank`` (rounded, defensive — the arithmetic is already
    engine-exact, see module docstring).

    One bounded driver action (``count()`` for N — a single scalar);
    everything else is distributed.

    ``materialize=False`` skips the per-round ``localCheckpoint`` so
    the COMPOSED plan of all rounds stays inspectable (plan tests);
    never run it that way — each round's frame feeds three consumers,
    so the un-cut lineage re-executes earlier rounds exponentially.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
    )
    if materialize:
        e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nd = nodes.join(
        deg, nodes["node"] == deg["src"], "left"
    ).select("node", "out_deg")
    if materialize:
        nd = nd.localCheckpoint(eager=True)
    n = nd.count()
    teleport = (1.0 - damping) / n

    ranks = nd.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            ranks.where(F.col("out_deg").isNotNull())
            .join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).cast(_DEC).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__csum"))
        )
        dangling = ranks.where(F.col("out_deg").isNull()).agg(
            F.coalesce(
                F.sum(F.col("rank").cast(_DEC)), F.lit(0).cast(_DEC)
            ).alias("__dsum")
        )
        ranks = (
            nd.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "out_deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(
                            F.col("__csum").cast("double"), F.lit(0.0)
                        )
                        + F.col("__dsum").cast("double") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if materialize:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("node").alias("node_id"),
        F.round("rank", round_digits).alias("pagerank"),
    )
