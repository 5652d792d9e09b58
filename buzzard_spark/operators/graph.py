"""Distributed connected components — alternating large-star / small-star.

The two-phase star algorithm (public: Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14 — also GraphFrames' default strategy)
converges in O(log² n) rounds of plain DataFrame joins and aggregations.
No graph state ever touches the driver (unlike a driver-side union-find,
which at web scale would pull millions of node tuples through one process);
every round shuffles the current edge set keyed by node id, so AQE handles
skewed hubs like any other hot key.

Used by ``dedup_clusters`` (near-duplicate pair graphs over a 10^12-page
crawl) and ``raster_ops.polygonize`` (border-run adjacency of tile masks —
a continent-scale component spans thousands of tiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = 'node',
                         max_iters: int = 25) -> DataFrame:
    """nodes: one row per node (isolated nodes allowed). edges: undirected
    (id_a, id_b). Returns (id_col, comp) with comp = min node id of the
    component — the same canonical labeling a union-find would produce.

    Raises RuntimeError if the star graph has not stabilized within
    max_iters rounds (components would be silently under-merged otherwise);
    the bound is O(log² n), so 25 covers any graph this engine can hold.
    """
    from buzzard_spark.session import checkpoint_release

    # localCheckpoint (eager=False) after every round: persist alone does
    # NOT truncate the logical plan, so an iterative join would hand
    # Catalyst an exponentially deeper plan each round — analysis time
    # explodes long before the data does. Lazy checkpoints + a signature
    # action only every OTHER round: two rounds of star joins materialize
    # in a single job, halving the per-round job-scheduling latency that
    # dominated round-2's dedup_clusters / polygonize_components walls.
    e = (edges
         .where(F.col('id_a') != F.col('id_b'))
         .select(F.greatest('id_a', 'id_b').alias('u'),
                 F.least('id_a', 'id_b').alias('v'))
         .distinct().localCheckpoint(eager=False))
    rounds = [e]

    def _round(e):
        # large-star: every neighbor larger than u links to min(N(u) ∪ {u});
        # emitted pairs are (larger, smaller) by construction
        bi = e.unionByName(
            e.select(F.col('v').alias('u'), F.col('u').alias('v')))
        lmins = (bi.groupBy('u').agg(F.min('v').alias('_mv'))
                 .select('u', F.least('_mv', F.col('u')).alias('m')))
        large = (bi.join(lmins, 'u')
                 .where(F.col('v') > F.col('u'))
                 .select(F.col('v').alias('u'), F.col('m').alias('v'))
                 .where(F.col('u') != F.col('v')))
        # small-star on the large-star output (edges already u > v):
        # all smaller neighbors (and u itself) link to the minimum neighbor
        smins = large.groupBy('u').agg(F.min('v').alias('m'))
        small = (large.join(smins, 'u')
                 .select(F.col('v').alias('u'), F.col('m').alias('v'))
                 .unionByName(smins.select('u', F.col('m').alias('v')))
                 .where(F.col('u') != F.col('v')))
        e_new = (small
                 .select(F.greatest('u', 'v').alias('u'),
                         F.least('u', 'v').alias('v'))
                 .distinct().localCheckpoint(eager=False))
        rounds.append(e_new)
        return e_new

    def _sig2(e_mid, e_new):
        # ONE action returns the signatures of two consecutive rounds: the
        # union materializes e_mid's lazy checkpoint once (e_new reads it
        # back), so convergence is still judged on CONSECUTIVE rounds (the
        # sound fixpoint criterion — no 2-cycle ambiguity) at half the jobs.
        # pmod keeps the checksum sum far from BIGINT overflow (ANSI mode).
        tagged = (e_mid.select(F.lit(0).alias('_r'), 'u', 'v')
                  .unionByName(e_new.select(F.lit(1).alias('_r'), 'u', 'v')))
        rows = {r['_r']: (r['n'], r['h']) for r in tagged.groupBy('_r').agg(
            F.count('*').alias('n'),
            F.sum(F.expr('pmod(xxhash64(u, v), 1000000007)')).alias('h')
        ).collect()}
        empty = (0, None)
        return rows.get(0, empty), rows.get(1, empty)

    converged = False
    done = 0
    while done < max_iters:
        e_mid = _round(e)
        e = _round(e_mid)
        done += 2
        s_mid, s_new = _sig2(e_mid, e)
        if s_new == s_mid:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f'connected_components did not converge in {max_iters} rounds')
    # converged star: every non-root node has exactly one edge to its root
    star = e.groupBy('u').agg(F.min('v').alias('comp'))
    out = (nodes.select(F.col(id_col).alias('u'))
           .join(star, 'u', 'left')
           .select(F.col('u').alias(id_col),
                   F.coalesce('comp', 'u').alias('comp')))
    # materialize the labeling through a reliable (file-backed) checkpoint,
    # then drop every round's localCheckpoint blocks: iterative operators
    # must not leak cached partitions into a long-lived session
    return checkpoint_release(out, rounds)
