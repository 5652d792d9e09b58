"""Similarity search over embedding columns (array<float>).

- ``brute_topk`` — exact cosine top-k: broadcast the (small) query set,
  dot products via zip_with/aggregate (JVM, no Python), window top-k.
  The baseline and the oracle-checkable path.
- ``lsh_topk`` — the scale path: random-hyperplane LSH signs bucket the
  corpus; queries probe their bucket (+ multi-probe neighbors by flipping
  the lowest-margin bits), exact re-rank inside the candidate set. At
  10^12 rows the corpus-side bucketing is a single narrow column and the
  join is an equi-join on bucket id — no crossJoin anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

COS = ('(aggregate(zip_with(vec, qvec, (x, y) -> CAST(x AS DOUBLE) * '
       'CAST(y AS DOUBLE)), 0E0, (acc, v) -> acc + v) / '
       '(sqrt(aggregate(vec, 0E0, (acc, v) -> acc + CAST(v AS DOUBLE) * '
       'CAST(v AS DOUBLE))) * '
       'sqrt(aggregate(qvec, 0E0, (acc, v) -> acc + CAST(v AS DOUBLE) * '
       'CAST(v AS DOUBLE)))))')


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy('qid').orderBy(F.col('cos').desc(),
                                          F.col('vec_id').asc())
    return (cand.withColumn('cos', F.expr(COS))
            .withColumn('rnk', F.row_number().over(w))
            .where(F.col('rnk') <= k))


def brute_topk(corpus: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """corpus(vec_id, vec) × queries(qid, qvec) → (qid, vec_id, cos, rnk)."""
    cand = corpus.crossJoin(F.broadcast(queries))
    return _topk(cand, k).select('qid', 'vec_id', 'cos', 'rnk')


def _plane_expr(planes: np.ndarray, vec_col: str) -> str:
    """Sign-bucket id from fixed hyperplanes — pure SQL arithmetic."""
    bits = []
    for b, plane in enumerate(planes):
        dot = ' + '.join(
            f'CAST({vec_col}[{i}] AS DOUBLE) * {w!r}'
            for i, w in enumerate(plane) if abs(w) > 1e-12)
        bits.append(f'(CASE WHEN ({dot}) > 0E0 THEN shiftleft(1L, {b}) '
                    'ELSE 0L END)')
    return '(' + ' | '.join(bits) + ')'


def lsh_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int, dim: int,
             n_planes: int = 8, probe_bits: int = 2,
             n_tables: int = 2) -> DataFrame:
    """Approximate cosine top-k: n_tables independent hyperplane-LSH
    bucketings, multi-probe within each, candidates unioned + deduped,
    exact re-rank. Recall is tested (tests/test_spark_trainops.py) rather
    than exactness — the scale path trades exact recall for equi-joins.
    """
    probes = [0]
    for b1 in range(n_planes):
        probes.append(1 << b1)
        if probe_bits >= 2:
            for b2 in range(b1 + 1, n_planes):
                probes.append((1 << b1) | (1 << b2))

    cands = None
    for t in range(n_tables):
        planes = lsh_planes(dim, n_planes, seed=42 + 1000 * t)
        c_bucket = corpus.withColumn(
            'bucket', F.expr(_plane_expr(planes, 'vec')))
        q_bucket = queries.withColumn(
            'bucket0', F.expr(_plane_expr(planes, 'qvec')))
        q_probe = q_bucket.withColumn(
            '_flip', F.explode(F.array(*[F.lit(p) for p in probes])))
        q_probe = q_probe.withColumn(
            'bucket', F.expr('bucket0').bitwiseXOR(F.col('_flip'))) \
            .drop('_flip', 'bucket0')
        pair = (c_bucket.join(F.broadcast(q_probe), 'bucket')
                .select('qid', 'qvec', 'vec_id', 'vec'))
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.dropDuplicates(['qid', 'vec_id'])
    return _topk(cands, k).select('qid', 'vec_id', 'cos', 'rnk')
