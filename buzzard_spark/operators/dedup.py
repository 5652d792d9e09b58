"""Deduplication operators for web-scale corpora.

All of the MinHash pipeline is JVM-side Catalyst expressions (array
transform/aggregate + xxhash64) — no Python in the row path; at 10^12 docs
the only shuffles are the LSH-band groupBy (keys ≈ n_bands·n_docs, values
tiny) and the candidate-pair self-join (broadcast-free, AQE-skew safe
because band buckets are bounded by construction).

- exact_dedup        — content-hash groupBy (canonical = min id).
- shingles           — word k-gram set (distinct), JVM.
- minhash_signature  — n_hashes minima of per-perm xxhash64, JVM.
- lsh_candidate_pairs— banding → groupBy band key → intra-bucket pairs.
- near_dup_pairs     — candidates + exact Jaccard verify (array_intersect).
- simhash64          — 64-bit simhash over token hashes (JVM bit ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = 'text',
                id_col: str = 'doc_id') -> DataFrame:
    """Canonical (min id) doc per exact content hash."""
    return (df.select(F.md5(F.encode(text_col, 'utf-8')).alias('fp'), id_col)
            .groupBy('fp')
            .agg(F.min(id_col).alias('keep_id'), F.count('*').alias('n_dups')))


def shingles(df: DataFrame, text_col: str = 'text', k: int = 3,
             out: str = 'shingles') -> DataFrame:
    """Distinct word k-gram array (JVM: split + transform-with-index)."""
    words = f"split(trim({text_col}), '\\\\s+')"
    sh = (f'array_distinct(transform(sequence(0, size({words}) - {k}), '
          f"i -> array_join(slice({words}, i + 1, {k}), ' ')))")
    return df.withColumn(out, F.expr(
        f'CASE WHEN size({words}) >= {k} THEN {sh} ELSE array() END'))


def minhash_signature(df: DataFrame, n_hashes: int = 32,
                      shingle_col: str = 'shingles',
                      out: str = 'sig') -> DataFrame:
    """n_hashes-wide MinHash signature: per permutation j, the minimum of
    xxhash64(shingle || '#j') over the shingle set."""
    mins = ', '.join(
        f"array_min(transform({shingle_col}, s -> xxhash64(concat(s, '#%d'))))" % j
        for j in range(n_hashes))
    return df.withColumn(out, F.expr(f'array({mins})'))


def lsh_candidate_pairs(df: DataFrame, id_col: str = 'doc_id',
                        n_hashes: int = 32, bands: int = 16,
                        sig_col: str = 'sig') -> DataFrame:
    """Band the signature; docs sharing any band bucket become (a, b) pairs.

    Bucket key = xxhash64 of the band slice; pairs deduped across bands.
    """
    rows = n_hashes // bands
    band_expr = (
        "transform(sequence(0, {b}), bb -> xxhash64(concat("
        "CAST(bb AS STRING), '#', "
        "array_join(transform(slice({sig}, bb * {r} + 1, {r}), "
        "x -> CAST(x AS STRING)), ','))))"
    ).format(b=bands - 1, sig=sig_col, r=rows)
    banded = df.select(
        F.col(id_col).alias('_id'), sig_col,
        F.explode(F.expr(band_expr)).alias('band_key'))
    a = banded.alias('a')
    b = banded.alias('b')
    return (a.join(b, (F.col('a.band_key') == F.col('b.band_key')) &
                      (F.col('a._id') < F.col('b._id')))
            .select(F.col('a._id').alias('id_a'), F.col('b._id').alias('id_b'))
            .distinct())


def near_dup_pairs(df: DataFrame, id_col: str = 'doc_id',
                   text_col: str = 'text', k: int = 3, n_hashes: int = 32,
                   bands: int = 16, threshold: float = 0.6) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Output: (id_a, id_b, jaccard_pm) with jaccard in integer per-mille
    (deterministic across engines — no float hashing).
    """
    # shingle arrays feed the signature AND both sides of the verify join —
    # persist to avoid recomputing the split/transform lineage three times
    sh = shingles(df, text_col, k).select(id_col, 'shingles').persist()
    sig = minhash_signature(sh, n_hashes)
    cand = lsh_candidate_pairs(sig, id_col, n_hashes, bands)
    sh_only = sh.select(F.col(id_col).alias('_jid'), 'shingles')
    joined = (cand
              .join(sh_only.withColumnRenamed('shingles', 'sh_a'),
                    cand.id_a == F.col('_jid')).drop('_jid')
              .join(sh_only.withColumnRenamed('shingles', 'sh_b'),
                    cand.id_b == F.col('_jid')).drop('_jid'))
    jac = ('CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / '
           'CAST(size(array_union(sh_a, sh_b)) AS DOUBLE)')
    return (joined
            .withColumn('jaccard_pm',
                        F.expr(f'CAST(FLOOR({jac} * 1000E0) AS BIGINT)'))
            .where(F.expr(f'{jac} >= {threshold}E0'))
            .select('id_a', 'id_b', 'jaccard_pm'))


def dedup_clusters(ids: DataFrame, pairs: DataFrame, id_col: str = 'doc_id',
                   max_iters: int = 15) -> DataFrame:
    """Resolve near-dup pairs into clusters: connected components by
    iterative min-label propagation (alternating large-star/small-star
    style; near-dup clusters have tiny diameter so a handful of join
    rounds converges — each round is one shuffle, no driver data).

    ids: one row per document. pairs: (id_a, id_b) undirected edges.
    Returns (doc_id, cluster_id) with cluster_id = min member id —
    keep-first dedup keeps rows where doc_id == cluster_id.
    """
    labels = ids.select(F.col(id_col).alias('node'),
                        F.col(id_col).alias('comp'))
    edges = (pairs.select(F.col('id_a').alias('src'), F.col('id_b').alias('dst'))
             .unionByName(pairs.select(F.col('id_b').alias('src'),
                                       F.col('id_a').alias('dst')))
             .distinct().persist())
    for _ in range(max_iters):
        neighbor_min = (edges.join(labels, edges.dst == labels.node)
                        .groupBy('src').agg(F.min('comp').alias('ncomp')))
        new_labels = (labels.join(neighbor_min,
                                  labels.node == neighbor_min.src, 'left')
                      .select('node',
                              F.least('comp', F.coalesce('ncomp', 'comp'))
                              .alias('comp'))).persist()
        changed = (new_labels.alias('n')
                   .join(labels.alias('o'), F.col('n.node') == F.col('o.node'))
                   .where(F.col('n.comp') != F.col('o.comp')).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col('node').alias(id_col),
                         F.col('comp').alias('cluster_id'))


def simhash64(df: DataFrame, text_col: str = 'text', id_col: str = 'doc_id',
              out: str = 'simhash') -> DataFrame:
    """64-bit SimHash: per bit, sign of the sum over tokens of ±1 from the
    token's xxhash64 bit — all JVM via nested transform/aggregate."""
    words = f"split(trim({text_col}), '\\\\s+')"
    hashes = f'transform({words}, w -> xxhash64(w))'
    bit_terms = (
        'transform(sequence(0, 63), b -> '
        f'aggregate({hashes}, 0L, (acc, h) -> acc + '
        'CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END))')
    pack = (f'aggregate(zip_with({bit_terms}, sequence(0, 63), '
            '(t, b) -> CASE WHEN t > 0 THEN shiftleft(1L, b) ELSE 0L END), '
            '0L, (acc, x) -> acc | x)')
    return df.select(id_col, F.expr(pack).alias(out))


def hamming64(col_a: str, col_b: str) -> F.Column:
    """Hamming distance between two 64-bit simhash columns (JVM)."""
    # lambda var must not shadow dataframe aliases used in col_a/col_b
    return F.expr(
        f'aggregate(transform(sequence(0, 63), bitn -> '
        f'CAST((({col_a} >> bitn) & 1) != (({col_b} >> bitn) & 1) AS INT)), '
        '0, (acc, x) -> acc + x)')
