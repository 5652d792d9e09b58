"""Corpus-cleaning operators for web-scale text pipelines.

Three operators a large-scale training-data pipeline needs beyond
whole-document dedup (which lives in :mod:`.dedup`):

- :func:`chunk_dedup` — CCNet-style sub-document dedup: the corpus is cut
  into fixed-width word chunks and every chunk that already appeared
  earlier in the corpus (by (doc_id, chunk_idx) order) is dropped; each
  document is reconstructed from its surviving chunks. Removes
  boilerplate (headers, navigation, license blocks) that whole-document
  hashing can't touch.
- :func:`repetition_stats` — Gopher-style per-document repetition
  signals: word count, distinct-word count, most-frequent word and
  bigram with their counts. Integer-only outputs so the DuckDB oracle
  compares exactly.
- :func:`tfidf_top_terms` — top-k characteristic terms per document
  ranked by tf·idf. The rank orders by ``tf / df`` (monotone in
  tf·ln(N/df) for fixed doc... strictly: tf/df is the engine-exact
  proxy — ranking never needs a transcendental, so Spark and the SQL
  oracle agree bit-for-bit), ties broken by term.

All three are pure DataFrame compositions — no Python UDFs, one
hash-shuffle per logical step, nothing quadratic, nothing collected to
the driver — and each ships a DuckDB oracle generator used by the
driver's correctness gate.

Reference scope note: the reference engine (preligens-lab/buzzard) has no
text stack; these follow the public CCNet (Wenzek et al., LREC 2020) and
Gopher (Rae et al., 2021) corpus-filtering recipes re-expressed as Spark
relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ['chunk_dedup', 'repetition_stats', 'tfidf_top_terms',
           'collocations', 'chunk_array_sql', 'boilerplate_remove',
           'weighted_sample', 'contamination_check']

# chunk index is packed with doc_id into one BIGINT first-occurrence key:
# doc_id * 2^20 + idx. Contract: doc_id < 2^43 and < 2^20 chunks per
# document (10M words/doc at the default width — beyond any web page).
CHUNK_IDX_BITS = 20


def chunk_array_sql(text_col: str, chunk_words: int,
                    dialect: str = 'spark') -> str:
    """SQL expression: ARRAY<STRING> of consecutive ``chunk_words``-word
    chunks of ``text_col`` (last chunk may be shorter). Same values in
    both dialects; the word array is bound once (no per-chunk re-split).
    """
    w = chunk_words
    if dialect == 'duckdb':
        ws = f"string_split_regex(trim({text_col}), '\\s+')"
        return (f'list_transform(range((length({ws}) + {w - 1}) // {w}), '
                f"c -> array_to_string(list_slice({ws}, c * {w} + 1, "
                f"c * {w} + {w}), ' '))")
    # spark: split(trim) always yields >= 1 element, so the sequence upper
    # bound (n_chunks - 1) is >= 0 and never walks backwards
    ws = f"split(trim({text_col}), '\\\\s+')"
    return (f'element_at(transform(array({ws}), ws -> '
            f'transform(sequence(0, ((size(ws) + {w - 1}) DIV {w}) - 1), '
            f"c -> array_join(slice(ws, c * {w} + 1, {w}), ' '))), 1)")


def chunk_dedup(df: DataFrame, text_col: str = 'text',
                id_col: str = 'doc_id', chunk_words: int = 10) -> DataFrame:
    """Corpus-wide sub-document dedup (CCNet-style paragraph dedup with
    fixed-width word chunks standing in for paragraphs).

    A chunk SURVIVES iff its (doc_id, chunk_idx) is the corpus-wide
    minimum among all positions where that chunk text occurs. Returns one
    row per input document::

        (doc_id, n_chunks, n_kept, clean_text)

    with ``clean_text`` the surviving chunks re-joined in document order
    ('' when every chunk was seen earlier elsewhere).

    Scale shape (100 TB): the dedup decision runs on a NARROW table of
    (xxhash64(chunk), packed_key) — chunk text is never shuffled for the
    group-by; the winning keys come back as a packed-BIGINT semi-join
    against the exploded table, then one partial-agg group-by per doc
    reconstructs the text. Three shuffles total, only the last two carry
    strings. Chunk identity is the 64-bit hash (collision odds ~1e-19 per
    pair — same contract as :func:`.dedup.shingle_ids`).
    """
    chunks = chunk_array_sql(text_col, chunk_words, 'spark')
    ch = df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias('idx', 'chunk'))
    packed = (F.col(id_col).cast('long') *
              F.lit(1 << CHUNK_IDX_BITS).cast('long') + F.col('idx'))
    ch = ch.withColumn('_k', packed)
    # narrow dedup decision: hash + packed key only
    first = (ch.select(F.xxhash64('chunk').alias('_h'), '_k')
             .groupBy('_h').agg(F.min('_k').alias('_k')))
    kept = ch.join(first.select('_k'), '_k', 'left_semi')
    # n_chunks is a per-row formula on the source — no explode, no shuffle
    ws = f"split(trim({text_col}), '\\\\s+')"
    totals = df.select(
        F.col(id_col),
        F.expr(f'CAST((size({ws}) + {chunk_words - 1}) DIV {chunk_words} '
               'AS BIGINT)').alias('n_chunks'))
    rebuilt = kept.groupBy(id_col).agg(
        F.count('*').alias('n_kept'),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct('idx', 'chunk'))),
                lambda s: s.chunk),
            ' ').alias('clean_text'))
    return (totals.join(rebuilt, id_col, 'left')
            .select(F.col(id_col), F.col('n_chunks'),
                    F.coalesce('n_kept', F.lit(0)).alias('n_kept'),
                    F.coalesce('clean_text', F.lit('')).alias('clean_text')))


def chunk_dedup_oracle_sql(table: str = 'documents', text_col: str = 'text',
                           id_col: str = 'doc_id',
                           chunk_words: int = 10,
                           corpus_cte: str | None = None) -> str:
    """DuckDB equivalent of :func:`chunk_dedup` (groups by chunk STRING —
    value-identical to the hash grouping absent a 64-bit collision).

    ``corpus_cte``: optional SQL for a CTE named ``corpus`` providing
    (id_col, text_col); defaults to the raw table.
    """
    w = chunk_words
    corpus = corpus_cte or f'SELECT {id_col}, {text_col} FROM {table}'
    chunks = chunk_array_sql(text_col, w, 'duckdb')
    return f"""
WITH corpus AS ({corpus}),
c AS (SELECT {id_col}, {chunks} AS chunks FROM corpus),
ch AS (SELECT {id_col}, unnest(chunks) AS chunk,
              unnest(range(len(chunks))) AS idx FROM c),
keyed AS (SELECT {id_col}, idx, chunk,
                 {id_col} * {1 << CHUNK_IDX_BITS} + idx AS k FROM ch),
first AS (SELECT chunk, MIN(k) AS k FROM keyed GROUP BY chunk),
kept AS (SELECT keyed.* FROM keyed JOIN first USING (chunk, k)),
tot AS (SELECT {id_col}, COUNT(*) AS n_chunks FROM keyed GROUP BY 1),
reb AS (SELECT {id_col}, COUNT(*) AS n_kept,
               string_agg(chunk, ' ' ORDER BY idx) AS clean_text
        FROM kept GROUP BY 1)
SELECT tot.{id_col} AS {id_col}, tot.n_chunks,
       COALESCE(reb.n_kept, 0) AS n_kept,
       COALESCE(reb.clean_text, '') AS clean_text
FROM tot LEFT JOIN reb USING ({id_col})
"""


def repetition_stats(df: DataFrame, text_col: str = 'text',
                     id_col: str = 'doc_id') -> DataFrame:
    """Gopher-style repetition signals per document::

        (doc_id, n_words, n_distinct, top_word, top_word_n,
         top_bigram, top_bigram_n)

    ``top_word`` / ``top_bigram`` are the most frequent (ties → the
    lexicographically smallest), so every column is engine-exact.
    Documents with a single word get ``top_bigram = ''`` / count 0.

    Scale shape: explode → per-(doc, gram) partial-count → per-doc
    window top-1 (the row_number sort reuses the group-by's hash
    partitioning on doc_id). Nothing driver-side, nothing quadratic.
    """
    ws = df.select(F.col(id_col),
                   F.split(F.trim(text_col), r'\s+').alias('ws'))
    wc = (ws.select(id_col, F.explode('ws').alias('g'))
          .groupBy(id_col, 'g').agg(F.count('*').alias('n')))
    win = Window.partitionBy(id_col).orderBy(F.col('n').desc(),
                                             F.col('g').asc())
    topw = (wc.withColumn('rn', F.row_number().over(win))
            .where(F.col('rn') == 1)
            .select(id_col, F.col('g').alias('top_word'),
                    F.col('n').alias('top_word_n')))
    agg = wc.groupBy(id_col).agg(F.sum('n').alias('n_words'),
                                 F.count('*').alias('n_distinct'))
    bigrams = ('transform(sequence(0, size(ws) - 2), '
               "i -> concat(element_at(ws, i + 1), ' ', "
               'element_at(ws, i + 2)))')
    bc = (ws.where(F.expr('size(ws) >= 2'))
          .select(id_col, F.explode(F.expr(bigrams)).alias('g'))
          .groupBy(id_col, 'g').agg(F.count('*').alias('n')))
    topb = (bc.withColumn('rn', F.row_number().over(win))
            .where(F.col('rn') == 1)
            .select(id_col, F.col('g').alias('top_bigram'),
                    F.col('n').alias('top_bigram_n')))
    return (agg.join(topw, id_col).join(topb, id_col, 'left')
            .select(F.col(id_col), 'n_words', 'n_distinct',
                    'top_word', 'top_word_n',
                    F.coalesce('top_bigram', F.lit('')).alias('top_bigram'),
                    F.coalesce('top_bigram_n',
                               F.lit(0).cast('long')).alias('top_bigram_n')))


def repetition_stats_oracle_sql(table: str = 'documents',
                                text_col: str = 'text',
                                id_col: str = 'doc_id') -> str:
    """DuckDB equivalent of :func:`repetition_stats`."""
    return f"""
WITH w AS (SELECT {id_col},
                  string_split_regex(trim({text_col}), '\\s+') AS ws
           FROM {table}),
words AS (SELECT {id_col}, unnest(ws) AS g FROM w),
wc AS (SELECT {id_col}, g, COUNT(*) AS n FROM words GROUP BY 1, 2),
topw AS (SELECT {id_col}, g AS top_word, n AS top_word_n
         FROM (SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY {id_col} ORDER BY n DESC, g ASC) AS rn
               FROM wc) WHERE rn = 1),
agg AS (SELECT {id_col}, SUM(n) AS n_words, COUNT(*) AS n_distinct
        FROM wc GROUP BY 1),
bg AS (SELECT {id_col}, unnest(list_transform(
           generate_series(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i + 1])) AS g
       FROM w WHERE len(ws) >= 2),
bc AS (SELECT {id_col}, g, COUNT(*) AS n FROM bg GROUP BY 1, 2),
topb AS (SELECT {id_col}, g AS top_bigram, n AS top_bigram_n
         FROM (SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY {id_col} ORDER BY n DESC, g ASC) AS rn
               FROM bc) WHERE rn = 1)
SELECT agg.{id_col} AS {id_col}, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_distinct AS BIGINT) AS n_distinct, top_word,
       CAST(top_word_n AS BIGINT) AS top_word_n,
       COALESCE(top_bigram, '') AS top_bigram,
       CAST(COALESCE(top_bigram_n, 0) AS BIGINT) AS top_bigram_n
FROM agg JOIN topw USING ({id_col}) LEFT JOIN topb USING ({id_col})
"""


def tfidf_top_terms(df: DataFrame, text_col: str = 'text',
                    id_col: str = 'doc_id', k: int = 3,
                    broadcast_vocab: bool = False,
                    rank_by: str = 'tf_over_df') -> DataFrame:
    """Top-``k`` characteristic terms per document::

        (doc_id, term, tf, df, rnk)

    ``rank_by='tf_over_df'`` (default, the oracle-checked path) orders by
    ``tf / df`` descending, ties by term ascending. This is a
    RARITY-BIASED PROXY for tf-idf, NOT the same ranking: the monotone-
    transform argument only holds for fixed tf, and across terms with
    differing tf the two orders diverge (tf/df over-weights rare terms —
    e.g. N=100: (tf=10, df=50) scores tf·idf≈6.93 but tf/df=0.2, while
    (tf=1, df=2) scores tf·idf≈3.91 but tf/df=0.5; ADVICE r4). Its
    virtue is exactness: the division of two BIGINTs is the identical
    IEEE double in Spark and DuckDB, so the driver oracle value-checks it
    with no transcendental in the comparison.

    ``rank_by='tfidf'`` orders by true ``tf · ln(N/df)`` descending
    (N = corpus document count, computed in the same pass via a window
    over the df table — no extra action). Use this when the classical
    weighting matters; it is pinned by a numpy-conformance pytest rather
    than the cross-engine hash oracle, because ``ln`` may differ by 1 ulp
    between the JVM and libm and a hash compare cannot absorb that.

    Scale shape (both rankings): one explode + two partial-agg group-bys;
    the (term, df) table joins back on term — pass
    ``broadcast_vocab=True`` only when the vocabulary is known to be
    broadcast-sized (a web-scale corpus' token vocabulary is NOT; the
    default shuffles the equi-join and lets AQE pick the strategy).
    """
    if rank_by not in ('tf_over_df', 'tfidf'):
        raise ValueError(f'rank_by must be tf_over_df|tfidf, got {rank_by}')
    tf = (df.select(F.col(id_col),
                    F.explode(F.split(F.trim(text_col), r'\s+'))
                    .alias('term'))
          .groupBy(id_col, 'term').agg(F.count('*').alias('tf')))
    dfreq = tf.groupBy('term').agg(F.count('*').alias('df'))
    if rank_by == 'tfidf':
        # N rides along as a column (count of docs, an unpartitioned
        # window over the doc table's distinct ids — one tiny agg),
        # avoiding a driver-side count() action inside a lazy builder
        n_docs = df.select(F.countDistinct(id_col).alias('_n'))
        dfreq = dfreq.crossJoin(F.broadcast(n_docs))
        score = (F.col('tf') *
                 F.log(F.col('_n').cast('double') / F.col('df')))
    else:
        score = F.col('tf') / F.col('df')
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    win = Window.partitionBy(id_col).orderBy(
        score.desc(), F.col('term').asc())
    return (tf.join(dfreq, 'term')
            .withColumn('rnk', F.row_number().over(win))
            .where(F.col('rnk') <= k)
            .select(F.col(id_col), 'term', 'tf', 'df', 'rnk'))


def collocations(df: DataFrame, text_col: str = 'text', k: int = 20,
                 min_count: int = 5,
                 broadcast_vocab: bool = False) -> DataFrame:
    """Top-``k`` collocations (corpus-level bigrams ranked by PMI-lift)::

        (bigram, n_xy, n_left, n_right, rnk)

    Rank orders by ``n_xy / (n_left · n_right)`` descending — monotone in
    PMI = ln(n_xy·N / (n_left·n_right)) for fixed N, with no
    transcendental in the comparison, ties by bigram ascending.
    ``min_count`` drops hapax noise the way every published collocation
    extractor does. The denominator multiplies as DOUBLE·DOUBLE (never a
    BIGINT product): at web scale two ~10⁹-plus unigram counts would
    overflow a BIGINT product, which Spark (non-ANSI) wraps silently
    while DuckDB raises — a cross-engine divergence exactly at the
    design point (ADVICE r4). Double multiply and divide are correctly
    rounded IEEE ops, bit-identical in both engines.

    Scale shape: two explode → partial-agg group-bys (unigrams, bigrams)
    and two equi-joins back on the words; ``broadcast_vocab`` opt-in as
    in :func:`tfidf_top_terms`. The global top-k is a TakeOrdered, not a
    full sort.
    """
    ws = df.select(F.split(F.trim(text_col), r'\s+').alias('ws'))
    uni = (ws.select(F.explode('ws').alias('w'))
           .groupBy('w').agg(F.count('*').alias('n')))
    if broadcast_vocab:
        uni = F.broadcast(uni)
    bigrams = ('transform(sequence(0, size(ws) - 2), '
               "i -> concat(element_at(ws, i + 1), ' ', "
               'element_at(ws, i + 2)))')
    bg = (ws.where(F.expr('size(ws) >= 2'))
          .select(F.explode(F.expr(bigrams)).alias('bigram'))
          .groupBy('bigram').agg(F.count('*').alias('n_xy'))
          .where(F.col('n_xy') >= min_count)
          .withColumn('_l', F.expr("split(bigram, ' ')[0]"))
          .withColumn('_r', F.expr("split(bigram, ' ')[1]")))
    joined = (bg
              .join(uni.withColumnRenamed('w', '_l')
                    .withColumnRenamed('n', 'n_left'), '_l')
              .join(uni.withColumnRenamed('w', '_r')
                    .withColumnRenamed('n', 'n_right'), '_r'))
    lift = (F.col('n_xy').cast('double') /
            (F.col('n_left').cast('double') *
             F.col('n_right').cast('double')))
    ranked = (joined
              .orderBy(lift.desc(), F.col('bigram').asc())
              .limit(k))
    return (ranked
            .select('bigram', 'n_xy', 'n_left', 'n_right')
            .withColumn('rnk', F.row_number().over(
                Window.orderBy(lift.desc(), F.col('bigram').asc()))))


def _hash_u32_sql(h_col: str, dialect: str = 'spark') -> str:
    """Uniform 32-bit value from the first 8 hex digits of a pre-computed
    md5 column — the branch-free nibble arithmetic both engines evaluate
    identically (same construction as the simhash oracle pairing)."""
    from buzzard_spark.operators.text import _nibble_sql
    # BIGINT per term: DuckDB's ascii() is INT32 and nibble·16⁷ overflows
    return '(' + ' + '.join(
        f'(CAST({_nibble_sql(h_col, i, dialect)} AS BIGINT) '
        f'* {16 ** (8 - i)})'
        for i in range(1, 9)) + ')'


def deterministic_sample(df: DataFrame, fraction: float | dict,
                         id_col: str = 'doc_id', seed: int = 42,
                         strata_col: str | None = None) -> DataFrame:
    """Reproducible (hash-gated) sampling — the corpus-subsampling
    primitive a training-data pipeline needs instead of ``df.sample``:
    membership depends ONLY on (id, seed), never on partitioning, task
    retries, or row order, so the same ids are kept on every run, on any
    cluster, and in the SQL oracle (md5-derived uniform u32 < fraction ·
    2³², evaluated identically in DuckDB — no RNG state anywhere).

    ``fraction``: a float, or (with ``strata_col``) a {stratum: fraction}
    dict for stratified sampling (unlisted strata are dropped). The
    decision is one md5 + integer arithmetic per row in whole-stage
    codegen — no shuffle, no sort, trivially pushed below everything.
    """
    if isinstance(fraction, dict) != (strata_col is not None):
        raise ValueError('strata_col requires a {stratum: fraction} dict '
                         'and vice versa')
    h = F.md5(F.concat_ws(':', F.col(id_col).cast('string'),
                          F.lit(str(seed))))
    out = df.withColumn('_h', h)
    val = _hash_u32_sql('_h', 'spark')
    if strata_col is None:
        pred = f'{val} < {int(fraction * (16 ** 8))}'
    else:
        whens = ' '.join(
            f"WHEN {strata_col} = '{k}' THEN {int(v * (16 ** 8))}"
            for k, v in sorted(fraction.items()))
        pred = f'{val} < (CASE {whens} ELSE -1 END)'
    return out.where(F.expr(pred)).drop('_h')


def deterministic_sample_oracle_sql(fraction: dict, strata_col: str,
                                    table: str = 'documents',
                                    id_col: str = 'doc_id',
                                    seed: int = 42,
                                    select: str = '*') -> str:
    """DuckDB equivalent of the stratified :func:`deterministic_sample`."""
    val = _hash_u32_sql('_h', 'duckdb')
    whens = ' '.join(
        f"WHEN {strata_col} = '{k}' THEN {int(v * (16 ** 8))}"
        for k, v in sorted(fraction.items()))
    return (f'WITH h AS (SELECT *, md5(concat_ws(\':\', '
            f'CAST({id_col} AS VARCHAR), \'{seed}\')) AS _h FROM {table}) '
            f'SELECT {select} FROM h '
            f'WHERE {val} < (CASE {whens} ELSE -1 END)')


def collocations_oracle_sql(table: str = 'documents',
                            text_col: str = 'text', k: int = 20,
                            min_count: int = 5) -> str:
    """DuckDB equivalent of :func:`collocations`."""
    return f"""
WITH w AS (SELECT string_split_regex(trim({text_col}), '\\s+') AS ws
           FROM {table}),
uni AS (SELECT unnest(ws) AS w FROM w),
un AS (SELECT w, COUNT(*) AS n FROM uni GROUP BY 1),
bg AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           i -> ws[i] || ' ' || ws[i + 1])) AS bigram
       FROM w WHERE len(ws) >= 2),
bn AS (SELECT bigram, COUNT(*) AS n_xy FROM bg GROUP BY 1
       HAVING COUNT(*) >= {min_count}),
j AS (SELECT bn.bigram, bn.n_xy, l.n AS n_left, r.n AS n_right
      FROM bn JOIN un l ON l.w = string_split(bn.bigram, ' ')[1]
      JOIN un r ON r.w = string_split(bn.bigram, ' ')[2])
SELECT bigram, CAST(n_xy AS BIGINT) AS n_xy,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       CAST(ROW_NUMBER() OVER (ORDER BY CAST(n_xy AS DOUBLE) /
           (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)) DESC,
           bigram ASC) AS INT) AS rnk
FROM j ORDER BY rnk LIMIT {k}
"""


def tfidf_top_terms_oracle_sql(table: str = 'documents',
                               text_col: str = 'text',
                               id_col: str = 'doc_id', k: int = 3) -> str:
    """DuckDB equivalent of :func:`tfidf_top_terms`."""
    return f"""
WITH words AS (SELECT {id_col},
                      unnest(string_split_regex(trim({text_col}),
                                                '\\s+')) AS term
               FROM {table}),
tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT {id_col}, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS INT) AS rnk
FROM (SELECT tf.{id_col} AS {id_col}, tf.term, tf.tf, dfreq.df,
             ROW_NUMBER() OVER (PARTITION BY tf.{id_col}
                 ORDER BY tf.tf / dfreq.df DESC, tf.term ASC) AS rnk
      FROM tf JOIN dfreq USING (term))
WHERE rnk <= {k}
"""


def bigram_coverage(df: DataFrame, text_col: str = 'text',
                    id_col: str = 'doc_id', min_df: int = 5) -> DataFrame:
    """Per-document n-gram COVERAGE quality signal: how much of a document
    is made of bigrams the corpus itself has seen at least ``min_df``
    times.  A transcendental-free stand-in for CCNet's LM-perplexity
    filter — documents whose bigrams are mostly corpus-rare are gibberish,
    boilerplate-mangled, or off-distribution, and a training-data pipeline
    gates on exactly this ratio; keeping the outputs integer counts
    (``n_bigrams``, ``n_covered``) makes the cross-engine compare exact
    (the same integer-only discipline as ``repetition_stats``).

    Plan: tokenize once per row (the materialized-``ws`` lesson from the
    round-3 ``bigram_top`` regression), pre-aggregate to the narrow
    (doc, bigram, m) table, derive corpus frequencies FROM that table
    (one extra partial-agg instead of a second full tokenize), equi-join
    back and sum.  The (doc, bigram, m) table is persisted for its two
    scans and released through the final checkpoint.  Hot bigrams skew
    the join key; AQE splits them like any hot key.  Returns one row per
    input document (docs with < 2 words get zeros).
    """
    from buzzard_spark.session import checkpoint_release

    ws = df.select(F.col(id_col),
                   F.split(F.trim(text_col), r'\s+').alias('ws')) \
           .where(F.expr('size(ws) >= 2'))
    bigrams = ('transform(sequence(0, size(ws) - 2), '
               "i -> concat(element_at(ws, i + 1), ' ', "
               'element_at(ws, i + 2)))')
    db = (ws.select(F.col(id_col),
                    F.explode(F.expr(bigrams)).alias('bigram'))
          .groupBy(id_col, 'bigram').agg(F.count('*').alias('m'))
          .persist())
    cf = db.groupBy('bigram').agg(F.sum('m').alias('n_corpus'))
    per = (db.join(cf, 'bigram')
           .groupBy(id_col)
           .agg(F.sum('m').alias('nb'),
                F.sum(F.when(F.col('n_corpus') >= min_df, F.col('m'))
                      .otherwise(F.lit(0))).alias('nc')))
    out = (df.select(id_col)
           .join(per, id_col, 'left')
           .select(F.col(id_col),
                   F.coalesce('nb', F.lit(0)).cast('long')
                   .alias('n_bigrams'),
                   F.coalesce('nc', F.lit(0)).cast('long')
                   .alias('n_covered')))
    return checkpoint_release(out, [db])


def bigram_coverage_oracle_sql(table: str = 'documents',
                               text_col: str = 'text',
                               id_col: str = 'doc_id',
                               min_df: int = 5) -> str:
    """DuckDB equivalent of :func:`bigram_coverage` (sums cast back to
    BIGINT — DuckDB widens SUM(BIGINT) to HUGEINT)."""
    return f"""
WITH w AS (SELECT {id_col},
                  string_split_regex(trim({text_col}), '\\s+') AS ws
           FROM {table}),
b AS (SELECT {id_col}, unnest(list_transform(
          generate_series(1, len(ws) - 1),
          i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w WHERE len(ws) >= 2),
db AS (SELECT {id_col}, bigram, COUNT(*) AS m FROM b GROUP BY 1, 2),
cf AS (SELECT bigram, SUM(m) AS n_corpus FROM db GROUP BY 1),
per AS (SELECT {id_col}, SUM(m) AS nb,
               SUM(CASE WHEN cf.n_corpus >= {min_df} THEN m ELSE 0 END)
                   AS nc
        FROM db JOIN cf USING (bigram) GROUP BY 1)
SELECT d.{id_col},
       CAST(COALESCE(per.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(per.nc, 0) AS BIGINT) AS n_covered
FROM {table} d LEFT JOIN per USING ({id_col})
"""


def column_profile(df: DataFrame, value_col: str, group_col: str,
                   qs: tuple = (25, 50, 75, 95)) -> DataFrame:
    """EXACT per-group distribution profile (count / min / max / discrete
    percentiles) — the corpus-profiling step a training-data pipeline
    runs before choosing length/quality cutoffs. ``qs`` are integer
    percents; each p-th value is the classic discrete quantile (the value
    at rank ceil(p·n/100) in ascending order), computed with INTEGER rank
    arithmetic ``(p·n + 99) div 100`` so both engines agree exactly and
    no float/DECIMAL literal ever enters the plan (the ``dlit`` trap).

    Exactness costs a per-group sort (one window over
    ``partitionBy(group)``) — correct and distributed at any group count,
    but at the 100-TB design point a profile over few huge groups should
    use ``approx_percentile`` (t-digest, mergeable map-side) instead;
    this operator is the exact-truth twin the approximate path is
    validated against. Ties: ranks among equal values are arbitrary but
    the VALUE at a given rank is deterministic, which is all the output
    exposes.
    """
    from pyspark.sql.window import Window
    for q in qs:
        if not (isinstance(q, int) and 0 < q <= 100):
            raise ValueError(f'qs must be integer percents in (0, 100]: {q}')
    w = Window.partitionBy(group_col).orderBy(value_col)
    wn = Window.partitionBy(group_col)
    ranked = (df.select(group_col, value_col)
              .withColumn('rn', F.row_number().over(w))
              .withColumn('n', F.count('*').over(wn)))
    aggs = [F.max('n').alias('n_rows'),
            F.min(value_col).alias('min_v'),
            F.max(value_col).alias('max_v')]
    aggs += [F.max(F.when(
        F.expr(f'rn = ({q} * n + 99) div 100'), F.col(value_col)))
        .alias(f'p{q}') for q in qs]
    return ranked.groupBy(group_col).agg(*aggs)


def column_profile_oracle_sql(table: str, value_col: str, group_col: str,
                              qs: tuple = (25, 50, 75, 95)) -> str:
    """DuckDB equivalent of :func:`column_profile` (same integer rank
    arithmetic; ``//`` is DuckDB's integer division)."""
    g, v = group_col, value_col
    ps = ', '.join(
        f'CAST(MAX(CASE WHEN rn = ({q} * n + 99) // 100 THEN {v} END) '
        f'AS BIGINT) AS p{q}' for q in qs)
    return (f'WITH r AS (SELECT {g}, {v}, '
            f'ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {v}) AS rn, '
            f'COUNT(*) OVER (PARTITION BY {g}) AS n FROM {table}) '
            f'SELECT {g}, CAST(MAX(n) AS BIGINT) AS n_rows, '
            f'MIN({v}) AS min_v, MAX({v}) AS max_v, {ps} '
            f'FROM r GROUP BY {g}')


def inverted_index(df: DataFrame, text_col: str = 'text',
                   id_col: str = 'doc_id',
                   max_postings: int = 32) -> DataFrame:
    """Inverted index over the corpus: per token its document frequency,
    total occurrence count, and the first ``max_postings`` posting doc
    ids (ascending, comma-joined) — the search-index build step, and the
    classic hot-key workload: a stop-word's posting list at 100 TB is
    billions of ids, so the list is BOUNDED before any collection
    happens. ``row_number`` over (token → id) ranks postings inside the
    same hash partitioning the final groupBy uses (one shuffle total),
    and ``collect_list`` only ever sees rows with ``rn <= max_postings``
    — no unbounded per-token buffer anywhere; ``df``/``n_total`` stay
    exact over ALL rows. Postings are emitted as a joined STRING so the
    cross-engine compare is a plain value hash.
    """
    from pyspark.sql.window import Window
    if max_postings < 1:
        raise ValueError(f'max_postings must be >= 1: {max_postings}')
    toks = df.select(
        id_col,
        F.explode(F.split(F.trim(text_col), r'\s+')).alias('tok'))
    per = toks.groupBy('tok', id_col).agg(F.count('*').alias('tf'))
    w = Window.partitionBy('tok').orderBy(id_col)
    ranked = per.withColumn('rn', F.row_number().over(w))
    return ranked.groupBy('tok').agg(
        F.count('*').alias('df'),
        F.sum('tf').alias('n_total'),
        F.array_join(F.sort_array(F.collect_list(
            F.when(F.col('rn') <= max_postings, F.col(id_col)))), ',')
        .alias('postings'))


def inverted_index_oracle_sql(table: str = 'documents',
                              text_col: str = 'text',
                              id_col: str = 'doc_id',
                              max_postings: int = 32) -> str:
    """DuckDB twin of :func:`inverted_index` (FILTER instead of the
    null-dropping collect_list; same bounded-postings contract)."""
    return (
        f'WITH t AS (SELECT {id_col}, '
        f"unnest(string_split_regex(trim({text_col}), '\\s+')) AS tok "
        f'FROM {table}), '
        f'per AS (SELECT tok, {id_col}, COUNT(*) AS tf '
        f'FROM t GROUP BY 1, 2), '
        f'r AS (SELECT tok, {id_col}, tf, ROW_NUMBER() OVER '
        f'(PARTITION BY tok ORDER BY {id_col}) AS rn FROM per) '
        f'SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, '
        f'CAST(SUM(tf) AS BIGINT) AS n_total, '
        f'array_to_string(list_sort(list({id_col}) '
        f'FILTER (WHERE rn <= {max_postings})), \',\') AS postings '
        f'FROM r GROUP BY tok')


def boilerplate_remove(df: DataFrame, text_col: str = 'text',
                       id_col: str = 'doc_id', group_col: str = 'host',
                       max_ratio_pct: int = 50,
                       min_df: int = 2) -> DataFrame:
    """CCNet-style boilerplate LINE removal: within each ``group_col``
    (canonically the host — a site's navigation/footer/cookie-banner
    lines repeat across ITS pages), a line is boilerplate iff it occurs
    in at least ``min_df`` documents of the group AND in strictly more
    than ``max_ratio_pct`` percent of them. Boilerplate lines are
    dropped from every document; each document is rebuilt from its
    surviving lines in order. Returns one row per input document::

        (id_col, n_lines, n_kept, clean_text)

    This is the df-RATIO filter that complements :func:`chunk_dedup`
    (first-occurrence-wins keeps ONE copy of a repeated chunk;
    boilerplate removal deletes ALL copies of a site-wide line — CCNet,
    Wenzek et al. LREC 2020, applies exactly this per-shard line filter
    before LM scoring). The threshold compare is pure integer arithmetic
    (``line_df * 100 > max_ratio_pct * n_docs``) so both engines agree
    exactly. Note empty lines repeat like any other line: a group's
    blank separators typically exceed the ratio and are removed, which
    is the documented CCNet behavior.

    Scale shape (100 TB): the df decision runs on a NARROW
    (group, xxhash64(line), doc) projection — line text is never
    shuffled for the frequency count; flagged hashes come back via an
    equi-join on (group, hash) against the exploded table (a host's
    distinct-line set is bounded, so per-group fan-out is bounded), and
    one final per-doc group-by rebuilds the text. No window over the
    whole group, nothing collected to the driver.
    """
    if not (0 <= max_ratio_pct <= 100):
        raise ValueError(f'max_ratio_pct must be in [0, 100]: {max_ratio_pct}')
    lines = df.select(
        F.col(group_col).alias('_g'), F.col(id_col),
        F.posexplode(F.split(F.col(text_col), '\n')).alias('idx', 'line'))
    narrow = lines.select('_g', F.xxhash64('line').alias('_h'),
                          F.col(id_col)).distinct()
    dfreq = narrow.groupBy('_g', '_h').agg(F.count('*').alias('_df'))
    ndocs = df.groupBy(F.col(group_col).alias('_g')).agg(
        F.countDistinct(id_col).alias('_n'))
    boiler = (dfreq.join(ndocs, '_g')
              .where((F.col('_df') >= min_df)
                     & (F.col('_df') * 100 > max_ratio_pct * F.col('_n')))
              .select('_g', '_h'))
    kept = (lines.withColumn('_h', F.xxhash64('line'))
            .join(boiler, ['_g', '_h'], 'left_anti'))
    totals = df.select(
        F.col(id_col),
        F.expr(f"CAST(size(split({text_col}, '\\n')) AS BIGINT)")
        .alias('n_lines'))
    rebuilt = kept.groupBy(id_col).agg(
        F.count('*').alias('n_kept'),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct('idx', 'line'))),
                lambda s: s.line),
            '\n').alias('clean_text'))
    return (totals.join(rebuilt, id_col, 'left')
            .select(F.col(id_col), F.col('n_lines'),
                    F.coalesce('n_kept', F.lit(0)).alias('n_kept'),
                    F.coalesce('clean_text', F.lit('')).alias('clean_text')))


def boilerplate_remove_oracle_sql(corpus_cte: str, text_col: str = 'text',
                                  id_col: str = 'doc_id',
                                  group_col: str = 'host',
                                  max_ratio_pct: int = 50,
                                  min_df: int = 2) -> str:
    """DuckDB twin of :func:`boilerplate_remove` (groups by the line
    STRING instead of its 64-bit hash — value-identical absent a
    collision; same integer ratio compare). ``corpus_cte``: SQL for a
    CTE named ``corpus`` providing (group_col, id_col, text_col)."""
    g, i, t = group_col, id_col, text_col
    return f"""
WITH corpus AS ({corpus_cte}),
ln AS (SELECT {g}, {i}, unnest(string_split({t}, chr(10))) AS line,
              unnest(range(len(string_split({t}, chr(10))))) AS idx
       FROM corpus),
dfreq AS (SELECT {g}, line, COUNT(DISTINCT {i}) AS line_df
          FROM ln GROUP BY 1, 2),
nd AS (SELECT {g}, COUNT(DISTINCT {i}) AS n_docs FROM corpus GROUP BY 1),
boiler AS (SELECT {g}, line FROM dfreq JOIN nd USING ({g})
           WHERE line_df >= {min_df}
             AND line_df * 100 > {max_ratio_pct} * n_docs),
kept AS (SELECT ln.* FROM ln ANTI JOIN boiler USING ({g}, line)),
tot AS (SELECT {i}, CAST(len(string_split({t}, chr(10))) AS BIGINT)
               AS n_lines FROM corpus),
reb AS (SELECT {i}, COUNT(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY idx) AS clean_text
        FROM kept GROUP BY 1)
SELECT tot.{i} AS {i}, tot.n_lines,
       CAST(COALESCE(reb.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(reb.clean_text, '') AS clean_text
FROM tot LEFT JOIN reb USING ({i})
"""


def score_priorities(df: DataFrame, weight_col: str,
                     id_col: str = 'doc_id', seed: int = 42) -> DataFrame:
    """Stateless scoring stage shared by :func:`weighted_sample` and the
    streaming sampler: adds the deterministic ``priority`` column
    ``w · 2^32 / (md5_u32(id, seed) + 1)`` (one exact dyadic scale + one
    correctly-rounded IEEE division — bit-identical in any engine)."""
    h = F.md5(F.concat_ws(':', F.col(id_col).cast('string'),
                          F.lit(str(seed))))
    u32 = _hash_u32_sql('_h', 'spark')
    q = (f'CAST({weight_col} AS DOUBLE) * CAST(4294967296 AS DOUBLE) '
         f'/ CAST(({u32}) + 1 AS DOUBLE)')
    return (df.withColumn('_h', h)
            .withColumn('priority', F.expr(q)).drop('_h'))


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = 'doc_id', seed: int = 42,
                    strata_col: str | None = None) -> DataFrame:
    """Deterministic PRIORITY SAMPLING (Duffield-Lund-Thorup, JACM 2007):
    keep the k rows with the largest priority ``q = w / u`` where ``u``
    is a uniform (0,1] derived from md5(id, seed) — weight-proportional
    inclusion with rerun/partition/retry-invariant membership (same
    contract as :func:`deterministic_sample`, which is the unweighted
    fraction gate). With ``strata_col``, top-k per stratum.

    Output: the kept rows plus ``priority`` and ``w_est`` — the
    priority-sampling Horvitz-Thompson estimate ``max(w, tau)`` with
    ``tau`` the (k+1)-th priority (0 when the stratum has <= k rows, in
    which case the sample is exhaustive and ``w_est = w``). Summing
    ``w_est`` over any subset of the sample unbiasedly estimates that
    subset's true weight sum — the property that makes a small sample
    usable for corpus accounting at 100 TB.

    Cross-engine exactness: ``q = CAST(w AS DOUBLE) * 2^32 / (u32 + 1)``
    is one exact dyadic scale plus ONE correctly-rounded IEEE division
    of identical operands in both engines — bit-identical priorities,
    no transcendental, no RNG state (the A-ES ``u^(1/w)`` key needs
    pow/ln and is ordered identically to ``w/u`` only through a monotone
    transform that floats do not preserve; priority sampling's published
    form IS ``w/u``).

    Scale shape: stratified path = one hash shuffle on the stratum + a
    per-stratum sort (window); global path = Spark's distributed
    TakeOrdered (map-side partial top-(k+1), no single-partition
    exchange on the full table — only the k+1 survivors converge).
    """
    if k < 1:
        raise ValueError(f'k must be >= 1: {k}')
    scored = score_priorities(df, weight_col, id_col, seed)
    if strata_col is not None:
        w = Window.partitionBy(strata_col).orderBy(
            F.col('priority').desc(), F.col(id_col).asc())
        ws = Window.partitionBy(strata_col)
        ranked = (scored.withColumn('_rn', F.row_number().over(w))
                  .where(F.col('_rn') <= k + 1)
                  .withColumn('_tau', F.coalesce(
                      F.max(F.when(F.col('_rn') == k + 1,
                                   F.col('priority'))).over(ws),
                      F.lit(0.0).cast('double'))))
        kept = ranked.where(F.col('_rn') <= k)
    else:
        lim = scored.orderBy(F.col('priority').desc(),
                             F.col(id_col).asc()).limit(k + 1)
        w = Window.orderBy(F.col('priority').desc(), F.col(id_col).asc())
        ws = Window.partitionBy()
        # <= k+1 rows by construction: the windows run on a bounded set
        ranked = (lim.withColumn('_rn', F.row_number().over(w))
                  .withColumn('_tau', F.coalesce(
                      F.max(F.when(F.col('_rn') == k + 1,
                                   F.col('priority'))).over(ws),
                      F.lit(0.0).cast('double'))))
        kept = ranked.where(F.col('_rn') <= k)
    return (kept.withColumn(
        'w_est', F.greatest(F.col(weight_col).cast('double'),
                            F.col('_tau')))
        .drop('_rn', '_tau'))


def weighted_sample_oracle_sql(corpus_cte: str, weight_col: str, k: int,
                               id_col: str = 'doc_id', seed: int = 42,
                               strata_col: str | None = None) -> str:
    """DuckDB twin of :func:`weighted_sample` (same md5-u32 uniform,
    same single-division priority). ``corpus_cte``: SQL for a CTE named
    ``corpus`` providing (id_col, weight_col [, strata_col])."""
    u32 = _hash_u32_sql('_h', 'duckdb')
    part = f'PARTITION BY {strata_col} ' if strata_col else ''
    return f"""
WITH corpus AS ({corpus_cte}),
h AS (SELECT *, md5(concat_ws(':', CAST({id_col} AS VARCHAR),
                              '{seed}')) AS _h FROM corpus),
s AS (SELECT * EXCLUDE (_h),
             CAST({weight_col} AS DOUBLE) * CAST(4294967296 AS DOUBLE)
             / CAST(({u32}) + 1 AS DOUBLE) AS priority FROM h),
r AS (SELECT *, ROW_NUMBER() OVER ({part}ORDER BY priority DESC,
                                   {id_col} ASC) AS _rn FROM s),
t AS (SELECT *, COALESCE(MAX(CASE WHEN _rn = {k + 1} THEN priority END)
                         OVER ({part.rstrip() or ''}), 0.0E0) AS _tau
      FROM r WHERE _rn <= {k + 1})
SELECT * EXCLUDE (_rn, _tau),
       greatest(CAST({weight_col} AS DOUBLE), _tau) AS w_est
FROM t WHERE _rn <= {k}
"""


def lm_surprisal(df: DataFrame, train: DataFrame | None = None,
                 text_col: str = 'text', id_col: str = 'doc_id',
                 oov_bits: int = 32,
                 broadcast_model: bool = False) -> DataFrame:
    """Integer-exact bigram language-model surprisal scoring — the
    perplexity-style fluency signal (CCNet scores documents with a
    KenLM; this is its transcendental-free relational analogue, exact
    across engines).

    A bigram model is counted over ``train`` (default: ``df`` itself —
    held-in scoring): ``n_bi(w1,w2)`` and the prefix total
    ``n_pre(w1) = Σ_w2 n_bi(w1,w2)``. Each scored document's bigram
    surprisal is the INTEGER proxy of ``-log2 P(w2|w1)``::

        seen bigram:      bits(n_pre) - bits(n_bi)   (>= 0)
        unseen, w1 known: bits(n_pre) + 1            (> any seen w1-bigram)
        w1 unknown:       oov_bits

    with ``bits(n) = length(bin(n)) = floor(log2 n) + 1`` — exact
    integer arithmetic both engines share (``bin`` exists in Spark and
    DuckDB), ordered like the float log-probability at 1-bit
    granularity. Output, one row per scored doc::

        (doc_id, n_bigrams, total_bits, oov_bigrams)

    Low mean ``total_bits / n_bigrams`` = fluent/common phrasing; high =
    rare or incoherent word sequences; single-word docs score 0 over 0
    bigrams. Summing integer bits also keeps the 100-TB aggregation
    overflow-free (max 64 bits/bigram).

    Held-in caveat: with ``train=None`` the model is an unsmoothed MLE
    of the scored corpus itself, so a document whose bigrams occur
    nowhere else is "perfectly predicted" (hapax ⇒ P(w2|w1)=1 ⇒ 0
    bits). For quality FILTERING, train on a trusted reference corpus
    (CCNet uses Wikipedia) — that is what makes word salad score high;
    self-training is for relative in-distribution ranking only.

    Scale shape: two explode → partial-agg group-bys build the model,
    two equi-joins score it (broadcast via ``broadcast_model`` when the
    model vocabulary fits — bigram tables at web scale usually do NOT,
    so the default is the shuffle join), one per-doc partial-agg
    group-by. Nothing driver-side, no Python.
    """
    tr = train if train is not None else df
    tws = tr.select(F.split(F.trim(text_col), r'\s+').alias('ws'))
    bigrams = ('transform(sequence(0, size(ws) - 2), '
               "i -> struct(element_at(ws, i + 1) AS w1, "
               'element_at(ws, i + 2) AS w2))')
    tb = (tws.where(F.expr('size(ws) >= 2'))
          .select(F.explode(F.expr(bigrams)).alias('b'))
          .select('b.w1', 'b.w2'))
    n_bi = tb.groupBy('w1', 'w2').agg(F.count('*').alias('_nb'))
    n_pre = tb.groupBy('w1').agg(F.count('*').alias('_np'))
    if broadcast_model:
        n_bi, n_pre = F.broadcast(n_bi), F.broadcast(n_pre)
    sb = (df.select(F.col(id_col),
                    F.split(F.trim(text_col), r'\s+').alias('ws'))
          .where(F.expr('size(ws) >= 2'))
          .select(id_col, F.explode(F.expr(bigrams)).alias('b'))
          .select(id_col, 'b.w1', 'b.w2'))
    scored = (sb.join(n_bi, ['w1', 'w2'], 'left')
              .join(n_pre, 'w1', 'left')
              .withColumn('_bits', F.expr(
                  'CAST(CASE WHEN _nb IS NOT NULL THEN '
                  'length(bin(_np)) - length(bin(_nb)) '
                  'WHEN _np IS NOT NULL THEN length(bin(_np)) + 1 '
                  f'ELSE {oov_bits} END AS BIGINT)')))
    per_doc = scored.groupBy(id_col).agg(
        F.count('*').alias('n_bigrams'),
        F.sum('_bits').alias('total_bits'),
        F.sum(F.when(F.col('_nb').isNull(), 1).otherwise(0))
        .cast('long').alias('oov_bigrams'))
    base = df.select(F.col(id_col))
    return (base.join(per_doc, id_col, 'left')
            .select(F.col(id_col),
                    F.coalesce('n_bigrams', F.lit(0)).alias('n_bigrams'),
                    F.coalesce('total_bits', F.lit(0)).alias('total_bits'),
                    F.coalesce('oov_bigrams', F.lit(0))
                    .alias('oov_bigrams')))


def lm_surprisal_oracle_sql(score_cte: str, train_cte: str | None = None,
                            text_col: str = 'text',
                            id_col: str = 'doc_id',
                            oov_bits: int = 32) -> str:
    """DuckDB twin of :func:`lm_surprisal`. ``score_cte``/``train_cte``:
    SQL providing (id_col, text_col); train defaults to the score CTE."""
    t, i = text_col, id_col
    train = train_cte or score_cte
    return f"""
WITH sc AS ({score_cte}), tr AS ({train}),
tws AS (SELECT string_split_regex(trim({t}), '\\s+') AS ws FROM tr),
tb AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           x -> struct_pack(w1 := ws[x], w2 := ws[x + 1]))) AS b
       FROM tws WHERE len(ws) >= 2),
nbi AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS nb
        FROM tb GROUP BY 1, 2),
npre AS (SELECT w1, SUM(nb) AS np FROM nbi GROUP BY 1),
sws AS (SELECT {i}, string_split_regex(trim({t}), '\\s+') AS ws FROM sc),
sb AS (SELECT {i}, unnest(list_transform(generate_series(1, len(ws) - 1),
           x -> struct_pack(w1 := ws[x], w2 := ws[x + 1]))) AS b
       FROM sws WHERE len(ws) >= 2),
j AS (SELECT sb.{i} AS {i}, nbi.nb, npre.np
      FROM sb LEFT JOIN nbi ON sb.b.w1 = nbi.w1 AND sb.b.w2 = nbi.w2
      LEFT JOIN npre ON sb.b.w1 = npre.w1),
bits AS (SELECT {i}, nb,
                CAST(CASE WHEN nb IS NOT NULL
                     THEN length(bin(np)) - length(bin(nb))
                     WHEN np IS NOT NULL THEN length(bin(np)) + 1
                     ELSE {oov_bits} END AS BIGINT) AS b FROM j),
pd AS (SELECT {i}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              CAST(SUM(b) AS BIGINT) AS total_bits,
              CAST(SUM(CASE WHEN nb IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS oov_bigrams
       FROM bits GROUP BY 1)
SELECT sc.{i} AS {i},
       CAST(COALESCE(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(pd.total_bits, 0) AS BIGINT) AS total_bits,
       CAST(COALESCE(pd.oov_bigrams, 0) AS BIGINT) AS oov_bigrams
FROM sc LEFT JOIN pd USING ({i})
"""


def repeated_ngram_spans(df: DataFrame, text_col: str = 'text',
                         id_col: str = 'doc_id',
                         ngram_words: int = 10) -> DataFrame:
    """Exact repeated-substring detection at ANY alignment (the
    sliding-window form of Lee et al. 2022's exact-substring dedup,
    which :func:`chunk_dedup`'s fixed-grid chunks approximate only for
    aligned copies): a word position is DUPLICATED iff the
    ``ngram_words``-gram starting there occurs more than once in the
    corpus (across docs or within one). Per document::

        (doc_id, n_words, n_grams, dup_grams, max_dup_run)

    ``dup_grams`` counts duplicated n-gram start positions and
    ``max_dup_run`` is the longest consecutive run of them — a run of r
    duplicated starts means an exactly-repeated span of r+ngram_words-1
    words, the quantity a span-removal pass needs. Docs shorter than
    ``ngram_words`` words have 0 grams.

    Scale shape (100 TB): the frequency decision runs on a NARROW
    (xxhash64(gram), 1) projection — ~L rows per doc of 8-byte hashes,
    the price of any-alignment sensitivity (the published tool pays the
    same blowup in a suffix array); the duplicated-hash set comes back
    as a semi-join, and the run-length statistic is ONE per-doc
    sort-within-group (max_by over a window difference — no per-row
    Python). Gram identity is the 64-bit hash, same collision contract
    as :func:`chunk_dedup`.
    """
    w = ngram_words
    if w < 2:
        raise ValueError(f'ngram_words must be >= 2: {w}')
    ws = f"split(trim({text_col}), '\\\\s+')"
    # gram hash WITHOUT materializing gram strings: hash every word once,
    # then hash the w-tuple of word hashes per start position. The split
    # result is bound ONCE as a lambda variable (array-wrap trick, see
    # shingle_ids) — the previous form inlined `split` inside the
    # transform lambda, re-splitting the document at EVERY gram position
    # (O(L²) splits per doc) and allocated a w-word string per position.
    # Same 64-bit gram-identity contract: equal grams ⇒ equal hashes, and
    # distinct grams collide with the same ~2⁻⁶⁴ probability either way
    # (words contain no whitespace, so the joined string was injective).
    hargs = ', '.join(f'element_at(wh, i + {j})' for j in range(1, w + 1))
    gram_h = (f'element_at(transform(array(transform({ws}, '
              f'x -> xxhash64(x))), '
              f'wh -> transform(sequence(0, size(wh) - {w}), '
              f'i -> xxhash64({hargs}))), 1)')
    g = (df.where(F.expr(f'size({ws}) >= {w}'))
         .select(F.col(id_col),
                 F.posexplode(F.expr(gram_h)).alias('idx', '_h'))
         .select(id_col, 'idx', '_h'))
    # duplicated-gram decision as a window count over the hash (one
    # exchange of the gram rows) instead of a groupBy plus a semi-join
    # back — the semi-join form evaluated the whole gram-hash projection
    # TWICE (build side and probe side) and shuffled it twice
    dup = (g.withColumn('_n', F.count('*').over(Window.partitionBy('_h')))
           .where('_n > 1').drop('_n'))
    # consecutive duplicated starts share (idx - rank) — the classic
    # gaps-and-islands grouping, computed inside the per-doc window
    wd = Window.partitionBy(id_col).orderBy('idx')
    runs = (dup.withColumn('_grp', F.col('idx')
                           - F.row_number().over(wd))
            .groupBy(id_col, '_grp').agg(F.count('*').alias('_run')))
    # dup_grams == Σ run lengths, so one per-doc aggregate over the runs
    # yields BOTH statistics (the old form aggregated the dup rows twice
    # and joined the two aggregates back together)
    per_doc = runs.groupBy(id_col).agg(
        F.sum('_run').alias('dup_grams'),
        F.max('_run').alias('max_dup_run'))
    totals = df.select(
        F.col(id_col),
        F.expr(f'CAST(size({ws}) AS BIGINT)').alias('n_words'),
        F.expr(f'CAST(greatest(size({ws}) - {w - 1}, 0) AS BIGINT)')
        .alias('n_grams'))
    return (totals.join(per_doc, id_col, 'left')
            .select(F.col(id_col), 'n_words', 'n_grams',
                    F.coalesce('dup_grams', F.lit(0)).alias('dup_grams'),
                    F.coalesce('max_dup_run', F.lit(0))
                    .alias('max_dup_run')))


def repeated_ngram_spans_oracle_sql(corpus_cte: str,
                                    text_col: str = 'text',
                                    id_col: str = 'doc_id',
                                    ngram_words: int = 10) -> str:
    """DuckDB twin of :func:`repeated_ngram_spans` (groups by the gram
    STRING; same gaps-and-islands run statistic)."""
    w, t, i = ngram_words, text_col, id_col
    return f"""
WITH corpus AS ({corpus_cte}),
ws AS (SELECT {i}, string_split_regex(trim({t}), '\\s+') AS ws
       FROM corpus),
g AS (SELECT {i},
             unnest(generate_series(0, len(ws) - {w})) AS idx,
             unnest(list_transform(generate_series(1, len(ws) - {w - 1}),
                 x -> array_to_string(list_slice(ws, x, x + {w - 1}),
                                      ' '))) AS gram
      FROM ws WHERE len(ws) >= {w}),
duph AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
dup AS (SELECT g.{i} AS {i}, g.idx FROM g SEMI JOIN duph USING (gram)),
runs AS (SELECT {i}, idx - ROW_NUMBER() OVER (PARTITION BY {i}
                ORDER BY idx) AS grp FROM dup),
rl AS (SELECT {i}, grp, COUNT(*) AS run FROM runs GROUP BY 1, 2),
pd AS (SELECT d.{i} AS {i}, COUNT(*) AS dup_grams FROM dup d
       GROUP BY 1),
mx AS (SELECT {i}, MAX(run) AS max_dup_run FROM rl GROUP BY 1),
tot AS (SELECT {i}, CAST(len(ws) AS BIGINT) AS n_words,
               CAST(greatest(len(ws) - {w - 1}, 0) AS BIGINT) AS n_grams
        FROM ws)
SELECT tot.{i} AS {i}, tot.n_words, tot.n_grams,
       CAST(COALESCE(pd.dup_grams, 0) AS BIGINT) AS dup_grams,
       CAST(COALESCE(mx.max_dup_run, 0) AS BIGINT) AS max_dup_run
FROM tot LEFT JOIN pd USING ({i}) LEFT JOIN mx USING ({i})
"""


def contamination_check(df: DataFrame, bench: DataFrame,
                        text_col: str = 'text', id_col: str = 'doc_id',
                        bench_text_col: str = 'text',
                        bench_id_col: str = 'bench_id',
                        ngram_words: int = 8) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    ``ngram_words``-gram with a benchmark/eval set (the GPT-3 appendix-C
    / PaLM 13-gram overlap rule, re-expressed relationally). Output, one
    row per contaminated (document, benchmark item) pair::

        (doc_id, bench_id, n_shared_grams)

    where ``n_shared_grams`` counts DISTINCT shared n-grams — the
    quantity thresholded when deciding to drop the document from
    training data (any hit usually suffices; the count supports
    graduated policies). Clean documents simply don't appear.

    Scale shape (100 TB corpus, ~10^4-10^6 benchmark items): the
    benchmark's distinct (gram-hash, bench_id) table is SMALL and is
    broadcast, so the corpus side is scanned ONCE, map-side — grams are
    exploded, hashed, semi-matched against the broadcast table with NO
    shuffle of corpus data; the only exchange is the final groupBy over
    the (tiny) matched pairs. Gram identity is xxhash64, the same
    collision contract as :func:`chunk_dedup`; the DuckDB oracle joins
    on the gram STRING, so the driver gate also cross-checks that no
    collision fired at test scale. Documents (or benchmark items)
    shorter than ``ngram_words`` words contribute no grams.
    """
    w = ngram_words
    if w < 2:
        raise ValueError(f'ngram_words must be >= 2: {w}')

    def grams(frame, icol, tcol, out_id):
        # split bound once + word-hash-tuple gram hashing (no gram string
        # is ever materialized) — see repeated_ngram_spans for the
        # rationale; the previous inline-split form re-split the document
        # per gram position (O(L²) splits per doc). Collision contract
        # unchanged (xxhash64 gram identity, cross-checked by the oracle's
        # string join at the gate sf).
        ws = f"split(trim({tcol}), '\\\\s+')"
        hargs = ', '.join(f'element_at(wh, i + {j})'
                          for j in range(1, w + 1))
        gram_h = (f'element_at(transform(array(transform({ws}, '
                  f'x -> xxhash64(x))), '
                  f'wh -> transform(sequence(0, size(wh) - {w}), '
                  f'i -> xxhash64({hargs}))), 1)')
        return (frame.where(F.expr(f'size({ws}) >= {w}'))
                .select(F.col(icol).alias(out_id),
                        F.explode(F.expr(gram_h)).alias('_h'))
                .select(out_id, '_h').distinct())

    bg = grams(bench, bench_id_col, bench_text_col, bench_id_col)
    cg = grams(df, id_col, text_col, id_col)
    return (cg.join(F.broadcast(bg), '_h')
            .groupBy(id_col, bench_id_col)
            .agg(F.count('*').alias('n_shared_grams')))


def contamination_check_oracle_sql(corpus_cte: str, bench_cte: str,
                                   text_col: str = 'text',
                                   id_col: str = 'doc_id',
                                   bench_text_col: str = 'text',
                                   bench_id_col: str = 'bench_id',
                                   ngram_words: int = 8) -> str:
    """DuckDB twin of :func:`contamination_check` (joins on the gram
    STRING — exact, collision-free truth)."""
    w = ngram_words

    def grams(cte, icol, tcol, out_id):
        return (f"SELECT DISTINCT {icol} AS {out_id}, "
                f"array_to_string(list_slice(ws, x, x + {w - 1}), ' ') "
                f'AS gram FROM (SELECT {icol}, '
                f"string_split_regex(trim({tcol}), '\\s+') AS ws "
                f'FROM ({cte})) '
                f'CROSS JOIN unnest(generate_series(1, len(ws) - {w - 1})) '
                f't(x) WHERE len(ws) >= {w}')

    return (f'WITH cg AS ({grams(corpus_cte, id_col, text_col, id_col)}), '
            f'bg AS ({grams(bench_cte, bench_id_col, bench_text_col, bench_id_col)}) '
            f'SELECT cg.{id_col} AS {id_col}, bg.{bench_id_col} AS {bench_id_col}, '
            f'COUNT(*) AS n_shared_grams '
            f'FROM cg JOIN bg USING (gram) GROUP BY 1, 2')


def pareto_front(df: DataFrame, x_col: str, y_col: str,
                 bucket_width: int = 1024) -> DataFrame:
    """2-D skyline (Pareto front) under maximize-both strict dominance::

        (x_col, y_col, n_rows)   -- the distinct points no other point
                                 -- dominates; n_rows = multiplicity

    Point b dominates a iff ``b.x >= a.x AND b.y >= a.y`` with at least
    one strict — the standard skyline operator (Börzsönyi et al.,
    ICDE'01: "The Skyline Operator"). Ties ARE skyline points (equal
    points don't dominate each other), which is why the output carries
    the multiplicity instead of exploding duplicates. The corpus use:
    the quality frontier "no other document has both more tokens AND
    more distinct tokens" — the non-dominated set a data-selection pass
    keeps when trading off two quality signals.

    Plan shape (2-D makes the sort-based algorithm distributable with
    NO single-partition window over row-scale data):

    1. ``groupBy(x, y).count()`` — map-side combinable; everything after
       runs on DISTINCT POINTS (domain-bounded, not corpus-bounded).
    2. per-x max y (only the top point of each x-column can survive).
    3. suffix-max of y over strictly greater x, computed bucketed:
       a window PARTITIONED by ``x DIV bucket_width`` (parallel), plus a
       bucket-level suffix-max over the bucket aggregate table — whose
       row count is |x-domain| / bucket_width, the only single-partition
       step and bounded by design, analogous to the driver-side quantile
       table other engines broadcast.
    4. keep (x, maxy) where the strict-suffix max is NULL or < y, join
       multiplicities back.

    Scale shape (10^12 pages): the corpus appears ONLY in step 1's
    partial-aggregated groupBy; steps 2-4 operate on ≤ |X|·|Y|-bounded
    distinct points. Integer inputs, no floating aggregation — the
    DuckDB oracle (brute NOT EXISTS dominance) matches hash-exact.
    """
    if bucket_width < 1:
        raise ValueError(f'bucket_width must be >= 1: {bucket_width}')
    pts = (df.groupBy(F.col(x_col).alias('x'), F.col(y_col).alias('y'))
           .agg(F.count('*').alias('n_rows')))
    colmax = pts.groupBy('x').agg(F.max('y').alias('my'))
    b = colmax.withColumn('_b', F.expr(f'x DIV {bucket_width}'))
    w_in = (Window.partitionBy('_b').orderBy(F.desc('x'))
            .rowsBetween(Window.unboundedPreceding, -1))
    b = b.withColumn('_sfx_in', F.max('my').over(w_in))
    bmax = b.groupBy('_b').agg(F.max('my').alias('_bm'))
    w_b = (Window.orderBy(F.desc('_b'))
           .rowsBetween(Window.unboundedPreceding, -1))
    bmax = bmax.withColumn('_sfx_b', F.max('_bm').over(w_b))
    sky = (b.join(bmax.select('_b', '_sfx_b'), '_b')
           .withColumn('_sfx', F.greatest('_sfx_in', '_sfx_b'))
           .where(F.col('_sfx').isNull() | (F.col('_sfx') < F.col('my')))
           .select('x', F.col('my').alias('y')))
    return (sky.join(pts, ['x', 'y'])
            .select(F.col('x').alias(x_col), F.col('y').alias(y_col),
                    'n_rows'))


def pareto_front_oracle_sql(rows_sql: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`pareto_front`: brute NOT EXISTS dominance
    over the distinct-point table. ``rows_sql`` yields one row per input
    row with columns ``x_col``, ``y_col``."""
    return (
        f'WITH d AS ({rows_sql}), '
        f'pts AS (SELECT {x_col} AS x, {y_col} AS y, COUNT(*) AS c '
        'FROM d GROUP BY 1, 2) '
        f'SELECT a.x AS {x_col}, a.y AS {y_col}, '
        'CAST(a.c AS BIGINT) AS n_rows FROM pts a '
        'WHERE NOT EXISTS (SELECT 1 FROM pts b '
        'WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))'
    )
