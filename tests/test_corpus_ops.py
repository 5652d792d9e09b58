"""Unit tests for buzzard_spark.operators.corpus (chunk-level dedup,
repetition stats, tf-idf top terms)."""

from pyspark.sql import functions as F

from buzzard_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_chunk_dedup_first_occurrence_wins(spark):
    # doc 1 chunk0 == doc 2 chunk1 (with chunk_words=2): the doc-2 copy
    # must be dropped, the doc-1 original kept.
    df = _docs(spark, [
        (1, 'a b c d'),          # chunks: 'a b', 'c d'
        (2, 'x y a b'),          # chunks: 'x y', 'a b' (dup of doc1#0)
        (3, 'c d'),              # chunk:  'c d' (dup of doc1#1)
    ])
    out = {r['doc_id']: r for r in
           corpus.chunk_dedup(df, chunk_words=2).collect()}
    assert out[1]['n_chunks'] == 2 and out[1]['n_kept'] == 2
    assert out[1]['clean_text'] == 'a b c d'
    assert out[2]['n_chunks'] == 2 and out[2]['n_kept'] == 1
    assert out[2]['clean_text'] == 'x y'
    assert out[3]['n_chunks'] == 1 and out[3]['n_kept'] == 0
    assert out[3]['clean_text'] == ''


def test_chunk_dedup_intra_doc_repeats(spark):
    # repeated chunk INSIDE one doc: only the first position survives
    df = _docs(spark, [(7, 'p q p q p q')])
    row = corpus.chunk_dedup(df, chunk_words=2).collect()[0]
    assert row['n_chunks'] == 3
    assert row['n_kept'] == 1
    assert row['clean_text'] == 'p q'


def test_chunk_dedup_partial_tail_chunk_distinct(spark):
    # a shorter tail chunk is NOT equal to a full chunk with same prefix
    df = _docs(spark, [(1, 'a b c'), (2, 'a b')])
    out = {r['doc_id']: r for r in
           corpus.chunk_dedup(df, chunk_words=3).collect()}
    assert out[1]['n_kept'] == 1 and out[1]['clean_text'] == 'a b c'
    assert out[2]['n_kept'] == 1 and out[2]['clean_text'] == 'a b'


def test_chunk_dedup_order_reconstruction(spark):
    # surviving chunks rejoin in document order even when interleaved
    # with removed ones
    df = _docs(spark, [
        (1, 'dup dup'),
        (2, 'u1 u1 dup dup u2 u2'),   # middle chunk removed
    ])
    out = {r['doc_id']: r for r in
           corpus.chunk_dedup(df, chunk_words=2).collect()}
    assert out[2]['clean_text'] == 'u1 u1 u2 u2'
    assert out[2]['n_kept'] == 2


def test_repetition_stats_values_and_ties(spark):
    df = _docs(spark, [
        (1, 'b a b a c'),      # counts: a2 b2 c1 → tie a/b → 'a'
        (2, 'solo'),           # single word: no bigram
    ])
    out = {r['doc_id']: r for r in
           corpus.repetition_stats(df).collect()}
    r1 = out[1]
    assert r1['n_words'] == 5 and r1['n_distinct'] == 3
    assert r1['top_word'] == 'a' and r1['top_word_n'] == 2
    # bigrams: 'b a' x2, 'a b' x1, 'a c' x1 → top 'b a'
    assert r1['top_bigram'] == 'b a' and r1['top_bigram_n'] == 2
    r2 = out[2]
    assert r2['n_words'] == 1 and r2['top_word'] == 'solo'
    assert r2['top_bigram'] == '' and r2['top_bigram_n'] == 0


def test_tfidf_ranking_and_cutoff(spark):
    # 'rare' appears in 1 doc, 'common' in all 3 → rare ranks first
    df = _docs(spark, [
        (1, 'common rare common'),
        (2, 'common other'),
        (3, 'common other'),
    ])
    out = corpus.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r['doc_id'], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r['rnk'])
    assert [r['term'] for r in d1] == ['rare', 'common']
    assert d1[0]['tf'] == 1 and d1[0]['df'] == 1
    assert d1[1]['tf'] == 2 and d1[1]['df'] == 3
    # k cutoff: no doc returns more than 2 rows
    assert all(len(v) <= 2 for v in by_doc.values())
    # ties (same tf/df) break by term ascending
    d2 = sorted(by_doc[2], key=lambda r: r['rnk'])
    assert [r['term'] for r in d2] == ['other', 'common']


def test_tfidf_broadcast_matches_shuffle(spark):
    df = _docs(spark, [(i, f'w{i % 3} shared w{i % 5}') for i in range(30)])
    a = sorted(map(tuple, corpus.tfidf_top_terms(
        df, k=3, broadcast_vocab=True).collect()))
    b = sorted(map(tuple, corpus.tfidf_top_terms(
        df, k=3, broadcast_vocab=False).collect()))
    assert a == b


def test_chunk_dedup_plan_no_python_udf(spark):
    """Hot path stays JVM-side: no BatchEvalPython in the plan."""
    df = _docs(spark, [(1, 'a b c d')])
    plan = corpus.chunk_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert 'BatchEvalPython' not in plan
    assert 'CartesianProduct' not in plan


def _py_chunk_dedup(rows, w):
    """Pure-python oracle: first-occurrence-wins over (doc_id, idx)."""
    chunks = {}
    for doc_id, text in rows:
        ws = text.strip().split()
        for i in range(0, max(1, (len(ws) + w - 1) // w)):
            c = ' '.join(ws[i * w:(i + 1) * w])
            chunks.setdefault(c, []).append((doc_id, i))
    first = {c: min(pos) for c, pos in chunks.items()}
    out = {}
    for doc_id, text in rows:
        ws = text.strip().split()
        n = max(1, (len(ws) + w - 1) // w)
        kept = [(i, ' '.join(ws[i * w:(i + 1) * w])) for i in range(n)
                if first[' '.join(ws[i * w:(i + 1) * w])] == (doc_id, i)]
        out[doc_id] = (n, len(kept), ' '.join(c for _, c in kept))
    return out


def test_chunk_dedup_randomized_vs_python_oracle(spark):
    """Seeded random corpora (small vocab → heavy chunk collisions,
    dup docs, empty-ish docs) == pure-python first-occurrence oracle."""
    import random

    for seed in (7, 41, 1234):
        rng = random.Random(seed)
        vocab = [f'w{i}' for i in range(6)]
        rows = []
        for doc_id in range(40):
            n = rng.randrange(1, 30)
            rows.append((doc_id, ' '.join(rng.choice(vocab)
                                          for _ in range(n))))
        # exact duplicate docs with later ids
        rows += [(100 + i, rows[i][1]) for i in range(5)]
        expect = _py_chunk_dedup(rows, 4)
        df = spark.createDataFrame(rows, 'doc_id long, text string')
        got = {r['doc_id']: (r['n_chunks'], r['n_kept'], r['clean_text'])
               for r in corpus.chunk_dedup(df, chunk_words=4).collect()}
        assert got == expect, f'seed {seed}'


def test_collocations_lift_ranking(spark):
    """'strong tea' (always together, rare words) outranks 'of the'
    (frequent words, frequent pair) under lift; min_count filters hapax."""
    rows = []
    for i in range(10):
        rows.append((i, 'strong tea of the day of the week'))
    rows.append((100, 'hapax pair of the end'))
    df = spark.createDataFrame(rows, 'doc_id long, text string')
    out = corpus.collocations(df, k=5, min_count=2).collect()
    by_rnk = sorted(out, key=lambda r: r['rnk'])
    assert by_rnk[0]['bigram'] == 'strong tea'
    assert by_rnk[0]['n_xy'] == 10
    assert by_rnk[0]['n_left'] == 10 and by_rnk[0]['n_right'] == 10
    # hapax pair (n_xy=1 < min_count) absent
    assert all(r['bigram'] != 'hapax pair' for r in out)
    # 'of the' present but ranked below strong tea (lift 20/(21*21) << 10/100)
    of_the = [r for r in out if r['bigram'] == 'of the']
    assert of_the and of_the[0]['rnk'] > 1


def test_collocations_deterministic_ties(spark):
    """Equal-lift bigrams rank by bigram ascending."""
    df = spark.createDataFrame(
        [(i, 'aa bb cc dd') for i in range(5)], 'doc_id long, text string')
    out = sorted(corpus.collocations(df, k=10, min_count=2).collect(),
                 key=lambda r: r['rnk'])
    # all three bigrams have n_xy=5, n_l=n_r=5 -> equal lift -> lexical
    assert [r['bigram'] for r in out] == ['aa bb', 'bb cc', 'cc dd']


def test_deterministic_sample_invariance(spark):
    """Membership depends only on (id, seed): identical across
    partitionings; different seeds decorrelate; fraction ~ observed."""
    df = spark.range(5000).select(F.col('id').alias('doc_id'))
    a = {r['doc_id'] for r in
         corpus.deterministic_sample(df, 0.3, seed=1).collect()}
    b = {r['doc_id'] for r in corpus.deterministic_sample(
        df.repartition(17), 0.3, seed=1).collect()}
    assert a == b
    c = {r['doc_id'] for r in
         corpus.deterministic_sample(df, 0.3, seed=2).collect()}
    assert c != a
    assert 0.25 < len(a) / 5000 < 0.35


def test_deterministic_sample_stratified(spark):
    df = spark.createDataFrame(
        [(i, 'en' if i % 2 else 'zh') for i in range(2000)],
        'doc_id long, lang string')
    out = corpus.deterministic_sample(
        df, {'en': 0.8, 'zh': 0.1}, strata_col='lang')
    rows = out.collect()
    en = sum(1 for r in rows if r['lang'] == 'en')
    zh = sum(1 for r in rows if r['lang'] == 'zh')
    assert 0.7 < en / 1000 < 0.9
    assert 0.05 < zh / 1000 < 0.16
    # strata subset of listed ones only
    df2 = df.withColumn('lang', F.lit('unlisted'))
    assert corpus.deterministic_sample(
        df2, {'en': 0.8}, strata_col='lang').count() == 0
    # mismatched args rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.deterministic_sample(df, 0.5, strata_col='lang')
    with _pytest.raises(ValueError):
        corpus.deterministic_sample(df, {'en': 0.5})


def test_deterministic_sample_fraction_edges(spark):
    df = spark.range(500).select(F.col('id').alias('doc_id'))
    assert corpus.deterministic_sample(df, 1.0).count() == 500
    assert corpus.deterministic_sample(df, 0.0).count() == 0


def _tfidf_corpus(spark):
    """ADVICE r4's counterexample corpus (N=100): in doc 0, 'mid'
    (tf=10, df=50) outranks 'rare' (tf=1, df=2) under true tf-idf
    (6.93 vs 3.91) but LOSES under the tf/df proxy (0.2 vs 0.5)."""
    docs = [(0, ('rare ' + 'mid ' * 10).strip()), (1, 'rare')]
    docs += [(i, 'mid') for i in range(2, 51)]
    docs += [(i, f'filler{i}') for i in range(51, 100)]
    return _docs(spark, docs)


def test_tfidf_proxy_and_true_rankings_diverge(spark):
    df = _tfidf_corpus(spark)
    proxy = {r['rnk']: r['term'] for r in
             corpus.tfidf_top_terms(df, k=2).collect()
             if r['doc_id'] == 0}
    true = {r['rnk']: r['term'] for r in
            corpus.tfidf_top_terms(df, k=2, rank_by='tfidf').collect()
            if r['doc_id'] == 0}
    assert proxy == {1: 'rare', 2: 'mid'}
    assert true == {1: 'mid', 2: 'rare'}


def test_tfidf_true_ranking_matches_python(spark):
    """rank_by='tfidf' == tf*ln(N/df) ranking computed in python over
    the same tf/df tables, for every doc."""
    import math

    df = _tfidf_corpus(spark)
    got = corpus.tfidf_top_terms(df, k=3, rank_by='tfidf').collect()
    # rebuild tf/df in python
    rows = [(r['doc_id'], r['text']) for r in df.collect()]
    n_docs = len({d for d, _ in rows})
    tf, dfreq = {}, {}
    for d, text in rows:
        terms = text.split()
        for t in terms:
            tf[(d, t)] = tf.get((d, t), 0) + 1
        for t in set(terms):
            dfreq[t] = dfreq.get(t, 0) + 1
    expect = {}
    for d in {d for d, _ in rows}:
        terms = [(t, n) for (dd, t), n in tf.items() if dd == d]
        terms.sort(key=lambda tn: (-tn[1] * math.log(n_docs / dfreq[tn[0]]),
                                   tn[0]))
        expect[d] = [t for t, _ in terms[:3]]
    by_doc = {}
    for r in got:
        by_doc.setdefault(r['doc_id'], []).append((r['rnk'], r['term']))
    for d, pairs in by_doc.items():
        assert [t for _, t in sorted(pairs)] == expect[d], d
        for r in got:
            if r['doc_id'] == d:
                assert r['tf'] == tf[(d, r['term'])]
                assert r['df'] == dfreq[r['term']]


def test_tfidf_rank_by_validation(spark):
    import pytest
    with pytest.raises(ValueError, match='rank_by'):
        corpus.tfidf_top_terms(_docs(spark, [(1, 'a')]), rank_by='bogus')


def test_bigram_coverage_hand_computed(spark):
    """'a b a b' bigrams: (a b)x2, (b a)x1; 'a b c': (a b), (b c);
    with min_df=2 only 'a b' (corpus freq 3) is covered."""
    docs = spark.createDataFrame(
        [(0, 'a b a b'), (1, 'a b c'), (2, 'solo'), (3, '')],
        'doc_id long, text string')
    out = {r['doc_id']: (r['n_bigrams'], r['n_covered'])
           for r in corpus.bigram_coverage(docs, min_df=2).collect()}
    assert out == {0: (3, 2), 1: (2, 1), 2: (0, 0), 3: (0, 0)}


def test_bigram_coverage_min_df_one_covers_everything(spark):
    docs = spark.createDataFrame(
        [(0, 'x y z'), (1, 'p q')], 'doc_id long, text string')
    out = {r['doc_id']: (r['n_bigrams'], r['n_covered'])
           for r in corpus.bigram_coverage(docs, min_df=1).collect()}
    assert out == {0: (2, 2), 1: (1, 1)}


def test_bigram_coverage_randomized_vs_python_oracle(spark):
    import random
    rng = random.Random(11)
    vocab = ['aa', 'bb', 'cc', 'dd', 'ee']
    rows = [(i, ' '.join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 12))))
            for i in range(40)]
    min_df = 4
    from collections import Counter
    per_doc = {}
    corpus_freq = Counter()
    for doc_id, text in rows:
        ws = text.strip().split()
        bgs = [f'{a} {b}' for a, b in zip(ws, ws[1:])]
        per_doc[doc_id] = Counter(bgs)
        corpus_freq.update(bgs)
    expect = {d: (sum(c.values()),
                  sum(m for bg, m in c.items()
                      if corpus_freq[bg] >= min_df))
              for d, c in per_doc.items()}
    docs = spark.createDataFrame(rows, 'doc_id long, text string')
    got = {r['doc_id']: (r['n_bigrams'], r['n_covered'])
           for r in corpus.bigram_coverage(docs, min_df=min_df).collect()}
    assert got == expect


def test_inverted_index_bounded_postings(spark):
    docs = spark.createDataFrame(
        [(3, 'x y x'), (1, 'x z'), (2, 'x')], 'doc_id long, text string')
    out = {r['tok']: (r['df'], r['n_total'], r['postings'])
           for r in corpus.inverted_index(docs, max_postings=2).collect()}
    assert out['x'] == (3, 4, '1,2')   # capped at 2, ascending
    assert out['y'] == (1, 1, '3')
    assert out['z'] == (1, 1, '1')


def test_inverted_index_validates(spark):
    import pytest
    docs = spark.createDataFrame([(1, 'a')], 'doc_id long, text string')
    with pytest.raises(ValueError):
        corpus.inverted_index(docs, max_postings=0)


def test_boilerplate_remove_ratio_and_min_df(spark):
    """A line in >50% of a host's docs is removed everywhere; a line at
    exactly the ratio stays (strict >); min_df=2 protects singletons
    even in tiny groups; groups are independent."""
    df = spark.createDataFrame([
        # host a: 4 docs. 'NAV' in 3/4 (75% > 50%) -> boilerplate.
        # 'half' in 2/4 (exactly 50%, strict >) -> kept.
        (1, 'a', 'NAV\nbody one\nhalf'),
        (2, 'a', 'NAV\nbody two'),
        (3, 'a', 'NAV\nbody three\nhalf'),
        (4, 'a', 'body four'),
        # host b: 1 doc. its only line is 1/1 = 100% but df=1 < min_df.
        (5, 'b', 'NAV'),
    ], 'doc_id long, host string, text string')
    out = {r['doc_id']: r for r in
           corpus.boilerplate_remove(df).collect()}
    assert out[1]['n_lines'] == 3 and out[1]['n_kept'] == 2
    assert out[1]['clean_text'] == 'body one\nhalf'
    assert out[2]['clean_text'] == 'body two'
    assert out[3]['clean_text'] == 'body three\nhalf'
    assert out[4]['clean_text'] == 'body four'
    # host b untouched: df=1 < min_df=2
    assert out[5]['clean_text'] == 'NAV' and out[5]['n_kept'] == 1


def test_boilerplate_remove_all_lines_removed(spark):
    """A doc made entirely of boilerplate comes back empty (n_kept=0,
    clean_text='') rather than vanishing from the output."""
    df = spark.createDataFrame([
        (1, 'a', 'NAV\nFOOTER'),
        (2, 'a', 'NAV\nFOOTER'),
        (3, 'a', 'NAV\nFOOTER'),
    ], 'doc_id long, host string, text string')
    out = {r['doc_id']: r for r in
           corpus.boilerplate_remove(df).collect()}
    assert all(out[i]['n_kept'] == 0 and out[i]['clean_text'] == ''
               and out[i]['n_lines'] == 2 for i in (1, 2, 3))


def test_boilerplate_remove_validates_ratio(spark):
    df = spark.createDataFrame([(1, 'a', 'x')],
                               'doc_id long, host string, text string')
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.boilerplate_remove(df, max_ratio_pct=101)


def _ws_df(spark, n=40, parts=1):
    rows = [(i, 'en' if i % 2 == 0 else 'fr', 10 + (i * 37) % 90)
            for i in range(n)]
    return spark.createDataFrame(
        rows, 'doc_id long, lang string, w long').repartition(parts)


def test_weighted_sample_membership_matches_python_oracle(spark):
    """Priority formula recomputed row-for-row in pure python (hashlib
    md5 + one float division) — membership and priorities must agree."""
    import hashlib
    df = _ws_df(spark)
    rows = df.collect()

    def prio(doc_id, w):
        u32 = int(hashlib.md5(f'{doc_id}:42'.encode())
                  .hexdigest()[:8], 16)
        return float(w) * 4294967296.0 / float(u32 + 1)

    expect = {}
    for lang in ('en', 'fr'):
        scored = sorted(((prio(r['doc_id'], r['w']), r['doc_id'])
                         for r in rows if r['lang'] == lang),
                        key=lambda t: (-t[0], t[1]))
        tau = scored[5][0] if len(scored) > 5 else 0.0
        for p, d in scored[:5]:
            expect[d] = (p, max(p / p * 0.0 + tau,
                                0.0))  # tau per stratum
    got = {r['doc_id']: (r['priority'], r['w_est']) for r in
           corpus.weighted_sample(df, 'w', 5, strata_col='lang').collect()}
    assert set(got) == set(expect)
    for d, (p, tau) in expect.items():
        assert got[d][0] == p
        w = next(r['w'] for r in rows if r['doc_id'] == d)
        assert got[d][1] == max(float(w), tau)


def test_weighted_sample_partitioning_invariant(spark):
    df1, df8 = _ws_df(spark, parts=1), _ws_df(spark, parts=8)
    a = sorted((r['doc_id'], r['priority'], r['w_est']) for r in
               corpus.weighted_sample(df1, 'w', 3,
                                      strata_col='lang').collect())
    b = sorted((r['doc_id'], r['priority'], r['w_est']) for r in
               corpus.weighted_sample(df8, 'w', 3,
                                      strata_col='lang').collect())
    assert a == b


def test_weighted_sample_exhaustive_stratum_and_global(spark):
    df = _ws_df(spark, n=4)          # 2 docs per lang < k=5
    out = corpus.weighted_sample(df, 'w', 5, strata_col='lang').collect()
    assert len(out) == 4
    # exhaustive stratum: tau=0 -> estimator is the exact weight
    assert all(r['w_est'] == float(r['w']) for r in out)
    # global (no strata) path: distributed TakeOrdered, k rows total
    big = _ws_df(spark, n=40, parts=8)
    got = corpus.weighted_sample(big, 'w', 7).collect()
    assert len(got) == 7
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.weighted_sample(big, 'w', 0)


def test_lm_surprisal_truth_table(spark):
    """Hand-computed bits: model on docs 1-2, score 1-4. n_bi(a,b)=2,
    n_bi(b,c)=n_bi(b,d)=1; n_pre(a)=n_pre(b)=2; bits(2)=2, bits(1)=1."""
    train = _docs(spark, [(1, 'a b c'), (2, 'a b d')])
    score = _docs(spark, [(1, 'a b c'), (2, 'a b d'),
                          (3, 'b z q'), (4, 'solo')])
    out = {r['doc_id']: (r['n_bigrams'], r['total_bits'],
                         r['oov_bigrams'])
           for r in corpus.lm_surprisal(score, train=train).collect()}
    # doc1: (a,b) 2-2=0, (b,c) 2-1=1 -> 1 bit
    assert out[1] == (2, 1, 0)
    assert out[2] == (2, 1, 0)
    # doc3: (b,z) known prefix unseen bigram = bits(2)+1 = 3;
    #       (z,q) unknown prefix = 32
    assert out[3] == (2, 35, 2)
    # doc4: no bigrams
    assert out[4] == (0, 0, 0)


def test_lm_surprisal_reference_model_separates_quality(spark):
    """Trained on a fluent reference corpus, word salad scores far more
    bits per bigram than in-distribution text. Also pins the documented
    held-in caveat: under an unsmoothed self-trained MLE, a document of
    hapax bigrams is 'perfectly predicted' (0 bits)."""
    ref = _docs(spark, [
        (1, 'the cat sat on the mat'),
        (2, 'the cat sat on the rug'),
        (3, 'the cat sat on the mat again'),
    ])
    score = _docs(spark, [
        (10, 'the cat sat on the mat'),
        (11, 'zeb qox vrm plu wda xyk'),
    ])
    out = {r['doc_id']: r for r in
           corpus.lm_surprisal(score, train=ref).collect()}
    fluent = out[10]['total_bits'] / out[10]['n_bigrams']
    salad = out[11]['total_bits'] / out[11]['n_bigrams']
    assert out[10]['oov_bigrams'] == 0
    assert out[11]['oov_bigrams'] == 5 and salad == 32.0
    assert fluent < salad
    # held-in caveat: hapax-only doc self-scores 0 bits (P(w2|w1)=1)
    solo = _docs(spark, [(1, 'zeb qox vrm')])
    got = corpus.lm_surprisal(solo).collect()[0]
    assert got['total_bits'] == 0 and got['oov_bigrams'] == 0


def test_repeated_ngram_spans_any_alignment(spark):
    """A copy at an ODD word offset (invisible to fixed-grid chunking)
    is caught: every 3-gram of the shared span is duplicated; run
    length recovers the span length (run + w - 1 words)."""
    #  doc1: words 0..9; doc2 repeats doc1's words 2..8 shifted by 1
    d1 = 'w0 w1 w2 w3 w4 w5 w6 w7 w8 w9'
    d2 = 'x0 w2 w3 w4 w5 w6 w7 w8 y0 y1'
    df = _docs(spark, [(1, d1), (2, d2)])
    out = {r['doc_id']: r for r in
           corpus.repeated_ngram_spans(df, ngram_words=3).collect()}
    # shared span 'w2..w8' = 7 words -> 5 duplicated 3-gram starts,
    # consecutive -> max run 5; span length 5+3-1 = 7 words recovered
    assert out[1]['n_grams'] == 8 and out[1]['dup_grams'] == 5
    assert out[1]['max_dup_run'] == 5
    assert out[2]['dup_grams'] == 5 and out[2]['max_dup_run'] == 5


def test_repeated_ngram_spans_within_doc_and_short(spark):
    df = _docs(spark, [
        (1, 'a b a b a b'),       # within-doc repetition
        (2, 'too short'),         # < ngram_words
        (3, 'p q r s t'),         # all grams unique
    ])
    out = {r['doc_id']: r for r in
           corpus.repeated_ngram_spans(df, ngram_words=3).collect()}
    # doc1 3-grams: 'a b a','b a b','a b a','b a b' -> all 4 duplicated
    assert out[1] and out[1]['dup_grams'] == 4
    assert out[1]['max_dup_run'] == 4
    assert out[2]['n_grams'] == 0 and out[2]['dup_grams'] == 0
    assert out[3]['dup_grams'] == 0 and out[3]['max_dup_run'] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.repeated_ngram_spans(df, ngram_words=1)


def test_incremental_near_pairs_new_vs_index(spark):
    """Incremental dedup finds new-vs-old and new-vs-new pairs, never
    old-vs-old; jaccard values match the batch operator's contract."""
    from buzzard_spark.operators import dedup as dedup_ops
    old = _docs(spark, [
        (1, 'a b c d e f g h i j'),
        (2, 'p q r s t u v w x y'),     # old near-dup of old 1? no
        (3, 'a b c d e f g h i q'),     # old-old near pair with 1
    ])
    new = _docs(spark, [
        (101, 'a b c d e f g h i j'),   # exact copy of old 1
        (102, 'p q r s t u v w x z'),   # near-dup of old 2
        (103, 'm n o aa bb cc dd ee ff gg'),  # unrelated
        (104, 'm n o aa bb cc dd ee ff hh'),  # near-dup of new 103
    ])
    index = dedup_ops.build_dedup_index(old)
    got = {(r['id_a'], r['id_b']): r['jaccard_pm'] for r in
           dedup_ops.incremental_near_pairs(new, index,
                                            threshold=0.5).collect()}
    assert (1, 101) in got and got[(1, 101)] == 1000
    assert (2, 102) in got
    assert (103, 104) in got
    # old-old pair (1,3) has J ~ 0.5+ but must NOT be emitted
    assert all(a > 100 or b > 100 for a, b in got)


def test_incremental_near_pairs_capped_bucket_flood(spark):
    """A flood of identical new docs against one indexed original
    degrades to verified star edges — pair count stays O(n), every
    edge J=1000, and the transitive closure covers the flood."""
    from buzzard_spark.operators import dedup as dedup_ops
    text = 'z1 z2 z3 z4 z5 z6 z7 z8 z9 z10'
    old = _docs(spark, [(1, text)])
    new = _docs(spark, [(100 + i, text) for i in range(30)])
    index = dedup_ops.build_dedup_index(old)
    pairs = dedup_ops.incremental_near_pairs(
        new, index, threshold=0.5, bucket_cap=5).collect()
    assert all(r['jaccard_pm'] == 1000 for r in pairs)
    # star shape: bounded pair count (not the 31*30/2 quadratic set)
    assert len(pairs) <= 60
    # connectivity: every flood member reachable from the bucket min
    ids = {1} | {100 + i for i in range(30)}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for r in pairs:
        parent[find(r['id_a'])] = find(r['id_b'])
    assert len({find(i) for i in ids}) == 1


def test_pareto_front_dominance_ties_and_buckets(spark):
    """Skyline semantics pinned against brute force: anti-correlated
    staircase (all on front), dominated interior points, equal-point
    multiplicity (ties are skyline, counted not exploded), equal-x /
    equal-y strict dominance, and bucket_width=4 so the cross-bucket
    suffix-max path is exercised."""
    from buzzard_spark.operators.corpus import (
        pareto_front, pareto_front_oracle_sql)

    pts = [(100, 1), (80, 5), (60, 9), (40, 13), (20, 17)]  # staircase
    pts += [(79, 5),    # dominated by (80, 5): equal y, smaller x
            (80, 4),    # dominated by (80, 5): equal x, smaller y
            (50, 8), (10, 2)]                       # interior
    rows = pts + [(100, 1), (100, 1)]               # multiplicity 3
    df = spark.createDataFrame(rows, 'x long, y long')
    got = sorted(tuple(r) for r in
                 pareto_front(df, 'x', 'y', bucket_width=4).collect())
    brute = {}
    for p in rows:
        brute[p] = brute.get(p, 0) + 1
    sky = sorted((x, y, n) for (x, y), n in brute.items()
                 if not any(bx >= x and by >= y and (bx > x or by > y)
                            for (bx, by) in brute if (bx, by) != (x, y)))
    assert got == sky
    assert (100, 1, 3) in got            # multiplicity carried
    assert len(got) == 5                 # exactly the staircase

    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    rows_sql = ' UNION ALL '.join(f'SELECT {x} AS x, {y} AS y'
                                  for x, y in rows)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        pareto_front_oracle_sql(rows_sql, 'x', 'y')).fetchall())
    assert got == want

    # bucket width must not change the answer
    for bw in (1, 3, 1000):
        assert sorted(tuple(r) for r in
                      pareto_front(df, 'x', 'y', bucket_width=bw)
                      .collect()) == sky
    with _pytest.raises(ValueError):
        pareto_front(df, 'x', 'y', bucket_width=0)
