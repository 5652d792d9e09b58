"""Sketches (HLL, Count-Min), URL canonicalization, link extraction,
exact column profiling — Spark vs DuckDB parity plus Python-oracle
truth on randomized inputs."""

import hashlib
import math
import random
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from buzzard_spark.operators import corpus
from buzzard_spark.operators import sketch
from buzzard_spark.operators import text as text_ops


# ---------------------------------------------------------------- HLL

def _py_hll(values_by_group, p):
    """Reference HLL with trailing-zeros rank + linear counting."""
    m = 1 << p
    maxr = 41
    out = {}
    for g, vals in values_by_group.items():
        regs = {}
        for v in set(vals):
            h = hashlib.md5(str(v).encode()).hexdigest()
            w = int(h[:10], 16)
            b = int(h[10:10 + p // 4], 16)
            if w == 0:
                rho = maxr
            else:
                rho = 1
                while not (w >> (rho - 1)) & 1:
                    rho += 1
            regs[b] = max(regs.get(b, 0), rho)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s = sum(1 << (maxr - regs.get(b, 0)) for b in range(m))
        raw = alpha * m * m * float(1 << maxr) / s
        v_empty = m - len(regs)
        if v_empty > 0 and raw <= 2.5 * m:
            est = m * math.log(m / v_empty)
        else:
            est = raw
        out[g] = (int(est // 1), v_empty)
    return out


def test_hll_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [(f'g{i % 3}', f'v{rng.randint(0, 400)}') for i in range(3000)]
    df = spark.createDataFrame(rows, 'g string, v string')
    got = {r['g']: (r['n_hll'], r['v_empty'])
           for r in sketch.approx_distinct(df, 'v', 'g', p=8).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    assert got == _py_hll(by_g, 8)


def test_hll_small_range_accuracy(spark):
    # n ~ 120 distinct with m=256 registers sits squarely in the
    # linear-counting regime; the corrected estimate must be close
    rows = [('g', f'val{i}') for i in range(120) for _ in range(3)]
    df = spark.createDataFrame(rows, 'g string, v string')
    [r] = sketch.approx_distinct(df, 'v', 'g', p=8).collect()
    assert abs(r['n_hll'] - 120) <= 12


def test_hll_oracle_parity_duckdb(spark):
    rows = [(f'g{i % 2}', f'x{(i * i) % 500}') for i in range(2000)]
    df = spark.createDataFrame(rows, 'g string, v string')
    got = sorted(map(tuple,
                     sketch.approx_distinct(df, 'v', 'g', p=4).collect()))
    con = duckdb.connect()
    con.execute('CREATE TABLE t (g VARCHAR, v VARCHAR)')
    con.executemany('INSERT INTO t VALUES (?, ?)', rows)
    want = sorted(map(tuple, con.execute(
        sketch.approx_distinct_oracle_sql('t', 'v', 'g', p=4)).fetchall()))
    assert got == want


def test_hll_p_validation():
    with pytest.raises(ValueError):
        sketch._hll_frags('v', 7, 'spark')
    with pytest.raises(ValueError):
        sketch._hll_frags('v', 16, 'spark')


# ---------------------------------------------------------- Count-Min

def test_count_min_guarantee_and_python_truth(spark):
    rng = random.Random(3)
    vals = [f'k{int(rng.paretovariate(1.2)) % 60}' for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], 'v string')
    got = {r['v']: (r['n_true'], r['cm_est'])
           for r in sketch.count_min_estimates(df, 'v', d=3,
                                               width=32).collect()}
    true = Counter(vals)

    def col(v, i, w=32):
        h = hashlib.md5((v + f':cm{i}:').encode()).hexdigest()
        return int(h[:8], 16) % w

    cells = Counter()
    for v, n in true.items():
        for i in range(3):
            cells[(i, col(v, i))] += n
    for v, n in true.items():
        est = min(cells[(i, col(v, i))] for i in range(3))
        assert got[v] == (n, est)
        assert est >= n  # one-sided error


def test_count_min_exact_when_wide(spark):
    # width far above the vocabulary: no collisions, estimates exact
    rows = [(f'v{i % 10}',) for i in range(300)]
    df = spark.createDataFrame(rows, 'v string')
    for r in sketch.count_min_estimates(df, 'v', d=3, width=4096).collect():
        assert r['cm_est'] == r['n_true'] == 30


# --------------------------------------------- URL canonicalization

def _canon_spark(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], 'u string')
    expr = text_ops.canonical_url_sql('u', 'spark')
    return [r[0] for r in df.select(F.expr(expr)).collect()]


def test_canonical_url_rules(spark):
    got = _canon_spark(spark, [
        'HTTPS://Example.COM:443/Path/X?b=2&a=1#frag',
        'https://example.com/Path/X?a=1&b=2',
        'http://example.com:80',
        'http://example.com/',
        'https://example.com:8443/x',
        'http://example.com/x?',
    ])
    assert got[0] == got[1] == 'https://example.com/Path/X?a=1&b=2'
    assert got[2] == got[3] == 'http://example.com/'
    assert got[4] == 'https://example.com:8443/x'  # non-default port kept
    assert got[5] == 'http://example.com/x'        # bare '?' dropped


def test_canonical_url_duckdb_parity(spark):
    urls = [
        'HTTPS://HOST9.EXAMPLE:443/p/9?z=9&a=1&m=0#x',
        'https://host9.example/p/9?a=1&m=0&z=9',
        'http://a.b:80/c?q=%20x',
        'ftp://Weird.Host:21/file',
        'https://h.e/x?single',
    ]
    got = _canon_spark(spark, urls)
    con = duckdb.connect()
    expr = text_ops.canonical_url_sql('u', 'duckdb')
    want = [con.execute(f"SELECT {expr} FROM (SELECT ? AS u)",
                        [u]).fetchone()[0] for u in urls]
    assert got == want


def test_extract_links(spark):
    df = spark.createDataFrame([
        ('<a href="http://x/1">a</a> <img src="i"/>'
         '<a class="z" href="https://y/2?q=1">b</a>',),
        ('no links here',),
    ], 'html string')
    got = [r[0] for r in df.select(
        F.expr(text_ops.extract_links_sql('html'))).collect()]
    assert got[0] == ['http://x/1', 'https://y/2?q=1']
    assert got[1] == []


# ------------------------------------------------- column_profile

def test_column_profile_discrete_percentiles(spark):
    rows = [('g', v) for v in [5, 1, 9, 3, 7, 7, 2, 8, 6, 4]]
    rows += [('h', 42)]
    df = spark.createDataFrame(rows, 'g string, v long')
    out = {r['g']: r.asDict() for r in
           corpus.column_profile(df, 'v', 'g',
                                 qs=(25, 50, 75, 100)).collect()}
    # sorted g: [1,2,3,4,5,6,7,7,8,9]; rank ceil(p*n/100)
    assert out['g']['n_rows'] == 10
    assert (out['g']['min_v'], out['g']['max_v']) == (1, 9)
    assert out['g']['p25'] == 3   # rank ceil(2.5)=3
    assert out['g']['p50'] == 5   # rank 5
    assert out['g']['p75'] == 7   # rank 8 -> value 7
    assert out['g']['p100'] == 9
    assert out['h']['p25'] == out['h']['p100'] == 42  # n=1: every q


def test_column_profile_validates_qs(spark):
    df = spark.createDataFrame([('g', 1)], 'g string, v long')
    with pytest.raises(ValueError):
        corpus.column_profile(df, 'v', 'g', qs=(0,))
    with pytest.raises(ValueError):
        corpus.column_profile(df, 'v', 'g', qs=(50.5,))


def test_registrable_domain(spark):
    cases = [
        ('a.b.example.co.uk', 'example.co.uk'),
        ('www.example.com', 'example.com'),
        ('example.com', 'example.com'),
        ('x.y.z.site.com.au', 'site.com.au'),
        ('deep.sub.thing.org', 'thing.org'),
        ('localhost', ''),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], 'h string')
    expr = text_ops.registrable_domain_sql('h', 'spark')
    got = [r[0] for r in df.select(F.expr(expr)).collect()]
    assert got == [w for _, w in cases]

    con = duckdb.connect()
    dexpr = text_ops.registrable_domain_sql('h', 'duckdb')
    want = [con.execute(f'SELECT {dexpr} FROM (SELECT ? AS h)',
                        [h]).fetchone()[0] for h, _ in cases]
    assert got == want


def test_canonical_url_schemeless_passthrough(spark):
    got = _canon_spark(spark, [
        '/relative/path#sec', '//cdn.example/x', 'page.html'])
    assert got == ['/relative/path', '//cdn.example/x', 'page.html']


def test_canonical_url_idempotent(spark):
    # frontier requirement: canonicalizing an already-canonical URL is a
    # no-op (otherwise re-crawled URLs fork new frontier entries)
    urls = [
        'HTTPS://Example.COM:443/Path/X?b=2&a=1#frag',
        'http://example.com:80',
        'https://example.com:8443/x?z=1&y=2&x=3',
        '/relative/path#sec',
        '//cdn.example/x',
        'http://a.b/c?q=1&q=0',
    ]
    once = _canon_spark(spark, urls)
    twice = _canon_spark(spark, once)
    assert once == twice


def test_robots_filter_precedence(spark):
    """Longest match wins; allow beats disallow on ties; no rule ->
    allowed; rule-less host -> allowed."""
    urls = spark.createDataFrame([
        ('https://a.x/docs/page',),      # matched by /docs (deny)
        ('https://a.x/docs/pub/ok',),    # longer /docs/pub allow wins
        ('https://a.x/other',),          # no matching prefix
        ('https://b.x/anything',),       # host without rules
        ('https://a.x/tie',),            # equal-length allow+deny: allow
        ('https://a.x',),                # empty path -> '/'
    ], 'url string')
    rules = spark.createDataFrame([
        ('a.x', '/docs', False),
        ('a.x', '/docs/pub', True),
        ('a.x', '/tie', True),
        ('a.x', '/tie', False),
        ('a.x', '/', False),
    ], 'host string, prefix string, allow boolean')
    got = {r['url']: r['allowed']
           for r in text_ops.robots_filter(urls, rules).collect()}
    assert got == {
        'https://a.x/docs/page': False,
        'https://a.x/docs/pub/ok': True,
        'https://a.x/other': False,     # matched by the '/' catch-all
        'https://b.x/anything': True,
        'https://a.x/tie': True,
        'https://a.x': False,           # empty path -> '/' -> deny
    }


def test_frontier_schedule_waves_and_rates(spark):
    """Per-host rate caps wave occupancy; priority orders within host;
    hosts without a rate row fall back to default_rate."""
    urls = spark.createDataFrame(
        [(f'https://a.x/{i}', i) for i in range(5)]
        + [('https://b.x/only', 99)],
        'url string, prio long')
    rates = spark.createDataFrame([('a.x', 2)], 'host string, rate long')
    out = {r['url']: (r['wave'], r['slot'], r['rank_in_host'])
           for r in text_ops.frontier_schedule(
               urls, priority_col='prio', host_rates=rates).collect()}
    # a.x: priority desc -> /4 /3 /2 /1 /0; rate 2 -> waves 0,0,1,1,2
    assert out['https://a.x/4'] == (0, 0, 1)
    assert out['https://a.x/3'] == (0, 1, 2)
    assert out['https://a.x/2'] == (1, 0, 3)
    assert out['https://a.x/1'] == (1, 1, 4)
    assert out['https://a.x/0'] == (2, 0, 5)
    # b.x has no rate row -> default_rate=1, single url -> wave 0
    assert out['https://b.x/only'] == (0, 0, 1)
    # no host exceeds its rate in any wave
    rows = text_ops.frontier_schedule(
        urls, priority_col='prio', host_rates=rates).collect()
    from collections import Counter
    occ = Counter((r['host'], r['wave']) for r in rows)
    assert all(n <= (2 if h == 'a.x' else 1) for (h, _), n in occ.items())


def test_frontier_schedule_deterministic_no_priority(spark):
    urls = spark.createDataFrame(
        [('https://a.x/b',), ('https://a.x/a',)], 'url string')
    out = {r['url']: r['rank_in_host']
           for r in text_ops.frontier_schedule(urls).collect()}
    assert out == {'https://a.x/a': 1, 'https://a.x/b': 2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        text_ops.frontier_schedule(urls, default_rate=0)


def test_anchor_terms_aggregation(spark):
    """Anchor tokens aggregate per target HOST across pages; messy
    spellings of the same host fold via canonicalization; top-k orders
    by count desc then term asc; empty anchors contribute nothing."""
    pages = spark.createDataFrame([
        ('<a href="https://a.x/p">great site</a>'
         '<a href="HTTPS://A.X:443/q#f">great read</a>',),
        ('<a href="https://a.x/p">great</a>'
         '<a href="https://b.x/r">other   place</a>'
         '<a href="https://c.x/s"></a>',),
    ], 'html string')
    rows = text_ops.anchor_terms(pages, k=2).collect()
    got = {(r['dst_host'], r['term']): (r['n'], r['rnk']) for r in rows}
    # a.x: great=3, read=1/site=1 tie -> 'read' wins rank 2 by term asc
    assert got[('a.x', 'great')] == (3, 1)
    assert got[('a.x', 'read')] == (1, 2)
    assert ('a.x', 'site') not in got          # k=2 cut
    assert got[('b.x', 'other')] == (1, 1)
    assert got[('b.x', 'place')] == (1, 2)
    assert not any(h == 'c.x' for h, _ in got)  # empty anchor text


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    """Every true member passes (no false negatives — the bloom
    guarantee); most non-members are pruned at 8 bits/key; membership
    matches a pure-python recompute of the same bloom bit-for-bit."""
    import hashlib
    build_keys = list(range(0, 2000, 20))            # 100 keys
    probe_keys = list(range(1000))                    # 100 members
    build = spark.createDataFrame([(kk,) for kk in build_keys], 'k long')
    probe = spark.createDataFrame([(kk,) for kk in probe_keys], 'k long')
    out = {r['k'] for r in sketch.bloom_filter(
        probe, build, 'k', 'k', m_bits=1024, k=4).collect()}
    members = {kk for kk in probe_keys if kk in set(build_keys)}
    assert members <= out                             # no false negatives
    assert len(out) < 200                             # real pruning

    def positions(key):
        h = hashlib.md5(str(key).encode()).hexdigest()
        return [int(h[4 * j:4 * j + 4], 16) % 1024 for j in range(4)]

    bits = set()
    for kk in build_keys:
        bits.update(positions(kk))
    expect = {kk for kk in probe_keys
              if all(p in bits for p in positions(kk))}
    assert out == expect                              # exact, FPs included


def test_bloom_filter_validates_params(spark):
    df = spark.createDataFrame([(1,)], 'k long')
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sketch.bloom_filter(df, df, 'k', 'k', m_bits=1000)
    with _pytest.raises(ValueError):
        sketch.bloom_filter(df, df, 'k', 'k', k=9)
