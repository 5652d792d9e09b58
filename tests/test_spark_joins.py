"""Distributed join operators: region-region overlap join conformance."""


def test_rect_overlap_pairs_equals_bruteforce(spark):
    """Cover-cell candidate generation has exact recall: cover join +
    bbox verify == brute all-pairs bbox predicate, including boundary
    touches and a hot oversized rect overlapping many."""
    from buzzard_spark import synth
    from buzzard_spark.operators import spatial_join

    regions = synth.regions(spark, 120)
    got = {(r['id_a'], r['id_b']) for r in
           spatial_join.rect_overlap_pairs(regions, 4).collect()}
    rows = regions.collect()
    brute = set()
    for a in rows:
        for b in rows:
            if a['region_id'] < b['region_id'] and \
               a['minlat'] <= b['maxlat'] and b['minlat'] <= a['maxlat'] and \
               a['minlng'] <= b['maxlng'] and b['minlng'] <= a['maxlng']:
                brute.add((a['region_id'], b['region_id']))
    assert got == brute
    assert brute  # non-trivial: overlaps exist at this density


def test_distance_pairs_matches_bruteforce(spark):
    """ε-join == brute-force all-pairs on a clustered + sparse corpus,
    including pairs straddling cell borders and a NULL-coordinate row."""
    import itertools

    from buzzard_spark.operators.spatial_join import distance_pairs
    pts = [
        (0, 10.0, 20.0), (1, 10.1, 20.1), (2, 10.2, 19.9),   # cluster
        (3, -45.0, 100.0), (4, -45.05, 100.05),              # pair
        (5, 60.0, -170.0),                                    # lonely
        (6, 0.0, 0.0), (7, 0.0, 0.3), (8, 0.3, 0.0),          # border-ish
    ]
    rows = [(i, la, ln) for i, la, ln in pts] + [(9, None, None)]
    df = spark.createDataFrame(
        rows, 'page_id long, lat double, lng double')
    eps = 0.35
    for res in (4, 7):
        got = {(r['id_a'], r['id_b']): r['dist2'] for r in
               distance_pairs(df, eps, res).collect()}
        want = {}
        for (i, la1, ln1), (j, la2, ln2) in itertools.combinations(pts, 2):
            d2 = (la1 - la2) ** 2 + (ln1 - ln2) ** 2
            if d2 <= eps * eps:
                want[(i, j)] = d2
        assert got == want, res


def test_distance_pairs_oracle_sql_agrees(spark):
    """Engine == DuckDB brute-force oracle (identical IEEE dist2)."""
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    from buzzard_spark.operators.spatial_join import (
        distance_pairs, distance_pairs_oracle_sql)
    rows = [(i, (i * 37 % 19) - 9.5, (i * 53 % 36) - 18.0 + i * 0.01)
            for i in range(60)]
    df = spark.createDataFrame(rows, 'page_id long, lat double, lng double')
    got = sorted((r['id_a'], r['id_b'], r['dist2']) for r in
                 distance_pairs(df, 2.5, 5).collect())
    from buzzard_spark.functions.sqlgen import dlit
    cte = ' UNION ALL '.join(
        f'SELECT {i} AS page_id, {dlit(la)} AS lat, '
        f'{dlit(ln)} AS lng' for i, la, ln in rows)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        distance_pairs_oracle_sql(cte, 2.5)).fetchall())
    assert got == want


def test_nearest_region_matches_oracle_and_ties(spark):
    """Fold-expression argmin == DuckDB window argmin, including an
    exact tie (lowest region_id wins) and NULL coords (sentinel -1)."""
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    from buzzard_spark.functions.sqlgen import dlit
    from buzzard_spark.operators.spatial_join import (
        nearest_region, nearest_region_oracle_sql)
    cents = [(0, 0.0, 0.0), (1, 10.0, 10.0), (2, 0.0, 20.0),
             (3, 0.0, 10.0)]   # 1 and 3 equidistant from (5, 10)
    pts = [(100, 5.0, 10.0),   # tie between centroids 1 and 3 -> 1
           (101, -1.0, 1.0), (102, 9.0, 11.0), (103, 1.0, 19.0)]
    pages = spark.createDataFrame(
        pts + [(104, None, None)],
        'page_id long, lat double, lng double')
    cdf = spark.createDataFrame(
        cents, 'region_id long, clat double, clng double')
    got = sorted(tuple(r) for r in nearest_region(pages, cdf).collect())
    assert (104, -1, None) in got
    p_cte = ' UNION ALL '.join(
        f'SELECT {i} AS page_id, {dlit(la)} AS lat, {dlit(ln)} AS lng'
        for i, la, ln in pts)
    c_cte = ' UNION ALL '.join(
        f'SELECT {r} AS region_id, {dlit(a)} AS clat, {dlit(b)} AS clng'
        for r, a, b in cents)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        nearest_region_oracle_sql(p_cte, c_cte)).fetchall())
    assert [g for g in got if g[0] != 104] == want
    assert dict((g[0], g[1]) for g in got)[100] == 1   # tie -> lowest id


def test_nearest_region_plan_no_join_no_exchange(spark):
    """The literal-fold plan is a pure codegen map: no join, no shuffle,
    no Python."""
    from buzzard_spark.operators.spatial_join import nearest_region
    pages = spark.range(0, 5000).selectExpr(
        'id AS page_id', 'CAST(id % 90 AS DOUBLE) - 45.0 AS lat',
        'CAST(id % 360 AS DOUBLE) - 180.0 AS lng')
    cents = spark.range(0, 100).selectExpr(
        'id AS region_id', 'CAST(id % 60 AS DOUBLE) - 30.0 AS clat',
        'CAST(id % 300 AS DOUBLE) - 150.0 AS clng')
    out = nearest_region(pages, cents)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert 'Join' not in p and 'Exchange' not in p
    assert 'BatchEvalPython' not in p and 'ArrowEvalPython' not in p
    assert '*(1)' in p


def test_quadtree_leaves_matches_oracle_and_partitions(spark):
    """Spark hierarchical-rollup quadtree == DuckDB per-level CTE oracle;
    leaves partition the corpus (counts sum to the valid-coord total) and
    a same-cell flood becomes a forced max_res leaf."""
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    from buzzard_spark.functions.sqlgen import dlit
    from buzzard_spark.operators.spatial_join import (
        quadtree_leaves, quadtree_leaves_oracle_sql)
    pts = [(i, 10.0 + (i % 5) * 0.001, 20.0 + (i // 5) * 0.001)
           for i in range(20)]                      # tight flood
    pts += [(200 + i, -40.0 + i * 2.9, -100.0 + i * 3.7)
            for i in range(12)]                     # spread
    rows = pts + [(999, None, None)]
    df = spark.createDataFrame(rows, 'page_id long, lat double, lng double')
    got = sorted(tuple(r) for r in
                 quadtree_leaves(df, cap=4, max_res=5).collect())
    assert sum(r[2] for r in got) == len(pts)       # NULL row dropped
    assert any(r[0] == 5 and r[2] == 20 for r in got)  # forced leaf
    cte = ' UNION ALL '.join(
        f'SELECT {i} AS page_id, {dlit(la)} AS lat, {dlit(ln)} AS lng'
        for i, la, ln in pts)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        quadtree_leaves_oracle_sql(cte, cap=4, max_res=5)).fetchall())
    assert got == want

    with _pytest.raises(ValueError):
        quadtree_leaves(df, cap=0, max_res=5)
    with _pytest.raises(ValueError):
        quadtree_leaves(df, cap=4, max_res=3, res0=4)
