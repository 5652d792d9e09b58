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
