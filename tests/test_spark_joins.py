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


def test_dbscan_matches_bruteforce_and_pins_roles(spark):
    """Distributed DBSCAN == pure-python reference on a crafted layout
    exercising all roles: a 6-point dense blob (cores), a chain point in
    reach of one core (border), an isolated pair (noise — degree 1 each),
    a singleton (noise), a NULL-coordinate page (noise via the cell
    sentinel), and a border point between TWO clusters that must take the
    MIN cluster label (the determinism contract)."""
    from buzzard_spark.operators.spatial_join import dbscan

    pts = {
        # blob A around (0, 0) — all 6 within eps=2 of each other
        0: (0.0, 0.0), 1: (0.5, 0.5), 2: (-0.5, 0.5),
        3: (0.5, -0.5), 4: (-0.5, -0.5), 5: (0.0, 0.9),
        # blob B around (0, 10) — 4 points
        10: (0.0, 10.0), 11: (0.5, 10.5), 12: (-0.5, 10.2),
        13: (0.3, 9.6),
        # border of A only: within eps of point 5 but low degree
        20: (0.0, 2.7),
        # bridge border: within eps of blob A's 5 AND blob B's 13 ->
        # must join min(labelA, labelB) = blob A's label (0)
        # (placed at lng 5 is too far; craft: eps=6 variant below)
        # isolated pair (each degree 2 incl self < min_pts=4)
        30: (50.0, 50.0), 31: (50.0, 51.0),
        # singleton
        40: (-70.0, 120.0),
    }
    rows = [(i, la, ln) for i, (la, ln) in pts.items()] + [(99, None, None)]
    df = spark.createDataFrame(rows, 'page_id long, lat double, lng double')
    eps, min_pts = 2.0, 4
    got = {r['page_id']: (r['cluster'], r['role'])
           for r in dbscan(df, eps, min_pts, res=5).collect()}

    # pure-python reference
    import itertools
    ids = list(pts)
    nbrs = {i: {j for j in ids if j != i and
                (pts[i][0] - pts[j][0]) ** 2 +
                (pts[i][1] - pts[j][1]) ** 2 <= eps * eps} for i in ids}
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    lab = {i: i for i in core}
    for _ in ids:
        for a, b in itertools.permutations(core, 2):
            if b in nbrs[a] and lab[b] < lab[a]:
                lab[a] = lab[b]
    want = {}
    for i in ids:
        if i in core:
            want[i] = (lab[i], 'core')
        else:
            cl = [lab[c] for c in nbrs[i] if c in core]
            want[i] = (min(cl), 'border') if cl else (-1, 'noise')
    want[99] = (-1, 'noise')
    assert got == want
    roles = {v[1] for v in got.values()}
    assert roles == {'core', 'border', 'noise'}
    # blob A and blob B are distinct clusters; pair + singleton are noise
    assert got[0][0] != got[10][0]
    assert got[30] == (-1, 'noise') and got[40] == (-1, 'noise')

    import pytest as _pytest
    with _pytest.raises(ValueError):
        dbscan(df, eps, 1, res=5)


def test_dbscan_min_label_border_tiebreak(spark):
    """A border point in eps-reach of two clusters joins the one with the
    smaller label — partitioning/visit-order independent by construction."""
    from buzzard_spark.operators.spatial_join import dbscan
    pts = {
        # cluster with min id 1 (left blob, 4 mutual cores)
        1: (0.0, 0.0), 2: (0.0, 0.8), 3: (0.8, 0.0), 4: (0.8, 0.8),
        # cluster with min id 10 (right blob)
        10: (0.0, 4.0), 11: (0.0, 4.8), 12: (0.8, 4.0), 13: (0.8, 4.8),
        # bridge: reaches EXACTLY 4 (0.8,0.8, d=1.6) and 12 (0.8,4.0,
        # d=1.6); every other point is > eps away (next closest 1.79) —
        # degree 2 + self = 3 < min_pts, so it stays border
        20: (0.8, 2.4),
    }
    eps = 1.7
    rows = [(i, la, ln) for i, (la, ln) in pts.items()]
    df = spark.createDataFrame(rows, 'page_id long, lat double, lng double')
    got = {r['page_id']: (r['cluster'], r['role'])
           for r in dbscan(df, eps, 4, res=6).collect()}
    assert got[1] == (1, 'core') and got[10][1] == 'core'
    # the two blobs must NOT have merged through the low-degree bridge
    assert got[10][0] == 10
    assert got[20] == (1, 'border')   # min(1, 10) = 1


def test_compact_cells_roundtrip_and_merge(spark):
    """compact_cells: a full 2x2 quad merges, a 3/4 quad does not, merges
    cascade upward, and UNCOMPACTING the output (expanding every output
    cell back to res-level children) reproduces the input set exactly —
    the H3 compact/uncompact round-trip contract."""
    from buzzard_spark.kernels import cells as kc
    from buzzard_spark.operators.spatial_join import (
        compact_cells, compact_cells_oracle_sql)

    res = 3
    # a fully covered res-1 cell (16 res-3 descendants) -> cascades to res 1
    deep = list(kc.children(5, 1, res))
    # one full res-2 quad elsewhere (4 cells) -> merges one level
    quad = list(kc.children(200, 2, res))
    # a 3/4 quad -> must NOT merge
    partial = list(kc.children(210, 2, res))[:3]
    inp = sorted(set(int(c) for c in deep + quad + partial))
    df = spark.createDataFrame([(c,) for c in inp], 'cell long')
    got = sorted((r['res'], r['cell'])
                 for r in compact_cells(df, res, min_res=0).collect())
    assert (1, 5) in got
    assert (2, 200) in got
    assert all((3, c) in got for c in partial)
    assert len(got) == 1 + 1 + 3

    # uncompact round-trip
    back = []
    for r, c in got:
        back += [int(x) for x in kc.children(c, r, res)]
    assert sorted(back) == inp

    # oracle agreement on the same set
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    cte = ' UNION ALL '.join(f'SELECT {c} AS cell' for c in inp)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        compact_cells_oracle_sql(cte, res, 0)).fetchall())
    assert got == want

    with _pytest.raises(ValueError):
        compact_cells(df, res, min_res=res + 1)


def test_focal_sum_box_filter_edges_and_values(spark):
    """focal_sum: interior cell sums its full 3x3 neighborhood, corner
    cells clamp (no wrap), radius 0 degenerates to the plain count, and
    the DuckDB self-join oracle agrees."""
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    from buzzard_spark.functions.sqlgen import dlit
    from buzzard_spark.kernels import cells as kc
    from buzzard_spark.operators.spatial_join import (
        focal_sum, focal_sum_oracle_sql)

    res = 2   # 32 x 16 grid
    # pages at specific cells: a 3x3 block of cells around (iy=5, ix=10)
    # with varying counts, plus the north-west corner cell (0, 0)
    def center(iy, ix):
        la, ln = kc.cell_center(iy * 32 + ix, res)
        return float(la), float(ln)

    rows, pid = [], 0
    for (iy, ix, n) in [(4, 9, 1), (4, 10, 2), (4, 11, 3),
                        (5, 9, 4), (5, 10, 5), (5, 11, 6),
                        (6, 9, 7), (6, 10, 8), (6, 11, 9),
                        (0, 0, 2)]:
        la, ln = center(iy, ix)
        for _ in range(n):
            rows.append((pid, la, ln)); pid += 1
    rows.append((pid, None, None))   # NULL coords drop
    df = spark.createDataFrame(rows, 'page_id long, lat double, lng double')
    got = {r['cell']: (r['n_pages'], r['focal_n'])
           for r in focal_sum(df, res, radius=1).collect()}
    assert got[5 * 32 + 10] == (5, 45)          # full 3x3 = 1+..+9
    assert got[0] == (2, 2)                     # corner, no neighbors
    assert got[4 * 32 + 9] == (1, 1 + 2 + 4 + 5)  # corner of the block
    # radius 0 == plain counts
    got0 = {r['cell']: r['focal_n']
            for r in focal_sum(df, res, radius=0).collect()}
    assert all(got0[c] == got[c][0] for c in got0)

    cte = ' UNION ALL '.join(
        f'SELECT {i} AS page_id, {dlit(la)} AS lat, {dlit(ln)} AS lng'
        for i, la, ln in rows if la is not None)
    want = {r[0]: (r[1], r[2]) for r in duckdb.connect().execute(
        focal_sum_oracle_sql(cte, res, 1)).fetchall()}
    assert got == want

    import pytest as _pytest2
    with _pytest2.raises(ValueError):
        focal_sum(df, res, radius=-1)


def test_pip_anti_join_complement(spark):
    """pip_anti_join is the exact complement of pip_join_rect's matched
    id set, and NULL-coordinate pages land outside."""
    from buzzard_spark import synth
    from buzzard_spark.operators.spatial_join import (
        pip_anti_join, pip_join_rect)
    pages = synth.synthetic_pages(spark, 2000).select('page_id', 'lat', 'lng')
    pages = pages.unionByName(spark.createDataFrame(
        [(999999, None, None)], 'page_id long, lat double, lng double'))
    regions = synth.regions(spark, 50)
    inside = {r['page_id']
              for r in pip_join_rect(pages, regions, 4)
              .select('page_id').distinct().collect()}
    outside = {r['page_id']
               for r in pip_anti_join(pages, regions, 4).collect()}
    allids = {r['page_id'] for r in pages.collect()}
    assert inside | outside == allids
    assert inside & outside == set()
    assert 999999 in outside


def test_cell_pyramid_conservation_and_nesting(spark):
    """cell_pyramid: every level's counts sum to the valid-coord corpus
    (mass conservation through the cascade), each parent equals the sum
    of its children, the coarsest level matches a DIRECT aggregation at
    that resolution (grid nesting is exact), and the oracle agrees."""
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    from buzzard_spark import synth
    from buzzard_spark.functions.sqlgen import dlit
    from buzzard_spark.operators.spatial_join import (
        assign_cell, cell_pyramid, cell_pyramid_oracle_sql)

    pages = synth.synthetic_pages(spark, 3000).select('page_id', 'lat', 'lng')
    pages = pages.unionByName(spark.createDataFrame(
        [(99999, None, None)], 'page_id long, lat double, lng double'))
    res = 4
    got = [(r['res'], r['cell'], r['n_pages'])
           for r in cell_pyramid(pages, res, min_res=0).collect()]
    by_level = {}
    for rr, c, n in got:
        by_level.setdefault(rr, {})[c] = n
    assert set(by_level) == set(range(0, res + 1))
    for rr in by_level:
        assert sum(by_level[rr].values()) == 3000, rr   # NULL row dropped
    # parent = sum of children
    for rr in range(res, 0, -1):
        nxc, nxp = 8 << rr, 8 << (rr - 1)
        agg = {}
        for c, n in by_level[rr].items():
            p = ((c // nxc) // 2) * nxp + (c % nxc) // 2
            agg[p] = agg.get(p, 0) + n
        assert agg == by_level[rr - 1], rr
    # coarsest level == direct aggregation at that res (exact nesting)
    direct = {r['cell']: r['n']
              for r in assign_cell(pages, 0).where('cell >= 0')
              .groupBy('cell').count().withColumnRenamed('count', 'n')
              .collect()}
    assert direct == by_level[0]

    rows = [(r['page_id'], r['lat'], r['lng'])
            for r in pages.collect() if r['lat'] is not None][:200]
    cte = ' UNION ALL '.join(
        f'SELECT {i} AS page_id, {dlit(la)} AS lat, {dlit(ln)} AS lng'
        for i, la, ln in rows)
    small = spark.createDataFrame(
        rows, 'page_id long, lat double, lng double')
    got_small = sorted(tuple(r) for r in
                       cell_pyramid(small, 3).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        cell_pyramid_oracle_sql(cte, 3)).fetchall())
    assert got_small == want

    with _pytest.raises(ValueError):
        cell_pyramid(pages, 3, min_res=5)


def test_kmeans_assign_matches_python_lloyd(spark):
    """kmeans_assign == a pure-python Lloyd with the identical contract
    (lowest-id seeds, floored integer coords, exact-sum centroids, min-
    cluster tie-break, empty clusters frozen); NULL coords -> -1; the
    DuckDB unrolled oracle agrees; convergence: one more round leaves a
    converged assignment unchanged."""
    import pytest as _pytest
    duckdb = _pytest.importorskip('duckdb')
    from buzzard_spark.functions.sqlgen import dlit
    from buzzard_spark.operators.spatial_join import (
        kmeans_assign, kmeans_assign_oracle_sql)

    pts = [(i, -40.0 + (i * 37 % 83), -170.0 + (i * 53 % 331) * 1.0)
           for i in range(60)]
    rows = pts + [(999, None, None)]
    df = spark.createDataFrame(rows, 'page_id long, lat double, lng double')
    k, iters, scale = 5, 3, 1_000_000

    def lloyd(n_iters):
        import math
        ipts = [(i, math.floor(la * scale), math.floor(ln * scale))
                for i, la, ln in pts]
        cents = [(j, float(ix), float(iy))
                 for j, (_, ix, iy) in enumerate(sorted(ipts)[:k])]
        assign = {}
        for it in range(n_iters):
            assign = {}
            for i, ix, iy in ipts:
                best = min(cents, key=lambda c: ((ix - c[1]) ** 2 +
                                                 (iy - c[2]) ** 2, c[0]))
                assign[i] = best[0]
            if it == n_iters - 1:
                break
            sums = {}
            for i, ix, iy in ipts:
                c = assign[i]
                sx, sy, n = sums.get(c, (0, 0, 0))
                sums[c] = (sx + ix, sy + iy, n + 1)
            cents = [(c, float(sums[c][0]) / float(sums[c][2]),
                      float(sums[c][1]) / float(sums[c][2]))
                     if c in sums else (c, x, y) for c, x, y in cents]
        return assign

    got = {r['page_id']: r['cluster']
           for r in kmeans_assign(df, k, iters).collect()}
    want = lloyd(iters)
    want[999] = -1
    assert got == want
    assert len({v for v in got.values() if v >= 0}) > 1

    cte = ' UNION ALL '.join(
        f'SELECT {i} AS page_id, {dlit(la)} AS lat, {dlit(ln)} AS lng'
        for i, la, ln in pts)
    oracle = {r[0]: r[1] for r in duckdb.connect().execute(
        kmeans_assign_oracle_sql(cte, k, iters)).fetchall()}
    assert oracle == lloyd(iters)

    # convergence fixed point: iterate python lloyd to convergence, then
    # the engine at that round count +1 must produce the same labels
    prev, n = None, iters
    while True:
        cur = lloyd(n)
        if cur == prev or n > 20:
            break
        prev, n = cur, n + 1
    got_conv = {r['page_id']: r['cluster'] for r in
                kmeans_assign(df, k, n + 1).collect() if r['cluster'] >= 0}
    assert got_conv == cur

    with _pytest.raises(ValueError):
        kmeans_assign(df, 0, 3)
    with _pytest.raises(ValueError):
        kmeans_assign(df, 5, 0)


def test_sample_join_pairs_identity_and_invariance(spark):
    """Bottom-k-by-hash join sample: identical sample under different
    partitionings (determinism contract), a subset of the true join,
    exactly k rows when the join is big enough, whole join when k
    exceeds it."""
    from buzzard_spark import synth
    from buzzard_spark.operators.spatial_join import (
        pip_join_rect, sample_join_pairs)
    pages = synth.synthetic_pages(spark, 3000).select('page_id', 'lat', 'lng')
    regions = synth.regions(spark, 60)
    full = {(r['page_id'], r['region_id'])
            for r in pip_join_rect(pages, regions, 4)
            .select('page_id', 'region_id').collect()}
    assert len(full) > 100
    s1 = sorted(tuple(r) for r in
                sample_join_pairs(pages, regions, 4, 40).collect())
    s2 = sorted(tuple(r) for r in
                sample_join_pairs(pages.repartition(17), regions, 4, 40)
                .collect())
    assert s1 == s2                       # partition invariance
    assert len(s1) == 40
    assert {(a, b) for a, b, _ in s1} <= full
    big = sample_join_pairs(pages, regions, 4, len(full) + 100).collect()
    assert {(r['page_id'], r['region_id']) for r in big} == full

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_join_pairs(pages, regions, 4, 0)
    with _pytest.raises(ValueError):
        sample_join_pairs(pages, regions, 4, 10 ** 9)


def test_nearest_k_refs_matches_brute_and_plan(spark):
    """k-array fold == brute top-k with (dist2, rid) tie order; exact
    ties ranked by id; NULL coords emit nothing; k >= |refs| returns all
    refs ranked; plan is join-free, shuffle-free, Python-free."""
    from buzzard_spark.operators.spatial_join import nearest_k_refs
    cents = [(0, 0.0, 0.0), (1, 10.0, 10.0), (2, 0.0, 20.0),
             (3, 0.0, 10.0)]
    pts = [(100, 5.0, 10.0), (101, -1.0, 1.0), (102, 9.0, 11.0)]
    pages = spark.createDataFrame(
        pts + [(104, None, None)], 'page_id long, lat double, lng double')
    cdf = spark.createDataFrame(
        cents, 'region_id long, clat double, clng double')
    for k in (2, 4, 10):
        got = sorted(tuple(r) for r in
                     nearest_k_refs(pages, cdf, k).collect())
        want = []
        for i, la, ln in pts:
            ds = sorted(((la - a) ** 2 + (ln - b) ** 2, r)
                        for r, a, b in cents)
            want += [(i, j + 1, r, d) for j, (d, r) in
                     enumerate(ds[:k])]
        assert got == sorted(want), k
    # page 100 ties between centroids 1 and 3 -> 1 first
    got2 = {(r['page_id'], r['rnk']): r['region_id']
            for r in nearest_k_refs(pages, cdf, 2).collect()}
    assert got2[(100, 1)] == 1 and got2[(100, 2)] == 3

    out = nearest_k_refs(pages, cdf, 3)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert 'Join' not in p and 'Exchange' not in p
    assert 'BatchEvalPython' not in p and 'ArrowEvalPython' not in p

    import pytest as _pytest
    with _pytest.raises(ValueError):
        nearest_k_refs(pages, cdf, 0)
    with _pytest.raises(ValueError):
        nearest_k_refs(pages, cdf, 100)
