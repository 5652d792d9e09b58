"""kNN cell-ring expansion vs single-node numpy brute force (F8 oracle),
plus cell-index kernel sanity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from buzzard_spark import synth
from buzzard_spark.functions import sqlgen
from buzzard_spark.kernels import cells
from buzzard_spark.operators import knn as knn_ops


def test_cell_kernel_matches_sql(spark):
    """cells.cell_of (numpy) == cell_sql (Catalyst) on random points."""
    rng = np.random.RandomState(5)
    lat = rng.rand(500) * 170 - 85
    lng = rng.rand(500) * 360 - 180
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)],
        'lat double, lng double')
    got = np.asarray([r[0] for r in df.select(
        F.expr(sqlgen.cell_sql('lat', 'lng', 9))).collect()])
    truth = cells.cell_of(lat, lng, 9)
    assert (got == truth).all()


def test_ring_contains_center_and_wraps():
    c = cells.cell_of(0.0, 179.9, 4)
    ring = cells.ring(c, 1, 4)
    assert int(c) in set(ring.tolist())
    assert len(ring) == 9  # wraps the antimeridian without loss
    # pole clipping
    c = cells.cell_of(89.9, 0.0, 4)
    ring = cells.ring(c, 1, 4)
    assert len(ring) == 6  # top row clipped


def test_parent_children_roundtrip():
    c = cells.cell_of(12.3, 45.6, 9)
    p = cells.parent(c, 9, 7)
    kids = cells.children(p, 7, 9)
    assert int(c) in set(kids.tolist())
    assert len(kids) == 16
    assert cells.parent(kids, 9, 7).tolist() == [int(p)] * 16


def test_cell_bounds_center():
    c = cells.cell_of(10.0, 20.0, 6)
    minlng, minlat, maxlng, maxlat = cells.cell_bounds(c, 6)
    assert minlng <= 20.0 < maxlng
    assert minlat <= 10.0 < maxlat
    clat, clng = cells.cell_center(c, 6)
    assert minlat < clat < maxlat and minlng < clng < maxlng


@pytest.mark.parametrize('n_pages, n_q, k, res, k_ring', [
    (3000, 25, 10, 4, 2),     # dense: ring path settles most queries
    (200, 15, 8, 6, 1),       # sparse: brute-force fallback dominates
])
def test_knn_matches_bruteforce(spark, n_pages, n_q, k, res, k_ring):
    pages = synth.synthetic_pages(spark, n_pages).select(
        'page_id', 'lat', 'lng')
    queries = spark.range(n_q).select(
        F.col('id').alias('qid'),
        F.expr(sqlgen.lat_sql('(id * 7919 + 13)')).alias('qlat'),
        F.expr(sqlgen.lng_sql('(id * 7919 + 13)')).alias('qlng'))

    got = {(r['qid'], r['rnk']): r['page_id']
           for r in knn_ops.knn(pages, queries, k, res, k_ring).collect()}

    p = np.asarray(pages.orderBy('page_id').collect())
    q = np.asarray(queries.orderBy('qid').collect())
    for qi in range(n_q):
        d2 = (p[:, 1] - q[qi, 1]) ** 2 + (p[:, 2] - q[qi, 2]) ** 2
        order = np.lexsort((p[:, 0], d2))[:k]
        for rnk, idx in enumerate(order, 1):
            assert got[(qi, rnk)] == p[idx, 0], (qi, rnk)
    assert len(got) == n_q * k


def test_knn_distributed_fallback_no_driver_collect(spark):
    """Sparse corpus, every query unsettled, broadcast threshold too small
    to admit the driver collect (VERDICT r3 #7): the ring must widen
    DISTRIBUTIVELY (eventually to full grid cover) and still equal brute
    force exactly."""
    n_pages, n_q, k, res = 6, 40, 4, 4
    pages = synth.synthetic_pages(spark, n_pages).select(
        'page_id', 'lat', 'lng')
    queries = spark.range(n_q).select(
        F.col('id').alias('qid'),
        F.expr(sqlgen.lat_sql('(id * 7919 + 13)')).alias('qlat'),
        F.expr(sqlgen.lng_sql('(id * 7919 + 13)')).alias('qlng'))

    got = {(r['qid'], r['rnk']): r['page_id']
           for r in knn_ops.knn(pages, queries, k, res, k_ring=1,
                                broadcast_rows=1).collect()}

    p = np.asarray(pages.orderBy('page_id').collect())
    q = np.asarray(queries.orderBy('qid').collect())
    for qi in range(n_q):
        d2 = (p[:, 1] - q[qi, 1]) ** 2 + (p[:, 2] - q[qi, 2]) ** 2
        order = np.lexsort((p[:, 0], d2))[:k]
        for rnk, idx in enumerate(order, 1):
            assert got[(qi, rnk)] == p[idx, 0], (qi, rnk)
    assert len(got) == n_q * k


def test_assign_cell_null_coords_drop_from_join(spark):
    """NULL lat/lng rows must vanish through the cell equi-join (inner-join
    null semantics), not be seated at a valid cell (ADVICE r3: the round-3
    coalesce(expr, 0) silently mapped them to cell 0)."""
    from buzzard_spark.operators import spatial_join

    pages = spark.createDataFrame(
        [(1, 89.9, -179.9), (2, None, 10.0), (3, 10.0, None)],
        'page_id long, lat double, lng double')
    cells_df = spatial_join.assign_cell(pages, 4)
    vals = {r['page_id']: r['cell'] for r in cells_df.collect()}
    assert vals[1] == 0          # the real cell 0 (north-west corner)
    assert vals[2] == -1 and vals[3] == -1
    regions = synth.regions(spark, 50)
    joined = spatial_join.pip_join_rect(pages, regions, 4)
    assert joined.where(F.col('page_id').isin(2, 3)).count() == 0
