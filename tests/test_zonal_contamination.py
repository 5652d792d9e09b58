"""Tests for zonal raster statistics and benchmark decontamination."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from buzzard_spark.kernels.footprint import Footprint
from buzzard_spark.operators import corpus
from buzzard_spark.operators import raster_ops


def _docs(spark, rows, idc='doc_id'):
    return spark.createDataFrame(rows, f'{idc} long, text string')


def rect_wkb(minx, miny, maxx, maxy):
    from buzzard_spark.kernels import geometry
    ring = np.asarray([(minx, miny), (maxx, miny), (maxx, maxy),
                       (minx, maxy), (minx, miny)])
    return geometry.wkb_polygon(ring)


def test_contamination_check_pairs_and_counts(spark):
    """Docs sharing >= 1 benchmark n-gram are flagged with the DISTINCT
    shared-gram count; clean and too-short docs are absent."""
    docs = _docs(spark, [
        (1, 'a b c d e f g h i j'),        # 2 shared grams with bench 10
        (2, 'x y z a b c d e f g h q'),    # 1 shared gram with bench 10
        (3, 'p q r s t u v w'),            # clean (own grams only)
        (4, 'a b c'),                      # too short, no grams
    ])
    bench = _docs(spark, [
        (10, 'a b c d e f g h i'),          # grams: 2
        (11, 'zz yy xx ww vv uu tt ss'),     # matches nothing
    ], idc='bench_id')
    got = {(r['doc_id'], r['bench_id']): r['n_shared_grams'] for r in
           corpus.contamination_check(docs, bench).collect()}
    assert got == {(1, 10): 2, (2, 10): 1}


def test_contamination_check_duplicate_grams_counted_once(spark):
    """A gram repeated inside a doc (or bench item) still counts ONCE —
    the contract is distinct shared grams."""
    docs = _docs(spark, [(1, 'a b c d e f g h a b c d e f g h')])
    bench = _docs(spark, [(10, 'a b c d e f g h')], idc='bench_id')
    got = corpus.contamination_check(docs, bench).collect()
    assert len(got) == 1 and got[0]['n_shared_grams'] == 1


def test_contamination_matches_duckdb_oracle(spark):
    """Engine (hash join) == DuckDB oracle (string join) on a corpus with
    overlaps, repeats and short rows."""
    duckdb = pytest.importorskip('duckdb')
    rows = [(i, ' '.join(f'w{(i * 7 + k) % 23}' for k in range(15)))
            for i in range(30)]
    brows = [(100 + i, ' '.join(f'w{(i * 7 + k) % 23}' for k in range(9)))
             for i in range(4)]
    docs, bench = _docs(spark, rows), _docs(spark, brows, idc='bench_id')
    got = sorted(tuple(r) for r in
                 corpus.contamination_check(docs, bench).collect())
    con = duckdb.connect()
    corpus_cte = ' UNION ALL '.join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows)
    bench_cte = ' UNION ALL '.join(
        f"SELECT {i} AS bench_id, '{t}' AS text" for i, t in brows)
    want = sorted(tuple(r) for r in con.execute(
        corpus.contamination_check_oracle_sql(
            corpus_cte, bench_cte)).fetchall())
    assert got == want


def test_contamination_rejects_unigrams(spark):
    with pytest.raises(ValueError):
        corpus.contamination_check(
            _docs(spark, [(1, 'a b')]),
            _docs(spark, [(2, 'a b')], idc='bench_id'), ngram_words=1)


def test_zonal_stats_matches_numpy(spark):
    """Distributed zonal stats over rect zones == whole-array numpy burn
    + masked reductions, including an overlapping zone pair and a zone
    off the grid."""
    fp = Footprint(tl=(0.0, 32.0), size=(48.0, 32.0), rsize=(48, 32))
    from buzzard_spark.kernels import raster as rk

    zones = [
        (0, 2.0, 3.0, 17.5, 21.0),
        (1, 10.0, 10.0, 30.0, 30.0),   # overlaps zone 0
        (2, -20.0, -20.0, -1.0, -1.0),  # fully off-grid
        (3, 40.0, 0.0, 48.0, 32.0),
    ]
    polys = spark.createDataFrame(
        [(z[0], bytearray(rect_wkb(*z[1:])), z[1], z[2], z[3], z[4])
         for z in zones],
        'region_id long, wkb binary, minlng double, minlat double, '
        'maxlng double, maxlat double')
    got = {r['region_id']: (r['n_pixels'], r['v_sum'], r['v_min'],
                            r['v_max'])
           for r in raster_ops.zonal_stats(spark, fp, polys,
                                           tile_size=16).collect()}
    ys = np.arange(32, dtype=np.int64)
    xs = np.arange(48, dtype=np.int64)
    vals = (17 * xs[None, :] + 31 * ys[:, None]) % 97
    want = {}
    for rid, minx, miny, maxx, maxy in zones:
        mask = rk.burn_polygons(fp, [rect_wkb(minx, miny, maxx, maxy)])
        if mask.any():
            mv = vals[mask]
            want[rid] = (int(mask.sum()), int(mv.sum()), int(mv.min()),
                         int(mv.max()))
    assert got == want
    assert 2 not in got


def test_zonal_stats_custom_value_fn(spark):
    """A caller-supplied band function is evaluated at GLOBAL pixel
    coords (tile offsets must not leak in)."""
    fp = Footprint(tl=(0.0, 16.0), size=(32.0, 16.0), rsize=(32, 16))
    polys = spark.createDataFrame(
        [(7, bytearray(rect_wkb(0.0, 0.0, 32.0, 16.0)),
          0.0, 0.0, 32.0, 16.0)],
        'region_id long, wkb binary, minlng double, minlat double, '
        'maxlng double, maxlat double')
    out = raster_ops.zonal_stats(
        spark, fp, polys,
        value_fn=lambda ys, xs: (1000 * ys[:, None]
                                 + xs[None, :]).astype(np.int64),
        tile_size=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r['n_pixels'] == 32 * 16
    assert r['v_min'] == 0 and r['v_max'] == 15 * 1000 + 31
    assert r['v_sum'] == sum(1000 * y + x
                             for y in range(16) for x in range(32))


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_contamination_plan_broadcasts_bench(spark):
    """The bench gram table must be broadcast — the corpus side joins
    map-side with no shuffle before the join; no Python eval nodes."""
    docs = _docs(spark, [(i, 'a b c d e f g h i j') for i in range(50)])
    bench = _docs(spark, [(10, 'a b c d e f g h')], idc='bench_id')
    plan = _plan(corpus.contamination_check(docs, bench))
    assert 'BroadcastHashJoin' in plan
    assert 'SortMergeJoin' not in plan
    assert 'BatchEvalPython' not in plan and 'ArrowEvalPython' not in plan


def test_redact_pii_plan_is_pure_map(spark):
    """Redaction is one codegen projection: no Exchange, no join, no
    Python."""
    from buzzard_spark.operators.text import redact_pii
    docs = _docs(spark, [(1, 'a@b.cc 10.0.0.1 123456789')])
    plan = _plan(redact_pii(docs))
    assert 'Exchange' not in plan
    assert 'Join' not in plan
    assert 'BatchEvalPython' not in plan and 'ArrowEvalPython' not in plan
    # '*(1)' is executedPlan().toString()'s whole-stage-codegen marker
    assert '*(1)' in plan


def test_distance_pairs_plan_single_shuffle_no_cartesian(spark):
    """The ε-join must be ONE equi-join on the cell id — never a
    cartesian/broadcast-nested-loop; the ring explode is Catalyst-side."""
    from buzzard_spark.operators.spatial_join import distance_pairs
    pts = spark.range(0, 1000).selectExpr(
        'id AS page_id',
        'CAST(id % 90 AS DOUBLE) - 45.0 AS lat',
        'CAST(id % 360 AS DOUBLE) - 180.0 AS lng')
    plan = _plan(distance_pairs(pts, 0.5, 6))
    assert 'CartesianProduct' not in plan
    assert 'BroadcastNestedLoopJoin' not in plan
    assert 'BatchEvalPython' not in plan and 'ArrowEvalPython' not in plan
