"""Distributed rasterize/polygonize conformance vs the single-node kernel,
on the reference's findburn ASCII grid, with tiles small enough that
cross-tile stitching is exercised hard (tile_size=6 over a 21×18 raster).
"""

import numpy as np
import pytest

from buzzard_spark import Footprint
from buzzard_spark.kernels import geometry, raster
from buzzard_spark.operators import raster_ops
from tests.test_kernel_findburn import _GRID


@pytest.fixture(scope='module')
def truth():
    grid = np.asarray([list(line) for line in _GRID.split('\n')])
    return grid != '-'


@pytest.fixture(scope='module')
def fullfp(truth):
    rsize = np.flipud(truth.shape)
    return Footprint(tl=(0, 0), rsize=rsize, size=rsize)


def _polys_df(spark, fullfp, truth):
    polys = raster.find_polygons(fullfp, truth)
    rows = []
    for i, rings in enumerate(polys):
        wkb = geometry.wkb_polygon(rings[0], rings[1:])
        xs = rings[0][:, 0]
        ys = rings[0][:, 1]
        rows.append((i, bytearray(wkb), float(ys.min()), float(xs.min()),
                     float(ys.max()), float(xs.max())))
    return spark.createDataFrame(
        rows, 'region_id long, wkb binary, minlat double, minlng double, '
              'maxlat double, maxlng double')


def test_distributed_rasterize_matches_kernel(spark, fullfp, truth):
    polys_df = _polys_df(spark, fullfp, truth)
    tiles = raster_ops.rasterize(spark, fullfp, polys_df, tile_size=6).collect()
    out = np.zeros(tuple(fullfp.shape), dtype=bool)
    for row in tiles:
        mask = raster_ops._unpack_mask(row['mask'], row['h'], row['w'])
        out[row['y0']:row['y0'] + row['h'], row['x0']:row['x0'] + row['w']] |= mask
    assert (out == truth).all()


def test_distributed_polygonize_matches_kernel(spark, fullfp, truth):
    polys_df = _polys_df(spark, fullfp, truth)
    tiles = raster_ops.rasterize(spark, fullfp, polys_df, tile_size=6)
    result = raster_ops.polygonize(spark, fullfp, tiles, tile_size=6).collect()

    kernel_polys = raster.find_polygons(fullfp, truth)
    assert len(result) == len(kernel_polys)

    total_area = sum(r['area'] for r in result)
    assert total_area == pytest.approx(float(truth.sum()))

    # burn distributed polygons back through the kernel: bit-for-bit mask
    burned = raster.burn_polygons(fullfp, [bytes(r['wkb']) for r in result])
    assert (burned == truth).all()

    # hole preservation survived the distributed path
    assert any(r['n_rings'] > 1 for r in result)


def test_distributed_rasterize_lines_matches_kernel(spark):
    fp = Footprint(tl=(0, 24), size=(30, 24), rsize=(30, 24))
    lines = [
        np.asarray([(2.5, 20.5), (27.5, 20.5)]),
        np.asarray([(5.5, 22.5), (5.5, 3.5), (25.5, 3.5)]),
        np.asarray([(1.2, 1.8), (28.7, 21.9)]),
    ]
    rows = []
    for i, line in enumerate(lines):
        wkb = geometry.wkb_linestring(line)
        rows.append((i, bytearray(wkb),
                     float(line[:, 1].min()), float(line[:, 0].min()),
                     float(line[:, 1].max()), float(line[:, 0].max())))
    lines_df = spark.createDataFrame(
        rows, 'line_id long, wkb binary, minlat double, minlng double, '
              'maxlat double, maxlng double')
    tiles = raster_ops.rasterize_lines(spark, fp, lines_df, tile_size=7)
    out = np.zeros(tuple(fp.shape), dtype=bool)
    for row in tiles.collect():
        mask = raster_ops._unpack_mask(row['mask'], row['h'], row['w'])
        out[row['y0']:row['y0'] + row['h'], row['x0']:row['x0'] + row['w']] |= mask
    truth = raster.burn_lines(fp, lines)
    assert (out == truth).all()


def test_polygonize_empty(spark):
    fp = Footprint(tl=(0, 0), size=(12, 12), rsize=(12, 12))
    empty = spark.createDataFrame([], raster_ops.TILE_SCHEMA)
    assert raster_ops.polygonize(spark, fp, empty, tile_size=6).count() == 0
