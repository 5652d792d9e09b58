"""Rasterize / polygonize round-trip — ported from the reference's ASCII
truth grid (buzzard/test/test_footprint_findburn_polygons.py). shapely-free:
the find test checks mask round-trip + exact area instead of symmetric
difference (equivalent for pixel-aligned polygons).
"""

import numpy as np
import numpy.random as npr
import pytest

from buzzard_spark import Footprint
from buzzard_spark.kernels import geometry, raster

_RANDOM_ORDERING_COUNT = 50

_GRID = """---------------------
---------a-----------
--000000000000000----
--0f--b--------g0----
--0-11111-22222-03---
--0-1---1-2-i-2-0-44-
-90-1-j-1-2-k-2-0-44-
--0-1l--1-2---2c0----
--0-11111d22222-05---
--0e-----------h0----
--000000000000000mmm-
--nnnn--88--6----m-m-
--n--n--88---7---mmm-
--n--n--88-----------
--nnnn------oooo-----
------------o--o-----
------------oooo-----
---------------------"""


@pytest.fixture(scope='module')
def chars_grid():
    return np.asarray([list(line) for line in _GRID.split('\n')])


def _corners_ring(fp):
    return np.asarray([fp.tl, fp.bl, fp.br, fp.tr, fp.tl])


@pytest.fixture(scope='module')
def geometries(chars_grid):
    chars_set = {c for c in _GRID if c not in ['\n', '-']}

    def fp_of_char(c):
        ys, xs = np.where(chars_grid == c)
        minx, maxx = xs.min(), xs.max()
        miny, maxy = ys.min(), ys.max()
        rsize = maxx - minx + 1, maxy - miny + 1
        return Footprint(tl=(minx, -miny), rsize=rsize, size=rsize)

    def rings_of_fp(fp):
        if fp.rarea != fp.rlength:
            return [_corners_ring(fp), _corners_ring(fp.erode(1))]
        return [_corners_ring(fp)]

    return [rings_of_fp(fp_of_char(c)) for c in sorted(chars_set)]


@pytest.fixture(scope='module')
def truth(chars_grid):
    return chars_grid != '-'


@pytest.fixture(scope='module')
def fullfp(truth):
    rsize = np.flipud(truth.shape)
    return Footprint(tl=(0, 0), rsize=rsize, size=rsize)


def seeds():
    rng = npr.RandomState(42)
    return list(rng.randint(0, 10000, _RANDOM_ORDERING_COUNT))


@pytest.mark.parametrize('seed', seeds())
def test_burn(fullfp, geometries, truth, seed):
    geoms = list(geometries)
    npr.RandomState(seed).shuffle(geoms)
    res = raster.burn_polygons(fullfp, geoms)
    assert (res == truth).all()


def test_burn_wkb(fullfp, geometries, truth):
    wkbs = [geometry.wkb_polygon(g[0], g[1:]) for g in geometries]
    res = raster.burn_polygons(fullfp, wkbs)
    assert (res == truth).all()


def test_find_roundtrip(fullfp, truth):
    polys = raster.find_polygons(fullfp, truth)
    # 1. exact area: total polygon area == burned pixel count
    total_area = sum(geometry.polygon_area(rings) for rings in polys)
    assert total_area == pytest.approx(float(truth.sum()))
    # 2. burning the found polygons reproduces the mask bit-for-bit
    res = raster.burn_polygons(fullfp, polys)
    assert (res == truth).all()
    # 3. holes preserved: the grid has ring shapes -> some polygon has holes
    assert any(len(rings) > 1 for rings in polys)


def test_find_labelize_count(fullfp, truth):
    polys = raster.find_polygons(fullfp, truth)
    labels, n = raster._label_components(truth)
    assert len(polys) == n


def test_burn_labelize(fullfp):
    r1 = [np.asarray([(1., 0.), (5., 0.), (5., -4.), (1., -4.), (1., 0.)])]
    r2 = [np.asarray([(8., 0.), (12., 0.), (12., -4.), (8., -4.), (8., 0.)])]
    out = raster.burn_polygons(fullfp, [r1, r2], labelize=True)
    assert out.dtype == np.uint8
    assert set(np.unique(out)) == {0, 1, 2}
    assert out[2, 2] == 1 and out[2, 9] == 2


def test_slopes_flat_and_ramp():
    fp = Footprint(tl=(0, 10), size=(10, 10), rsize=(10, 10))
    flat = np.full((10, 10), 7.0)
    assert (raster.slopes(fp, flat) == 0).all()
    xramp = np.tile(np.arange(10, dtype='float64'), (10, 1))
    s = raster.slopes(fp, xramp, crop=True)
    assert s.shape == (8, 8)
    assert np.allclose(s, 45.0)


def test_burn_find_lines_roundtrip():
    fp = Footprint(tl=(0, 20), size=(20, 20), rsize=(20, 20))
    line = np.asarray([(2.5, 17.5), (12.5, 17.5), (12.5, 5.5)])
    mask = raster.burn_lines(fp, [line])
    assert mask.any()
    lines = raster.find_lines(fp, mask)
    # merged into a small number of polylines covering the same pixels
    mask2 = raster.burn_lines(fp, lines)
    assert (mask2 == mask).all()
