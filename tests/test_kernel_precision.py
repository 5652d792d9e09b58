"""Precision-system tests — ported from the reference
(buzzard/test/test_footprint_precision.py), shapely-free: the reference's
``fp & sg.LineString([p, q])`` becomes an intersection with the segment's
bounds box, which is the same rectangle.
"""

import itertools

import numpy as np
import pytest

import buzzard_spark as buzz
from buzzard_spark import Footprint

LESS_ERROR = 1 / 3
MORE_ERROR = 2

FP1 = Footprint(
    tl=(672939.369686, 6876118.107215),
    size=(24.020000, 24.020000),
    rsize=(1201, 1201),
)

with buzz.Env(significant=15):
    ALL_FPS = [
        FP1,
        FP1.move(-FP1.diagvec / 2),
        FP1.move((1e8, 1e8)),
        FP1.move((1e8, 1e8), (1e8 + 1, 1e8), (1e8 + 1, 1e8 - 1)),
    ]


@pytest.fixture(params=[6, 8, 10])
def sig(request):
    with buzz.Env(significant=request.param):
        yield request.param


@pytest.fixture(params=list(range(len(ALL_FPS))))
def fp(request):
    return ALL_FPS[request.param]


def _bounds_of_segment(p, q):
    xs = [p[0], q[0]]
    ys = [p[1], q[1]]
    return (min(xs), min(ys), max(xs), max(ys))


def test_same_grid_and_move(fp, sig):
    ofp = fp
    if sig < ofp._significant_min + 1:
        pytest.skip()

    for factx, facty in itertools.combinations_with_replacement([-1, 0, +1], 2):
        tl = ofp.tl % ofp.pxsize + 1e9 // ofp.pxsize * ofp.pxsize * [factx, facty]
        fp2 = ofp.move(tl)
        if sig < fp2._significant_min:
            continue
        eps = np.abs(np.r_[fp2.coords, ofp.coords]).max() * 10 ** -buzz.env.significant

        for fx, fy in itertools.combinations_with_replacement([-1, 0, +1], 2):
            fact = np.asarray([fx, fy])
            moved = ofp.move(tl + eps * LESS_ERROR * fact)
            assert ofp.same_grid(moved)
            if (fact != 0).any():
                moved = ofp.move(tl + eps * MORE_ERROR * fact)
                assert not ofp.same_grid(moved)


def test_intersection_and_equals_and_of_extent(fp, sig):
    if sig < fp._significant_min:
        pytest.skip()
    eps = np.abs(fp.coords).max() * 10 ** -buzz.env.significant
    cwr = itertools.combinations_with_replacement

    for ax, ay, bx, by in cwr([-eps * LESS_ERROR, 0, +eps * LESS_ERROR], 4):
        deltas = np.asarray([ax, ay, bx, by])
        box = _bounds_of_segment(fp.tl + [ax, ay], fp.br + [bx, by])
        assert fp.almost_equals(fp & box)
        assert fp.almost_equals(fp.of_extent(fp.extent + deltas, fp.scale))
        if (deltas != 0).any():
            assert fp != fp.of_extent(
                fp.extent + deltas / LESS_ERROR * MORE_ERROR, fp.scale)

    for slacka, slackb in itertools.product(
            [0,
             -fp.pxvec / np.linalg.norm(fp.pxvec) * eps * MORE_ERROR,
             -fp.pxlrvec / np.linalg.norm(fp.pxlrvec) * eps * MORE_ERROR,
             -fp.pxtbvec / np.linalg.norm(fp.pxtbvec) * eps * MORE_ERROR],
            [0,
             fp.pxvec / np.linalg.norm(fp.pxvec) * eps * MORE_ERROR,
             fp.pxlrvec / np.linalg.norm(fp.pxlrvec) * eps * MORE_ERROR,
             fp.pxtbvec / np.linalg.norm(fp.pxtbvec) * eps * MORE_ERROR],
    ):
        if np.isscalar(slacka) and np.isscalar(slackb):
            continue
        box = _bounds_of_segment(fp.tl + slacka, fp.br + slackb)
        assert fp != fp.dilate(2) & box


def test_spatial_to_raster(fp, sig):
    if sig < fp._significant_min:
        pytest.skip()
    rng = np.random.RandomState(42)
    eps = np.abs(fp.coords).max() * 10 ** -buzz.env.significant

    xy = np.dstack(fp.meshgrid_spatial)
    rxy = np.dstack(fp.meshgrid_raster)
    assert np.all(np.equal(rxy, fp.spatial_to_raster(xy)))
    assert np.all(np.equal(
        rxy,
        fp.spatial_to_raster(xy + (rng.rand(*xy.shape) * 2 - 1) * eps * LESS_ERROR)))
    assert not np.all(np.equal(
        rxy,
        fp.spatial_to_raster(xy + (rng.rand(*xy.shape) * 2 - 1) * eps * MORE_ERROR)))
