"""tile_occurrence truth tables + invariants — ported from the reference
(buzzard/test/test_footprint_tile_occurrence.py). 7×7 lettered grid;
fps.Qg is the centered 3×3 block.
"""

import itertools
import operator

import numpy as np
import pytest

from buzzard_spark import Footprint
from tests.gridtools import make_tile_set, assert_tiles_eq


def is_invalid(tup):
    w, h, pox, poy = tup
    return (
        pox == 0 or poy == 0 or w == 0 or h == 0 or
        pox > w or poy > h or w % pox != 0 or h % poy != 0
    )


LOCI = ['br', 'tr', 'tl', 'bl']
COMBOS = set(itertools.product(range(4), range(4), range(10), range(10)))
FAIL_COMBOS = {tup for tup in COMBOS if is_invalid(tup)}
VALID_COMBOS = COMBOS - FAIL_COMBOS

RANDOM_COMBOS = set(itertools.product(
    [2000, 794], [2000, 794], [796, 795], [796, 795], [2, 3, 4], [2, 3, 4], LOCI))
RANDOM_FAIL = {tup for tup in RANDOM_COMBOS if is_invalid(tup[2:6])}
RANDOM_VALID = RANDOM_COMBOS - RANDOM_FAIL


@pytest.fixture(scope='module')
def fps():
    return make_tile_set(7, [1, -1], [1, -1])


def assert_property_tile_size(src, tiles, size, occx, occy, locus):
    assert np.unique(np.vectorize(operator.attrgetter('w'))(tiles.flatten())).size == 1
    assert np.unique(np.vectorize(operator.attrgetter('h'))(tiles.flatten())).size == 1


def assert_property_pixel_coverage(src, tiles, size, occx, occy, locus):
    mask = np.zeros(src.shape, dtype='int')
    for t in tiles.flatten():
        mask[t.slice_in(src, clip=True)] += 1
    assert (mask == occx * occy).all()


def assert_property_share_area(src, tiles, size, occx, occy, locus):
    border = np.r_[tiles[-1, 1:-1], tiles[0, 1:-1], tiles[:, 0], tiles[:, -1]]
    for t in border:
        assert t.share_area(src)


def assert_property_unique(src, tiles, size, occx, occy, locus):
    tls = np.vectorize(operator.attrgetter('tl'), signature='()->(2)')(tiles.flatten())
    assert np.unique(tls, axis=0).shape[0] == tiles.size


SUCCESS_ASSERTS = [
    assert_property_tile_size,
    assert_property_pixel_coverage,
    assert_property_share_area,
    assert_property_unique,
]


@pytest.mark.parametrize('srcw, srch, w, h, pox, poy, locus', sorted(RANDOM_VALID))
def test_random_success(srcw, srch, w, h, pox, poy, locus):
    fp = Footprint(tl=(0, 0), rsize=(srcw, srch), size=(srcw, srch))
    tiles = fp.tile_occurrence((w, h), pox, poy, boundary_effect_locus=locus)
    for f in SUCCESS_ASSERTS:
        f(fp, tiles, (w, h), pox, poy, locus)


@pytest.mark.parametrize('srcw, srch, w, h, pox, poy, locus', sorted(RANDOM_FAIL))
def test_random_fail(srcw, srch, w, h, pox, poy, locus):
    fp = Footprint(tl=(0, 0), rsize=(srcw, srch), size=(srcw, srch))
    with pytest.raises(ValueError):
        fp.tile_occurrence((w, h), pox, poy, boundary_effect_locus=locus)


@pytest.mark.parametrize('w, h, pox, poy', sorted(FAIL_COMBOS))
def test_fail(fps, w, h, pox, poy):
    with pytest.raises(ValueError):
        fps.Qg.tile_occurrence((w, h), pox, poy)


def _truth(fps, w, h, pox, poy):
    key = (w, h, pox, poy)
    T = {
        (1, 1, 1, 1): [[fps.Q, fps.R, fps.S],
                       [fps.X, fps.Y, fps.Z],
                       [fps.e, fps.f, fps.g]],
        (2, 1, 1, 1): [[fps.QR, fps.ST], [fps.XY, fps.Za], [fps.ef, fps.gh]],
        (2, 1, 2, 1): [[fps.PQ, fps.QR, fps.RS, fps.ST],
                       [fps.WX, fps.XY, fps.YZ, fps.Za],
                       [fps.de, fps.ef, fps.fg, fps.gh]],
        (1, 2, 1, 1): [[fps.QX, fps.RY, fps.SZ], [fps.el, fps.fm, fps.gn]],
        (1, 2, 1, 2): [[fps.JQ, fps.KR, fps.LS], [fps.QX, fps.RY, fps.SZ],
                       [fps.Xe, fps.Yf, fps.Zg], [fps.el, fps.fm, fps.gn]],
        (1, 3, 1, 1): [[fps.Qe, fps.Rf, fps.Sg]],
        (1, 3, 1, 3): [[fps.CQ, fps.DR, fps.ES], [fps.JX, fps.KY, fps.LZ],
                       [fps.Qe, fps.Rf, fps.Sg], [fps.Xl, fps.Ym, fps.Zn],
                       [fps.es, fps.ft, fps.gu]],
        (3, 1, 1, 1): [[fps.QS], [fps.XZ], [fps.eg]],
        (3, 1, 3, 1): [[fps.OQ, fps.PR, fps.QS, fps.RT, fps.SU],
                       [fps.VX, fps.WY, fps.XZ, fps.Ya, fps.Zb],
                       [fps.ce, fps.df, fps.eg, fps.fh, fps.gi]],
        (2, 2, 1, 1): [[fps.QY, fps.Sa], [fps.em, fps.go]],
        (2, 2, 2, 1): [[fps.PX, fps.QY, fps.RZ, fps.Sa],
                       [fps.dl, fps.em, fps.fn, fps.go]],
        (2, 2, 1, 2): [[fps.JR, fps.LT], [fps.QY, fps.Sa],
                       [fps.Xf, fps.Zh], [fps.em, fps.go]],
        (2, 2, 2, 2): [[fps.IQ, fps.JR, fps.KS, fps.LT],
                       [fps.PX, fps.QY, fps.RZ, fps.Sa],
                       [fps.We, fps.Xf, fps.Yg, fps.Zh],
                       [fps.dl, fps.em, fps.fn, fps.go]],
        (2, 3, 1, 1): [[fps.Qf, fps.Sh]],
        (2, 3, 2, 1): [[fps.Pe, fps.Qf, fps.Rg, fps.Sh]],
        (2, 3, 1, 3): [[fps.CR, fps.ET], [fps.JY, fps.La], [fps.Qf, fps.Sh],
                       [fps.Xm, fps.Zo], [fps.et, fps.gv]],
        (2, 3, 2, 3): [[fps.BQ, fps.CR, fps.DS, fps.ET],
                       [fps.IX, fps.JY, fps.KZ, fps.La],
                       [fps.Pe, fps.Qf, fps.Rg, fps.Sh],
                       [fps.Wl, fps.Xm, fps.Yn, fps.Zo],
                       [fps.ds, fps.et, fps.fu, fps.gv]],
        (3, 2, 1, 1): [[fps.QZ], [fps.en]],
        (3, 2, 1, 2): [[fps.JS], [fps.QZ], [fps.Xg], [fps.en]],
        (3, 2, 3, 1): [[fps.OX, fps.PY, fps.QZ, fps.Ra, fps.Sb],
                       [fps.cl, fps.dm, fps.en, fps.fo, fps.gp]],
        (3, 2, 3, 2): [[fps.HQ, fps.IR, fps.JS, fps.KT, fps.LU],
                       [fps.OX, fps.PY, fps.QZ, fps.Ra, fps.Sb],
                       [fps.Ve, fps.Wf, fps.Xg, fps.Yh, fps.Zi],
                       [fps.cl, fps.dm, fps.en, fps.fo, fps.gp]],
        (3, 3, 1, 1): [[fps.Qg]],
        (3, 3, 1, 3): [[fps.CS], [fps.JZ], [fps.Qg], [fps.Xn], [fps.eu]],
        (3, 3, 3, 1): [[fps.Oe, fps.Pf, fps.Qg, fps.Rh, fps.Si]],
        (3, 3, 3, 3): [[fps.AQ, fps.BR, fps.CS, fps.DT, fps.EU],
                       [fps.HX, fps.IY, fps.JZ, fps.Ka, fps.Lb],
                       [fps.Oe, fps.Pf, fps.Qg, fps.Rh, fps.Si],
                       [fps.Vl, fps.Wm, fps.Xn, fps.Yo, fps.Zp],
                       [fps.cs, fps.dt, fps.eu, fps.fv, fps.gw]],
    }
    return T[key]


@pytest.mark.parametrize('w, h, pox, poy', sorted(VALID_COMBOS))
def test_success(fps, w, h, pox, poy):
    truth = _truth(fps, w, h, pox, poy)
    tiles = fps.Qg.tile_occurrence((w, h), pox, poy)
    assert_tiles_eq(tiles, truth)
    for f in SUCCESS_ASSERTS:
        f(fps.Qg, tiles, (w, h), pox, poy, 'tl')


def test_value_error(fps):
    with pytest.raises(ValueError, match='shape'):
        fps.AI.tile_occurrence(1, 1, 1)
    with pytest.raises(ValueError, match='shape'):
        fps.AI.tile_occurrence([1, 1, 1], 1, 1)
    with pytest.raises(ValueError, match='effect'):
        fps.AI.tile_occurrence((1, 1), 1, 1, boundary_effect='')
    with pytest.raises(ValueError, match='effect_locus'):
        fps.AI.tile_occurrence((1, 1), 1, 1, boundary_effect_locus='')
