"""Tiling truth tables — ported bit-for-bit from the reference suite
(buzzard/test/test_footprint_tile.py). The 5×5 lettered grid:

    A B C D E
    F G H I J
    K L M N O
    P Q R S T
    U V W X Y
"""

import itertools

import pytest

from tests.gridtools import make_tile_set, assert_tiles_eq

ANY = 42
EFFECTS = {'extend', 'overlap', 'exclude', 'exception', 'shrink'}
LOCI = {'br', 'tr', 'tl', 'bl'}
COMBOS = {
    (w, h, ow, oh)
    for w, h, ow, oh in itertools.product(range(5), repeat=4)
}
FAIL_COMBOS = {
    (w, h, ow, oh) for w, h, ow, oh in COMBOS
    if w == 0 or h == 0 or ow >= w or oh >= h
}
VALID_COMBOS = COMBOS - FAIL_COMBOS
FIT_XY_COMBOS = {
    (w, h, ow, oh) for w, h, ow, oh in VALID_COMBOS
    if ((w == 3) or (w == 2 and ow == 1) or (w == 1)) and
       ((h == 3) or (h == 2 and oh == 1) or (h == 1))
}
NOFIT_XY_COMBOS = VALID_COMBOS - FIT_XY_COMBOS


@pytest.fixture(scope='module')
def fps():
    return make_tile_set(5, [1, -1], [1, -1])


@pytest.mark.parametrize('w, h, ow, oh', sorted(FAIL_COMBOS))
def test_fail(fps, w, h, ow, oh):
    with pytest.raises(ValueError):
        fps.GS.tile((w, h), ow, oh, boundary_effect='extend')


@pytest.mark.parametrize('w, h, ow, oh', sorted(NOFIT_XY_COMBOS))
@pytest.mark.parametrize('locus', sorted(LOCI))
def test_nofit_xy_exception(fps, w, h, ow, oh, locus):
    with pytest.raises(ValueError, match='There is a gap'):
        fps.GS.tile((w, h), ow, oh,
                    boundary_effect='exception', boundary_effect_locus=locus)


def _fit_truth(fps, w, h, ow, oh):
    if (1, 1, 0, 0) == (w, h, ow, oh):
        return [[fps.G, fps.H, fps.I], [fps.L, fps.M, fps.N], [fps.Q, fps.R, fps.S]]
    if (1, 2, 0, 1) == (w, h, ow, oh):
        return [[fps.GL, fps.HM, fps.IN], [fps.LQ, fps.MR, fps.NS]]
    if (1, 3, 0, ANY) == (w, h, ow, ANY):
        return [[fps.GQ, fps.HR, fps.IS]]
    if (2, 1, 1, 0) == (w, h, ow, oh):
        return [[fps.GH, fps.HI], [fps.LM, fps.MN], [fps.QR, fps.RS]]
    if (2, 2, 1, 1) == (w, h, ow, oh):
        return [[fps.GM, fps.HN], [fps.LR, fps.MS]]
    if (2, 3, 1, ANY) == (w, h, ow, ANY):
        return [[fps.GR, fps.HS]]
    if (3, 1, ANY, 0) == (w, h, ANY, oh):
        return [[fps.GI], [fps.LN], [fps.QS]]
    if (3, 2, ANY, 1) == (w, h, ANY, oh):
        return [[fps.GN], [fps.LS]]
    if (3, 3, ANY, ANY) == (w, h, ANY, ANY):
        return [[fps.GS]]
    raise AssertionError((w, h, ow, oh))


@pytest.mark.parametrize('w, h, ow, oh', sorted(FIT_XY_COMBOS))
@pytest.mark.parametrize('effect', sorted(EFFECTS))
@pytest.mark.parametrize('locus', sorted(LOCI))
def test_fit_xy(fps, w, h, ow, oh, effect, locus):
    truth = _fit_truth(fps, w, h, ow, oh)
    tiles = fps.GS.tile((w, h), ow, oh,
                        boundary_effect=effect, boundary_effect_locus=locus)
    assert_tiles_eq(tiles, truth)


@pytest.mark.parametrize('w, h, ow, oh', sorted(NOFIT_XY_COMBOS))
def test_nofit_xy_br_extend(fps, w, h, ow, oh):
    if (1, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GL, fps.HM, fps.IN], [fps.QV, fps.RW, fps.SX]]
    elif (2, 1, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GH, fps.IJ], [fps.LM, fps.NO], [fps.QR, fps.ST]]
    elif (2, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GM, fps.IO], [fps.QW, fps.SY]]
    elif (2, 2, 0, 1) == (w, h, ow, oh):
        truth = [[fps.GM, fps.IO], [fps.LR, fps.NT]]
    elif (2, 2, 1, 0) == (w, h, ow, oh):
        truth = [[fps.GM, fps.HN], [fps.QW, fps.RX]]
    elif (2, 3, 0, ANY) == (w, h, ow, ANY):
        truth = [[fps.GR, fps.IT]]
    elif (3, 2, ANY, 0) == (w, h, ANY, oh):
        truth = [[fps.GN], [fps.QX]]
    elif (4, 1, ANY, 0) == (w, h, ANY, oh):
        truth = [[fps.GJ], [fps.LO], [fps.QT]]
    elif (4, 2, ANY, 0) == (w, h, ANY, oh):
        truth = [[fps.GO], [fps.QY]]
    elif (4, 2, ANY, 1) == (w, h, ANY, oh):
        truth = [[fps.GO], [fps.LT]]
    elif (4, 3, ANY, ANY) == (w, h, ANY, ANY):
        truth = [[fps.GT]]
    elif (4, 4, ANY, ANY) == (w, h, ANY, ANY):
        truth = [[fps.GY]]
    elif (1, 4, 0, ANY) == (w, h, ow, ANY):
        truth = [[fps.GV, fps.HW, fps.IX]]
    elif (2, 4, 0, ANY) == (w, h, ow, ANY):
        truth = [[fps.GW, fps.IY]]
    elif (2, 4, 1, ANY) == (w, h, ow, ANY):
        truth = [[fps.GW, fps.HX]]
    elif (3, 4, ANY, ANY) == (w, h, ANY, ANY):
        truth = [[fps.GX]]
    else:
        raise AssertionError((w, h, ow, oh))
    tiles = fps.GS.tile((w, h), ow, oh, boundary_effect='extend')
    assert_tiles_eq(tiles, truth)


@pytest.mark.parametrize('w, h, ow, oh', sorted(NOFIT_XY_COMBOS))
def test_nofit_xy_br_overlap(fps, w, h, ow, oh):
    if (1, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GL, fps.HM, fps.IN], [fps.LQ, fps.MR, fps.NS]]
    elif (2, 1, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GH, fps.HI], [fps.LM, fps.MN], [fps.QR, fps.RS]]
    elif (2, 2, ANY, ANY) == (w, h, ANY, ANY):
        truth = [[fps.GM, fps.HN], [fps.LR, fps.MS]]
    elif (2, 3, 0, ANY) == (w, h, ow, ANY):
        truth = [[fps.GR, fps.HS]]
    elif (3, 2, ANY, 0) == (w, h, ANY, oh):
        truth = [[fps.GN], [fps.LS]]
    elif w == 4 or h == 4:
        with pytest.raises(ValueError, match='overlap'):
            fps.GS.tile((w, h), ow, oh, boundary_effect='overlap')
        return
    else:
        raise AssertionError((w, h, ow, oh))
    tiles = fps.GS.tile((w, h), ow, oh, boundary_effect='overlap')
    assert_tiles_eq(tiles, truth)


@pytest.mark.parametrize('w, h, ow, oh', sorted(NOFIT_XY_COMBOS))
def test_nofit_xy_br_exclude(fps, w, h, ow, oh):
    if (1, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GL, fps.HM, fps.IN]]
    elif (2, 1, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GH], [fps.LM], [fps.QR]]
    elif (2, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GM]]
    elif (2, 2, 0, 1) == (w, h, ow, oh):
        truth = [[fps.GM], [fps.LR]]
    elif (2, 2, 1, 0) == (w, h, ow, oh):
        truth = [[fps.GM, fps.HN]]
    elif (2, 3, 0, ANY) == (w, h, ow, ANY):
        truth = [[fps.GR]]
    elif (3, 2, ANY, 0) == (w, h, ANY, oh):
        truth = [[fps.GN]]
    elif w == 4 or h == 4:
        truth = []
    else:
        raise AssertionError((w, h, ow, oh))
    tiles = fps.GS.tile((w, h), ow, oh, boundary_effect='exclude')
    assert_tiles_eq(tiles, truth)


@pytest.mark.parametrize('w, h, ow, oh', sorted(NOFIT_XY_COMBOS))
def test_nofit_xy_br_shrink(fps, w, h, ow, oh):
    if (1, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GL, fps.HM, fps.IN], [fps.Q, fps.R, fps.S]]
    elif (2, 1, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GH, fps.I], [fps.LM, fps.N], [fps.QR, fps.S]]
    elif (2, 2, 0, 0) == (w, h, ow, oh):
        truth = [[fps.GM, fps.IN], [fps.QR, fps.S]]
    elif (2, 2, 0, 1) == (w, h, ow, oh):
        truth = [[fps.GM, fps.IN], [fps.LR, fps.NS]]
    elif (2, 2, 1, 0) == (w, h, ow, oh):
        truth = [[fps.GM, fps.HN], [fps.QR, fps.RS]]
    elif w == 2 and ow == 0 and h in (3, 4):
        truth = [[fps.GR, fps.IS]]
    elif h == 2 and oh == 0 and w in (3, 4):
        truth = [[fps.GN], [fps.QS]]
    elif (w, h) in ((3, 4), (4, 3), (4, 4)):
        truth = [[fps.GS]]
    elif (1, 4, 0, ANY) == (w, h, ow, ANY):
        truth = [[fps.GQ, fps.HR, fps.IS]]
    elif (4, 1, ANY, 0) == (w, h, ANY, oh):
        truth = [[fps.GI], [fps.LN], [fps.QS]]
    elif (4, 2, ANY, 1) == (w, h, ANY, oh):
        truth = [[fps.GN], [fps.LS]]
    elif (2, 4, 1, ANY) == (w, h, ow, ANY):
        truth = [[fps.GR, fps.HS]]
    else:
        raise AssertionError((w, h, ow, oh))
    tiles = fps.GS.tile((w, h), ow, oh, boundary_effect='shrink')
    assert_tiles_eq(tiles, truth)


EXTRA_COMBO = [
    (2, 2, 0, 1, be, bel)
    for be, bel in itertools.product(
        sorted(EFFECTS - {'exception'}), sorted(LOCI - {'br'}))
]


@pytest.mark.parametrize('w, h, ow, oh, effect, locus', EXTRA_COMBO)
def test_extra(fps, w, h, ow, oh, effect, locus):
    assert (w, h, ow, oh) == (2, 2, 0, 1)
    if locus == 'tr':
        truth = {
            'extend': [[fps.GM, fps.IO], [fps.LR, fps.NT]],
            'overlap': [[fps.GM, fps.HN], [fps.LR, fps.MS]],
            'exclude': [[fps.GM], [fps.LR]],
            'shrink': [[fps.GM, fps.IN], [fps.LR, fps.NS]],
        }[effect]
    else:  # tl and bl share truth (x-locus flip only)
        truth = {
            'extend': [[fps.FL, fps.HN], [fps.KQ, fps.MS]],
            'overlap': [[fps.GM, fps.HN], [fps.LR, fps.MS]],
            'exclude': [[fps.HN], [fps.MS]],
            'shrink': [[fps.GL, fps.HN], [fps.LQ, fps.MS]],
        }[effect]
    tiles = fps.GS.tile((w, h), ow, oh,
                        boundary_effect=effect, boundary_effect_locus=locus)
    assert_tiles_eq(tiles, truth)


def test_value_error(fps):
    with pytest.raises(ValueError, match='shape'):
        fps.AI.tile(1)
    with pytest.raises(ValueError, match='shape'):
        fps.AI.tile([1, 1, 1])
    with pytest.raises(ValueError, match='effect'):
        fps.AI.tile((1, 1), boundary_effect='')
    with pytest.raises(ValueError, match='effect_locus'):
        fps.AI.tile((1, 1), boundary_effect_locus='')
