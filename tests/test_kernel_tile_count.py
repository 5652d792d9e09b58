"""tile_count invariants — ported from the reference
(buzzard/test/test_footprint_tile_count.py)."""

import itertools
import operator

import numpy as np
import pytest

from tests.gridtools import make_tile_set

EFFECTS = ['extend', 'overlap', 'exclude', 'exception', 'shrink']
LOCI = ['br', 'tr', 'tl', 'bl']
COMBOS = set(itertools.product(range(4), range(4), range(4), range(4), EFFECTS))
FAIL_COMBOS = {
    (tx, ty, ox, oy, be)
    for (tx, ty, ox, oy, be) in COMBOS
    if tx == 0 or ty == 0
    or tx >= 4 or ty >= 4
    or ox >= 3 or oy >= 3
    or (ox == 2 and tx != 1)
    or (oy == 2 and ty != 1)
    or (ox == 1 and tx >= 3)
    or (oy == 1 and ty >= 3)
    or (be == 'exception' and ((tx == 2 and ox != 1) or (ty == 2 and oy != 1)))
}
VALID_COMBOS = COMBOS - FAIL_COMBOS


@pytest.fixture(scope='module')
def fps():
    return make_tile_set(5, [1, -1], [1, -1])


def assert_property_tile_size(fps, tiles, tx, ty, ox, oy, locus):
    assert np.unique(np.vectorize(operator.attrgetter('w'))(tiles.flatten())).size == 1
    assert np.unique(np.vectorize(operator.attrgetter('h'))(tiles.flatten())).size == 1


def assert_property_overlap(fps, tiles, tx, ty, ox, oy, locus):
    if locus == 'br':
        stride = tiles[0, 0].rsize - (ox, oy)
        refptx, refpty = 'lx', 'ty'
    elif locus == 'tl':
        stride = tiles[-1, -1].rsize - (ox, oy)
        refptx, refpty = 'rx', 'by'
    elif locus == 'tr':
        stride = tiles[-1, 0].rsize - (ox, oy)
        refptx, refpty = 'lx', 'by'
    elif locus == 'bl':
        stride = tiles[0, -1].rsize - (ox, oy)
        refptx, refpty = 'rx', 'ty'
    refptx = operator.attrgetter(refptx)
    refpty = operator.attrgetter(refpty)
    if tiles.shape[0] > 1:
        diffs = np.vectorize(lambda a, b: abs(refpty(a) - refpty(b)))(
            tiles[0:-1], tiles[1:])
        assert (diffs == stride[1]).all()
    if tiles.shape[1] > 1:
        diffs = np.vectorize(lambda a, b: abs(refptx(a) - refptx(b)))(
            tiles[:, 0:-1], tiles[:, 1:])
        assert (diffs == stride[0]).all()


def assert_property_global_bounds(fps, tiles, tx, ty, ox, oy, locus):
    gb = fps.GS.bounds
    for t in tiles.flatten():
        tb = t.bounds
        assert tb[0] >= gb[0] and tb[1] >= gb[1] and tb[2] <= gb[2] and tb[3] <= gb[3]


def assert_property_share_area(fps, tiles, tx, ty, ox, oy, locus):
    border = np.r_[tiles[-1, 1:-1], tiles[0, 1:-1], tiles[:, 0], tiles[:, -1]]
    for t in border:
        assert t.share_area(fps.GS)


def assert_property_full_pixel_coverage(fps, tiles, tx, ty, ox, oy, locus):
    mask = np.zeros(fps.GS.shape, dtype='int')
    for t in tiles.flatten():
        mask[t.slice_in(fps.GS, clip=True)] += 1
    assert (mask > 0).all()


def assert_property_shape(fps, tiles, tx, ty, ox, oy, locus):
    assert tiles.shape == (ty, tx)


def assert_property_unique(fps, tiles, tx, ty, ox, oy, locus):
    tls = np.vectorize(operator.attrgetter('tl'), signature='()->(2)')(tiles.flatten())
    assert np.unique(tls, axis=0).shape[0] == tiles.size


def assert_property_origin(fps, tiles, tx, ty, ox, oy, locus):
    if locus == 'br':
        assert (tiles[0, 0].tl == fps.GS.tl).all()
    elif locus == 'tl':
        assert (tiles[-1, -1].br == fps.GS.br).all()
    elif locus == 'tr':
        assert (tiles[-1, 0].bl == fps.GS.bl).all()
    elif locus == 'bl':
        assert (tiles[0, -1].tr == fps.GS.tr).all()


_PROPS = {
    'extend': [assert_property_tile_size, assert_property_overlap,
               assert_property_full_pixel_coverage, assert_property_shape,
               assert_property_origin, assert_property_share_area,
               assert_property_unique],
    'overlap': [assert_property_tile_size, assert_property_global_bounds,
                assert_property_full_pixel_coverage, assert_property_shape,
                assert_property_origin, assert_property_share_area,
                assert_property_unique],
    'exclude': [assert_property_tile_size, assert_property_overlap,
                assert_property_global_bounds, assert_property_shape,
                assert_property_origin, assert_property_share_area,
                assert_property_unique],
    'shrink': [assert_property_overlap, assert_property_global_bounds,
               assert_property_full_pixel_coverage, assert_property_shape,
               assert_property_origin, assert_property_share_area,
               assert_property_unique],
    'exception': [assert_property_tile_size, assert_property_overlap,
                  assert_property_global_bounds, assert_property_full_pixel_coverage,
                  assert_property_shape, assert_property_origin,
                  assert_property_share_area, assert_property_unique],
}


@pytest.mark.parametrize('tx, ty, ox, oy, be', sorted(FAIL_COMBOS))
@pytest.mark.parametrize('locus', LOCI)
def test_fail(fps, tx, ty, ox, oy, be, locus):
    with pytest.raises(ValueError):
        fps.GS.tile_count(tx, ty, ox, oy,
                          boundary_effect=be, boundary_effect_locus=locus)


@pytest.mark.parametrize('tx, ty, ox, oy, be', sorted(VALID_COMBOS))
@pytest.mark.parametrize('locus', LOCI)
def test_success(fps, tx, ty, ox, oy, be, locus):
    tiles = fps.GS.tile_count(tx, ty, ox, oy,
                              boundary_effect=be, boundary_effect_locus=locus)
    for f in _PROPS[be]:
        f(fps, tiles, tx, ty, ox, oy, locus)


def test_value_error(fps):
    with pytest.raises(ValueError, match='colcount'):
        fps.AI.tile_count(1, -1)
    with pytest.raises(ValueError, match='rowcount'):
        fps.AI.tile_count(-1, 1)
    with pytest.raises(ValueError, match='effect'):
        fps.AI.tile_count(1, 1, boundary_effect='')
    with pytest.raises(ValueError, match='effect_locus'):
        fps.AI.tile_count(1, 1, boundary_effect_locus='')
