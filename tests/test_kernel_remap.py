"""Remap regimes vs hand oracles (golden ramp: value = x + y, the
reference's make_tif2 pattern, buzzard/test/tools.py:159-187)."""

import numpy as np
import pytest

from buzzard_spark import Footprint
from buzzard_spark.kernels import remap


@pytest.fixture()
def src_fp():
    return Footprint(tl=(0, 10), size=(10, 10), rsize=(10, 10))


@pytest.fixture()
def src(src_fp):
    xs, ys = src_fp.meshgrid_spatial
    return (xs + ys).astype('float32')


def test_slice_regime(src_fp, src):
    dst_fp = src_fp.clip(2, 3, 7, 8)
    out = remap.remap(src_fp, dst_fp, array=src, dst_nodata=-1)
    assert out.shape == (5, 5)
    assert np.array_equal(out, src[3:8, 2:7])


def test_copy_regime_pads_nodata(src_fp, src):
    dst_fp = src_fp.move((-3, 13))  # shifted 3 left, 3 up, same grid
    out = remap.remap(src_fp, dst_fp, array=src, dst_nodata=-32000)
    assert out.shape == (10, 10)
    assert (out[:3, :] == -32000).all() and (out[:, :3] == -32000).all()
    assert np.array_equal(out[3:, 3:], src[:7, :7])


def test_nodata_conversion(src_fp, src):
    src2 = src.copy()
    src2[0, 0] = -99
    dst_fp = src_fp.clip(0, 0, 5, 5)
    out = remap.remap(src_fp, dst_fp, array=src2, src_nodata=-99,
                      dst_nodata=-1)
    assert out[0, 0] == -1


def test_interpolate_linear_upsample_exact_on_ramp(src_fp, src):
    # 2x upsample of a linear surface: bilinear reproduces it exactly
    dst_fp = Footprint(tl=(2, 8), size=(6, 6), rsize=(12, 12))
    assert not dst_fp.same_grid(src_fp)
    out = remap.remap(src_fp, dst_fp, array=src, dst_nodata=-32000,
                      interpolation='linear')
    xs, ys = dst_fp.meshgrid_spatial
    truth = (xs + ys).astype('float32')
    inner = out != -32000
    assert inner.sum() > 0.5 * out.size
    assert np.allclose(out[inner], truth[inner])


def test_interpolate_nearest(src_fp, src):
    dst_fp = Footprint(tl=(2, 8), size=(6, 6), rsize=(12, 12))
    out = remap.remap(src_fp, dst_fp, array=src, dst_nodata=-32000,
                      interpolation='nearest')
    valid = out != -32000
    assert valid.any()
    assert set(np.unique(out[valid])).issubset(set(np.unique(src)))


def test_interpolate_nodata_propagates(src_fp, src):
    src2 = src.copy()
    src2[4:6, 4:6] = -99
    dst_fp = Footprint(tl=(0, 10), size=(10, 10), rsize=(20, 20))
    out = remap.remap(src_fp, dst_fp, array=src2, src_nodata=-99,
                      dst_nodata=-1, interpolation='linear')
    assert (out == -1).any()
    assert (out[out != -1] != -99).all()


def test_mask_modes(src_fp):
    mask = np.zeros((10, 10), dtype=bool)
    mask[3:7, 3:7] = True
    dst_fp = Footprint(tl=(0, 10), size=(10, 10), rsize=(20, 20))
    dil = remap.remap(src_fp, dst_fp, mask=mask, dst_nodata=0,
                      mask_mode='dilate', interpolation='linear')
    ero = remap.remap(src_fp, dst_fp, mask=mask, dst_nodata=0,
                      mask_mode='erode', interpolation='linear')
    assert dil.sum() > ero.sum() > 0
    assert (dil | ero == dil).all()  # erode ⊆ dilate


def test_build_sampling_footprint(src_fp):
    outside = Footprint(tl=(100, 100), size=(5, 5), rsize=(5, 5))
    assert remap.build_sampling_footprint(src_fp, outside) is None
    inner = src_fp.clip(1, 1, 5, 5)
    sfp = remap.build_sampling_footprint(src_fp, inner)
    assert sfp == inner
    unaligned = Footprint(tl=(2.5, 8.5), size=(4, 4), rsize=(8, 8))
    sfp = remap.build_sampling_footprint(src_fp, unaligned, 'linear')
    assert sfp.same_grid(src_fp)
    assert sfp.share_area(unaligned)
