"""Dataset facade: registry, raster round-trips, recipe chaining,
vector scans — the reference's top-level workflow on Spark."""

import numpy as np
import pytest

from buzzard_spark import Footprint, synth
from buzzard_spark.dataset import Dataset


@pytest.fixture()
def ds(spark):
    return Dataset(spark)


def test_raster_create_open_get_set(ds, spark, tmp_path):
    fp = Footprint(tl=(0, 60), size=(60, 60), rsize=(60, 60))
    root = str(tmp_path / 'dem')
    ds.create_raster('dem', root, fp, tile_size=25, dtype='float32',
                     nodata=-1.0, fill=5.0)
    assert (ds['dem'].get_data() == 5.0).all()

    patch_fp = fp.clip(10, 10, 30, 30)
    ds['dem'].set_data(np.full((20, 20), 9.0, 'float32'), patch_fp)
    out = ds['dem'].get_data()
    assert (out[10:30, 10:30] == 9.0).all()
    assert (out[:10, :] == 5.0).all()

    # re-open from stored properties in a fresh registry
    ds2 = Dataset(spark)
    ds2.open_raster('dem', root)
    assert ds2['dem'].fp == fp
    assert np.array_equal(ds2['dem'].get_data(), out)

    # windowed + padded read
    win = ds2['dem'].get_data(fp.dilate(5), dst_nodata=-1.0)
    assert win.shape == (70, 70)
    assert (win[:5, :] == -1.0).all()

    with pytest.raises(ValueError, match='registered'):
        ds.create_raster('dem', root, fp)


def test_recipe_chain(ds, spark, tmp_path):
    fp = Footprint(tl=(0, 60), size=(60, 60), rsize=(60, 60))
    ds.create_raster('base', str(tmp_path / 'base'), fp, tile_size=30,
                     fill=0.0)
    xs, ys = fp.meshgrid_spatial
    ds['base'].set_data((xs + ys).astype('float64'))

    def _blur(tile_fp, window_fp, prims):
        win = prims['src']
        return (win[:-2, 1:-1] + win[2:, 1:-1] +
                win[1:-1, :-2] + win[1:-1, 2:]) / 4.0

    ds.create_cached_raster_recipe(
        'blur', fp, _blur, str(tmp_path / 'blur'), tile_size=30,
        primitives={'src': 'base'}, context_px=1)

    out = ds['blur'].get_data()
    full = xs + ys
    pad = np.pad(full, 1, mode='constant')
    truth = (pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]) / 4.0
    assert np.array_equal(out, truth)

    # lazily cached: second access recomputes nothing
    assert ds['blur'].ensure() == 0

    # ordered pull-stream (queue_data analogue)
    windows = list(ds['blur'].iter_data(
        [fp.clip(0, 0, 10, 10), fp.clip(20, 20, 40, 40)]))
    assert windows[0].shape == (10, 10)
    assert np.array_equal(windows[1], truth[20:40, 20:40])


def test_numpy_wrap(ds, spark):
    fp = Footprint(tl=(0, 40), size=(40, 40), rsize=(40, 40))
    xs, ys = fp.meshgrid_spatial
    arr = (xs * 2 + ys).astype('float32')
    ds.wrap_numpy('mem', fp, arr, tile_size=16)
    assert np.array_equal(ds['mem'].get_data(), arr)
    win = ds['mem'].get_data(fp.clip(5, 5, 25, 25))
    assert np.array_equal(win, arr[5:25, 5:25])


def test_vector_table_insert(ds, spark, tmp_path):
    feats = synth.features(spark, 30)
    ds.create_vector('roads', str(tmp_path / 'roads'), initial_df=feats)
    assert len(ds['roads']) == 30
    more = synth.features(spark, 40).where('fid >= 30')
    ds['roads'].insert_data(more)
    assert len(ds['roads']) == 40
    rows = list(ds['roads'].iter_data(fields=['kind'], slicing=slice(0, 3)))
    assert len(rows) == 3


def test_vector_registry(ds, spark):
    feats = synth.features(spark, 90)
    ds.register_vector('feats', feats)
    assert len(ds['feats']) == 90
    b = ds['feats'].bounds
    assert b[0] < b[2] and b[1] < b[3]
    rows = list(ds['feats'].iter_data(
        fields=['kind'], mask=(-60, -40, 60, 40), slicing=slice(0, 5)))
    assert len(rows) <= 5
    assert all(hasattr(r, 'kind') for r in rows)
