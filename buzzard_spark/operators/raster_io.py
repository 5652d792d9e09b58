"""Windowed raster read / masked write over tile tables.

The distributed re-expression of the reference's synchronous IO path
(reference: buzzard/_a_source_raster.py:52-188 get_data,
buzzard/_a_stored_raster.py:17-155 set_data):

- ``get_data``: sampling-window plan (kernel) → Catalyst predicate on the
  tile table's pixel-range columns (partition/row-group pruning — the
  distributed ``ReadAsArray(x, y, w, h)`` pushdown) → driver stitch →
  kernel remap (slice/copy/interpolate regimes).
- ``set_data``: masked, remapped read-modify-write per intersecting tile —
  appended as a new snapshot; readers resolve "latest snapshot wins" per
  tile key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from buzzard_spark.kernels import remap as remap_k
from buzzard_spark.operators.recipe import DATA_TILE_SCHEMA
from buzzard_spark.sources.snapshot_table import SnapshotTable


def _pixel_window(raster_fp, sfp):
    x0, y0 = raster_fp.spatial_to_raster(sfp.tl)
    return int(x0), int(y0), sfp.rsizex, sfp.rsizey


def get_data(spark: SparkSession, tiles: DataFrame, raster_fp,
             request_fp=None, nodata=None, dst_nodata=None,
             interpolation='linear') -> np.ndarray:
    """Windowed read: returns the request window as one ndarray, padded
    with nodata outside the raster (the reference's default chain
    dst_nodata → raster nodata → 0)."""
    fp = request_fp if request_fp is not None else raster_fp
    onodata = dst_nodata if dst_nodata is not None else (
        nodata if nodata is not None else 0)

    sfp = remap_k.build_sampling_footprint(raster_fp, fp, interpolation)
    sample_dtype = None
    if sfp is None:
        rows = []
    else:
        x0, y0, w, h = _pixel_window(raster_fp, sfp)
        rows = (tiles.where(
            (F.col('x0') < x0 + w) & (F.col('x0') + F.col('w') > x0) &
            (F.col('y0') < y0 + h) & (F.col('y0') + F.col('h') > y0))
            .collect())
    if not rows:
        return np.full(tuple(fp.shape), onodata)

    sample_dtype = np.dtype(rows[0]['dtype'])
    fill = nodata if nodata is not None else 0
    sample = np.full(tuple(sfp.shape), fill, dtype=sample_dtype)
    for row in rows:
        arr = np.frombuffer(bytes(row['data']),
                            dtype=np.dtype(row['dtype'])).reshape(
                                row['h'], row['w'])
        ty0, tx0 = row['y0'] - y0, row['x0'] - x0
        sy0, sx0 = max(0, ty0), max(0, tx0)
        sy1 = min(h, ty0 + row['h'])
        sx1 = min(w, tx0 + row['w'])
        sample[sy0:sy1, sx0:sx1] = arr[sy0 - ty0:sy1 - ty0,
                                       sx0 - tx0:sx1 - tx0]
    return remap_k.remap(sfp, fp, array=sample, src_nodata=nodata,
                         dst_nodata=onodata, interpolation=interpolation)


def set_data(spark: SparkSession, cache_root: str, raster_fp,
             tile_size: int, array: np.ndarray, request_fp=None,
             mask: np.ndarray | None = None, nodata=None) -> dict:
    """Masked write of `array` (located at request_fp, same grid) into the
    tile table: read-modify-write of intersecting tiles, committed as a new
    snapshot (resumable, atomic)."""
    fp = request_fp if request_fp is not None else raster_fp
    assert fp.same_grid(raster_fp), 'set_data expects an aligned window'
    table = SnapshotTable(cache_root)
    x0, y0, w, h = _pixel_window(raster_fp, fp)
    existing = table.read(spark, dedupe_keys=['tile_y', 'tile_x'])
    touched = existing.where(
        (F.col('x0') < x0 + w) & (F.col('x0') + F.col('w') > x0) &
        (F.col('y0') < y0 + h) & (F.col('y0') + F.col('h') > y0))

    if mask is None:
        mask = np.ones(tuple(fp.shape), dtype=bool)
    payload = {'array': array, 'mask': mask, 'x0': x0, 'y0': y0}

    def _apply(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            arr = np.frombuffer(bytes(row['data']),
                                dtype=np.dtype(row['dtype'])).reshape(
                                    row['h'], row['w']).copy()
            ty0, tx0 = int(row['y0']), int(row['x0'])
            iy0 = max(ty0, payload['y0'])
            ix0 = max(tx0, payload['x0'])
            iy1 = min(ty0 + int(row['h']), payload['y0'] + payload['array'].shape[0])
            ix1 = min(tx0 + int(row['w']), payload['x0'] + payload['array'].shape[1])
            sub_m = payload['mask'][iy0 - payload['y0']:iy1 - payload['y0'],
                                    ix0 - payload['x0']:ix1 - payload['x0']]
            sub_a = payload['array'][iy0 - payload['y0']:iy1 - payload['y0'],
                                     ix0 - payload['x0']:ix1 - payload['x0']]
            view = arr[iy0 - ty0:iy1 - ty0, ix0 - tx0:ix1 - tx0]
            view[sub_m] = sub_a[sub_m].astype(arr.dtype, copy=False)
            out.append({
                'tile_y': int(row['tile_y']), 'tile_x': int(row['tile_x']),
                'y0': ty0, 'x0': tx0, 'h': int(row['h']), 'w': int(row['w']),
                'dtype': str(row['dtype']),
                'data': bytearray(arr.tobytes()),
            })
        return pd.DataFrame(out)

    updated = (touched.groupBy('tile_y', 'tile_x')
               .applyInPandas(_apply, DATA_TILE_SCHEMA))
    return table.append(updated, key_cols=['tile_y', 'tile_x'],
                        observe={'rows': F.count(F.lit(1))})
