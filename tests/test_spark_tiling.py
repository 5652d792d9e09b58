"""Distributed tiling conformance: tile_grid_df (JVM arithmetic) must
reproduce the kernel's fp.tile(..., boundary_effect='shrink') exactly."""

import numpy as np
import pytest

from buzzard_spark import Footprint
from buzzard_spark.operators.raster_ops import tile_grid_df


@pytest.mark.parametrize('rsize, ts', [
    ((21, 18), 6),
    ((21, 18), 5),
    ((512, 256), 100),
    ((7, 7), 7),
    ((7, 7), 3),
])
def test_tile_grid_matches_kernel(spark, rsize, ts):
    fp = Footprint(tl=(0, 0), size=rsize, rsize=rsize)
    kernel_tiles = fp.tile((ts, ts), boundary_effect='shrink')
    rows = {(r['tile_y'], r['tile_x']): r
            for r in tile_grid_df(spark, fp, ts).collect()}
    assert len(rows) == kernel_tiles.size
    for ty in range(kernel_tiles.shape[0]):
        for tx in range(kernel_tiles.shape[1]):
            kfp = kernel_tiles[ty, tx]
            row = rows[(ty, tx)]
            assert row['w'] == kfp.rsizex and row['h'] == kfp.rsizey
            # offsets: kernel tile tl in pixel coords of fp
            off = fp.spatial_to_raster(kfp.tl)
            assert (row['x0'], row['y0']) == (off[0], off[1])
