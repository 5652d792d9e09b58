"""Cached, resumable tile computation — the Spark re-expression of the
reference's cached raster recipes (reference: buzzard/_dataset.py:1015-1249,
buzzard/_cached_raster_recipe.py:27-202).

The reference's actor pipeline (QueriesHandler → CacheSupervisor →
Computer → Merger → Writer → …, ~2600 LoC) collapses into one DataFrame
plan: enumerate tiles → anti-join the snapshot manifest (skip what exists:
"pixels never computed twice") → applyInPandas(compute) → snapshot append
with per-file lineage + Observation metrics. Corrupted cache files are
detected by the manifest integrity check and their tiles recomputed
(reference: buzzard/_actors/cached/file_checker.py semantics).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from buzzard_spark.operators.raster_ops import tile_grid_df
from buzzard_spark.sources.snapshot_table import SnapshotTable

DATA_TILE_SCHEMA = ('tile_y long, tile_x long, y0 int, x0 int, h int, w int, '
                    'dtype string, data binary')


def cached_tile_compute(
        spark: SparkSession, fp, tile_size: int,
        compute: Callable[[object], np.ndarray],
        cache_root: str) -> tuple[DataFrame, int]:
    """Compute (or resume) a tiled raster into a snapshot table.

    ``compute(tile_fp) -> np.ndarray`` runs per tile inside applyInPandas
    (must be picklable — same contract as the reference's compute_array,
    buzzard/_dataset.py:888-889). Returns (full table DataFrame, number of
    tiles computed in THIS run — 0 on a warm cache).
    """
    table = SnapshotTable(cache_root)
    tiles = tile_grid_df(spark, fp, tile_size) \
        .withColumn('tile_y', F.col('tile_y').cast('long')) \
        .withColumn('tile_x', F.col('tile_x').cast('long'))
    pending = table.pending(tiles, ['tile_y', 'tile_x'])
    n_pending = pending.count()

    if n_pending:
        gt = tuple(float(v) for v in fp.gt)

        def _compute(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from buzzard_spark.kernels.footprint import Footprint
            out = []
            for _, row in pdf.iterrows():
                tile_gt = list(gt)
                tile_gt[0] = gt[0] + int(row.x0) * gt[1]
                tile_gt[3] = gt[3] + int(row.y0) * gt[5]
                tile_fp = Footprint(gt=tile_gt, rsize=(int(row.w), int(row.h)))
                arr = np.ascontiguousarray(compute(tile_fp))
                out.append({
                    'tile_y': int(row.tile_y), 'tile_x': int(row.tile_x),
                    'y0': int(row.y0), 'x0': int(row.x0),
                    'h': int(row.h), 'w': int(row.w),
                    'dtype': str(arr.dtype),
                    'data': bytearray(arr.tobytes()),
                })
            return pd.DataFrame(out)

        computed = (pending.groupBy('tile_y', 'tile_x')
                    .applyInPandas(_compute, DATA_TILE_SCHEMA))
        table.append(
            computed, key_cols=['tile_y', 'tile_x'],
            observe={'rows': F.count(F.lit(1)),
                     'bytes': F.sum(F.length('data'))})
    return table.read(spark), n_pending


def assemble(rows, fp, dtype=None, nodata=0) -> np.ndarray:
    """Stitch collected tile rows into one array (driver-side; the
    distributed analogue of the reference's concat_arrays merge,
    reference: buzzard/utils/_merge_functions.py:3-22)."""
    first = rows[0]
    dt = np.dtype(dtype or first['dtype'])
    out = np.full(tuple(fp.shape), nodata, dtype=dt)
    for row in rows:
        arr = np.frombuffer(bytes(row['data']),
                            dtype=np.dtype(row['dtype']))
        arr = arr.reshape(row['h'], row['w'])
        out[row['y0']:row['y0'] + row['h'],
            row['x0']:row['x0'] + row['w']] = arr
    return out
