"""Dataset — keyed registry of raster/vector sources, the reference's
top-level API re-expressed over Spark (reference: buzzard/_dataset.py:30-297).

A user of the reference maps almost one-to-one:

    ds = Dataset(spark)
    ds.create_raster('dem', root, fp=fp, fill=0.0)        # snapshot table
    ds.create_cached_raster_recipe('slope', fp, compute, root2,
                                   primitives={'dem': 'dem'})
    arr = ds['slope'].get_data(window_fp)                 # windowed read
    ds['dem'].set_data(arr2, patch_fp, mask=m)            # masked write
    for arr in ds['dem'].iter_data([fp1, fp2]): ...       # ordered pull
    ds.register_vector('roads', features_df)
    for row in ds['roads'].iter_data(mask=box, clip=True): ...

What is deliberately absent: the LRU driver-handle pool and the actor
scheduler (executors and Spark's scheduler own those concerns), and
GDAL file drivers (tables are parquet snapshot tables).
"""

from __future__ import annotations

import json
import os

import numpy as np

from buzzard_spark.kernels.footprint import Footprint
from buzzard_spark.operators import raster_io, recipe, vector_source
from buzzard_spark.sources.snapshot_table import SnapshotTable


class RasterProxy:
    """One registered raster: a footprint + a tile snapshot table."""

    def __init__(self, spark, root, fp, tile_size, nodata=None):
        self.spark = spark
        self.root = root
        self.fp = fp
        self.tile_size = tile_size
        self.nodata = nodata

    @property
    def table(self):
        return SnapshotTable(self.root)

    def tiles(self):
        return self.table.read(
            self.spark, dedupe_keys=['tile_y', 'tile_x', 'channel'])

    def get_data(self, fp=None, dst_nodata=None, interpolation='linear',
                 channels=None):
        return raster_io.get_data(
            self.spark, self.tiles(), self.fp, request_fp=fp,
            nodata=self.nodata, dst_nodata=dst_nodata,
            interpolation=interpolation, channels=channels)

    def set_data(self, array, fp=None, mask=None, channel=0):
        return raster_io.set_data(
            self.spark, self.root, self.fp, self.tile_size,
            np.asarray(array), request_fp=fp, mask=mask,
            nodata=self.nodata, channel=channel)

    def iter_data(self, fps, **kwargs):
        """Ordered pull-stream of windows — the queue_data analogue
        (reference: buzzard/_a_async_raster.py:23-160). Spark's lazy jobs
        provide the backpressure: each window is one bounded action."""
        for fp in fps:
            yield self.get_data(fp, **kwargs)

    def fill(self, value):
        arr = np.full(tuple(self.fp.shape), value)
        return self.set_data(arr)


class RecipeProxy(RasterProxy):
    """Lazy cached raster: computes missing tiles on first access."""

    def __init__(self, spark, root, fp, tile_size, compute, dataset,
                 primitives=None, context_px=0, nodata=None):
        super().__init__(spark, root, fp, tile_size, nodata)
        self._compute = compute
        self._dataset = dataset
        self._primitives = primitives or {}
        self._context_px = context_px

    def ensure(self):
        if self._primitives:
            prim_tiles = {
                name: self._dataset[key].tiles()
                for name, key in self._primitives.items()}
            df, n = recipe.derived_tile_compute(
                self.spark, self.fp, self.tile_size, self._compute,
                self.root, prim_tiles, context_px=self._context_px,
                fill=self.nodata if self.nodata is not None else 0)
        else:
            df, n = recipe.cached_tile_compute(
                self.spark, self.fp, self.tile_size, self._compute, self.root)
        return n

    def get_data(self, fp=None, **kwargs):
        self.ensure()
        return super().get_data(fp, **kwargs)


class VectorProxy:
    """One registered vector source (DataFrame with wkb + bbox columns).

    With a ``root``, the source is a snapshot table and supports
    ``insert_data`` (the reference's feature append,
    buzzard/_a_stored_vector.py) — atomic, resumable commits.
    """

    def __init__(self, spark, df=None, root=None):
        self.spark = spark
        self._df = df
        self.root = root

    @property
    def df(self):
        if self.root is not None:
            return SnapshotTable(self.root).read(self.spark)
        return self._df

    def insert_data(self, rows_df):
        """Append features (same schema) as a new snapshot."""
        if self.root is None:
            raise ValueError('insert_data requires a table-backed vector '
                             '(Dataset.create_vector)')
        from pyspark.sql import functions as F
        return SnapshotTable(self.root).append(
            rows_df, observe={'rows': F.count(F.lit(1))})

    def __len__(self):
        return self.df.count()

    @property
    def bounds(self):
        from pyspark.sql import functions as F
        row = self.df.agg(F.min('minx'), F.min('miny'),
                          F.max('maxx'), F.max('maxy')).collect()[0]
        return tuple(row)

    def scan(self, **kwargs):
        return vector_source.scan_features(self.df, **kwargs)

    def iter_data(self, fields=None, mask=None, clip=False, slicing=None):
        out = self.scan(fields=fields, mask=mask, clip=clip, slicing=slicing)
        return out.toLocalIterator()


class Dataset:
    def __init__(self, spark):
        self.spark = spark
        self._sources = {}

    def __getitem__(self, key):
        return self._sources[key]

    def __contains__(self, key):
        return key in self._sources

    def keys(self):
        return self._sources.keys()

    def _register(self, key, proxy):
        if key in self._sources:
            raise ValueError(f'key {key!r} already registered')
        self._sources[key] = proxy
        return proxy

    # -- rasters --------------------------------------------------------------

    def create_raster(self, key, root, fp, tile_size=256, dtype='float64',
                      nodata=None, fill=0):
        """Create + register a tiled raster table initialized to `fill`."""
        props = {
            'gt': [float(v) for v in fp.gt],
            'rsize': [fp.rsizex, fp.rsizey],
            'tile_size': tile_size, 'dtype': str(dtype), 'nodata': nodata,
        }
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, 'table_props.json'), 'w') as f:
            json.dump(props, f)
        value = fill

        def _fill(tile_fp):
            return np.full(tuple(tile_fp.shape), value, dtype=np.dtype(dtype))

        recipe.cached_tile_compute(self.spark, fp, tile_size, _fill, root)
        return self._register(
            key, RasterProxy(self.spark, root, fp, tile_size, nodata))

    def open_raster(self, key, root):
        """Open an existing raster table from its stored properties —
        the metadata path (reference: buzzard/_a_source_raster.py:204-218)."""
        with open(os.path.join(root, 'table_props.json')) as f:
            props = json.load(f)
        fp = Footprint(gt=props['gt'], rsize=props['rsize'])
        return self._register(
            key, RasterProxy(self.spark, root, fp, props['tile_size'],
                             props['nodata']))

    def create_cached_raster_recipe(self, key, fp, compute, root,
                                    tile_size=256, primitives=None,
                                    context_px=0, nodata=None):
        return self._register(
            key, RecipeProxy(self.spark, root, fp, tile_size, compute, self,
                             primitives=primitives, context_px=context_px,
                             nodata=nodata))

    def wrap_numpy(self, key, fp, array, tile_size=256, nodata=None):
        """In-RAM ndarray → registered raster without a backing table —
        the NumpyRaster analogue (reference: buzzard/_numpy_raster.py).
        The array is cut into tile rows via createDataFrame."""
        import pandas as pd

        from buzzard_spark.operators.recipe import (DATA_TILE_SCHEMA,
                                                    tile_rows)
        rows = []
        arr = np.asarray(array)
        assert arr.shape[:2] == tuple(fp.shape)
        for ty, y0 in enumerate(range(0, fp.rsizey, tile_size)):
            for tx, x0 in enumerate(range(0, fp.rsizex, tile_size)):
                sub = arr[y0:y0 + tile_size, x0:x0 + tile_size]
                rows.extend(tile_rows(
                    {'tile_y': ty, 'tile_x': tx, 'y0': y0, 'x0': x0,
                     'h': sub.shape[0], 'w': sub.shape[1]}, sub))
        cols = [f.split()[0] for f in DATA_TILE_SCHEMA.split(', ')]
        df = self.spark.createDataFrame(pd.DataFrame(rows)[cols],
                                        DATA_TILE_SCHEMA)

        proxy = RasterProxy(self.spark, None, fp, tile_size, nodata)
        proxy.tiles = lambda: df
        proxy.set_data = None  # in-RAM wrapper is read-only on the table side
        return self._register(key, proxy)

    # -- vectors --------------------------------------------------------------

    def register_vector(self, key, df):
        return self._register(key, VectorProxy(self.spark, df))

    def create_vector(self, key, root, initial_df=None):
        """Table-backed vector source supporting insert_data appends."""
        proxy = VectorProxy(self.spark, root=root)
        if initial_df is not None:
            from pyspark.sql import functions as F
            SnapshotTable(root).append(
                initial_df, observe={'rows': F.count(F.lit(1))})
        return self._register(key, proxy)
