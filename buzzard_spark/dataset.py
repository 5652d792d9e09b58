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
import pandas as pd

from buzzard_spark.kernels.footprint import Footprint
from buzzard_spark.operators import raster_io, recipe, vector_source
from buzzard_spark.sources.snapshot_table import SnapshotTable


class _QueueDataIterator:
    """Ordered pull-stream with bounded async prefetch (queue_data).

    Production starts LAZILY on the first ``__next__`` — an iterator that
    is never consumed never runs a Spark action — and ``close()`` (also
    called by ``__del__`` / GC and usable from a ``contextlib.closing``
    block) cancels outstanding production unconditionally, whether or not
    iteration ever started (round 2 started the producer thread eagerly
    and only a *started* consumer generator's ``finally`` could stop it).
    """

    def __init__(self, proxy, fps, max_queue_size, kwargs):
        import queue as _queue
        import threading
        self._proxy = proxy
        self._fps = fps
        self._kwargs = kwargs
        self._q = _queue.Queue(maxsize=max_queue_size)
        self._stop = threading.Event()
        self._thread = None
        self._END = object()

    def _produce(self):
        import queue as _queue
        q, stop = self._q, self._stop

        def _put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except _queue.Full:
                    continue
            return False

        try:
            for fp in self._fps:
                if stop.is_set():
                    return
                arr = self._proxy.get_data(fp, **self._kwargs)
                if not _put(arr):
                    return
        except BaseException as exc:  # re-raised on the consumer side
            _put(exc)
            return
        _put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        if self._thread is None:
            import threading
            self._thread = threading.Thread(target=self._produce, daemon=True)
            self._thread.start()
        item = self._q.get()
        if item is self._END:
            self._stop.set()
            raise StopIteration
        if isinstance(item, BaseException):
            self._stop.set()
            raise item
        return item

    def close(self):
        self._stop.set()
        # unblock a producer waiting on a full queue
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RasterProxy:
    """One registered raster: a footprint + a tile snapshot table, with a
    per-channel schema (nodata/interpretation/offset/scale/mask — the
    reference's channels_schema, buzzard/_a_source_raster.py:204-228)."""

    def __init__(self, spark, root, fp, tile_size, nodata=None,
                 channels_schema=None, channel_count=1):
        from buzzard_spark import channels as _channels
        self.spark = spark
        self.root = root
        self.fp = fp
        self.tile_size = tile_size
        self.channel_count = channel_count
        self.channels_schema = _channels.full_schema(
            channels_schema, channel_count, default_nodata=nodata)

    @property
    def nodata(self):
        """Nodata of channel 0 (the reference's convenience accessor)."""
        return self.get_nodata(0)

    def get_nodata(self, channel=0):
        return self.channels_schema['nodata'][channel]

    def __len__(self):
        return self.channel_count

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
            interpolation=interpolation, channels=channels,
            channel_nodata=self.channels_schema['nodata'])

    def set_data(self, array, fp=None, mask=None, channel=0):
        return raster_io.set_data(
            self.spark, self.root, self.fp, self.tile_size,
            np.asarray(array), request_fp=fp, mask=mask,
            nodata=self.nodata, channel=channel)

    def queue_data(self, fps, max_queue_size=5, **kwargs):
        """Ordered pull-stream with bounded async prefetch — the
        reference's queue_data (buzzard/_a_async_raster.py:23-80,144-160):
        a producer thread runs the NEXT windows' Spark actions while the
        consumer processes the current array, overlapping compute with
        consumption; the bounded queue is the backpressure (production
        stalls when the consumer lags) and closing/dropping the iterator
        cancels outstanding production."""
        return _QueueDataIterator(self, fps, max_queue_size, kwargs)

    def iter_data(self, fps, **kwargs):
        """Ordered window iteration (prefetch pipelined via queue_data)."""
        return self.queue_data(fps, **kwargs)

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


class NumpyRasterProxy(RasterProxy):
    """In-RAM raster: the wrapped ndarray IS the storage (shared with the
    caller, the reference's NumpyRaster contract —
    buzzard/_numpy_raster.py:68-144). ``tiles()`` rebuilds tile rows from
    the live array, so table-side reads always see the latest writes."""

    def __init__(self, spark, fp, array, tile_size, nodata=None):
        assert array.shape[:2] == tuple(fp.shape), \
            'array shape does not match footprint shape'
        channel_count = 1 if array.ndim == 2 else int(array.shape[2])
        super().__init__(spark, None, fp, tile_size, nodata,
                         channel_count=channel_count)
        self._arr = array

    def tiles(self):
        import pandas as pd

        from buzzard_spark.operators.recipe import (DATA_TILE_SCHEMA,
                                                    tile_rows)
        rows = []
        fp, tile_size = self.fp, self.tile_size
        for ty, y0 in enumerate(range(0, fp.rsizey, tile_size)):
            for tx, x0 in enumerate(range(0, fp.rsizex, tile_size)):
                sub = self._arr[y0:y0 + tile_size, x0:x0 + tile_size]
                rows.extend(tile_rows(
                    {'tile_y': ty, 'tile_x': tx, 'y0': y0, 'x0': x0,
                     'h': sub.shape[0], 'w': sub.shape[1]}, sub))
        cols = [f.split()[0] for f in DATA_TILE_SCHEMA.split(', ')]
        return self.spark.createDataFrame(pd.DataFrame(rows)[cols],
                                          DATA_TILE_SCHEMA)

    def set_data(self, array, fp=None, mask=None, channel=0):
        """Masked in-place write into the wrapped array (aligned window)."""
        fp = self.fp if fp is None else fp
        assert fp.same_grid(self.fp), 'set_data expects an aligned window'
        x0, y0 = (int(v) for v in self.fp.spatial_to_raster(fp.tl))
        iy0, ix0 = max(0, y0), max(0, x0)
        iy1 = min(self.fp.rsizey, y0 + fp.rsizey)
        ix1 = min(self.fp.rsizex, x0 + fp.rsizex)
        if iy0 >= iy1 or ix0 >= ix1:
            return
        sub = (slice(iy0 - y0, iy1 - y0), slice(ix0 - x0, ix1 - x0))
        arr = np.asarray(array)
        m = np.asarray(mask, dtype=bool)[sub] if mask is not None else \
            np.ones((iy1 - iy0, ix1 - ix0), dtype=bool)
        if self._arr.ndim == 2:
            src = arr[sub] if arr.ndim == 2 else arr[sub + (0,)]
            view = self._arr[iy0:iy1, ix0:ix1]
            view[m] = src[m].astype(self._arr.dtype, copy=False)
            return
        planes = {int(channel): arr} if arr.ndim == 2 else \
            {c: arr[:, :, c] for c in range(arr.shape[2])}
        for c, plane in planes.items():
            view = self._arr[iy0:iy1, ix0:ix1, c]
            view[m] = plane[sub][m].astype(self._arr.dtype, copy=False)


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
        """Append features as a new snapshot, coercing field types to the
        stored schema (the reference coerces each field through its
        definition's python type and rejects non-coercible values,
        buzzard/_a_gdal_vector.py:128-208 `_type_of_field_index`).

        Columns are matched by NAME: a missing or unknown column raises
        immediately; a type mismatch is cast to the stored type — under
        Spark's ANSI mode a non-coercible value (e.g. ``'abc'`` into a
        bigint field) fails the write, mirroring the reference's
        ``int(field)`` raise. Round 2 was schema-trusting and surfaced a
        raw parquet schema error instead."""
        if self.root is None:
            raise ValueError('insert_data requires a table-backed vector '
                             '(Dataset.create_vector)')
        from pyspark.sql import functions as F
        table = SnapshotTable(self.root)
        if table.current_snapshot_id() is None:
            # first insert defines the schema — nothing to coerce against
            return table.append(rows_df, observe={'rows': F.count(F.lit(1))})
        target = table.read(self.spark).schema
        have = set(rows_df.columns)
        extra = sorted(have - {f.name for f in target.fields})
        missing = sorted({f.name for f in target.fields} - have)
        if extra or missing:
            raise ValueError(
                f'insert_data schema mismatch: missing fields {missing}, '
                f'unknown fields {extra} (stored schema: '
                f'{[f.name for f in target.fields]})')
        src_types = {f.name: f.dataType for f in rows_df.schema.fields}
        coerced = rows_df.select(*[
            (F.col(f.name) if src_types[f.name] == f.dataType
             else F.col(f.name).cast(f.dataType)).alias(f.name)
            for f in target.fields])
        return table.append(coerced, observe={'rows': F.count(F.lit(1))})

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

    def iter_data(self, fields=None, mask=None, clip=False, slicing=None,
                  geom_type='wkb'):
        """Ordered feature pull. geom_type ∈ {'wkb', 'geojson',
        'coordinates'} — the reference's geometry codecs
        (buzzard/_a_source_vector.py:86-107): 'wkb' yields Rows (engine
        native); the other two yield (geometry, *field_values) tuples, or
        the bare geometry when ``fields == []``."""
        out = self.scan(fields=fields, mask=mask, clip=clip, slicing=slicing)
        if geom_type == 'wkb':
            return out.toLocalIterator()
        if geom_type not in ('geojson', 'coordinates'):
            raise ValueError(f'unknown geom_type {geom_type!r}')
        from buzzard_spark.kernels import geometry as _geometry
        codec = (_geometry.geojson_of_wkb if geom_type == 'geojson'
                 else _geometry.coords_of_wkb)
        field_names = [c for c in out.columns if c not in ('wkb',)]
        if fields is not None:
            field_names = [c for c in field_names if c in set(fields)]

        def _gen():
            for row in out.toLocalIterator():
                geom = codec(bytes(row['wkb']))
                if fields is not None and not field_names:
                    yield geom
                else:
                    yield (geom, *[row[c] for c in field_names])
        return _gen()

    def iter_geojson(self, fields=None, mask=None, clip=False, slicing=None):
        """Geojson Feature dicts (the reference's iter_geojson,
        buzzard/_a_source_vector.py:168-257)."""
        out = self.scan(fields=fields, mask=mask, clip=clip, slicing=slicing)
        from buzzard_spark.kernels import geometry as _geometry
        prop_names = [c for c in out.columns if c != 'wkb']

        def _gen():
            for row in out.toLocalIterator():
                yield {
                    'type': 'Feature',
                    'geometry': _geometry.geojson_of_wkb(bytes(row['wkb'])),
                    'properties': {c: row[c] for c in prop_names},
                }
        return _gen()

    def get_geojson(self, index: int):
        """Single feature by position (ordered by fid)."""
        return next(iter(self.iter_geojson(slicing=slice(index, index + 1))))

    def get_data(self, index: int, fields=None, geom_type='wkb'):
        """Single feature by position — reference get_data
        (buzzard/_a_source_vector.py:168-180)."""
        return next(iter(self.iter_data(
            fields=fields, slicing=slice(index, index + 1),
            geom_type=geom_type)))


class Dataset:
    """Keyed source registry with spatial-reference homogenization.

    sr modes (reference: buzzard/_dataset.py:199-275):

    1. no sr params — sources pass through untouched;
    2. ``sr_work`` — every source is converted from its stored sr into
       sr_work; a source without a stored sr raises;
    3. ``sr_work + sr_fallback`` — sources without a stored sr assume
       sr_fallback (stored sr wins when present);
    4. ``sr_work + sr_forced`` — every source is treated as sr_forced,
       stored sr ignored.

    Conversions run at registration: raster footprints are re-located via
    ``kernels.crs.normalize_footprint`` (move + snap, the reference's
    open-time reprojection) and vector geometries/bboxes are reprojected
    through a vectorized pandas UDF. Registered transforms are axis-monotone
    (lonlat ⇄ webmercator), so bbox corners transform exactly.
    """

    def __init__(self, spark, sr_work=None, sr_fallback=None, sr_forced=None):
        if (sr_fallback is not None or sr_forced is not None) \
                and sr_work is None:
            raise ValueError('sr_fallback/sr_forced require sr_work')
        if sr_fallback is not None and sr_forced is not None:
            raise ValueError('sr_fallback and sr_forced are mutually '
                             'exclusive')
        self.spark = spark
        self.sr_work = sr_work
        self.sr_fallback = sr_fallback
        self.sr_forced = sr_forced
        self._sources = {}

    def _virtual_sr(self, stored_sr):
        """The sr a source is assumed to be in, per the active mode."""
        if self.sr_work is None:
            return None                      # mode 1: no conversions
        if self.sr_forced is not None:
            return self.sr_forced            # mode 4
        if stored_sr is not None:
            return stored_sr                 # modes 2/3, stored wins
        if self.sr_fallback is not None:
            return self.sr_fallback          # mode 3
        raise ValueError('source has no stored sr and the Dataset has no '
                         'sr_fallback (mode 2 requires stored sr)')

    def _normalize_fp(self, fp, stored_sr):
        virtual = self._virtual_sr(stored_sr)
        if virtual is None or virtual == self.sr_work:
            return fp
        from buzzard_spark.kernels import crs
        return crs.normalize_footprint(fp, virtual, self.sr_work)

    def _reproject_vector(self, df, stored_sr):
        virtual = self._virtual_sr(stored_sr)
        if virtual is None or virtual == self.sr_work:
            return df
        from buzzard_spark.kernels import crs
        src, dst = virtual, self.sr_work
        from pyspark.sql import functions as F

        @F.pandas_udf('binary')
        def _rewkb(wkb: pd.Series) -> pd.Series:
            from buzzard_spark.kernels import crs as _crs
            from buzzard_spark.kernels import geometry as _geometry
            fwd = _crs.get_transform(src, dst)
            out = []
            for buf in wkb:
                kind, payload = _geometry.wkb_decode(bytes(buf))
                if kind == 'point':
                    x, y = fwd(payload[0], payload[1])
                    out.append(bytearray(_geometry.wkb_point(
                        float(x), float(y))))
                elif kind == 'linestring':
                    xs, ys = fwd(payload[:, 0], payload[:, 1])
                    out.append(bytearray(_geometry.wkb_linestring(
                        np.column_stack([xs, ys]))))
                elif kind == 'polygon':
                    rings = []
                    for ring in payload:
                        xs, ys = fwd(ring[:, 0], ring[:, 1])
                        rings.append(np.column_stack([xs, ys]))
                    out.append(bytearray(_geometry.wkb_polygon(
                        rings[0], rings[1:])))
                elif kind == 'multipolygon':
                    parts = []
                    for poly in payload:
                        rings = []
                        for ring in poly:
                            xs, ys = fwd(ring[:, 0], ring[:, 1])
                            rings.append(np.column_stack([xs, ys]))
                        parts.append((rings[0], rings[1:]))
                    out.append(bytearray(_geometry.wkb_multipolygon(parts)))
                else:
                    raise ValueError(f'cannot reproject {kind}')
            return pd.Series(out)

        fwd = crs.get_transform(src, dst)
        # axis-monotone transforms: bbox corners transform exactly; probe
        # orientation once on the driver to map min/max correctly
        (x0, x1), (y0, y1) = fwd([0.0, 1.0], [0.0, 0.0])[0], \
            fwd([0.0, 0.0], [0.0, 1.0])[1]
        assert x1 > x0 and y1 > y0, 'transforms must be axis-increasing'
        out = df.withColumn('wkb', _rewkb(F.col('wkb')))
        for cx in ('minx', 'maxx'):
            if cx in df.columns:
                out = out.withColumn(cx, F.pandas_udf(
                    lambda s: pd.Series(fwd(s.to_numpy(), 0.0 * s.to_numpy())[0]),
                    'double')(F.col(cx)))
        for cy in ('miny', 'maxy'):
            if cy in df.columns:
                out = out.withColumn(cy, F.pandas_udf(
                    lambda s: pd.Series(fwd(0.0 * s.to_numpy(), s.to_numpy())[1]),
                    'double')(F.col(cy)))
        return out

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
                      nodata=None, fill=0, channel_count=1,
                      channels_schema=None, sr=None):
        """Create + register a tiled raster table initialized to `fill`.

        channels_schema: per-channel nodata/interpretation/offset/scale/mask
        (scalars broadcast; the reference's create_raster contract).
        sr: the stored spatial reference id (see Dataset sr modes)."""
        from buzzard_spark import channels as _channels
        schema = _channels.full_schema(channels_schema, channel_count,
                                       default_nodata=nodata)
        props = {
            'gt': [float(v) for v in fp.gt],
            'rsize': [fp.rsizex, fp.rsizey],
            'tile_size': tile_size, 'dtype': str(dtype), 'nodata': nodata,
            'channel_count': channel_count, 'channels_schema': schema,
            'sr': sr,
        }
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, 'table_props.json'), 'w') as f:
            json.dump(props, f)
        value = fill

        def _fill(tile_fp):
            shape = tuple(tile_fp.shape)
            if channel_count > 1:
                shape = shape + (channel_count,)
            return np.full(shape, value, dtype=np.dtype(dtype))

        recipe.cached_tile_compute(self.spark, fp, tile_size, _fill, root)
        proxy = RasterProxy(self.spark, root,
                            self._normalize_fp(fp, sr), tile_size, nodata,
                            channels_schema=schema,
                            channel_count=channel_count)
        proxy.fp_stored = fp
        return self._register(key, proxy)

    def open_raster(self, key, root):
        """Open an existing raster table from its stored properties —
        the metadata path (reference: buzzard/_a_source_raster.py:204-218);
        the footprint is homogenized into the Dataset's work sr."""
        with open(os.path.join(root, 'table_props.json')) as f:
            props = json.load(f)
        fp = Footprint(gt=props['gt'], rsize=props['rsize'])
        proxy = RasterProxy(self.spark, root,
                            self._normalize_fp(fp, props.get('sr')),
                            props['tile_size'], props['nodata'],
                            channels_schema=props.get('channels_schema'),
                            channel_count=props.get('channel_count', 1))
        proxy.fp_stored = fp
        return self._register(key, proxy)

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
        Writes go straight into the wrapped array (shared memory, like the
        reference); reads cut the current array into tile rows."""
        return self._register(
            key, NumpyRasterProxy(self.spark, fp, np.asarray(array),
                                  tile_size, nodata))

    # -- vectors --------------------------------------------------------------

    def register_vector(self, key, df, sr=None):
        """Register a feature DataFrame; geometries are homogenized into
        the work sr per the Dataset's sr mode."""
        return self._register(
            key, VectorProxy(self.spark, self._reproject_vector(df, sr)))

    def create_vector(self, key, root, initial_df=None, sr=None):
        """Table-backed vector source supporting insert_data appends.
        Data is stored in the work sr (converted at creation)."""
        proxy = VectorProxy(self.spark, root=root)
        if initial_df is not None:
            from pyspark.sql import functions as F
            SnapshotTable(root).append(
                self._reproject_vector(initial_df, sr),
                observe={'rows': F.count(F.lit(1))})
        return self._register(key, proxy)
