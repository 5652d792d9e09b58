"""Distributed raster ↔ vector operators.

The reference runs these per-array on one machine
(reference: buzzard/_footprint.py:1538-1935); here rasters are DataFrames
of tile rows and the kernels (kernels.raster) run per tile inside
applyInPandas:

- ``rasterize``  — polygons ⨝ tiles (bbox broadcast join) →
  groupBy(tile).applyInPandas(burn) → tile mask rows.
- ``polygonize`` — the reference never had to stitch (single array;
  SURVEY.md §7.3 hard part 3). Three phases:
    1. per-tile run-length labeling (applyInPandas → run rows),
    2. cross-tile connectivity: border runs of vertically adjacent tiles
       are interval-joined; the resulting (tile,label) graph is small
       (O(total tile-border length)) and resolved with union-find,
    3. runs shuffled by global component id; one reducer per component
       rebuilds the component's (sparse, bbox-cropped) mask and traces
       rings with the exact same kernel as the single-node path — so
       distributed output == kernel output by construction.

Tile rows: (tile_y int, tile_x int, y0 int, x0 int, h int, w int,
mask binary) — mask is a packed bool numpy buffer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from buzzard_spark.kernels import geometry, raster

TILE_SCHEMA = ('tile_y int, tile_x int, y0 int, x0 int, h int, w int, '
               'mask binary')
RUN_SCHEMA = 'tile_y int, tile_x int, y int, xs int, xe int, lab int'
POLY_SCHEMA = 'component_id long, wkb binary, area double, n_rings int'


def tile_grid_df(spark: SparkSession, fp, tile_size: int) -> DataFrame:
    """Enumerate the shrink-tiling of fp as rows (pure JVM arithmetic).

    Mirrors fp.tile((tile_size, tile_size), boundary_effect='shrink') —
    conformance is pinned by tests/test_spark_tiling.py.
    """
    ntx = -(-fp.rsizex // tile_size)
    nty = -(-fp.rsizey // tile_size)
    return spark.range(ntx * nty).select(
        (F.col('id') % ntx).cast('int').alias('tile_x'),
        (F.col('id') / ntx).cast('int').alias('tile_y'),
    ).select(
        'tile_y', 'tile_x',
        (F.col('tile_y') * tile_size).alias('y0'),
        (F.col('tile_x') * tile_size).alias('x0'),
        F.least(F.lit(tile_size),
                F.lit(fp.rsizey) - F.col('tile_y') * tile_size).cast('int').alias('h'),
        F.least(F.lit(tile_size),
                F.lit(fp.rsizex) - F.col('tile_x') * tile_size).cast('int').alias('w'),
    )


def rasterize(spark: SparkSession, fp, polys: DataFrame,
              tile_size: int = 256) -> DataFrame:
    """polys (region_id, wkb, minlat, minlng, maxlat, maxlng — world bbox)
    → tile mask rows. Only tiles intersecting ≥1 polygon are emitted."""
    a, b, c, d, e, f = fp._coef
    tiles = tile_grid_df(spark, fp, tile_size)
    # world bbox of each tile (north-up: a>0, e<0)
    tiles = tiles.select(
        '*',
        (F.col('x0') * a + c).alias('t_minx'),
        ((F.col('x0') + F.col('w')) * a + c).alias('t_maxx'),
        ((F.col('y0') + F.col('h')) * e + f).alias('t_miny'),
        (F.col('y0') * e + f).alias('t_maxy'),
    )
    cand = tiles.join(
        F.broadcast(polys),
        (F.col('t_minx') <= F.col('maxlng')) & (F.col('t_maxx') >= F.col('minlng')) &
        (F.col('t_miny') <= F.col('maxlat')) & (F.col('t_maxy') >= F.col('minlat')))

    gt = tuple(float(v) for v in fp.gt)

    def _burn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from buzzard_spark.kernels.footprint import Footprint
        row = pdf.iloc[0]
        y0, x0, h, w = int(row.y0), int(row.x0), int(row.h), int(row.w)
        tile_gt = list(gt)
        tile_gt[0] = gt[0] + x0 * gt[1]
        tile_gt[3] = gt[3] + y0 * gt[5]
        tile_fp = Footprint(gt=tile_gt, rsize=(w, h))
        mask = raster.burn_polygons(tile_fp, [bytes(b) for b in pdf['wkb']])
        return pd.DataFrame([{
            'tile_y': int(row.tile_y), 'tile_x': int(row.tile_x),
            'y0': y0, 'x0': x0, 'h': h, 'w': w,
            'mask': bytearray(np.packbits(mask).tobytes()),
        }])

    return cand.groupBy('tile_y', 'tile_x').applyInPandas(_burn, TILE_SCHEMA)


def rasterize_lines(spark: SparkSession, fp, lines: DataFrame,
                    tile_size: int = 256) -> DataFrame:
    """linestrings (line_id, wkb, minlat, minlng, maxlat, maxlng) → tile
    mask rows via per-tile DDA burn (kernels.raster.burn_lines)."""
    a, b, c, d, e, f = fp._coef
    tiles = tile_grid_df(spark, fp, tile_size)
    tiles = tiles.select(
        '*',
        (F.col('x0') * a + c).alias('t_minx'),
        ((F.col('x0') + F.col('w')) * a + c).alias('t_maxx'),
        ((F.col('y0') + F.col('h')) * e + f).alias('t_miny'),
        (F.col('y0') * e + f).alias('t_maxy'),
    )
    cand = tiles.join(
        F.broadcast(lines),
        (F.col('t_minx') <= F.col('maxlng')) & (F.col('t_maxx') >= F.col('minlng')) &
        (F.col('t_miny') <= F.col('maxlat')) & (F.col('t_maxy') >= F.col('minlat')))

    gt = tuple(float(v) for v in fp.gt)

    def _burn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from buzzard_spark.kernels.footprint import Footprint
        row = pdf.iloc[0]
        y0, x0, h, w = int(row.y0), int(row.x0), int(row.h), int(row.w)
        tile_gt = list(gt)
        tile_gt[0] = gt[0] + x0 * gt[1]
        tile_gt[3] = gt[3] + y0 * gt[5]
        tile_fp = Footprint(gt=tile_gt, rsize=(w, h))
        mask = raster.burn_lines(tile_fp, [bytes(b_) for b_ in pdf['wkb']])
        return pd.DataFrame([{
            'tile_y': int(row.tile_y), 'tile_x': int(row.tile_x),
            'y0': y0, 'x0': x0, 'h': h, 'w': w,
            'mask': bytearray(np.packbits(mask).tobytes()),
        }])

    return cand.groupBy('tile_y', 'tile_x').applyInPandas(_burn, TILE_SCHEMA)


def rasterize_counts(spark: SparkSession, fp, polys: DataFrame,
                     tile_size: int = 64) -> DataFrame:
    """Per-region burned-pixel count: polygons ⨝ tiles, per-(tile, region)
    scanline burn, map-side partial sums → (region_id, n_pixels).

    The aggregation-shaped variant of ``rasterize`` — the distributed
    answer to "how many pixels does each polygon cover on this grid".
    """
    a, b, c, d, e, f = fp._coef
    tiles = tile_grid_df(spark, fp, tile_size)
    tiles = tiles.select(
        '*',
        (F.col('x0') * a + c).alias('t_minx'),
        ((F.col('x0') + F.col('w')) * a + c).alias('t_maxx'),
        ((F.col('y0') + F.col('h')) * e + f).alias('t_miny'),
        (F.col('y0') * e + f).alias('t_maxy'),
    )
    cand = tiles.join(
        F.broadcast(polys),
        (F.col('t_minx') <= F.col('maxlng')) & (F.col('t_maxx') >= F.col('minlng')) &
        (F.col('t_miny') <= F.col('maxlat')) & (F.col('t_maxy') >= F.col('minlat')))

    gt = tuple(float(v) for v in fp.gt)

    def _count(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from buzzard_spark.kernels.footprint import Footprint
        row = pdf.iloc[0]
        tile_gt = list(gt)
        tile_gt[0] = gt[0] + int(row.x0) * gt[1]
        tile_gt[3] = gt[3] + int(row.y0) * gt[5]
        tile_fp = Footprint(gt=tile_gt, rsize=(int(row.w), int(row.h)))
        mask = raster.burn_polygons(tile_fp, [bytes(row['wkb'])])
        return pd.DataFrame([{'region_id': int(row.region_id),
                              'n_pixels': int(mask.sum())}])

    return (cand.groupBy('tile_y', 'tile_x', 'region_id')
            .applyInPandas(_count, 'region_id long, n_pixels long')
            .groupBy('region_id')
            .agg(F.sum('n_pixels').alias('n_pixels'))
            .where(F.col('n_pixels') > 0))


def _unpack_mask(buf, h, w):
    return np.unpackbits(
        np.frombuffer(bytes(buf), dtype=np.uint8),
        count=h * w).reshape(h, w).astype(bool)


def tile_runs(mask_tiles: DataFrame) -> DataFrame:
    """Per-tile 4-connected labeling → run rows (global pixel coords)."""
    def _runs(key, pdf: pd.DataFrame):
        out = []
        for _, row in pdf.iterrows():
            h, w = int(row.h), int(row.w)
            mask = _unpack_mask(row['mask'], h, w)
            labels, n = raster._label_components(mask)
            for y in range(h):
                line = labels[y]
                nz = line != 0
                if not nz.any():
                    continue
                change = np.diff(np.r_[0, nz.view(np.int8), 0])
                starts = np.flatnonzero(change == 1)
                ends = np.flatnonzero(change == -1)
                for s, e in zip(starts, ends):
                    # split runs on label change within the span
                    labs = line[s:e]
                    cuts = np.r_[0, np.flatnonzero(np.diff(labs)) + 1, e - s]
                    for i in range(len(cuts) - 1):
                        out.append((int(row.tile_y), int(row.tile_x),
                                    int(row.y0) + y,
                                    int(row.x0) + s + int(cuts[i]),
                                    int(row.x0) + s + int(cuts[i + 1]),
                                    int(labs[cuts[i]])))
        return pd.DataFrame(
            out, columns=['tile_y', 'tile_x', 'y', 'xs', 'xe', 'lab'])

    return (mask_tiles.groupBy('tile_y', 'tile_x')
            .applyInPandas(_runs, RUN_SCHEMA))


def _resolve_components(runs: DataFrame, tile_size: int):
    """Cross-tile union-find over border-run adjacency. Returns a driver
    dict {(tile_y, tile_x, lab): component_id}. The border graph is
    O(raster perimeter / tile) — tiny next to the raster itself."""
    r = runs
    # vertical adjacency: bottom row of tile (ty) ↔ top row of tile (ty+1)
    bottom = r.where((F.col('y') + 1) % tile_size == 0).alias('a')
    top = r.where(F.col('y') % tile_size == 0).alias('b')
    vert = bottom.join(
        top,
        (F.col('a.y') + 1 == F.col('b.y')) &
        (F.col('a.xs') < F.col('b.xe')) & (F.col('b.xs') < F.col('a.xe')))
    # horizontal adjacency: last col of tile ↔ first col of next tile
    right = r.where(F.col('xe') % tile_size == 0).alias('a')
    left = r.where(F.col('xs') % tile_size == 0).alias('b')
    horiz = right.join(
        left,
        (F.col('a.xe') == F.col('b.xs')) & (F.col('a.y') == F.col('b.y')))
    sel = [F.col('a.tile_y').alias('aty'), F.col('a.tile_x').alias('atx'),
           F.col('a.lab').alias('alab'), F.col('b.tile_y').alias('bty'),
           F.col('b.tile_x').alias('btx'), F.col('b.lab').alias('blab')]
    edges = (vert.select(*sel).unionByName(horiz.select(*sel)).collect())
    nodes = [tuple(row) for row in
             runs.select('tile_y', 'tile_x', 'lab').distinct().collect()]

    parent = {n: n for n in nodes}

    def find(n):
        while parent[n] != n:
            parent[n] = parent[parent[n]]
            n = parent[n]
        return n

    for row in edges:
        na = (row[0], row[1], row[2])
        nb = (row[3], row[4], row[5])
        ra, rb = find(na), find(nb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    roots = sorted({find(n) for n in nodes})
    gid_of_root = {root: i for i, root in enumerate(roots)}
    return {n: gid_of_root[find(n)] for n in nodes}


def polygonize(spark: SparkSession, fp, mask_tiles: DataFrame,
               tile_size: int = 256) -> DataFrame:
    """Distributed find_polygons: tile masks → polygon rows
    (component_id, wkb multirings, area, n_rings), world coordinates."""
    runs = tile_runs(mask_tiles).persist()
    mapping = _resolve_components(runs, tile_size)
    if not mapping:
        return spark.createDataFrame([], POLY_SCHEMA)
    map_df = spark.createDataFrame(
        [(ty, tx, lab, gid) for (ty, tx, lab), gid in mapping.items()],
        'tile_y int, tile_x int, lab int, component_id long')
    tagged = runs.join(F.broadcast(map_df), ['tile_y', 'tile_x', 'lab'])

    coef = tuple(float(v) for v in fp._coef)

    def _trace(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        ys = pdf['y'].to_numpy()
        xs = pdf['xs'].to_numpy()
        xe = pdf['xe'].to_numpy()
        y_min, y_max = int(ys.min()), int(ys.max())
        x_min, x_max = int(xs.min()), int(xe.max())
        mask = np.zeros((y_max - y_min + 1, x_max - x_min), dtype=bool)
        for y, s, e in zip(ys, xs, xe):
            mask[y - y_min, s - x_min:e - x_min] = True
        rings_px = raster._trace_rings(mask)
        rings_w = []
        a, b, c, d, e_, f_ = coef
        for ring in rings_px:
            gx = ring[:, 0] + x_min
            gy = ring[:, 1] + y_min
            rings_w.append(np.column_stack(
                [gx * a + gy * b + c, gx * d + gy * e_ + f_]))
        areas = [abs(geometry.ring_area(r)) for r in rings_w]
        order = np.argsort(areas)[::-1]
        rings_w = [rings_w[i] for i in order]
        wkb = geometry.wkb_polygon(rings_w[0], rings_w[1:])
        return pd.DataFrame([{
            'component_id': gid,
            'wkb': bytearray(wkb),
            'area': geometry.polygon_area(rings_w),
            'n_rings': len(rings_w),
        }])

    return tagged.groupBy('component_id').applyInPandas(_trace, POLY_SCHEMA)
