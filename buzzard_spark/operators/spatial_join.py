"""Distributed spatial join: cell-indexed point-in-polygon.

The Spark-first generalization of buzzard's single-machine overlay
(reference: buzzard/_a_gdal_vector.py:94-103 ``SetSpatialFilter`` +
buzzard/_footprint.py:421 ``intersection``): instead of filtering one
polygon at a time against one OGR layer, the engine

1. assigns every page its equirectangular cell (JVM-side arithmetic —
   whole-stage codegen, no Python),
2. explodes each region into its cover cells (sequence() + explode, also
   JVM-side),
3. equi-joins on cell — broadcast when the cover is small, shuffle hash
   join with AQE skew handling otherwise,
4. refines exactly with the geometric predicate.

At 10^12-page scale the shuffle is keyed by cell, so hot cells (dense
regions) are the skew risk: AQE skew-join splitting is enabled in
session config; for pathological dimension-side fanout use
``salt`` > 1 to spread each cover cell over N join keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from buzzard_spark.functions import sqlgen
from buzzard_spark.kernels import cells


def assign_cell(pages: DataFrame, res: int,
                lat='lat', lng='lng', out='cell') -> DataFrame:
    """Add the cell-id column (pure Catalyst expression).

    The expression is wrapped in a value-neutral ``coalesce(expr, -1)`` so
    the column is provably NON-NULLABLE: without it, an inner join on the
    cell infers an IsNotNull(cell) constraint that Catalyst pushes below
    the projection, RECOMPUTING the whole cell expression (and its lat/lng
    inputs) a second time per row inside a Filter node — measured as a
    significant share of the flagship's map-stage cost (round 3).

    The sentinel is -1, a cell id no cover/ring expansion can ever emit
    (all real cells are ≥ 0): a row with NULL lat/lng therefore still
    drops out of every downstream equi-join, preserving inner-join null
    semantics exactly. The null check must be EXPLICIT (ADVICE r3): the
    cell expression's GREATEST/LEAST clamps swallow nulls in Spark
    (``greatest(NULL, 0) = 0``), so a NULL coordinate would otherwise be
    silently clamped into a VALID edge cell, never surfacing as NULL for
    a coalesce to catch. For non-nullable lat/lng columns (the flagship
    path) Catalyst constant-folds the IS NULL branches away — zero cost."""
    expr = sqlgen.cell_sql(lat, lng, res)
    return pages.withColumn(
        out, F.expr(f'CASE WHEN {lat} IS NULL OR {lng} IS NULL '
                    f'THEN CAST(-1 AS BIGINT) '
                    f'ELSE coalesce({expr}, CAST(-1 AS BIGINT)) END'))


def cover_cells_rect(regions: DataFrame, res: int, salt: int = 1) -> DataFrame:
    """Explode rectangle regions into (region cols…, cell) cover rows.

    Mirrors kernels.cells.cover_rect with sequence()+explode so the whole
    cover generation stays in the JVM. With ``salt`` > 1 each cover cell is
    replicated into N salted keys (cell*salt+i) for skew spreading — pages
    must then join on (cell*salt + pmod(hash, salt)).
    """
    nx, ny = cells.dims(res)
    iy0 = sqlgen.lat_cell_row_sql('maxlat', res)
    iy1 = sqlgen.lat_cell_row_sql('minlat', res)
    ix0 = sqlgen.lng_cell_col_sql('minlng', res)
    ix1 = sqlgen.lng_cell_col_sql('maxlng', res)
    out = (
        regions
        .withColumn('_iy', F.explode(F.expr(f'sequence({iy0}, {iy1})')))
        .withColumn('_ix', F.explode(F.expr(f'sequence({ix0}, {ix1})')))
        .withColumn('cell', F.expr(f'_iy * {nx} + _ix'))
        .drop('_iy', '_ix')
    )
    if salt > 1:
        out = (
            out
            .withColumn('_s', F.explode(F.expr(f'sequence(0, {salt - 1})')))
            .withColumn('cell', F.expr(f'cell * {salt} + _s'))
            .drop('_s')
        )
    return out


def pip_join_rect(pages: DataFrame, regions: DataFrame, res: int,
                  broadcast_cover: bool = True, salt: int = 1) -> DataFrame:
    """pages ⨝ rectangle-regions, point-in-rect.

    Returns one row per (page, containing region). The equi-join on cell
    prunes candidates; the BETWEEN refine is exact. Each page has exactly
    one cell and cover cells are distinct per region, so no dedup is needed.
    """
    pages_c = assign_cell(pages, res)
    if salt > 1:
        pages_c = pages_c.withColumn(
            'cell', F.expr(f'cell * {salt} + pmod(hash(lat, lng), {salt})'))
    cover = cover_cells_rect(regions, res, salt=salt)
    if broadcast_cover:
        cover = F.broadcast(cover)
    joined = pages_c.join(cover, 'cell')
    return joined.where(
        (F.col('lat') >= F.col('minlat')) & (F.col('lat') <= F.col('maxlat')) &
        (F.col('lng') >= F.col('minlng')) & (F.col('lng') <= F.col('maxlng')))


def pip_join_wkb(pages: DataFrame, regions: DataFrame, res: int,
                 broadcast_cover: bool = True) -> DataFrame:
    """pages ⨝ arbitrary-polygon regions (WKB), exact point-in-polygon.

    regions: (region_id, wkb binary, minlat, minlng, maxlat, maxlng).
    Candidate pruning = bbox cover-cell equi-join (JVM); exact refine =
    Arrow-batched pandas UDF running the vectorized ray-casting kernel
    (kernels.geometry.points_in_wkb) with a per-batch decode cache — the
    distributed generalization of the reference's one-polygon-at-a-time
    ``SetSpatialFilter`` + Intersection scan
    (reference: buzzard/_a_gdal_vector.py:45-103).
    """
    @F.pandas_udf('boolean')
    def _pip(lat: pd.Series, lng: pd.Series, wkb: pd.Series) -> pd.Series:
        from buzzard_spark.kernels import geometry

        out = np.zeros(len(lat), dtype=bool)
        lat_v = lat.to_numpy(dtype=np.float64)
        lng_v = lng.to_numpy(dtype=np.float64)
        # vectorize per distinct polygon in the batch
        for buf, idx in wkb.groupby(wkb, sort=False).indices.items():
            out[idx] = geometry.points_in_wkb(lng_v[idx], lat_v[idx], buf)
        return pd.Series(out)

    pages_c = assign_cell(pages, res)
    cover = cover_cells_rect(regions, res)
    if broadcast_cover:
        cover = F.broadcast(cover)
    joined = pages_c.join(cover, 'cell')
    # cheap bbox refine first (codegen), exact PIP only on bbox survivors
    joined = joined.where(
        (F.col('lat') >= F.col('minlat')) & (F.col('lat') <= F.col('maxlat')) &
        (F.col('lng') >= F.col('minlng')) & (F.col('lng') <= F.col('maxlng')))
    return joined.where(_pip(F.col('lat'), F.col('lng'), F.col('wkb')))


def pip_count_by_region(pages: DataFrame, regions: DataFrame, res: int,
                        **kwargs) -> DataFrame:
    """Pages-per-region — the flagship slice query (SURVEY.md §7.1 step 3).

    The groupBy after the refine is a partial-aggregated (map-side combine)
    count keyed by region_id — tiny shuffle even at full scale.
    """
    return (
        pip_join_rect(pages, regions, res, **kwargs)
        .groupBy('region_id')
        .agg(F.count('*').alias('page_count'))
    )


def rect_overlap_pairs(regions: DataFrame, res: int,
                       id_col: str = 'region_id') -> DataFrame:
    """Polygon-polygon (bbox) overlap SELF-join via shared cover cells —
    the region-to-region analogue of the page-to-region PIP join.

    Candidates: two rectangles that overlap both cover the cell
    containing any point of their (non-empty) intersection, so a cover ⋈
    cover equi-join on the cell id has EXACT recall — never a cross join,
    and per-cell fan-out is bounded by the cover density at ``res``
    (AQE's skew handling applies to hot cells exactly as in the PIP
    join). Verify: the exact inclusive bbox-intersection predicate on
    the pair (boundary touch counts as overlap; the oracle evaluates the
    identical predicate, so the contract is engine-exact).

    Output: (id_a, id_b), id_a < id_b, distinct.
    """
    cov = cover_cells_rect(regions, res).select(
        F.col(id_col).alias('_id'), 'cell',
        'minlat', 'maxlat', 'minlng', 'maxlng')
    a = cov.alias('a')
    b = cov.alias('b')
    return (a.join(b, (F.col('a.cell') == F.col('b.cell')) &
                   (F.col('a._id') < F.col('b._id')))
            .where((F.col('a.minlat') <= F.col('b.maxlat')) &
                   (F.col('b.minlat') <= F.col('a.maxlat')) &
                   (F.col('a.minlng') <= F.col('b.maxlng')) &
                   (F.col('b.minlng') <= F.col('a.maxlng')))
            .select(F.col('a._id').alias('id_a'),
                    F.col('b._id').alias('id_b'))
            .distinct())
