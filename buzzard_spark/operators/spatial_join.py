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
import math

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


def distance_pairs(pages: DataFrame, eps: float, res: int,
                   id_col: str = 'page_id',
                   lat: str = 'lat', lng: str = 'lng') -> DataFrame:
    """Spatial ε-join (within-distance self-join): all unordered pairs of
    pages at planar distance ≤ ``eps`` degrees, as::

        (id_a, id_b, dist2)     -- id_a < id_b, dist2 = squared distance

    the third of the classic spatial-join triad (PIP join, kNN,
    distance join — the reference answers it array-side via
    ``Footprint.dilate`` + mask intersection; here it is the grid-file
    blocking join of the published spatial-join literature).

    Plan shape: one cell assignment at resolution ``res``, the LEFT side
    exploded to the ``(2kx+1)·(2ky+1)`` neighbor cells that can hold a
    point within ``eps`` (kx/ky from the cell dims — exactness is
    guaranteed, not probabilistic), ONE equi-join on the cell id, exact
    distance filter, ``id_a < id_b`` to collapse the two orientations
    each pair appears in. No distinct needed: a pair is emitted exactly
    once because the right side sits on its OWN cell (each (a, b) join
    hit is unique per orientation).

    Distance is planar squared-degrees (the engine's kNN metric —
    :data:`buzzard_spark.operators.knn.DIST2`), exact in IEEE doubles so
    the DuckDB oracle matches bit-for-bit. NULL coordinates drop out via
    the −1 sentinel (:func:`assign_cell` contract — the exploded ring
    of a sentinel row stays negative and matches nothing).

    Scale shape (10^12 pages): output size is inherently quadratic in
    local density — pick ``res`` so the typical cell holds O(1/eps²)
    points (cells ≈ eps wide ⇒ the ring is 3×3 and each point meets only
    its true neighborhood). Hot cells (urban skew) inflate one join key;
    AQE skew-join splits them, and the ring explosion is on the SMALLER
    exploded side (factor ≤ 9 at the recommended res), never the raw
    corpus twice.
    """
    if eps <= 0:
        raise ValueError(f'eps must be > 0: {eps}')
    cw, ch = cells.cell_size_deg(res)
    kx = int(math.ceil(eps / cw))
    ky = int(math.ceil(eps / ch))
    nx, ny = cells.dims(res)
    a = assign_cell(pages, res, lat=lat, lng=lng, out='_c') \
        .select(F.col(id_col).alias('id_a'), F.col(lat).alias('_alat'),
                F.col(lng).alias('_alng'), '_c') \
        .withColumn('_ax', F.expr(f'_c % {nx}')) \
        .withColumn('_ay', F.expr(f'_c DIV {nx}'))
    # neighbor cells WITHOUT longitude wrap (planar metric: the distance
    # filter is planar, so a wrapped cell could never pass it anyway);
    # sentinel rows (_c = -1 -> _ay = -1) produce no in-range cells
    ring = (f'CASE WHEN _c < 0 THEN array(CAST(-1 AS BIGINT)) ELSE '
            f'flatten(transform('
            f'sequence(GREATEST(_ay - {ky}, 0L), LEAST(_ay + {ky}, {ny - 1}L)), '
            f'yy -> transform('
            f'sequence(GREATEST(_ax - {kx}, 0L), LEAST(_ax + {kx}, {nx - 1}L)), '
            f'xx -> yy * {nx} + xx))) END')
    a = (a.withColumn('cell', F.explode(F.expr(ring)))
         .where(F.col('cell') >= 0)
         .drop('_c', '_ax', '_ay'))
    b = assign_cell(pages, res, lat=lat, lng=lng, out='cell') \
        .select(F.col(id_col).alias('id_b'), F.col(lat).alias('_blat'),
                F.col(lng).alias('_blng'), 'cell') \
        .where(F.col('cell') >= 0)
    d2 = ('(_alat - _blat) * (_alat - _blat) + '
          '(_alng - _blng) * (_alng - _blng)')
    el = sqlgen.dlit(eps)
    return (a.join(b, 'cell')
            .where(F.col('id_a') < F.col('id_b'))
            .where(F.expr(f'{d2} <= {el} * {el}'))
            .select('id_a', 'id_b', F.expr(d2).alias('dist2')))


def distance_pairs_oracle_sql(pages_cte: str, eps: float,
                              id_col: str = 'page_id',
                              lat: str = 'lat', lng: str = 'lng') -> str:
    """DuckDB twin of :func:`distance_pairs`: brute-force all-pairs with
    the identical planar dist2 expression (exact IEEE arithmetic both
    sides; NULL coordinates drop via the inequality)."""
    d2 = (f'(a.{lat} - b.{lat}) * (a.{lat} - b.{lat}) + '
          f'(a.{lng} - b.{lng}) * (a.{lng} - b.{lng})')
    el = sqlgen.dlit(eps)
    return (f'WITH p AS ({pages_cte}) '
            f'SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, '
            f'{d2} AS dist2 FROM p a JOIN p b '
            f'ON a.{id_col} < b.{id_col} '
            f'WHERE {d2} <= {el} * {el}')
