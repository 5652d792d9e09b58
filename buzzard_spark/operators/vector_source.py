"""Vector feature scan — the distributed ``iter_data``
(reference: buzzard/_a_source_vector.py:70-166, pushdown
buzzard/_a_gdal_vector.py:94-125):

- field projection  (None = all fields, [] = geometry only, names list),
- spatial mask      (bbox predicate → Catalyst/parquet min-max pruning —
  the engine's SetSpatialFilterRect),
- exact refine + clip (WKB rect clip in an Arrow pandas UDF),
- slicing           (applied after the filter, deterministic fid order).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scan_features(features: DataFrame, fields: list[str] | None = None,
                  mask=None, clip: bool = False,
                  slicing: slice | None = None,
                  geom_col: str = 'wkb', fid_col: str = 'fid') -> DataFrame:
    """features must carry bbox columns (minx, miny, maxx, maxy).

    mask: (minx, miny, maxx, maxy) world rect or None.
    slicing: python slice with step 1 (reference applies it post-filter).
    """
    df = features
    if mask is not None:
        mnx, mny, mxx, mxy = (float(v) for v in mask)
        df = df.where(
            (F.col('minx') <= mxx) & (F.col('maxx') >= mnx) &
            (F.col('miny') <= mxy) & (F.col('maxy') >= mny))
        if clip:
            @F.pandas_udf('binary')
            def _clip(wkb: pd.Series) -> pd.Series:
                from buzzard_spark.kernels import geometry
                out = []
                for buf in wkb:
                    res = geometry.clip_wkb_rect(bytes(buf), mnx, mny, mxx, mxy)
                    out.append(None if res is None else bytearray(res))
                return pd.Series(out)

            df = df.withColumn(geom_col, _clip(F.col(geom_col))) \
                   .where(F.col(geom_col).isNotNull())
    if slicing is not None:
        assert slicing.step in (None, 1), 'only step-1 slicing supported'
        w = Window.orderBy(F.col(fid_col).asc())
        cond = F.col('_pos') >= (slicing.start or 0)
        if slicing.stop is not None:
            cond = cond & (F.col('_pos') < slicing.stop)
        df = (df.withColumn('_pos', F.row_number().over(w) - 1)
              .where(cond).drop('_pos'))
    if fields is None:
        return df
    keep = [fid_col, geom_col] + list(fields)
    return df.select(*[c for c in df.columns if c in keep])
