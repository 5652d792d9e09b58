"""Spatial-reference handling — the engine's §2.7 surface.

pyproj/GDAL-osr are unavailable offline, so the engine ships the two
transforms a web-page corpus actually needs, plus the reference's
validation discipline:

- ``lonlat`` (EPSG:4326-style degrees) ⇄ ``webmercator``
  (EPSG:3857-style meters, spherical formulas — public arithmetic),
- ``Analysis``: round-trip error / corner-angle / aspect-ratio checks
  against env.significant (reference: buzzard/srs/_analysis.py:8-106),
- ``normalize_footprint``: re-locate a Footprint into the work CRS via
  move(round_coordinates=True), the reference's open-time reprojection
  (reference: buzzard/_a_source_raster.py:204-218).

The registry keys are plain strings; a real pyproj Transformer drops in
behind ``get_transform``.
"""

from __future__ import annotations

import numpy as np

from buzzard_spark.env import env

R = 6378137.0  # spherical earth radius (web-mercator convention)


def _lonlat_to_webmercator(x, y):
    mx = np.radians(np.asarray(x, dtype=np.float64)) * R
    my = np.log(np.tan(np.pi / 4 + np.radians(np.asarray(y, dtype=np.float64)) / 2)) * R
    return mx, my


def _webmercator_to_lonlat(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R)) - np.pi / 2)
    return lon, lat


_TRANSFORMS = {
    ('lonlat', 'webmercator'): _lonlat_to_webmercator,
    ('webmercator', 'lonlat'): _webmercator_to_lonlat,
    ('lonlat', 'lonlat'): lambda x, y: (np.asarray(x, dtype=np.float64),
                                        np.asarray(y, dtype=np.float64)),
    ('webmercator', 'webmercator'): lambda x, y: (np.asarray(x, dtype=np.float64),
                                                  np.asarray(y, dtype=np.float64)),
}


def get_transform(src: str, dst: str):
    """Vectorized (xs, ys) -> (xs', ys') transform between registered CRSs."""
    try:
        return _TRANSFORMS[(src, dst)]
    except KeyError:
        raise ValueError(f'no transform registered for {src!r} -> {dst!r}')


class Analysis:
    """Losslessness analysis of a transform over a footprint's corners
    (the reference gates sr modes on this; buzzard/srs/_analysis.py)."""

    def __init__(self, fwd, bwd, fp):
        coords = fp.coords  # (tl, bl, br, tr)
        fx, fy = fwd(coords[:, 0], coords[:, 1])
        bx, by = bwd(fx, fy)
        self.roundtrip_error = float(np.abs(
            np.column_stack([bx, by]) - coords).max())
        largest = np.abs(coords).max().clip(1, np.inf)
        self.spatial_precision = largest * 10 ** -env.significant
        self.lossless = self.roundtrip_error < self.spatial_precision

        # aspect-ratio / corner-angle drift of the projected rectangle
        proj = np.column_stack([fx, fy])
        lr = proj[3] - proj[0]
        tb = proj[1] - proj[0]
        self.angle_drift = abs(90.0 - np.degrees(abs(
            np.arccos(np.clip(np.dot(lr / np.linalg.norm(lr),
                                     tb / np.linalg.norm(tb)), -1, 1)))))


def normalize_footprint(fp, src: str, work: str):
    """Re-locate a Footprint into the work CRS (affine approximation over
    its corners + snap, like the reference's open-time move)."""
    fwd = get_transform(src, work)
    tl = np.asarray(fwd(*fp.tl))
    tr = np.asarray(fwd(*fp.tr))
    br = np.asarray(fwd(*fp.br))
    return fp.move(tl, tr, br, round_coordinates=True)
