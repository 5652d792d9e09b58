"""The significant-digits precision discipline.

Reproduces the float rules of buzzard's ``_tools.Rect`` + env.significant
system (reference: buzzard/_tools/rect.py:55-146, buzzard/_env.py:31) —
the foundation of bit-for-bit tile assignment:

- ``spatial precision`` = max|coord| (clipped to >=1) * 10^-significant
- ``significant_min``   = -log10(smallest_reso / max|coord|)
- ``abstract grid density`` = floor(1 / (spatial_precision / smallest_reso))
  — conversions snap to this virtual sub-pixel lattice before floor/ceil.

All computations are float64; nothing here may be vectorized with fast-math.
"""

from __future__ import annotations

import numpy as np

from buzzard_spark.env import env
from buzzard_spark.kernels import affine6

__all__ = [
    'corners_angle_deg', 'corners_size', 'corners_scale',
    'spatial_precision_of', 'significant_min_of', 'abstract_grid_density_of',
    'check_significant', 'angle_between_deg',
]


def corners_angle_deg(tl, tr):
    """Rotation angle in degrees of the lr vector."""
    lrvec = np.asarray(tr, dtype=np.float64) - np.asarray(tl, dtype=np.float64)
    return float(np.arctan2(lrvec[1], lrvec[0]) * 180. / np.pi)


def corners_size(tl, br, tr):
    """Unsigned (w, h) of an imperfect rectangle given 3 corners."""
    angle = corners_angle_deg(tl, tr)
    diagvec = np.asarray(br, dtype=np.float64) - np.asarray(tl, dtype=np.float64)
    inv_rot = affine6.inverse(affine6.rotation_deg(angle))
    dx, dy = affine6.apply(inv_rot, diagvec[0], diagvec[1])
    return np.abs(np.asarray([dx, dy]), dtype=np.float64)


def corners_scale(tl, br, tr, rsize):
    """Signed pixel size from corners + raster size."""
    angle = corners_angle_deg(tl, tr)
    inv_rot = affine6.inverse(affine6.rotation_deg(angle))
    tlr = np.asarray(affine6.apply(inv_rot, tl[0], tl[1]))
    brr = np.asarray(affine6.apply(inv_rot, br[0], br[1]))
    return np.asarray((brr - tlr) / np.asarray(rsize), dtype=np.float64)


def spatial_precision_of(coords):
    """max|coord| clipped to [1, inf) times 10^-significant."""
    largest_coord = np.abs(np.asarray(coords, dtype=np.float64)).max().clip(1, np.inf)
    return largest_coord * 10 ** -env.significant


def significant_min_of(coords, smallest_reso):
    largest_coord = np.abs(np.asarray(coords, dtype=np.float64)).max().clip(1, np.inf)
    return -np.log10(smallest_reso / largest_coord)


def abstract_grid_density_of(coords, smallest_reso):
    pixel_precision = spatial_precision_of(coords) / smallest_reso
    return np.floor(1 / pixel_precision)


def check_significant(significant_min):
    """Raise like the reference when env.significant is insufficient
    (reference: buzzard/_footprint.py:1480-1486)."""
    if env.significant <= significant_min:
        raise RuntimeError(
            'This Footprint have large coordinates and small pixels, at least '
            '{:.2} significant digits are necessary to perform this operation, '
            'but `significant` is set to {}. Increase this value with '
            'Env(significant={}).'.format(
                significant_min, env.significant, env.significant + 1))


def angle_between_deg(a, b, c):
    """Angle at vertex b of the polyline a-b-c, degrees."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    u = (a - b) / np.linalg.norm(a - b)
    v = (c - b) / np.linalg.norm(c - b)
    return float(np.arccos(np.dot(u, v)) / np.pi * 180.)
