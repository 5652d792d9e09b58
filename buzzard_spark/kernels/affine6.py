"""Minimal 2-D affine transform helpers over plain 6-tuples.

Coefficient order is ``(a, b, c, d, e, f)`` mapping
``(x, y) -> (a*x + b*y + c, d*x + e*y + f)`` — the same convention as the
``affine`` package the reference relies on (buzzard/_footprint.py:194).
GDAL geotransform order is ``(c, a, b, f, d, e)``.

The inverse uses the exact same floating-point expression sequence as
``affine.Affine.__invert__`` so downstream rounding matches the reference
to the last ulp.
"""

from __future__ import annotations

import math

__all__ = [
    'from_gdal', 'to_gdal', 'apply', 'inverse', 'compose',
    'translation', 'rotation_deg', 'scaling',
]


def from_gdal(gt):
    """GDAL (c, a, b, f, d, e) -> (a, b, c, d, e, f)."""
    c, a, b, f, d, e = gt
    return (a, b, c, d, e, f)


def to_gdal(coef):
    a, b, c, d, e, f = coef
    return (c, a, b, f, d, e)


def apply(coef, x, y):
    """Apply transform to scalar or ndarray coordinates."""
    a, b, c, d, e, f = coef
    return a * x + b * y + c, d * x + e * y + f


def inverse(coef):
    a, b, c, d, e, f = coef
    det = a * e - b * d
    if det == 0:
        raise ValueError('Cannot invert degenerate transform')
    idet = 1.0 / det
    ra = e * idet
    rb = -b * idet
    rd = -d * idet
    re = a * idet
    rc = -c * ra - f * rb
    rf = -c * rd - f * re
    return (ra, rb, rc, rd, re, rf)


def compose(lhs, rhs):
    """lhs ∘ rhs: apply rhs first, then lhs."""
    la, lb, lc, ld, le, lf = lhs
    ra, rb, rc, rd, re, rf = rhs
    return (
        la * ra + lb * rd,
        la * rb + lb * re,
        la * rc + lb * rf + lc,
        ld * ra + le * rd,
        ld * rb + le * re,
        ld * rc + le * rf + lf,
    )


def translation(tx, ty):
    return (1.0, 0.0, float(tx), 0.0, 1.0, float(ty))


def rotation_deg(deg):
    # quarter turns produce exact 0.0/±1.0 coefficients (the ``affine``
    # package does the same, so reference-built grids keep exact axes)
    deg = deg % 360.0
    if deg == 0.0:
        ca, sa = 1.0, 0.0
    elif deg == 90.0:
        ca, sa = 0.0, 1.0
    elif deg == 180.0:
        ca, sa = -1.0, 0.0
    elif deg == 270.0:
        ca, sa = 0.0, -1.0
    else:
        rad = math.radians(deg)
        ca, sa = math.cos(rad), math.sin(rad)
    return (ca, -sa, 0.0, sa, ca, 0.0)


def scaling(sx, sy):
    return (float(sx), 0.0, 0.0, 0.0, float(sy), 0.0)
