"""Vectorized geometry kernels: WKB codec + point-in-polygon + bboxes.

shapely is unavailable offline (SURVEY.md §7.0), so the engine ships its
own numpy geometry: a minimal WKB codec (Point / LineString / Polygon /
MultiPolygon, little-endian) and an even-odd ray-casting PIP over
coordinate arrays — the vectorized replacement for the reference's
per-feature ``geom.Intersection`` / OGR spatial filter path
(reference: buzzard/_a_gdal_vector.py:45-103). Everything here is
numpy-only and safe inside pandas UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


# -- WKB encode -----------------------------------------------------------------

def wkb_point(x, y) -> bytes:
    return struct.pack('<BIdd', 1, _WKB_POINT, float(x), float(y))


def wkb_linestring(coords) -> bytes:
    coords = np.asarray(coords, dtype='<f8')
    head = struct.pack('<BII', 1, _WKB_LINESTRING, len(coords))
    return head + coords.tobytes()


def _ring_bytes(ring) -> bytes:
    ring = np.asarray(ring, dtype='<f8')
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return struct.pack('<I', len(ring)) + ring.tobytes()


def wkb_polygon(exterior, holes=()) -> bytes:
    out = [struct.pack('<BII', 1, _WKB_POLYGON, 1 + len(holes))]
    out.append(_ring_bytes(exterior))
    for hole in holes:
        out.append(_ring_bytes(hole))
    return b''.join(out)


def wkb_multipolygon(polygons) -> bytes:
    """polygons: sequence of (exterior, holes) pairs."""
    out = [struct.pack('<BII', 1, _WKB_MULTIPOLYGON, len(polygons))]
    for exterior, holes in polygons:
        out.append(wkb_polygon(exterior, holes))
    return b''.join(out)


# -- WKB decode -----------------------------------------------------------------

def _read_u32(buf, off):
    return struct.unpack_from('<I', buf, off)[0], off + 4


def wkb_decode(buf: bytes):
    """→ (geom_type_str, payload):

    - ('point', (x, y))
    - ('linestring', ndarray (N, 2))
    - ('polygon', [ring0, ring1, ...])   ring = ndarray (N, 2), ring0 exterior
    - ('multipolygon', [rings, rings, ...])
    """
    geom, _ = _decode_at(buf, 0)
    return geom


def _decode_at(buf, off):
    byte_order = buf[off]
    assert byte_order == 1, 'big-endian WKB unsupported'
    gtype, off2 = _read_u32(buf, off + 1)
    gtype &= 0xFF  # mask Z/M/SRID flag variants
    if gtype == _WKB_POINT:
        x, y = struct.unpack_from('<dd', buf, off2)
        return ('point', (x, y)), off2 + 16
    if gtype == _WKB_LINESTRING:
        n, off3 = _read_u32(buf, off2)
        arr = np.frombuffer(buf, '<f8', n * 2, off3).reshape(n, 2)
        return ('linestring', arr), off3 + n * 16
    if gtype == _WKB_POLYGON:
        nrings, off3 = _read_u32(buf, off2)
        rings = []
        for _ in range(nrings):
            n, off3 = _read_u32(buf, off3)
            rings.append(np.frombuffer(buf, '<f8', n * 2, off3).reshape(n, 2))
            off3 += n * 16
        return ('polygon', rings), off3
    if gtype == _WKB_MULTIPOLYGON:
        nparts, off3 = _read_u32(buf, off2)
        parts = []
        for _ in range(nparts):
            (kind, rings), off3 = _decode_at(buf, off3)
            assert kind == 'polygon'
            parts.append(rings)
        return ('multipolygon', parts), off3
    raise ValueError('unsupported wkb geometry type %d' % gtype)


def wkb_bbox(buf: bytes):
    """(minx, miny, maxx, maxy) of any supported geometry."""
    kind, payload = wkb_decode(buf)
    if kind == 'point':
        x, y = payload
        return (x, y, x, y)
    if kind == 'linestring':
        arr = payload
    elif kind == 'polygon':
        arr = payload[0]
    else:  # multipolygon: exteriors only
        arr = np.vstack([rings[0] for rings in payload])
    return (float(arr[:, 0].min()), float(arr[:, 1].min()),
            float(arr[:, 0].max()), float(arr[:, 1].max()))


# -- point-in-polygon -----------------------------------------------------------

def points_in_ring(px, py, ring) -> np.ndarray:
    """Even-odd ray casting of many points against one ring. Vectorized
    over points AND edges: O(P·E) numpy ops, no Python loop over points."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = ring[:-1, 0][None, :]
    y1 = ring[:-1, 1][None, :]
    x2 = ring[1:, 0][None, :]
    y2 = ring[1:, 1][None, :]
    straddles = (y1 > py) != (y2 > py)
    with np.errstate(divide='ignore', invalid='ignore'):
        xcross = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hits = straddles & (px < xcross)
    return hits.sum(axis=1) % 2 == 1


def points_in_polygon(px, py, rings) -> np.ndarray:
    """PIP with holes: inside exterior, outside every hole (even-odd)."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_wkb(px, py, buf: bytes) -> np.ndarray:
    kind, payload = wkb_decode(buf)
    if kind == 'polygon':
        return points_in_polygon(px, py, payload)
    if kind == 'multipolygon':
        out = np.zeros(len(np.asarray(px)), dtype=bool)
        for rings in payload:
            out |= points_in_polygon(px, py, rings)
        return out
    raise ValueError('points_in_wkb expects polygon/multipolygon, got %s' % kind)


# -- polygon helpers ------------------------------------------------------------

def ring_area(ring) -> float:
    """Signed shoelace area (CCW positive)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return float(0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings) -> float:
    """Unsigned area with holes subtracted."""
    return abs(ring_area(rings[0])) - sum(abs(ring_area(h)) for h in rings[1:])
