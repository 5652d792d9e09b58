"""Raster ↔ vector kernels: rasterize / polygonize / lines / slopes.

GDAL-free numpy reimplementations of the reference's conversions
(reference: buzzard/_footprint.py:1538-1935):

- ``burn_polygons`` — scanline rasterization with GDAL's pixel-center rule
  (pixel burned iff its center is inside; even-odd, holes supported) and an
  ``all_touched`` variant; ``labelize`` burns feature index (last wins, in
  feature order, like gdal.RasterizeLayer with ATTRIBUTE).
- ``find_polygons`` — pixel-is-area polygonization of a bool mask:
  4-connected components, edge-walk boundary tracing with a right-turn rule
  at pinch corners so holes touching the exterior diagonally stay holes
  (the exact case buzzard fixes with buffer(0),
  reference: buzzard/_footprint.py:1798-1804).
- ``burn_lines`` — DDA line rasterization on the pixel grid.
- ``find_lines`` — mask skeleton → merged polylines (degree-2 chain merge).
- ``slopes`` — Horn 8-neighbor gradient in degrees
  (reference: buzzard/algo/_slopes.py:25-57).

All functions operate in *raster* pixel space given arrays plus the
footprint's affine for world conversion; they are numpy-only and run
per-tile inside applyInPandas in the distributed layer.
"""

from __future__ import annotations

import numpy as np

from buzzard_spark.kernels import geometry


# -- rasterize -------------------------------------------------------------------

def _rings_to_raster(rings, fp):
    return [np.column_stack(
        _world_to_pixel_float(fp, ring[:, 0], ring[:, 1])) for ring in rings]


def _world_to_pixel_float(fp, xs, ys):
    from buzzard_spark.kernels import affine6
    a, b, c, d, e, f = affine6.inverse(fp._coef)
    return xs * a + ys * b + c, xs * d + ys * e + f


def _burn_rings_centers(out, rings_px, value):
    """Even-odd scanline at pixel centers (GDAL default rule)."""
    h, w = out.shape
    ys = np.arange(h) + 0.5
    # all rings' edges participate jointly in the even-odd rule
    x1 = np.concatenate([r[:-1, 0] for r in rings_px])
    y1 = np.concatenate([r[:-1, 1] for r in rings_px])
    x2 = np.concatenate([r[1:, 0] for r in rings_px])
    y2 = np.concatenate([r[1:, 1] for r in rings_px])
    keep = y1 != y2
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
    if len(x1) == 0:
        return
    for iy, cy in enumerate(ys):
        straddle = (y1 > cy) != (y2 > cy)
        if not straddle.any():
            continue
        xc = x1[straddle] + (cy - y1[straddle]) * \
            (x2[straddle] - x1[straddle]) / (y2[straddle] - y1[straddle])
        xc.sort()
        # pixel center cx = ix + 0.5 inside iff odd # of crossings to its left
        idx = np.searchsorted(xc, np.arange(w) + 0.5, side='left')
        inside = (idx % 2) == 1
        out[iy, inside] = value


def _burn_rings_all_touched(out, rings_px, value):
    """Burn every pixel touched by the boundary, then fill interior."""
    _burn_rings_centers(out, rings_px, value)
    for ring in rings_px:
        for i in range(len(ring) - 1):
            _burn_segment(out, ring[i], ring[i + 1], value)


def _burn_segment(out, p, q, value):
    """DDA over the segment; marks every pixel the segment passes through."""
    h, w = out.shape
    x1, y1 = p
    x2, y2 = q
    n = int(max(abs(x2 - x1), abs(y2 - y1)) * 2) + 1
    ts = np.linspace(0.0, 1.0, n + 1)
    xs = np.clip((x1 + (x2 - x1) * ts).astype(np.int64), 0, w - 1)
    ys = np.clip((y1 + (y2 - y1) * ts).astype(np.int64), 0, h - 1)
    # only mark pixels the segment actually traverses inside bounds
    inb = ((x1 + (x2 - x1) * ts) >= 0) & ((x1 + (x2 - x1) * ts) < w) & \
          ((y1 + (y2 - y1) * ts) >= 0) & ((y1 + (y2 - y1) * ts) < h)
    out[ys[inb], xs[inb]] = value


def burn_polygons(fp, objs, all_touched=False, labelize=False):
    """Rasterize polygons into fp's grid.

    objs: WKB bytes, decoded ('polygon', rings) payloads, raw ring lists,
    or any nested sequence of those (reference accepts nested iterators,
    buzzard/_footprint.py:1884).
    """
    polys = list(_iter_polys(objs))
    if labelize:
        if len(polys) >= 65535:
            dtype = np.dtype('uint32')
        elif len(polys) >= 255:
            dtype = np.dtype('uint16')
        else:
            dtype = np.dtype('uint8')
    else:
        dtype = np.dtype('bool')
    out = np.zeros(tuple(fp.shape), dtype=dtype)
    for i, rings in enumerate(polys, 1):
        rings_px = _rings_to_raster(rings, fp)
        value = i if labelize else True
        if all_touched:
            _burn_rings_all_touched(out, rings_px, value)
        else:
            _burn_rings_centers(out, rings_px, value)
    return out


def _iter_polys(obj):
    """Yield ring-lists from WKB bytes / decoded payloads / nested seqs."""
    if isinstance(obj, (bytes, bytearray)):
        kind, payload = geometry.wkb_decode(bytes(obj))
        if kind == 'polygon':
            yield payload
        elif kind == 'multipolygon':
            yield from payload
        else:
            raise ValueError('cannot burn geometry type %s' % kind)
    elif isinstance(obj, np.ndarray) and obj.ndim == 2:
        yield [obj]
    elif isinstance(obj, (list, tuple)):
        if obj and isinstance(obj[0], np.ndarray) and obj[0].ndim == 2:
            yield [np.asarray(r, dtype=np.float64) for r in obj]
        else:
            for sub in obj:
                yield from _iter_polys(sub)
    else:
        raise TypeError('cannot burn %r' % type(obj))


# -- polygonize -------------------------------------------------------------------

def _label_components(mask):
    """4-connected component labels via row-run union-find (numpy per row)."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    prev_runs = []  # (start, end, label) of previous row
    next_label = 1
    for y in range(h):
        row = mask[y]
        if not row.any():
            prev_runs = []
            continue
        padded = np.diff(np.r_[0, row.view(np.int8), 0])
        starts = np.flatnonzero(padded == 1)
        ends = np.flatnonzero(padded == -1)
        runs = []
        for s, e in zip(starts, ends):
            lab = 0
            for ps, pe, plab in prev_runs:
                if ps < e and s < pe:  # 4-connectivity overlap
                    if lab == 0:
                        lab = plab
                    else:
                        union(lab, plab)
            if lab == 0:
                lab = next_label
                parent.append(lab)
                next_label += 1
            labels[y, s:e] = lab
            runs.append((s, e, lab))
        # resolve merged labels within this row now (runs keep raw labels)
        prev_runs = runs
    if next_label > 1:
        lut = np.zeros(next_label, dtype=np.int32)
        for i in range(1, next_label):
            lut[i] = find(i)
        # compact to 1..n
        uniq = np.unique(lut[1:])
        remap = np.zeros(next_label, dtype=np.int32)
        remap[uniq] = np.arange(1, len(uniq) + 1)
        labels = remap[lut[labels]]
    return labels, int(labels.max())


_DIRS = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}
_VECS = [(1, 0), (0, 1), (-1, 0), (0, -1)]


def _walk_edges(edges):
    """Assemble closed rings from a directed boundary-edge dict
    {(vx, vy, dir): used}. Directed edges keep the filled pixel on the
    RIGHT of travel; at pinch vertices the sharpest right turn is taken,
    which preserves 4-connectivity (diagonal contact does not merge)."""
    rings = []
    for start in edges:
        if edges[start]:
            continue
        ring = []
        vx, vy, d = start
        while True:
            edges[(vx, vy, d)] = True
            ring.append((vx, vy))
            dx, dy = _VECS[d]
            vx, vy = vx + dx, vy + dy
            # prefer right turn, then straight, then left (never U-turn)
            for nd in ((d + 1) % 4, d, (d + 3) % 4):
                key = (vx, vy, nd)
                if key in edges and not edges[key]:
                    d = nd
                    break
            else:
                break  # closed the loop
        ring.append(ring[0])
        rings.append(np.asarray(ring, dtype=np.float64))
    return rings


def _trace_rings(comp_mask):
    """Boundary rings of one component (pixel-is-area corners, raster
    coords) from a dense mask."""
    h, w = comp_mask.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = comp_mask
    edges = {}  # (vx, vy, dir) -> used?

    ys, xs = np.nonzero(comp_mask)
    for x, y in zip(xs, ys):
        if not pad[y, x + 1]:        # empty above -> east edge on top
            edges[(x, y, 0)] = False
        if not pad[y + 1, x + 2]:    # empty right -> south edge on right
            edges[(x + 1, y, 1)] = False
        if not pad[y + 2, x + 1]:    # empty below -> west edge on bottom
            edges[(x + 1, y + 1, 2)] = False
        if not pad[y + 1, x]:        # empty left -> north edge on left
            edges[(x, y + 1, 3)] = False

    return _walk_edges(edges)


def _uncovered(s, e, row):
    """Sub-intervals of [s, e) not covered by the sorted disjoint intervals
    ``row`` = (starts, ends) — interval subtraction for run exposure."""
    if row is None:
        yield (s, e)
        return
    rs, re = row
    i = int(np.searchsorted(re, s, side='right'))
    cur = s
    while cur < e and i < len(rs):
        a, b = int(rs[i]), int(re[i])
        if a >= e:
            break
        if a > cur:
            yield (cur, min(a, e))
        cur = max(cur, b)
        i += 1
    if cur < e:
        yield (cur, e)


def trace_rings_from_runs(ys, xs, xe):
    """Boundary rings of ONE component given its scanline runs (pixel
    coords, any frame) — O(perimeter) memory and time: the dense mask is
    never materialized, so a continent-scale component (huge area, modest
    boundary) traces without rebuilding its area. Same ring contract as
    ``_trace_rings`` (pixel-is-area corners, holes preserved, right-turn
    rule at pinch vertices).

    ys/xs/xe: arrays — run at row ys[i] covers pixels [xs[i], xe[i]).
    Runs of one row must be disjoint (they are, from ``_label_components``).
    """
    ys = np.asarray(ys, dtype=np.int64)
    xs = np.asarray(xs, dtype=np.int64)
    xe = np.asarray(xe, dtype=np.int64)
    order = np.lexsort((xs, ys))
    ys, xs, xe = ys[order], xs[order], xe[order]
    # coalesce abutting runs: tile seams split a row's run at x boundaries,
    # which would otherwise fabricate interior left/right edges at the seam
    if len(ys):
        keep = np.r_[True, (ys[1:] != ys[:-1]) | (xs[1:] != xe[:-1])]
        grp = np.cumsum(keep) - 1
        n = int(grp[-1]) + 1
        ys2 = ys[keep]
        xs2 = xs[keep]
        xe2 = np.zeros(n, dtype=np.int64)
        np.maximum.at(xe2, grp, xe)
        ys, xs, xe = ys2, xs2, xe2
    rows = {}
    if len(ys):
        bounds = np.flatnonzero(np.diff(ys)) + 1
        for seg in np.split(np.arange(len(ys)), bounds):
            rows[int(ys[seg[0]])] = (xs[seg], xe[seg])
    edges = {}
    for y, (s_arr, e_arr) in rows.items():
        up = rows.get(y - 1)
        dn = rows.get(y + 1)
        for s, e in zip(s_arr.tolist(), e_arr.tolist()):
            edges[(s, y + 1, 3)] = False       # exposed left → north edge
            edges[(e, y, 1)] = False           # exposed right → south edge
            for a, b in _uncovered(s, e, up):  # exposed top → east edges
                for x in range(a, b):
                    edges[(x, y, 0)] = False
            for a, b in _uncovered(s, e, dn):  # exposed bottom → west edges
                for x in range(a, b):
                    edges[(x + 1, y + 1, 2)] = False
    return _walk_edges(edges)


def find_polygons(fp, mask):
    """bool mask → list of ('polygon', [exterior, holes...]) ring lists in
    WORLD coordinates (pixel-is-area corners, holes preserved)."""
    if mask.shape != tuple(fp.shape):
        raise ValueError('Mask shape{} incompatible with footprint shape{}'
                         .format(mask.shape, tuple(fp.shape)))
    labels, n = _label_components(mask.astype(bool))
    out = []
    for comp in range(1, n + 1):
        rings_px = _trace_rings(labels == comp)
        # world coords; exterior = largest |area|
        rings_w = []
        for ring in rings_px:
            xw, yw = _pixel_to_world(fp, ring[:, 0], ring[:, 1])
            rings_w.append(np.column_stack([xw, yw]))
        areas = [abs(geometry.ring_area(r)) for r in rings_w]
        order = np.argsort(areas)[::-1]
        out.append([rings_w[i] for i in order])
    return out


def _pixel_to_world(fp, xs, ys):
    a, b, c, d, e, f = fp._coef
    return xs * a + ys * b + c, xs * d + ys * e + f


# -- lines -----------------------------------------------------------------------

def burn_lines(fp, lines, labelize=False):
    """Rasterize linestrings (world coords or WKB) via DDA."""
    geoms = []
    for obj in lines:
        if isinstance(obj, (bytes, bytearray)):
            kind, payload = geometry.wkb_decode(bytes(obj))
            assert kind == 'linestring'
            geoms.append(payload)
        else:
            geoms.append(np.asarray(obj, dtype=np.float64))
    if labelize:
        dtype = np.dtype('uint8') if len(geoms) < 255 else np.dtype('uint16')
    else:
        dtype = np.dtype('bool')
    out = np.zeros(tuple(fp.shape), dtype=dtype)
    for i, line in enumerate(geoms, 1):
        px, py = _world_to_pixel_float(fp, line[:, 0], line[:, 1])
        for j in range(len(px) - 1):
            _burn_segment(out, (px[j], py[j]), (px[j + 1], py[j + 1]),
                          i if labelize else True)
    return out


def _thin_delete(p, sub):
    """One thinning subiteration over a PADDED bool array ``p`` (1-pixel
    context border): returns the deletion mask for the interior
    ``p[1:-1, 1:-1]``.

    Implements the two-subiteration thinning conditions G1 ∧ G2 ∧ G3 (sub
    0) / G1 ∧ G2 ∧ G3' (sub 1) from Lam, Lee & Suen, "Thinning
    Methodologies — A Comprehensive Survey", IEEE PAMI 14(9), 1992 — the
    published algorithm behind ``skimage.morphology.thin``, which the
    reference applies before line extraction
    (buzzard/_footprint.py:1631 ``skm.thin``). Neighborhood is numbered
    x1..x8 counterclockwise from east. Fully vectorized; deletions within
    a subiteration are simultaneous (computed from the snapshot ``p``)."""
    m = p[1:-1, 1:-1]
    x1 = p[1:-1, 2:]
    x2 = p[:-2, 2:]
    x3 = p[:-2, 1:-1]
    x4 = p[:-2, :-2]
    x5 = p[1:-1, :-2]
    x6 = p[2:, :-2]
    x7 = p[2:, 1:-1]
    x8 = p[2:, 2:]
    # G1: crossing number X_H(p) == 1
    b = ((~x1 & (x2 | x3)).astype(np.int8) + (~x3 & (x4 | x5)) +
         (~x5 & (x6 | x7)) + (~x7 & (x8 | x1)))
    g1 = b == 1
    # G2: 2 <= min(n1, n2) <= 3
    n1 = (x1 | x2).astype(np.int8) + (x3 | x4) + (x5 | x6) + (x7 | x8)
    n2 = (x2 | x3).astype(np.int8) + (x4 | x5) + (x6 | x7) + (x8 | x1)
    mn = np.minimum(n1, n2)
    g2 = (mn >= 2) & (mn <= 3)
    # G3 (sub 0) / G3' (sub 1)
    if sub == 0:
        g3 = ~((x2 | x3 | ~x8) & x1)
    else:
        g3 = ~((x6 | x7 | ~x4) & x5)
    return m & g1 & g2 & g3


def thin(mask):
    """Morphological thinning to a width-1 (8-connected) skeleton that
    preserves endpoints and connectivity — the reference preprocesses every
    ``find_lines`` mask with exactly this operation
    (buzzard/_footprint.py:1631, ``skimage.morphology.thin``; algorithm:
    Lam-Lee-Suen 1992, see ``_thin_delete``). Iterates both subiterations
    until a full iteration deletes nothing."""
    m = np.ascontiguousarray(mask, dtype=bool).copy()
    while True:
        changed = False
        for sub in (0, 1):
            p = np.pad(m, 1)
            d = _thin_delete(p, sub)
            if d.any():
                m[d] = False
                changed = True
        if not changed:
            return m


def find_lines(fp, mask, merge=True, thin_first=True):
    """mask → polylines (world coords, pixel centers). The reference's
    thin → pixel-graph → linemerge chain
    (reference: buzzard/_footprint.py:1538-1717): the mask is first thinned
    (``thin``, the reference's ``skm.thin`` step — round 2 skipped this and
    produced denser linework on blob masks), then the 4/8-neighbor pixel
    graph is built (diagonals only where no 4-connected detour exists —
    the reference's has_topright/has_topleft subtraction) and degree-2
    chains are merged. Standalone pixels are ignored (same caveat as the
    reference). 2×2 squares surviving thinning are collapsed to their
    top-left pixel exactly as the reference's steps 3/6 (segments fully
    inside a square dropped, segment endpoints in a square extended to the
    square's top-left; the only deviation is that a vertex that is its own
    square top-left is not duplicated in the coordinate list — geometry
    identical).
    """
    mask = mask.astype(bool)
    if thin_first:
        mask = thin(mask)
    edges = pixel_edges(mask)
    links = square_links(mask)
    segs = []
    for ax, ay, bx, by in zip(*(a.tolist() for a in edges)):
        a, b = (ax, ay), (bx, by)
        la, lb = links.get(a), links.get(b)
        if la is not None and lb is not None:
            continue  # segment fully inside collapsed squares
        path = [a, b]
        if la is not None and la != a:
            path.insert(0, la)
        if lb is not None and lb != b:
            path.append(lb)
        segs.append(path)
    if merge:
        paths = merge_segments(segs)
    else:
        paths = segs
    lines = []
    for path in paths:
        px = np.asarray([p[0] + 0.5 for p in path])
        py = np.asarray([p[1] + 0.5 for p in path])
        xw, yw = _pixel_to_world(fp, px, py)
        lines.append(np.column_stack([xw, yw]))
    return lines


def pixel_edges(mask):
    """Pixel-graph edge list under the reference's rule (4-neighbors
    always; diagonals only when no 4-connected detour exists — the
    has_topright/has_topleft subtraction of buzzard/_footprint.py:1662-
    1668). Returns (ax, ay, bx, by) int arrays; each edge emitted once.
    Vectorized via shifted-AND on the dense mask."""
    H, W = mask.shape

    def _shift(a, dy, dx):
        out = np.zeros_like(a)
        ys0, ys1 = max(0, -dy), min(H, H - dy)
        xs0, xs1 = max(0, -dx), min(W, W - dx)
        if ys0 < ys1 and xs0 < xs1:
            out[ys0:ys1, xs0:xs1] = a[ys0 + dy:ys1 + dy, xs0 + dx:xs1 + dx]
        return out

    axs, ays, bxs, bys = [], [], [], []
    for dx, dy in ((1, 0), (0, 1), (1, 1), (1, -1)):
        pair = mask & _shift(mask, dy, dx)
        if dx and dy:
            pair &= ~(_shift(mask, 0, dx) | _shift(mask, dy, 0))
        py, px = np.nonzero(pair)
        axs.append(px)
        ays.append(py)
        bxs.append(px + dx)
        bys.append(py + dy)
    return (np.concatenate(axs), np.concatenate(ays),
            np.concatenate(bxs), np.concatenate(bys))


def square_links(mask):
    """The reference's 2×2-square collapse map (buzzard/_footprint.py:
    1644-1652): every pixel of a fully-set 2×2 square maps to the square's
    top-left pixel, (x, y) keys; overlapping squares resolve by row-major
    last-wins, exactly like the reference's dict comprehension over the
    row-major nonzero scan."""
    sq = mask[:-1, :-1] & mask[1:, :-1] & mask[:-1, 1:] & mask[1:, 1:]
    links = {}
    for y, x in zip(*(a.tolist() for a in np.nonzero(sq))):
        for dy in (0, 1):
            for dx in (0, 1):
                links[(x + dx, y + dy)] = (x, y)
    return links


def merge_segments(segs):
    """shapely.ops.linemerge semantics over vertex-list segments: segments
    sharing an endpoint merge iff exactly two segment-ends meet there
    (interior vertices ride along); junction points (degree ≠ 2) split,
    leftover cycles close on themselves. Deterministic: walks start at
    sorted non-degree-2 endpoints, then sorted remaining cycle segments —
    shared by the kernel ``find_lines`` and the distributed per-chain
    assembler (operators.raster_ops.vectorize_lines)."""
    incid = {}
    for i, s in enumerate(segs):
        incid.setdefault(s[0], []).append(i)
        incid.setdefault(s[-1], []).append(i)
    used = [False] * len(segs)
    out = []

    def _walk(path):
        while True:
            point = path[-1]
            ends = incid[point]
            if len(ends) != 2:
                return path
            nxt = [i for i in ends if not used[i]]
            if len(nxt) != 1:
                return path
            i = nxt[0]
            used[i] = True
            s = segs[i] if segs[i][0] == point else segs[i][::-1]
            path.extend(s[1:])
            if path[-1] == path[0]:
                return path

    for pt in sorted(p for p, ends in incid.items() if len(ends) != 2):
        for i in sorted(incid[pt]):
            if used[i]:
                continue
            used[i] = True
            s = segs[i] if segs[i][0] == pt else segs[i][::-1]
            out.append(_walk(list(s)))
    for i in range(len(segs)):  # pure cycles
        if used[i]:
            continue
        used[i] = True
        out.append(_walk(list(segs[i])))
    return out


# -- slopes ----------------------------------------------------------------------

def slopes(fp, dsm, crop=False):
    """DSM → slope degrees via Horn's 8-neighbor gradient
    (reference: buzzard/algo/_slopes.py:25-57). With crop=False the border
    is computed from an edge-replicated pad."""
    arr = np.pad(dsm.astype(np.float64), 1, mode='edge') if not crop else \
        dsm.astype(np.float64)
    nw, n, ne = arr[:-2, :-2], arr[:-2, 1:-1], arr[:-2, 2:]
    w_, e_ = arr[1:-1, :-2], arr[1:-1, 2:]
    sw, s, se = arr[2:, :-2], arr[2:, 1:-1], arr[2:, 2:]
    sx, sy = np.abs(fp.scale)
    dzdx = ((ne + 2 * e_ + se) - (nw + 2 * w_ + sw)) / (8 * sx)
    dzdy = ((sw + 2 * s + se) - (nw + 2 * n + ne)) / (8 * sy)
    return np.degrees(np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy)))
