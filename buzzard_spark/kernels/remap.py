"""Footprint→Footprint array remapping — the reference's three regimes
(reference: buzzard/_a_source_raster_remap.py:74-264) without cv2:

- same grid & contained → pure slicing            (_remap_slice)
- same grid, not contained → nodata-padded copy   (_remap_copy)
- different grid → nearest / bilinear resample with separate nodata-mask
  propagation and erode/dilate mask modes         (_remap_interpolate)

Sampling convention matches the reference: destination pixel corners are
converted into continuous source pixel coordinates via
``meshgrid_raster_in`` and sampled where integer coordinate k = source
array index k (cv2.remap's convention).
"""

from __future__ import annotations

import numpy as np

MASK_MODES = frozenset(['dilate', 'erode'])
INTERPOLATIONS = frozenset(['nearest', 'linear', 'cv_nearest', 'cv_linear'])


def build_sampling_footprint(raster_fp, request_fp, interpolation='linear'):
    """Minimal aligned window to read for a request
    (reference: buzzard/_a_source_raster_remap.py:35-72). None if disjoint."""
    if not request_fp.share_area(raster_fp):
        return None
    if request_fp.same_grid(raster_fp):
        return request_fp & raster_fp
    if interpolation is None:
        raise ValueError('unaligned request requires an interpolation')
    if interpolation in ('nearest', 'cv_nearest'):
        dilate_size = 1 * raster_fp.pxsizex / request_fp.pxsizex
    elif interpolation in ('linear', 'cv_linear'):
        dilate_size = 2 * raster_fp.pxsizex / request_fp.pxsizex
    else:
        dilate_size = 4 * raster_fp.pxsizex / request_fp.pxsizex
    dilate_size = max(2, np.around(dilate_size))
    return raster_fp & request_fp.dilate(dilate_size)


def remap(src_fp, dst_fp, array=None, mask=None, src_nodata=None,
          dst_nodata=0, mask_mode='dilate', interpolation='linear'):
    """General fp→fp transfer. Returns array, mask, or (array, mask)."""
    has_arr, has_mask = array is not None, mask is not None
    if mask_mode not in MASK_MODES:
        raise ValueError(f'mask_mode should be one of {MASK_MODES}')
    if not (interpolation is None or interpolation in INTERPOLATIONS):
        raise ValueError(f'interpolation should be None or one of {INTERPOLATIONS}')
    assert dst_nodata is not None

    if has_arr:
        assert array.shape[:2] == tuple(src_fp.shape)
        out_dtype = array.dtype
        out_shape = list(array.shape)
        out_shape[:2] = dst_fp.shape
        array = np.atleast_3d(array)
    if has_mask:
        assert mask.shape == tuple(src_fp.shape)
        assert mask.dtype == np.dtype('bool')

    same = src_fp.same_grid(dst_fp)
    if same and _contains(src_fp, dst_fp):
        array, mask = _remap_slice(src_fp, dst_fp, array, mask,
                                   src_nodata, dst_nodata)
    elif same:
        array, mask = _remap_copy(src_fp, dst_fp, array, mask,
                                  src_nodata, dst_nodata)
    else:
        array, mask = _remap_interpolate(src_fp, dst_fp, array, mask,
                                         src_nodata, dst_nodata,
                                         mask_mode, interpolation)

    if has_arr:
        array = array.reshape(out_shape).astype(out_dtype, copy=False)
    if has_arr and has_mask:
        return array, mask
    if has_arr:
        return array
    return mask


def _contains(src_fp, dst_fp):
    sb = src_fp.bounds
    db = dst_fp.bounds
    return (db[0] >= sb[0] and db[1] >= sb[1] and
            db[2] <= sb[2] and db[3] <= sb[3])


def _remap_slice(src_fp, dst_fp, array, mask, src_nodata, dst_nodata):
    src_slice = dst_fp.slice_in(src_fp)
    if array is not None:
        array = array[src_slice]
        if src_nodata is not None and dst_nodata != src_nodata:
            array = array.copy()
            array[array == src_nodata] = dst_nodata
    if mask is not None:
        mask = mask[src_slice]
    return array, mask


def _remap_copy(src_fp, dst_fp, array, mask, src_nodata, dst_nodata):
    dst_slice = src_fp.slice_in(dst_fp, clip=True)
    src_slice = dst_fp.slice_in(src_fp, clip=True)
    dstarray = dstmask = None
    if array is not None:
        dstarray = np.full(np.r_[dst_fp.shape, array.shape[-1]],
                           dst_nodata, array.dtype)
        dstarray[dst_slice] = array[src_slice]
        if src_nodata is not None and dst_nodata != src_nodata:
            view = dstarray[dst_slice]
            view[view == src_nodata] = dst_nodata
    if mask is not None:
        dstmask = np.zeros(tuple(dst_fp.shape), mask.dtype)
        dstmask[dst_slice] = mask[src_slice]
    return dstarray, dstmask


def _sample(values, mapx, mapy, interpolation):
    """Sample a (H, W, C) float array at continuous pixel coords; returns
    (sampled (h, w, C), valid (h, w)) — invalid where support leaves the
    array (BORDER_TRANSPARENT semantics)."""
    h_src, w_src = values.shape[:2]
    if interpolation in ('nearest', 'cv_nearest'):
        xi = np.rint(mapx).astype(np.int64)
        yi = np.rint(mapy).astype(np.int64)
        valid = (xi >= 0) & (xi < w_src) & (yi >= 0) & (yi < h_src)
        xi = xi.clip(0, w_src - 1)
        yi = yi.clip(0, h_src - 1)
        return values[yi, xi], valid
    # bilinear
    x0 = np.floor(mapx).astype(np.int64)
    y0 = np.floor(mapy).astype(np.int64)
    fx = (mapx - x0)[..., None]
    fy = (mapy - y0)[..., None]
    valid = (mapx >= 0) & (mapx <= w_src - 1) & \
            (mapy >= 0) & (mapy <= h_src - 1)
    x0c = x0.clip(0, w_src - 1)
    y0c = y0.clip(0, h_src - 1)
    x1c = (x0 + 1).clip(0, w_src - 1)
    y1c = (y0 + 1).clip(0, h_src - 1)
    v00 = values[y0c, x0c]
    v01 = values[y0c, x1c]
    v10 = values[y1c, x0c]
    v11 = values[y1c, x1c]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy, valid


def _remap_interpolate(src_fp, dst_fp, array, mask, src_nodata, dst_nodata,
                       mask_mode, interpolation):
    mapx, mapy = dst_fp.meshgrid_raster_in(src_fp, dtype='float64', op=None)
    dstarray = dstmask = None

    if array is not None:
        values = array.astype(np.float64, copy=False)
        sampled, valid = _sample(values, mapx, mapy, interpolation)
        if src_nodata is not None:
            nod, _ = _sample((array == src_nodata).astype(np.float64),
                             mapx, mapy, interpolation)
            bad = (nod != 0).any(axis=-1) if nod.ndim == 3 else (nod != 0)
            valid = valid & ~bad
        dstarray = np.full(np.r_[dst_fp.shape, array.shape[-1]],
                           dst_nodata, array.dtype)
        dstarray[valid] = sampled[valid].astype(array.dtype, copy=False)

    if mask is not None:
        sampled, valid = _sample(
            mask.astype(np.float64)[..., None], mapx, mapy, interpolation)
        sampled = sampled[..., 0]
        sampled[~valid] = 0.
        if mask_mode == 'erode':
            dstmask = sampled == 1.
        else:
            dstmask = sampled != 0.
    return dstarray, dstmask
