"""Per-channel raster schema — nodata / interpretation / offset / scale /
mask per channel, normalized exactly like the reference's
``sanitize_channels_schema`` (reference: buzzard/_tools/parameters.py:116-210,
consumed by buzzard/_a_source_raster.py:204-228). GDAL-free: color
interpretations and mask flags are validated against the public GDAL
vocabularies as plain strings.
"""

from __future__ import annotations

import numpy as np

CHANNELS_SCHEMA_PARAMS = {'nodata', 'interpretation', 'offset', 'scale', 'mask'}

# public GDAL color-interpretation names (GCI_*) as lowercase strings
INTERPRETATIONS = {
    'undefined', 'grayindex', 'paletteindex', 'redband', 'greenband',
    'blueband', 'alphaband', 'hueband', 'saturationband', 'lightnessband',
    'cyanband', 'magentaband', 'yellowband', 'blackband',
}
# public GDAL mask flags (GMF_*)
MASKS = {'all_valid', 'per_dataset', 'alpha', 'nodata'}


def _normalize_scalar_field(name, val, count, default):
    def one(v):
        if v is None:
            return default
        if np.shape(v) == () and np.all(np.isreal(v)):
            return float(np.asarray(v).item())
        raise ValueError(f'`{name}` cannot use value `{v}`')

    if val is None or np.shape(val) == ():
        return [one(val)] * count
    vals = list(val)
    if len(vals) != count:
        raise ValueError(f'{name}: {len(vals)} values for {count} channels')
    return [one(v) for v in vals]


def _normalize_enum_field(name, val, count, vocab):
    def one(v):
        if v not in vocab:
            raise ValueError(f'`{name}` cannot use value `{v}`')
        return v

    if isinstance(val, str):
        return [one(val)] * count
    vals = list(val)
    if len(vals) != count:
        raise ValueError(f'{name}: {len(vals)} values for {count} channels')
    return [one(v) for v in vals]


def sanitize_channels_schema(channels_schema: dict | None,
                             channel_count: int) -> dict:
    """Normalize a channels_schema dict: every present field becomes a list
    of length channel_count; scalars broadcast; None entries take the
    field default (nodata None, offset 0, scale 1)."""
    if channels_schema is None:
        channels_schema = {}
    diff = set(channels_schema.keys()) - CHANNELS_SCHEMA_PARAMS
    if diff:
        raise ValueError('Unknown channels_schema keys `%s`' % diff)
    ret = {}
    if 'nodata' in channels_schema:
        ret['nodata'] = _normalize_scalar_field(
            'nodata', channels_schema['nodata'], channel_count, None)
    if 'offset' in channels_schema:
        ret['offset'] = _normalize_scalar_field(
            'offset', channels_schema['offset'], channel_count, 0.0)
    if 'scale' in channels_schema:
        ret['scale'] = _normalize_scalar_field(
            'scale', channels_schema['scale'], channel_count, 1.0)
    if 'interpretation' in channels_schema:
        ret['interpretation'] = _normalize_enum_field(
            'interpretation', channels_schema['interpretation'],
            channel_count, INTERPRETATIONS)
    if 'mask' in channels_schema:
        ret['mask'] = _normalize_enum_field(
            'mask', channels_schema['mask'], channel_count, MASKS)
    return ret


def full_schema(channels_schema: dict | None, channel_count: int,
                default_nodata=None) -> dict:
    """Sanitized schema with every field materialized to its default."""
    s = sanitize_channels_schema(channels_schema, channel_count)
    s.setdefault('nodata', [default_nodata] * channel_count)
    s.setdefault('offset', [0.0] * channel_count)
    s.setdefault('scale', [1.0] * channel_count)
    s.setdefault('interpretation', ['undefined'] * channel_count)
    s.setdefault('mask', ['all_valid'] * channel_count)
    return s
