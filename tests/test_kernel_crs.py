"""CRS transforms, round-trip analysis, footprint normalization."""

import numpy as np
import pytest

import buzzard_spark as buzz
from buzzard_spark.kernels import crs


def test_roundtrip():
    rng = np.random.RandomState(0)
    lon = rng.rand(1000) * 360 - 180
    lat = rng.rand(1000) * 170 - 85
    mx, my = crs.get_transform('lonlat', 'webmercator')(lon, lat)
    lon2, lat2 = crs.get_transform('webmercator', 'lonlat')(mx, my)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_known_point():
    mx, my = crs.get_transform('lonlat', 'webmercator')(180.0, 0.0)
    assert mx == pytest.approx(20037508.342789244)
    assert my == pytest.approx(0.0, abs=1e-6)


def test_analysis_lossless_gate():
    fp = buzz.Footprint(tl=(2.0, 49.0), size=(0.5, 0.5), rsize=(512, 512))
    a = crs.Analysis(crs.get_transform('lonlat', 'webmercator'),
                     crs.get_transform('webmercator', 'lonlat'), fp)
    assert a.lossless
    assert a.roundtrip_error < 1e-9


def test_normalize_footprint():
    fp = buzz.Footprint(tl=(2.0, 49.0), size=(0.5, 0.5), rsize=(512, 512))
    out = crs.normalize_footprint(fp, 'lonlat', 'webmercator')
    assert (out.rsize == fp.rsize).all()
    fwd = crs.get_transform('lonlat', 'webmercator')
    assert np.allclose(out.tl, np.asarray(fwd(*fp.tl)), atol=1e-6)
    assert out.angle == 0.0  # snap kept the grid north-up


def test_unknown_crs():
    with pytest.raises(ValueError, match='no transform'):
        crs.get_transform('lonlat', 'utm31n')
