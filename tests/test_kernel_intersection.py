"""Intersection — ported from the reference
(buzzard/test/test_footprint_intersection.py), shapely-free: points become
degenerate bounds boxes, segments/polygons their bounds (identical for the
axis-aligned cases the reference exercises; ``rotation='fit'`` is out of
the engine's north-up scope and skipped)."""

import itertools

import numpy as np
import pytest

import buzzard_spark as buzz
from buzzard_spark.env import env
from tests.gridtools import fpeq, make_tile_set


@pytest.fixture(scope='module')
def fps():
    return make_tile_set(3, [0.1, -0.1])


@pytest.fixture(scope='module')
def fps1px():
    return make_tile_set(3, [1, -1], (1, -1))


def _pt(xy):
    x, y = xy
    return (x, y, x, y)


def _seg(p, q):
    xs = [p[0], q[0]]
    ys = [p[1], q[1]]
    return (min(xs), min(ys), max(xs), max(ys))


def _overlap_area(a, b):
    ab, bb = a.bounds, b.bounds
    w = min(ab[2], bb[2]) - max(ab[0], bb[0])
    h = min(ab[3], bb[3]) - max(ab[1], bb[1])
    return max(w, 0) * max(h, 0)


def test_rectangles(fps):
    for a, b in itertools.combinations_with_replacement(fps.values(), 2):
        if _overlap_area(a, b) > 0:
            assert fpeq(a.intersection(b), b.intersection(a))
    dfs = [
        fps.DF,
        fps.AF.intersection(fps.DI),
        fps.DF.intersection(fps.AI),
        fps.DF.intersection(fps.AF),
        fps.DF.intersection(fps.DI),
    ]
    for a in dfs:
        assert fpeq(a, dfs[0])
    assert fpeq(
        fps.E,
        fps.E.intersection(fps.E),
        fps.AI.intersection(fps.BH, fps.DF, fps.AH, fps.BI,
                            fps.AF, fps.DI, fps.AI))


def test_points(fps1px):
    fps = fps1px
    assert fpeq(
        fps.E,
        fps.AI.intersection(_pt(fps.E.c)),
        fps.AI.intersection(_pt(fps.E.t)),
        fps.AI.intersection(_pt(fps.E.l)),
        fps.AI.intersection(_pt(fps.E.tl)),
    )
    assert fpeq(fps.I, fps.AI.intersection(_pt(fps.E.br)))
    assert fpeq(fps.H, fps.AI.intersection(_pt(fps.E.bl)),
                fps.AI.intersection(_pt(fps.E.b)))
    assert fpeq(fps.F, fps.AI.intersection(_pt(fps.E.tr)),
                fps.AI.intersection(_pt(fps.E.r)))


def test_lines(fps1px):
    fps = fps1px

    def _f(coords, axes):
        axes = np.asarray(axes)
        epsilon = 10 ** -(env.significant - 1)
        tl = coords - (epsilon, epsilon) * axes * (1, -1)
        br = coords + (epsilon, epsilon) * axes * (1, -1)
        return _seg(tl, br)

    assert fpeq(
        fps.E,
        fps.AI.intersection(_f(fps.E.c, (1, 0))),
        fps.AI.intersection(_f(fps.E.c, (1, 1))),
        fps.AI.intersection(_f(fps.E.c, (0, 1))),
        fps.AI.intersection(_f(fps.E.l, (0, 1))),
        fps.AI.intersection(_f(fps.E.t, (1, 0))),
    )
    assert fpeq(
        fps.BE,
        fps.AI.intersection(_f(fps.E.t, (1, 1))),
        fps.AI.intersection(_f(fps.E.t, (0, 1))),
        fps.AI.intersection(_f(fps.E.tl, (0, 1))),
    )
    assert fpeq(
        fps.EF,
        fps.AI.intersection(_f(fps.E.r, (1, 0))),
        fps.AI.intersection(_f(fps.E.r, (1, 1))),
        fps.AI.intersection(_f(fps.E.tr, (1, 0))),
    )
    assert fpeq(fps.F, fps.AI.intersection(_f(fps.E.r, (0, 1))))
    assert fpeq(
        fps.EH,
        fps.AI.intersection(_f(fps.E.b, (1, 1))),
        fps.AI.intersection(_f(fps.E.b, (0, 1))),
        fps.AI.intersection(_f(fps.E.bl, (0, 1))),
    )
    assert fpeq(fps.H, fps.AI.intersection(_f(fps.E.b, (1, 0))))
    assert fpeq(
        fps.DE,
        fps.AI.intersection(_f(fps.E.l, (1, 0))),
        fps.AI.intersection(_f(fps.E.l, (1, 1))),
        fps.AI.intersection(_f(fps.E.tl, (1, 0))),
    )
    assert fpeq(fps.AE, fps.AI.intersection(_f(fps.E.tl, (1, 1))))
    assert fpeq(fps.BF, fps.AI.intersection(_f(fps.E.tr, (1, 1))))
    assert fpeq(fps.EI, fps.AI.intersection(_f(fps.E.br, (1, 1))))
    assert fpeq(fps.DH, fps.AI.intersection(_f(fps.E.bl, (1, 1))))
    assert fpeq(fps.CF, fps.AI.intersection(_f(fps.E.tr, (0, 1))))
    assert fpeq(fps.FI, fps.AI.intersection(_f(fps.E.br, (0, 1))))
    assert fpeq(fps.HI, fps.AI.intersection(_f(fps.E.br, (1, 0))))
    assert fpeq(fps.GH, fps.AI.intersection(_f(fps.E.bl, (1, 0))))

    # diagonals / multipoint polylines span the full grid
    assert fpeq(
        fps.AI,
        fps.AI.intersection(_seg(fps.AI.tl, fps.AI.br)),
        fps.AI.intersection(_seg(fps.AI.bl, fps.AI.tr)),
        fps.AI.intersection(_seg(fps.A.t, fps.I.b)),
        fps.AI.intersection(_seg(fps.A.l, fps.I.r)),
        fps.AI.intersection(_seg(fps.A.c, fps.I.c)),
    )


class _FtPoly:
    def __init__(self, data):
        self.__geo_interface__ = data


def test_corner_cases(fps1px):
    fps = fps1px
    with pytest.raises(ValueError):
        fps.A.intersection()
    with pytest.raises(ValueError):
        fps.A.intersection(fps.A, hello=True)
    with pytest.raises(TypeError):
        fps.A.intersection(42)
    assert fpeq(fps.BH, fps.AH.intersection(_FtPoly(fps.BI.__geo_interface__)))
    with pytest.raises(ValueError):
        fps.A.intersection(fps.A, scale='hello')
    with pytest.raises((ValueError, NotImplementedError)):
        fps.A.intersection(fps.A, rotation='hello')
    with pytest.raises(ValueError):
        fps.A.intersection(fps.A, alignment='hello')

    assert fpeq(
        buzz.Footprint(rsize=[2, 6], size=fps.BH.size, tl=fps.BH.tl),
        fps.AH.intersection(fps.BI, scale=0.5),
        fps.AH.intersection(fps.BI, scale=[0.5, -0.5]),
        fps.AH.intersection(fps.BI, scale=[0.5]),
    )
    with pytest.raises(ValueError):
        fps.AH.intersection(fps.BI, scale=[])
    with pytest.raises(ValueError):
        fps.AH.intersection(fps.BI, scale=0)

    lowest = fps.BH.intersection(fps.BH, scale=0.5)
    highest = fps.BH.intersection(fps.BH, scale=1.0)
    assert fpeq(
        lowest,
        lowest.intersection(highest, scale='lowest'),
        highest.intersection(lowest, scale='lowest'),
    )
    assert fpeq(
        highest,
        highest.intersection(lowest, scale='highest'),
        lowest.intersection(highest, scale='highest'),
    )

    assert fpeq(
        fps.BH,
        fps.AH.intersection(fps.BI, rotation=0),
        fps.AH.intersection(fps.BI, alignment=fps.BH.tl),
    )
    with pytest.raises(ValueError):
        fps.AH.intersection(fps.BI, alignment=[])
    assert fpeq(
        buzz.Footprint(rsize=[2, 4], size=fps.BH.size * [2 / 1, 4 / 3],
                       tl=fps.BH.tl - [0.5, -0.5]),
        fps.BH.intersection(fps.BH, alignment=[0.5, 0.5]),
    )
    assert fpeq(fps.BH, fps.BH.intersection(fps.BH, alignment='tl'))

    with buzz.Env(allow_complex_footprint=True):
        for angle in np.r_[0:180:13j]:
            rotated = fps.E.intersection(fps.E, rotation=angle)
            nofit = angle % 90 != 0
            if nofit:
                assert tuple(rotated.rsize) == (2, 2)
            else:
                assert tuple(rotated.rsize) == (1, 1)
            assert all(np.around(rotated.scale, 3) == (1, -1))
            assert np.around(rotated.angle, 3) == angle
            diff_area = rotated.area - fps.E.area
            if nofit:
                assert np.around(diff_area, 3) == 3.0
            else:
                assert np.around(diff_area, 3) == 0.0
            dot = np.dot(fps.E.lrvec / fps.E.w, rotated.lrvec / rotated.w)
            angle_real = np.arccos(np.clip(dot, -1, 1)) / np.pi * 180
            assert np.around(angle_real) == angle

    # homogeneous
    assert fpeq(fps.BH, fps.BH.intersection(fps.BH, homogeneous=True))
    with pytest.raises(ValueError, match='grid'):
        fps.BH.intersection(fps.BH.intersection(fps.BH, scale=0.5),
                            homogeneous=True)
    with pytest.raises(ValueError, match='grid'):
        fps.BH.intersection(fps.BH.intersection(fps.BH, alignment=[0.5, 0.5]),
                            homogeneous=True)
    with buzz.Env(allow_complex_footprint=True):
        with pytest.raises(ValueError, match='grid'):
            fps.AH.intersection(fps.E.intersection(fps.E, rotation=42),
                                homogeneous=True)

    # fit (reference: test_footprint_intersection.py:329-340) — a 45°
    # stripe polygon; 'fit' must equal an explicit rotation=45
    stripe = np.asarray([fps.A.tr, fps.I.tr, fps.I.bl, fps.A.bl])
    assert fpeq(
        fps.AI,
        fps.AI.intersection(stripe),
        fps.AI.intersection(stripe, rotation=0),
    )
    with buzz.Env(allow_complex_footprint=True):
        assert fpeq(
            fps.AI.intersection(stripe, rotation='fit'),
            fps.AI.intersection(stripe, rotation=45),
        )

    # misc: touching / disjoint neighbors
    with pytest.raises(ValueError, match='touch'):
        fps.A.intersection(fps.B)
    with pytest.raises(ValueError, match='empty'):
        fps.A.intersection(fps.C)
    with pytest.raises(ValueError, match='touch'):
        fps.A.intersection(fps.D)
