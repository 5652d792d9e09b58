"""General Footprint algebra — ported from the reference
(buzzard/test/test_footprint.py): accessors, predicates, morphology, clip,
move, meshgrids, coordinate conversions, init edge cases."""

import itertools

import numpy as np
import pytest

import buzzard_spark as buzz
from buzzard_spark.kernels import affine6
from tests.gridtools import eq, eqall, fpeq, make_tile_set

LETTERS = 'ABCDEFGHI'


@pytest.fixture(scope='module')
def fps():
    return make_tile_set(3, [0.1, -0.1])


@pytest.fixture(scope='module')
def fps1px():
    return make_tile_set(3, [1, -1], (1, -1))


def test_size_accessors_spatial(fps):
    assert eq(fps.A.size, fps.B.size, fps.C.size, fps.D.size, fps.E.size,
              fps.F.size, fps.G.size, fps.H.size, fps.I.size)
    assert eq(fps.AE.size, fps.BF.size, fps.DH.size, fps.EI.size)
    assert eq(fps.AH.size, fps.BI.size)
    assert eq(fps.AG.h, fps.BH.h, fps.CI.h, fps.CI.height)
    assert eq(fps.AB.w, fps.AE.w, fps.AH.w, fps.HI.w, fps.HI.width)


def test_size_accessors_raster(fps):
    assert eq(fps.A.rtl, [0, 0], [fps.A.rtlx, fps.A.rtly])
    assert eq(fps.A.rsize, fps.B.rsize, fps.C.rsize, fps.D.rsize, fps.E.rsize,
              fps.F.rsize, fps.G.rsize, fps.H.rsize, fps.I.rsize)
    assert eq(fps.AE.rsize, fps.BF.rsize, fps.DH.rsize, fps.EI.rsize)
    assert eq(fps.AH.rsize, fps.BI.rsize)
    assert eq(fps.AG.rh, fps.BH.rh, fps.CI.rh, fps.CI.rheight)
    assert eq(fps.AB.rw, fps.AE.rw, fps.AH.rw, fps.HI.rw, fps.HI.rwidth)
    assert eq(fps.A.shape, fps.B.shape, fps.I.shape)
    assert eq(fps.AE.shape, fps.BF.shape, fps.DH.shape, fps.EI.shape)


def test_coordinates_accessors_spatial_corners(fps):
    buzz.Footprint(gt=fps.A.gt, rsize=fps.A.rsize)
    assert eq(fps.E.tl, fps.B.bl, fps.A.br, fps.D.tr)
    assert eq(fps.E.bl, fps.D.br, fps.G.tr, fps.H.tl)
    assert eq(fps.E.br, fps.H.tr, fps.I.tl, fps.F.bl)
    assert eq(fps.E.tr, fps.F.tl, fps.C.bl, fps.B.br)
    for letter in LETTERS:
        those_tl = [v.tl for k, v in fps.items() if k.startswith(letter)]
        assert eq(*those_tl)
        those_br = [v.br for k, v in fps.items() if k.endswith(letter)]
        assert eq(*those_br)


def test_coordinates_accessors_spatial_others(fps):
    assert eq(fps.B.b, fps.E.t, fps.EH.t, fps.AC.b, fps.DF.t, fps.DI.t)
    assert eq(fps.D.r, fps.E.l, fps.EF.l, fps.AG.r, fps.BH.l, fps.BI.l)
    assert eq(fps.H.t, fps.E.b, fps.BE.b, fps.GI.t, fps.DF.b, fps.AF.b)
    assert eq(fps.F.l, fps.E.r, fps.DE.r, fps.CI.l, fps.BH.r, fps.AH.r)
    assert eq(fps.E.c, fps.AI.c, fps.DF.c, fps.BH.c)


def test_vector_accessors_spatial(fps):
    assert eq(fps.AC.lrvec, fps.AF.lrvec, fps.AI.lrvec, fps.DF.lrvec,
              fps.DI.lrvec, fps.GI.lrvec)
    assert eq(fps.AG.tbvec, fps.AH.tbvec, fps.AI.tbvec, fps.BH.tbvec,
              fps.BI.tbvec, fps.CI.tbvec)
    assert eq(fps.AE.diagvec, fps.BF.diagvec, fps.DH.diagvec, fps.EI.diagvec)
    assert eqall([fp.pxvec for fp in fps.values()] +
                 [fp.diagvec / fp.rsize for fp in fps.values()])


def test_coordinates_accessors_raster(fps):
    assert eq(fps.AC.rtr, fps.AF.rtr, fps.AI.rtr, fps.DF.rtr, fps.DI.rtr,
              fps.GI.rtr)
    assert eq(fps.AG.rbl, fps.AH.rbl, fps.AI.rbl, fps.BH.rbl, fps.BI.rbl,
              fps.CI.rbl)
    assert eq(fps.AE.rbr, fps.BF.rbr, fps.DH.rbr, fps.EI.rbr)
    assert eq(fps.AC.rt, fps.AF.rt, fps.AI.rt, fps.DF.rt, fps.DI.rt, fps.GI.rt)
    assert eq(fps.AG.rl, fps.AH.rl, fps.AI.rl, fps.BH.rl, fps.BI.rl, fps.CI.rl)
    assert eq(fps.AE.rr, fps.BF.rr, fps.DH.rr, fps.EI.rr)
    assert eq(fps.AE.rb, fps.BF.rb, fps.DH.rb, fps.EI.rb)
    assert eq(fps.AE.rc, fps.BF.rc, fps.DH.rc, fps.EI.rc)


def test_resolution_and_rotation_accessors(fps):
    c, a, b, f, d, e = fps.A.gt
    assert eq((a, b, c, d, e, f), fps.A.aff6, fps.A.aff23.flatten(),
              fps.A.aff33.flatten()[:6])

    def of_all(fn):
        return [fn(fp) for fp in fps.values()]

    assert eqall(
        of_all(lambda fp: fp.gt[1]) + of_all(lambda fp: fp.scale[0]) +
        of_all(lambda fp: fp.pxsize[0]) + of_all(lambda fp: fp.pxsize[1]) +
        of_all(lambda fp: fp.pxsizex) + of_all(lambda fp: fp.pxsizey) +
        of_all(lambda fp: fp.pxvec[0]) + of_all(lambda fp: -fp.gt[5]) +
        of_all(lambda fp: -fp.scale[1]) + of_all(lambda fp: -fp.pxvec[1]))
    assert eqall(of_all(lambda fp: fp.angle) + [0])
    assert eqall(of_all(lambda fp: fp.gt[2]))
    assert eqall(of_all(lambda fp: fp.gt[4]))
    for fp in fps.values():
        assert eq(fp.gt[0], fp.tlx)
        assert eq(fp.gt[3], fp.tly)


def test_non_trivial_accessors(fps):
    assert eq(fps.AI.semimajoraxis, fps.AH.semimajoraxis, fps.AG.semimajoraxis)
    assert eq(fps.BH.semiminoraxis, fps.BE.semiminoraxis, fps.B.semiminoraxis)
    assert eq(
        fps.A.length + fps.B.length + fps.D.length + fps.E.length,
        fps.AE.length + fps.A.length * 2)
    assert eq(fps.AI.rsemimajoraxis, fps.AH.rsemimajoraxis, fps.AG.rsemimajoraxis)
    assert eq(fps.BH.rsemiminoraxis, fps.BE.rsemiminoraxis, fps.B.rsemiminoraxis)
    assert eq(fps.AI.rarea, np.prod(fps.AI.rsize),
              np.prod(fps.AI.size / fps.AI.pxsize))
    assert eq(fps.AI.rlength,
              fps.AI.rsizex * 2 + fps.AI.rsizey * 2 - 4,
              fps.AC.rlength + fps.AD.rsizey * 2)
    fp = buzz.Footprint(gt=fps.AI.gt, rsize=(2, 10))
    assert eq(fp.rsemiminoraxis, 1)
    assert eq(fp.rlength, fp.rsemimajoraxis * 4)
    fp = buzz.Footprint(gt=fps.AI.gt, rsize=(1, 10))
    assert eq(fp.rsemiminoraxis, 1, tol=1)
    assert eq(fp.rlength, fp.rsemimajoraxis * 2)
    fp = buzz.Footprint(gt=fps.AI.gt, rsize=(1, 1))
    assert eq(fp.rsemiminoraxis, 1, fp.rsemimajoraxis, tol=1)
    assert eq(fp.rlength, 1)


def test_equal(fps):
    dfs = [
        fps.DF,
        fps.AF.intersection(fps.DI),
        fps.DF.intersection(fps.AI),
        fps.DF.intersection(fps.AF),
        fps.DF.intersection(fps.DI),
        fps.DF & fps.DI,
    ]
    for a in dfs:
        assert a == dfs[0]
    bhs = [
        fps.BH,
        fps.AH.intersection(fps.BI),
        fps.BH.intersection(fps.AI),
        fps.BH.intersection(fps.AH),
        fps.BH.intersection(fps.BI),
    ]
    for a in bhs:
        assert a == bhs[0]
    for a, b in itertools.combinations(fps.values(), 2):
        assert a != b


def test_morpho(fps):
    def create(rsizex, rsizey):
        return buzz.Footprint(gt=fps.AI.gt, rsize=(rsizex, rsizey))
    assert eq(create(3, 3).erode(1).rarea, 1 * 1)
    assert eq(create(4, 4).erode(1).rarea, 2 * 2)
    assert eq(create(5, 5).erode(1).rarea, 3 * 3)
    assert eq(create(5, 5).erode(2).rarea, 1 * 1)
    assert eq(create(3, 4).erode(1).rarea, 1 * 2)
    assert eq(create(4, 3).erode(1).rarea, 1 * 2)
    assert eq(create(2, 2).dilate(1).rarea, 4 * 4)
    assert eq(create(2, 3).dilate(1).rarea, 4 * 5)
    assert eq(create(1, 1).dilate(1).dilate(2).erode(3).rarea, 1 * 1)


def test_init_edge_cases(fps):
    rot = affine6.compose(
        affine6.translation(42, 21),
        affine6.compose(affine6.rotation_deg(12), affine6.scaling(0.1, -0.1)))
    with buzz.Env(allow_complex_footprint=True):
        buzz.Footprint(gt=affine6.to_gdal(rot), rsize=[1, 1])

    with pytest.raises(ValueError):
        buzz.Footprint(tl=fps.A.tl, size=fps.A.size)
    with pytest.raises(ValueError):
        buzz.Footprint(rsize=fps.A.rsize, size=fps.A.size)
    with pytest.raises(ValueError):
        buzz.Footprint(rsize=fps.A.rsize, tl=fps.A.tl)
    with pytest.raises(ValueError):
        buzz.Footprint(rsize=fps.A.rsize)

    with pytest.raises(ValueError, match='shape'):
        buzz.Footprint(rsize=[], tl=fps.A.tl, size=fps.A.size)
    with pytest.raises(ValueError, match='shape'):
        buzz.Footprint(rsize=fps.A.rsize, tl=[], size=fps.A.size)
    with pytest.raises(ValueError, match='shape'):
        buzz.Footprint(rsize=fps.A.rsize, tl=fps.A.tl, size=[])
    with pytest.raises(ValueError, match='shape'):
        buzz.Footprint(rsize=fps.A.rsize, gt=[])

    with pytest.raises(ValueError):
        buzz.Footprint(rsize=[-1] * 2, tl=fps.A.tl, size=fps.A.size)
    with pytest.raises(ValueError):
        buzz.Footprint(rsize=fps.A.rsize, tl=[np.inf] * 2, size=fps.A.size)
    with pytest.raises(ValueError):
        buzz.Footprint(rsize=fps.A.rsize, tl=fps.A.tl, size=[np.inf] * 2)
    with pytest.raises(ValueError):
        buzz.Footprint(rsize=fps.A.rsize, gt=[np.inf] * 6)


def test_clip(fps1px):
    fps = fps1px
    assert fpeq(
        fps.E,
        fps.E.clip(0, 0, 1, 1),
        fps.E.clip(-1, -1, 1, 1),
        fps.AI.clip(1, 1, 2, 2),
        fps.AI.clip(-2, -2, -1, -1),
        fps.BI.clip(0, 1, 1, 2),
        fps.BI.clip(0 - 2, 1 - 3, 1 - 2, 2 - 3),
    )


def test_move(fps1px):
    fps = fps1px
    with buzz.Env(allow_complex_footprint=True):
        assert fpeq(
            fps.B,
            fps.A.move(fps.B.tl),
            fps.B.move(fps.B.tl),
            fps.C.move(fps.B.tl),
            fps.A.move(fps.B.tl, fps.B.tr),
            fps.B.move(fps.B.tl, fps.B.tr),
            fps.C.move(fps.B.tl, fps.B.tr),
            fps.A.move(fps.B.tl, fps.B.tr, fps.B.br),
            fps.B.move(fps.B.tl, fps.B.tr, fps.B.br),
            fps.C.move(fps.B.tl, fps.B.tr, fps.B.br),
        )
        rot = affine6.compose(
            affine6.translation(*fps.A.bl),
            affine6.compose(affine6.rotation_deg(45),
                            affine6.scaling(2 ** 0.5, 2 ** 0.5 * -2)))
        assert fpeq(
            buzz.Footprint(gt=affine6.to_gdal(rot), rsize=(1, 1)),
            fps.A.move(fps.A.bl, fps.A.tr, fps.I.tr),
            fps.B.move(fps.A.bl, fps.A.tr, fps.I.tr),
            fps.C.move(fps.A.bl, fps.A.tr, fps.I.tr),
        )
        with pytest.raises(ValueError, match='angle'):
            fps.C.move(fps.A.bl, fps.A.tr, fps.I.c)


def test_binary_predicates(fps):
    for fp in fps.values():
        assert fp.share_area(fps.AI)
        assert fp.same_grid(fps.AI)
        sq2 = 2 ** 0.5
        assert not fp.same_grid(fp.move([sq2, sq2]))
        with buzz.Env(allow_complex_footprint=True):
            assert not fp.same_grid(fp.move([sq2, sq2], [2 * sq2, 2 * sq2]))


def test_numpy_like_functions(fps, fps1px):
    assert eq(
        fps.A.meshgrid_raster,
        fps.B.meshgrid_raster,
        fps.C.meshgrid_raster,
        np.meshgrid(range(fps.A.rw), range(fps.A.rh)),
    )
    assert eq(
        fps.A.meshgrid_spatial,
        fps.C.meshgrid_spatial + fps.A.tl[:, None, None] - fps.C.tl[:, None, None],
        fps.I.meshgrid_spatial + fps.A.tl[:, None, None] - fps.I.tl[:, None, None],
    )
    assert eq(
        fps.A.meshgrid_raster,
        fps.A.meshgrid_raster_in(fps.AI),
        fps.A.meshgrid_raster_in(fps.A),
        fps.I.meshgrid_raster_in(fps.A) +
        ((fps.A.tl - fps.I.tl) / fps.A.scale)[:, None, None],
    )
    assert fps.A.meshgrid_raster_in(fps.A, dtype='uint8')[0].dtype == np.uint8
    assert fps.A.meshgrid_raster_in(fps.A, dtype='float64', op=42)[0].dtype == np.float64

    fps = fps1px
    dense = fps.AI.move(fps.A.tl, fps.A.tr)
    mesh = np.dstack(fps.EI.meshgrid_raster_in(fps.AI))
    mesh_dense = np.dstack(fps.EI.meshgrid_raster_in(dense))
    assert ((mesh_dense / mesh) == 3).all()

    def op(arr):
        return arr * 0 + 42
    assert (np.asarray(fps.AI.meshgrid_raster_in(fps.AI, op=op)) == 42).all()

    mg_ai = np.asarray(fps.AI.meshgrid_spatial)
    for fp in fps.values():
        mg = np.asarray(fp.meshgrid_spatial)
        slices = (slice(0, 2),) + fp.slice_in(fps.AI)
        assert (mg == mg_ai[slices]).all()

    assert fps.A.meshgrid_spatial[0][fps.I.slice_in(fps.A, clip=True)].size == 0


def test_coord_conv(fps):
    ai = np.dstack(fps.AI.meshgrid_spatial)
    assert fps.AI.raster_to_spatial(ai).shape == ai.shape
    assert fps.AI.spatial_to_raster(ai).shape == ai.shape
    assert fps.AI.spatial_to_raster(ai, dtype='float16').dtype == np.float16
    assert fps.AI.spatial_to_raster(ai, dtype='float16', op=42).dtype == np.float16


# -- conv2d arithmetic (reference: test_footprint_convs.py, via the pytorch
#    output-shape formulas) --------------------------------------------------


def _torch_out(n, k, s, p, d):
    return int(np.floor((n + 2 * p - d * (k - 1) - 1) / s + 1))


@pytest.mark.parametrize('k, s, p, d', [
    (1, 1, 0, 1), (2, 1, 0, 1), (3, 1, 1, 1), (2, 2, 0, 1),
    (3, 2, 1, 1), (5, 3, 2, 2), (3, 1, 0, 2), (4, 4, 0, 1),
])
def test_forward_conv2d_shapes(k, s, p, d):
    fp = buzz.Footprint(tl=(0, 0), size=(64, 64), rsize=(64, 64))
    out = fp.forward_conv2d(kernel_size=k, stride=s, padding=p, dilation=d)
    assert out.rsizex == _torch_out(64, k, s, p, d)
    assert out.rsizey == _torch_out(64, k, s, p, d)
    # backward inverts rsize up to the bottom/right truncation
    back = out.backward_conv2d(kernel_size=k, stride=s, padding=p, dilation=d)
    assert back.rsizex <= 64 and back.rsizex > 64 - s
    assert eq(back.tl, fp.tl)


def test_conv2d_docstring_examples():
    fp0 = buzz.Footprint(tl=(0, 0), size=(1024, 1024), rsize=(1024, 1024))
    fp1 = fp0.forward_conv2d(kernel_size=2, stride=2)
    assert eq(fp1.tl, (0.5, -0.5)) and eq(fp1.size, (1024, 1024))
    assert eq(fp1.rsize, (512, 512))
    back = fp1.backward_conv2d(kernel_size=2, stride=2)
    assert eq(back.tl, (0, 0)) and eq(back.rsize, (1024, 1024))

    fp0 = buzz.Footprint(tl=(0, 0), size=(1024, 1024), rsize=(512, 512))
    fp1 = fp0.forward_convtranspose2d(kernel_size=3, stride=2, padding=1)
    assert eq(fp1.tl, (0, 0)) and eq(fp1.rsize, (1023, 1023))
    assert eq(fp1.size, (1023, 1023))
    back = fp1.backward_convtranspose2d(kernel_size=3, stride=2, padding=1)
    assert eq(back.tl, (0, 0)) and eq(back.rsize, (512, 512))
    assert eq(back.size, (1024, 1024))
