"""move + snap cascade — ported from the reference
(buzzard/test/test_footprint_move.py): named transforms × scale flips ×
rotations × noise factors; snapping must cancel 1e-6 noise."""

import numpy as np
import pytest

import buzzard_spark as buzz

S = 2 ** 14


def _transfos():
    with buzz.Env(allow_complex_footprint=1, significant=10):
        fp0 = buzz.Footprint(rsize=(S, S), size=(S, S), tl=(50000, 50000))
        return [
            (fp0, fp0, 'identity'),
            (fp0,
             buzz.Footprint(rsize=(S, S), size=(S * 2, S * 2), tl=(50000, 50000)),
             'double unit'),
            (fp0,
             buzz.Footprint(rsize=(S, S), gt=(50000, 1, 0, 50000, 0, -2)),
             'double y unit'),
            (fp0,
             fp0.intersection(fp0, rotation=45).clip(0, 0, S, S),
             'rotation 45'),
            (fp0,
             buzz.Footprint(rsize=(S, S), size=(S * 2, S * 2), tl=(50000, 50000))
             .intersection(fp0.dilate(S), rotation=45).clip(0, 0, S, S),
             'rotation 45 and double unit'),
            (fp0,
             buzz.Footprint(rsize=(S, S), gt=(50000, 1, 0, 50000, 0, -2))
             .intersection(fp0.dilate(S), rotation=45).clip(0, 0, S, S),
             'rotation 45 and double y unit'),
            (fp0,
             buzz.Footprint(rsize=(S, S), gt=(50000, 1, 0, 50000, 0, 1)),
             'mirror'),
        ]


def _params():
    out = []
    for src_fp, trg_fp, name in _transfos():
        for scalex in [1, -1]:
            for scaley in [1, -1]:
                for rot in [0, 45, -45, 90, -90, -135, 135, 180, -180]:
                    for noise in [0, 1e-6]:
                        out.append((name, src_fp, trg_fp, scalex, scaley,
                                    rot, noise))
    return out


@pytest.mark.parametrize(
    'name,src_fp,trg_fp,scalex,scaley,rot,noise_factor', _params())
def test_move(name, src_fp, trg_fp, scalex, scaley, rot, noise_factor):
    # deterministic seed: Python's hash() of strings is randomized per
    # process (PYTHONHASHSEED), which made the noise vectors differ from
    # run to run — one realization in ~dozens landed on a snap-cascade
    # decision boundary and flaked the suite. crc32 pins the exact noise
    # every run, like the reference's fixed-seed rng.
    import zlib
    rng = np.random.RandomState(zlib.crc32(repr(
        (name, scalex, scaley, rot, noise_factor)).encode()) % (2 ** 31))
    with buzz.Env(allow_complex_footprint=1, significant=10):
        src_fp = src_fp.dilate(S).intersection(
            src_fp.dilate(S), rotation=src_fp.angle + rot,
            scale=src_fp.scale * [scalex, scaley]).clip(0, 0, S, S)
        trg_fp = trg_fp.dilate(S).intersection(
            trg_fp.dilate(S), rotation=trg_fp.angle + rot,
            scale=trg_fp.scale * [scalex, scaley]).clip(0, 0, S, S)
        assert np.all(src_fp.rsize == trg_fp.rsize)

        tl, tr, br = trg_fp.tl, trg_fp.tr, trg_fp.br
        tl, tr, br = np.asarray([tl, tr, br]) + rng.rand(3, 2) * noise_factor

        out_fp0 = src_fp.move(tl, tr, br)
        assert trg_fp.almost_equals(out_fp0)

        out_fp1 = src_fp.move(tl, tr, br, True)
        assert trg_fp.almost_equals(out_fp1)

        if src_fp.angle == trg_fp.angle and np.isclose(0, (src_fp.angle + 360) % 90):
            # angles fully preserved when rotation is a multiple of 90
            # (±180 are the same rotation: the sign of the snapped angle at
            # exactly 180° follows the sign of the injected noise, in the
            # reference as here)
            assert (out_fp1.angle - src_fp.angle) % 360 == 0
