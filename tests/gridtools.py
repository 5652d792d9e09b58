"""Lettered tile-set fixture + comparison helpers.

Port of the reference's test data generator (the truth tables are data,
not code): buzzard/test/make_tile_set.py:16-130 and
buzzard/test/tools.py:47-74 (eq / fpeq / assert_tiles_eq).
"""

import itertools

import numpy as np

from buzzard_spark import Footprint

ALL_LETTERS = 'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvw'


class AttrDict(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def make_tile_set(width, reso, tilevec=(1, -10)):
    """All sub-rectangles of a width×width lettered grid as Footprints."""
    assert width <= 7
    count = int(width ** 2)
    letters = ALL_LETTERS[0:count]
    reso = np.asarray(reso)
    tilevec = np.asarray(tilevec)

    tlx = 0
    tly = -tilevec[1] * width
    tlxs, tlys = np.meshgrid(
        np.arange(tlx, tilevec[0] * width, tilevec[0]),
        np.arange(tly, tilevec[1] * width, tilevec[1]),
    )
    tl_of = {
        letter: np.array((x, y), dtype=int)
        for letter, x, y in zip(letters, tlxs.flatten(), tlys.flatten())
    }
    br_of = {
        letter: np.array((x, y), dtype=int) + tilevec
        for letter, x, y in zip(letters, tlxs.flatten(), tlys.flatten())
    }
    combos = [
        a + b
        for a, b in itertools.combinations(letters, 2)
        if tl_of[a][0] <= tl_of[b][0] and tl_of[a][1] >= tl_of[b][1]
    ] + list(letters)

    def fp_of(name):
        tl = tl_of[name[0]]
        br = br_of[name[-1]]
        diagvec = br - tl
        return Footprint(tl=tl, size=np.abs(diagvec), rsize=(diagvec / reso))

    return AttrDict({combo: fp_of(combo) for combo in combos})


def eq(*items, tol=10e-5):
    for a, b in itertools.combinations(items, 2):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        if not (diff <= tol).all():
            return False
    return True


def eqall(items, tol=10e-5):
    return eq(*items, tol=tol)


def fpeq(*items, tol=10e-5):
    for a, b in itertools.combinations(items, 2):
        if not (np.abs(a.gt - b.gt) <= tol).all():
            return False
        if not (np.abs(a.rsize - b.rsize) <= tol).all():
            return False
    return True


def assert_tiles_eq(mata, matb, tol=10e-5):
    mata = np.asarray(mata)
    matb = np.asarray(matb)
    assert mata.shape == matb.shape, (mata.shape, matb.shape)
    for a, b in zip(mata.flatten(), matb.flatten()):
        assert fpeq(a, b, tol=tol), (str(a), str(b))
