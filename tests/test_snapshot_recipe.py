"""Snapshot table + cached recipe semantics (the reference's cache
contract: laziness, persistence, corruption recovery —
buzzard/test/test_cached_raster_recipe.py analogues)."""

import glob
import os

import numpy as np
import pytest

from buzzard_spark import Footprint
from buzzard_spark.operators.recipe import assemble, cached_tile_compute
from buzzard_spark.sources.snapshot_table import SnapshotTable


def _ramp(tile_fp):
    """Deterministic value = x + y meshgrid ramp (reference test oracle,
    buzzard/test/tools.py:165-167)."""
    xs, ys = tile_fp.meshgrid_spatial
    return (xs + ys).astype('float32')


@pytest.fixture()
def fp():
    return Footprint(tl=(0, 10), size=(10, 10), rsize=(100, 100))


def _oracle(fp):
    xs, ys = fp.meshgrid_spatial
    return (xs + ys).astype('float32')


def test_compute_resume_and_corruption(spark, fp, tmp_path):
    root = str(tmp_path / 'cache')

    # cold: everything computed
    df, n1 = cached_tile_compute(spark, fp, 30, _ramp, root)
    assert n1 == 16  # ceil(100/30)^2
    rows = df.collect()
    out = assemble(rows, fp)
    assert np.array_equal(out, _oracle(fp))

    # warm: nothing recomputed ("pixels never computed twice")
    df2, n2 = cached_tile_compute(spark, fp, 30, _ramp, root)
    assert n2 == 0
    assert np.array_equal(assemble(df2.collect(), fp), _oracle(fp))

    # corruption: truncate one data file -> its snapshot invalidated,
    # its tiles recomputed, values identical again
    files = sorted(glob.glob(os.path.join(root, 'data', '*', '*.parquet')))
    with open(files[0], 'ab') as f:
        f.write(b'garbage')
    df3, n3 = cached_tile_compute(spark, fp, 30, _ramp, root)
    assert n3 > 0
    assert np.array_equal(assemble(df3.collect(), fp), _oracle(fp))

    # the repaired table is warm again
    _, n4 = cached_tile_compute(spark, fp, 30, _ramp, root)
    assert n4 == 0


def test_manifest_lineage_and_metrics(spark, fp, tmp_path):
    root = str(tmp_path / 'cache2')
    cached_tile_compute(spark, fp, 50, _ramp, root)
    table = SnapshotTable(root)
    manifests = table.manifests()
    assert len(manifests) == 1
    m = manifests[0]
    assert m['rows'] == 4
    assert m['metrics']['rows'] == 4
    assert m['metrics']['bytes'] > 0
    assert m['bytes'] == sum(f['bytes'] for f in m['files'])
    # per-file lineage: row counts and column min/max recorded
    assert all(f['rows'] >= 1 for f in m['files'])
    stats = {}
    for f in m['files']:
        for col, (mn, mx) in f['column_minmax'].items():
            lo, hi = stats.get(col, (mn, mx))
            stats[col] = (min(lo, mn), max(hi, mx))
    assert stats['tile_y'] == (0, 1) and stats['tile_x'] == (0, 1)
    # keys recorded for resume
    assert sorted(map(tuple, m['keys'])) == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_atomic_current_pointer(spark, fp, tmp_path):
    root = str(tmp_path / 'cache3')
    cached_tile_compute(spark, fp, 50, _ramp, root)
    table = SnapshotTable(root)
    assert table.current_snapshot_id() == 1
    # appending again bumps the snapshot and links the parent
    df, _ = cached_tile_compute(spark, fp, 50, _ramp, root)  # warm, no-op
    assert table.current_snapshot_id() == 1
