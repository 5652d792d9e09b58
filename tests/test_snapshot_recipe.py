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

    # SAME-SIZE corruption (flipped byte): only the md5 catches it —
    # reference checksum semantics (buzzard/_cached_raster_recipe.py:146-166).
    # Target a file of the CURRENT valid lineage (earlier corruption left a
    # dead snapshot dir on disk whose files are already out of play).
    table = SnapshotTable(root)
    files = sorted(os.path.join(root, fi['path'])
                   for m in table._valid_manifests() for fi in m['files'])
    with open(files[0], 'r+b') as f:
        f.seek(100)
        byte = f.read(1)
        f.seek(100)
        f.write(bytes([byte[0] ^ 0xFF]))
    df5, n5 = cached_tile_compute(spark, fp, 30, _ramp, root)
    assert n5 > 0
    assert np.array_equal(assemble(df5.collect(), fp), _oracle(fp))
    _, n6 = cached_tile_compute(spark, fp, 30, _ramp, root)
    assert n6 == 0


def test_concurrent_append_claims_unique_snapshots(spark, fp, tmp_path):
    """Two writers committing 'simultaneously' (same parent view) must not
    clobber each other: O_EXCL manifest claims serialize the ids and both
    snapshots survive in the lineage."""
    root = str(tmp_path / 'cache_cas')
    t1 = SnapshotTable(root)
    t2 = SnapshotTable(root)
    df_a = spark.range(3).selectExpr('id AS k', 'id * 10 AS v')
    df_b = spark.range(3, 5).selectExpr('id AS k', 'id * 10 AS v')
    # both see parent=None; t1 commits first, t2's claim of snap-1 must
    # fail and advance to snap-2 chained onto t1
    m1 = t1.append(df_a, key_cols=['k'])
    # simulate t2 having read parent before t1's commit: append() re-reads
    # parent at call time, so force the race by pre-claiming is already
    # covered — here we just verify the second commit chains, not replaces
    m2 = t2.append(df_b, key_cols=['k'])
    assert m1['snapshot_id'] == 1 and m2['snapshot_id'] == 2
    assert m2['parent'] == 1
    assert t1.current_snapshot_id() == 2
    got = sorted(r['k'] for r in t1.read(spark).collect())
    assert got == [0, 1, 2, 3, 4]
    # distinct data dirs (writer-unique tokens)
    assert m1['data_dir'] != m2['data_dir']


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
    # keys recorded for resume — in a parquet sidecar, never the manifest
    assert m['keys_path'] and 'keys' not in m
    import duckdb
    import os as _os
    kd = _os.path.join(root, m['keys_path'])
    got = duckdb.sql(
        f"SELECT tile_y, tile_x FROM read_parquet('{kd}/*.parquet') "
        'ORDER BY 1, 2').fetchall()
    assert got == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_atomic_current_pointer(spark, fp, tmp_path):
    root = str(tmp_path / 'cache3')
    cached_tile_compute(spark, fp, 50, _ramp, root)
    table = SnapshotTable(root)
    assert table.current_snapshot_id() == 1
    # appending again bumps the snapshot and links the parent
    df, _ = cached_tile_compute(spark, fp, 50, _ramp, root)  # warm, no-op
    assert table.current_snapshot_id() == 1


def test_time_travel_and_minmax_file_skipping(spark, tmp_path):
    """as_of reads the table frozen at a snapshot id; minmax_filter prunes
    whole data files from the manifest stats without touching parquet."""
    from pyspark.sql import functions as F

    root = str(tmp_path / 'tt')
    table = SnapshotTable(root)
    for lo in (0, 100, 200):  # 3 snapshots with disjoint key ranges
        df = spark.range(lo, lo + 100).select(
            F.col('id').alias('k'), (F.col('id') * 2).alias('v'))
        table.append(df.coalesce(1))

    # time travel: snapshot 2 sees the first two appends only
    assert table.read(spark).count() == 300
    as_of2 = table.read(spark, as_of=2)
    assert as_of2.count() == 200
    assert as_of2.agg(F.max('k')).first()[0] == 199
    assert table.read(spark, as_of=1).count() == 100
    with pytest.raises(FileNotFoundError):
        table.read(spark, as_of=0)

    # manifest min/max skipping: k in [150, 160] intersects only the
    # middle snapshot's file — exactly one parquet file is scanned
    pruned = table.read(spark, minmax_filter={'k': (150, 160)})
    assert len(pruned.inputFiles()) == 1
    assert pruned.where('k BETWEEN 150 AND 160').count() == 11

    # a range outside every file prunes everything but keeps the schema
    empty = table.read(spark, minmax_filter={'k': (9000, 9999)})
    assert empty.count() == 0
    assert empty.columns == ['k', 'v']

    # refusal: pruning cannot combine with latest-wins dedup
    with pytest.raises(ValueError):
        table.read(spark, dedupe_keys=['k'], minmax_filter={'k': (0, 1)})


def test_minmax_filter_empty_append_prune_everything(spark, tmp_path):
    """A snapshot whose append wrote an empty DataFrame records zero data
    files; a prune-everything minmax_filter read must still return an
    empty schema-preserving DataFrame, not IndexError (ADVICE r3)."""
    from buzzard_spark.sources.snapshot_table import SnapshotTable

    table = SnapshotTable(str(tmp_path / 'empty_tbl'))
    empty = spark.createDataFrame([], 'k long, v string')
    table.append(empty)
    out = table.read(spark, minmax_filter={'k': (0, 10)})
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ['k', 'v']


def test_resume_keys_sidecar_scales_off_driver(spark, tmp_path):
    """Resume keys live in an executor-written parquet sidecar (VERDICT r3
    #5): a key count that would be driver-unfriendly as manifest JSON
    (120k) round-trips through append -> pending as a distributed
    anti-join; the manifest itself stays tiny and holds no key rows."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F
    from buzzard_spark.sources.snapshot_table import SnapshotTable

    root = str(tmp_path / 'bigkeys')
    table = SnapshotTable(root)
    n = 120_000
    done = spark.range(n).select(
        F.col('id').alias('tile_y'), (F.col('id') * 2).alias('tile_x'),
        F.lit(1).alias('v'))
    manifest = table.append(done, key_cols=['tile_y', 'tile_x'])
    assert manifest['keys_path'] and 'keys' not in manifest
    raw = _json.load(open(_os.path.join(
        root, '_manifest', f"snap-{manifest['snapshot_id']}.json")))
    assert len(_json.dumps(raw)) < 100_000  # no embedded key list

    todo = spark.range(n + 500).select(
        F.col('id').alias('tile_y'), (F.col('id') * 2).alias('tile_x'))
    pend = table.pending(todo, ['tile_y', 'tile_x'])
    assert pend.count() == 500
    assert pend.agg(F.min('tile_y')).collect()[0][0] == n

    # a keyed snapshot whose sidecar vanishes is dropped from the lineage
    # (work redone, never duplicated)
    import shutil
    shutil.rmtree(_os.path.join(root, manifest['keys_path']))
    assert table.pending(todo, ['tile_y', 'tile_x']).count() == n + 500


def test_compact_folds_chain_preserving_rows_and_time_travel(spark, tmp_path):
    """compact(): N snapshots -> 1 replacing snapshot with identical
    rows; pre-compaction snapshots stay readable via as_of; subsequent
    appends chain onto the compacted snapshot."""
    import pyspark.sql.functions as F

    root = str(tmp_path / 'compact_tbl')
    table = SnapshotTable(root)
    for i in range(4):
        table.append(spark.range(i * 10, (i + 1) * 10)
                     .select(F.col('id').alias('k'),
                             (F.col('id') * 2).alias('v')))
    pre_ids = [m['snapshot_id'] for m in table.manifests()]
    assert len(pre_ids) == 4
    before = sorted((r['k'], r['v']) for r in table.read(spark).collect())

    man = table.compact(spark, target_file_bytes=1 << 30)
    assert man['parent'] is None
    assert man['compacted_from'] == pre_ids[-1]
    # one-manifest chain, same rows
    assert [m['snapshot_id'] for m in table.manifests()] == \
        [man['snapshot_id']]
    after = sorted((r['k'], r['v']) for r in table.read(spark).collect())
    assert after == before
    # fewer files than the 4-snapshot chain produced
    n_files = len(man['files'])
    assert n_files >= 1

    # time travel to a PRE-compaction snapshot still works
    tt = sorted(r['k'] for r in
                table.read(spark, as_of=pre_ids[1]).collect())
    assert tt == list(range(20))

    # appends after compaction chain onto it
    table.append(spark.range(100, 105).select(
        F.col('id').alias('k'), (F.col('id') * 2).alias('v')))
    final = sorted(r['k'] for r in table.read(spark).collect())
    assert final == list(range(40)) + list(range(100, 105))


def test_compact_with_dedupe_keys_materializes_latest(spark, tmp_path):
    """Latest-version-per-key is applied during the rewrite, so
    dedupe_keys reads stay correct after compaction."""
    import pyspark.sql.functions as F

    root = str(tmp_path / 'compact_rmw')
    table = SnapshotTable(root)
    table.append(spark.createDataFrame(
        [(1, 'old'), (2, 'old')], 'k long, v string'))
    table.append(spark.createDataFrame(
        [(1, 'new')], 'k long, v string'))
    assert {(r['k'], r['v']) for r in
            table.read(spark, dedupe_keys=['k']).collect()} == \
        {(1, 'new'), (2, 'old')}

    table.compact(spark, dedupe_keys=['k'])
    got = {(r['k'], r['v']) for r in table.read(spark).collect()}
    assert got == {(1, 'new'), (2, 'old')}
    # and the dedupe_keys read path agrees post-compaction
    got2 = {(r['k'], r['v']) for r in
            table.read(spark, dedupe_keys=['k']).collect()}
    assert got2 == got


def test_compact_rewrites_key_sidecar(spark, tmp_path):
    """Resume keys survive compaction: completed_keys after == before,
    computed from the compacted sidecar (distributed, no driver keys)."""
    import pyspark.sql.functions as F

    root = str(tmp_path / 'compact_keys')
    table = SnapshotTable(root)
    for i in range(3):
        table.append(spark.range(i * 5, (i + 1) * 5)
                     .select(F.col('id').alias('tile'),
                             (F.col('id') * 3).alias('v')),
                     key_cols=['tile'])
    before = sorted(r['tile'] for r in
                    table.completed_keys(spark, ['tile']).collect())
    table.compact(spark)
    after = sorted(r['tile'] for r in
                   table.completed_keys(spark, ['tile']).collect())
    assert after == before == list(range(15))
    # pending() anti-join still skips everything already computed
    todo = spark.range(20).select(F.col('id').alias('tile'))
    left = sorted(r['tile'] for r in
                  table.pending(todo, ['tile']).collect())
    assert left == list(range(15, 20))


def test_schema_evolution_read(spark, tmp_path):
    """A later append may ADD a column: reads surface it as NULL for
    pre-evolution rows (mergeSchema), in both the plain and the
    dedupe_keys read paths."""
    import pyspark.sql.functions as F

    root = str(tmp_path / 'evolve_tbl')
    table = SnapshotTable(root)
    table.append(spark.createDataFrame([(1, 'a')], 'k long, v string'))
    table.append(spark.createDataFrame(
        [(2, 'b', 9.5)], 'k long, v string, score double'))

    rows = {r['k']: (r['v'], r['score'])
            for r in table.read(spark).collect()}
    assert rows == {1: ('a', None), 2: ('b', 9.5)}

    rows2 = {r['k']: (r['v'], r['score'])
             for r in table.read(spark, dedupe_keys=['k']).collect()}
    assert rows2 == rows

    # compaction of an evolved chain keeps the union schema
    table.compact(spark)
    rows3 = {r['k']: (r['v'], r['score'])
             for r in table.read(spark).collect()}
    assert rows3 == rows


def test_expire_snapshots_removes_orphans_only(spark, tmp_path):
    """expire_snapshots deletes pre-compaction generations (manifest,
    data dir, sidecar) and nothing reachable; time travel to expired ids
    then raises."""
    import pyspark.sql.functions as F

    root = str(tmp_path / 'expire_tbl')
    table = SnapshotTable(root)
    for i in range(3):
        table.append(spark.range(i * 4, (i + 1) * 4)
                     .select(F.col('id').alias('tile')), key_cols=['tile'])
    pre_ids = [m['snapshot_id'] for m in table.manifests()]
    table.compact(spark)
    live_id = table.current_snapshot_id()

    expired = table.expire_snapshots()
    assert expired == pre_ids
    # live snapshot intact, rows intact, resume intact
    assert sorted(r['tile'] for r in table.read(spark).collect()) == \
        list(range(12))
    assert sorted(r['tile'] for r in
                  table.completed_keys(spark, ['tile']).collect()) == \
        list(range(12))
    assert table.current_snapshot_id() == live_id
    # expired id no longer readable
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        table.read(spark, as_of=pre_ids[0])
    # idempotent
    assert table.expire_snapshots() == []


def test_compact_concurrent_append_raises_and_retry_recovers(spark, tmp_path):
    """Iceberg CommitFailedException contract (VERDICT r4 #5): an append
    landing between compact's chain read and its commit makes the commit
    raise CommitConflictError (retryable); nothing is lost, and the
    retried compact folds the racer's rows into the replacement chain."""
    from buzzard_spark.sources.snapshot_table import CommitConflictError

    root = str(tmp_path / 'compact_race')

    class RacyTable(SnapshotTable):
        """Injects one racing append between compact's chain read and
        its rewrite (the first read() call during compact)."""

        def read(self, *a, **k):
            df = super().read(*a, **k)
            if not getattr(self, '_raced', False):
                self._raced = True
                SnapshotTable(self.root).append(spark.createDataFrame(
                    [(1000, 'race')], 'k long, v string'))
            return df

    table = RacyTable(root)
    for i in range(3):
        table.append(spark.createDataFrame(
            [(i, f'v{i}')], 'k long, v string'))

    with pytest.raises(CommitConflictError):
        table.compact(spark)

    # the racer's commit survived; nothing orphaned
    got = {(r['k'], r['v']) for r in table.read(spark).collect()}
    assert got == {(0, 'v0'), (1, 'v1'), (2, 'v2'), (1000, 'race')}

    # retry re-reads the chain (now including the racer) and succeeds
    man = table.compact(spark)
    assert man['parent'] is None
    assert [m['snapshot_id'] for m in table.manifests()] == \
        [man['snapshot_id']]
    after = {(r['k'], r['v']) for r in table.read(spark).collect()}
    assert after == got


def test_replace_commit_lost_claim_fails_fast_and_cleans_up(spark, tmp_path):
    """The O_EXCL leg of the compaction CAS: a racer that claimed the
    next snapshot id (manifest exists, CURRENT not yet flipped) makes the
    replace-commit raise instead of re-chaining past it; the loser's
    never-referenced data dir is removed."""
    import json as _json

    from buzzard_spark.sources.snapshot_table import CommitConflictError

    root = str(tmp_path / 'cas_claim')
    table = SnapshotTable(root)
    table.append(spark.createDataFrame([(1, 'a')], 'k long, v string'))
    table.append(spark.createDataFrame([(2, 'b')], 'k long, v string'))
    # simulate a racer mid-commit: snap-3 claimed, CURRENT still 2
    with open(os.path.join(root, '_manifest', 'snap-3.json'), 'x') as f:
        f.write(_json.dumps({'snapshot_id': 3, 'parent': 2, 'files': [],
                             'data_dir': 'data/none', 'rows': 0,
                             'bytes': 0, 'schema': None}))
    n_dirs_before = len(os.listdir(os.path.join(root, 'data')))
    with pytest.raises(CommitConflictError):
        table.append(spark.createDataFrame([(9, 'z')], 'k long, v string'),
                     _replaces=2, _expected_tip=2)
    assert len(os.listdir(os.path.join(root, 'data'))) == n_dirs_before
    assert table.current_snapshot_id() == 2


def test_compact_refuses_multi_version_keys_without_dedupe(spark, tmp_path):
    """ADVICE r4: compacting a chain that carries multiple versions per
    key WITHOUT dedupe_keys would make later-wins reads nondeterministic
    after the fold — it must refuse; with dedupe_keys it materializes
    the latest version."""
    root = str(tmp_path / 'compact_guard')
    table = SnapshotTable(root)
    table.append(spark.createDataFrame(
        [(1, 'old'), (2, 'old')], 'k long, v string'), key_cols=['k'])
    table.append(spark.createDataFrame(
        [(1, 'new')], 'k long, v string'), key_cols=['k'])

    with pytest.raises(ValueError, match='dedupe_keys'):
        table.compact(spark)

    table.compact(spark, dedupe_keys=['k'])
    got = {(r['k'], r['v']) for r in table.read(spark).collect()}
    assert got == {(1, 'new'), (2, 'old')}


# -- row-level deletes (delete_where) ------------------------------------------

def test_delete_where_filters_earlier_snapshots_only(spark, tmp_path):
    """Predicate delete removes matching rows from EARLIER snapshots;
    a later append resurrects them; time travel still sees them."""
    root = str(tmp_path / 'tbl')
    t = SnapshotTable(root)
    t.append(spark.range(0, 10).selectExpr('id AS k', 'id * 2 AS v'))
    t.append(spark.range(10, 20).selectExpr('id AS k', 'id * 2 AS v'))
    pre_delete = t.current_snapshot_id()
    t.delete_where(spark, 'k < 5 OR k >= 18')
    got = sorted(r['k'] for r in t.read(spark).collect())
    assert got == list(range(5, 18))
    # time travel to before the delete sees everything
    old = sorted(r['k'] for r in
                 t.read(spark, as_of=pre_delete).collect())
    assert old == list(range(20))
    # a later append is untouched by the earlier delete
    t.append(spark.range(0, 3).selectExpr('id AS k', 'id * 100 AS v'))
    got2 = sorted(r['k'] for r in t.read(spark).collect())
    assert got2 == [0, 1, 2] + list(range(5, 18))


def test_delete_where_null_predicate_keeps_row(spark, tmp_path):
    """A predicate evaluating to NULL must KEEP the row (only TRUE
    deletes) — SQL three-valued logic would otherwise silently drop it."""
    root = str(tmp_path / 'tbl')
    t = SnapshotTable(root)
    t.append(spark.createDataFrame([(1, 'x'), (2, None)],
                                   'k long, s string'))
    t.delete_where(spark, "s = 'x'")     # NULL for k=2
    got = sorted(r['k'] for r in t.read(spark).collect())
    assert got == [2]


def test_delete_where_validates_predicate_schema(spark, tmp_path):
    root = str(tmp_path / 'tbl')
    t = SnapshotTable(root)
    t.append(spark.range(5).selectExpr('id AS k'))
    with pytest.raises(Exception):
        t.delete_where(spark, 'no_such_column > 3')
    # the failed delete must not have committed anything
    assert t.current_snapshot_id() == 1


def test_delete_where_with_dedupe_keys_interplay(spark, tmp_path):
    """Delete kills the OLD version; a later re-append becomes the live
    version under later-wins reads."""
    root = str(tmp_path / 'tbl')
    t = SnapshotTable(root)
    t.append(spark.createDataFrame([(1, 10), (2, 20)], 'k long, v long'),
             key_cols=['k'])
    t.delete_where(spark, 'k = 1')
    t.append(spark.createDataFrame([(1, 11)], 'k long, v long'),
             key_cols=['k'])
    got = {r['k']: r['v'] for r in
           t.read(spark, dedupe_keys=['k']).collect()}
    assert got == {1: 11, 2: 20}


def test_delete_where_minmax_filter_composes(spark, tmp_path):
    root = str(tmp_path / 'tbl')
    t = SnapshotTable(root)
    t.append(spark.range(0, 100).selectExpr('id AS k'))
    t.delete_where(spark, 'k % 2 = 0')
    # minmax_filter is FILE skipping; the delete predicate still applies
    # to the surviving files' rows (the caller adds the row filter)
    pruned = t.read(spark, minmax_filter={'k': (10, 20)})
    got = sorted(r['k'] for r in
                 pruned.where('k BETWEEN 10 AND 20').collect())
    assert got == [11, 13, 15, 17, 19]
    # every row of every kept file has the delete applied (no evens),
    # and file skipping never resurrects a deleted row
    rest = [r['k'] for r in pruned.collect()]
    assert rest and all(k % 2 == 1 for k in rest)


def test_compact_materializes_deletes(spark, tmp_path):
    """compact() folds the chain to post-delete rows and drops the
    predicate from the new chain (no delete manifest survives)."""
    root = str(tmp_path / 'tbl')
    t = SnapshotTable(root)
    t.append(spark.range(0, 10).selectExpr('id AS k'))
    t.delete_where(spark, 'k >= 7')
    before = sorted(r['k'] for r in t.read(spark).collect())
    t.compact(spark)
    after = sorted(r['k'] for r in t.read(spark).collect())
    assert before == after == list(range(7))
    assert not any(m.get('delete_predicate') for m in t.manifests())


# -- streaming snapshot sink (epoch-idempotent foreachBatch) -------------------

def test_snapshot_sink_idempotent_replay(spark, tmp_path):
    """Replaying an epoch (foreachBatch's at-least-once contract after a
    crash) must not double-append; distinct epochs append normally."""
    from buzzard_spark.streaming.stream_ops import snapshot_sink
    root = str(tmp_path / 'sink')
    write = snapshot_sink(root)
    b0 = spark.range(0, 5).selectExpr('id AS k')
    b1 = spark.range(5, 8).selectExpr('id AS k')
    write(b0, 0)
    write(b0, 0)                       # replay of epoch 0 — must be a no-op
    write(b1, 1)
    t = SnapshotTable(root)
    got = sorted(r['k'] for r in t.read(spark).collect())
    assert got == list(range(8))
    assert t.current_snapshot_id() == 2
    epochs = [m.get('app_meta', {}).get('epoch_id') for m in t.manifests()]
    assert epochs == [0, 1]


def test_snapshot_sink_end_to_end_stream(spark, tmp_path):
    """Real writeStream → foreachBatch(snapshot_sink) run over a file
    source; table contents equal the batch read of the same input."""
    from buzzard_spark.streaming.stream_ops import snapshot_sink
    src = str(tmp_path / 'src')
    spark.range(0, 50).selectExpr('id AS k', 'id % 7 AS g') \
        .repartition(4).write.parquet(src)
    root = str(tmp_path / 'sink')
    stream = (spark.readStream.schema('k long, g long')
              .option('maxFilesPerTrigger', 2).parquet(src))
    q = (stream.writeStream
         .option('checkpointLocation', str(tmp_path / 'ckpt'))
         .foreachBatch(snapshot_sink(root))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r['k'] for r in
                 SnapshotTable(root).read(spark).collect())
    assert got == list(range(50))


def test_read_incremental_append_only_delta(spark, tmp_path):
    """Incremental scan returns exactly the rows appended after the
    checkpointed snapshot; None means from-the-beginning; the tip yields
    a schema-preserving empty delta."""
    table = SnapshotTable(str(tmp_path / 'inc'))
    ids = []
    for lo in (0, 10, 20):
        r = table.append(spark.range(lo, lo + 10).selectExpr(
            'id AS k', 'id * 2 AS v'))
        ids.append(r['snapshot_id'])

    assert sorted(r['k'] for r in
                  table.read_incremental(spark, None).collect()) \
        == list(range(30))
    assert sorted(r['k'] for r in
                  table.read_incremental(spark, ids[0]).collect()) \
        == list(range(10, 30))
    assert sorted(r['k'] for r in
                  table.read_incremental(spark, ids[1]).collect()) \
        == list(range(20, 30))
    empty = table.read_incremental(spark, ids[2])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ['k', 'v']
    # bounded range: (ids[0], ids[1]]
    assert sorted(r['k'] for r in table.read_incremental(
        spark, ids[0], end=ids[1]).collect()) == list(range(10, 20))


def test_read_incremental_rejects_non_append_ranges(spark, tmp_path):
    """Compaction or delete_where inside the range, or a checkpoint
    orphaned by compaction, raise instead of double-emitting rows."""
    table = SnapshotTable(str(tmp_path / 'incbad'))
    s1 = table.append(spark.range(0, 10).selectExpr('id AS k'))['snapshot_id']
    table.append(spark.range(10, 20).selectExpr('id AS k'))
    table.delete_where(spark, 'k = 3')
    with pytest.raises(ValueError, match='not pure appends'):
        table.read_incremental(spark, s1)

    t2 = SnapshotTable(str(tmp_path / 'incbad2'))
    s1 = t2.append(spark.range(0, 10).selectExpr('id AS k'))['snapshot_id']
    t2.append(spark.range(10, 20).selectExpr('id AS k'))
    t2.compact(spark)
    # s1 was compacted off the current chain -> orphaned checkpoint
    with pytest.raises(ValueError, match='not on the current chain'):
        t2.read_incremental(spark, s1)
