"""Unit tests for buzzard_spark.operators.temporal.asof_join."""

import pytest

from buzzard_spark.operators.temporal import asof_join


def _frames(spark):
    probes = spark.createDataFrame([
        (1, 10, 5), (2, 10, 20), (3, 10, 30), (4, 10, 31),
        (5, 99, 7),             # key with no state at all
    ], 'event_id long, k long, ts long')
    states = spark.createDataFrame([
        (10, 10, 'a'), (10, 20, 'b'), (10, 30, 'c'),
    ], 'k long, ts long, v string')
    return probes, states


def test_backward_inclusive(spark):
    probes, states = _frames(spark)
    got = {r['event_id']: r['v'] for r in
           asof_join(probes, states, on='k').collect()}
    assert got == {1: None,      # before first state
                   2: 'b',       # equal ts -> inclusive
                   3: 'c', 4: 'c',
                   5: None}      # key without states


def test_forward(spark):
    probes, states = _frames(spark)
    got = {r['event_id']: r['v'] for r in
           asof_join(probes, states, on='k',
                     direction='forward').collect()}
    assert got == {1: 'a', 2: 'b', 3: 'c', 4: None, 5: None}


def test_tolerance(spark):
    probes, states = _frames(spark)
    got = {r['event_id']: r['v'] for r in
           asof_join(probes, states, on='k',
                     tolerance_s=5).collect()}
    # event 4 at ts=31 is 1s after state ts=30 -> within tolerance;
    # re-run with tolerance 0: only exact-ts matches survive
    assert got[4] == 'c' and got[2] == 'b'
    got0 = {r['event_id']: r['v'] for r in
            asof_join(probes, states, on='k',
                      tolerance_s=0).collect()}
    assert got0 == {1: None, 2: 'b', 3: 'c', 4: None, 5: None}


def test_left_columns_preserved_and_multi_key(spark):
    probes = spark.createDataFrame(
        [(1, 'x', 1, 10, 'keepme')],
        'event_id long, a string, b long, ts long, payload string')
    states = spark.createDataFrame(
        [('x', 1, 5, 42), ('x', 2, 5, 43)],
        'a string, b long, ts long, val long')
    rows = asof_join(probes, states, on=['a', 'b']).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r['payload'] == 'keepme' and r['val'] == 42
    assert set(rows[0].asDict()) == {
        'event_id', 'a', 'b', 'ts', 'payload', 'val'}


def test_bad_direction(spark):
    probes, states = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(probes, states, on='k', direction='nearest')
