"""Z-order clustering operator: Morton arithmetic vs python, partition
range contiguity, plan hygiene."""

from pyspark.sql import functions as F

from buzzard_spark.operators import zorder


def _py_morton(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 255, 511) for y in (0, 1, 128, 255)]
    df = spark.createDataFrame(rows, 'x long, y long')
    got = {(r['x'], r['y']): r['z'] for r in df.select(
        'x', 'y', F.expr(zorder.zvalue_sql('x', 'y', 9)).alias('z')
    ).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y, 9), (x, y)


def test_zvalue_duckdb_dialect_matches(spark):
    import duckdb
    rows = [(x, y) for x in (0, 5, 77, 511) for y in (0, 9, 200, 255)]
    expr = zorder.zvalue_sql('x', 'y', 9, dialect='duckdb')
    got = duckdb.sql(
        'SELECT x, y, ' + expr + ' AS z FROM (VALUES ' +
        ', '.join(f'({x}, {y})' for x, y in rows) + ') t(x, y)').fetchall()
    for x, y, z in got:
        assert z == _py_morton(x, y, 9)


def test_cluster_by_zorder_partitions_are_contiguous_ranges(spark):
    """After clustering, every partition covers a z-range disjoint from
    and ordered against every other partition (tight min-max per file)."""
    df = spark.createDataFrame(
        [((i * 7919) % 512, (i * 104729) % 256) for i in range(2000)],
        'x long, y long')
    out = zorder.cluster_by_zorder(df, 'x', 'y', 9, n_partitions=8)
    parts = (out.withColumn('pid', F.spark_partition_id())
             .groupBy('pid').agg(F.min('zval').alias('lo'),
                                 F.max('zval').alias('hi'),
                                 F.count('*').alias('n'))
             .orderBy('lo').collect())
    assert sum(p['n'] for p in parts) == 2000
    for a, b in zip(parts, parts[1:]):
        assert a['hi'] <= b['lo'], (a, b)
    # and rows are sorted within partitions
    rows_by_part = out.select('zval').rdd.glom().collect()
    for chunk in rows_by_part:
        zs = [r['zval'] for r in chunk]
        assert zs == sorted(zs)


def test_zorder_plan_no_python(spark):
    df = spark.createDataFrame([(1, 2)], 'x long, y long')
    plan = (zorder.cluster_by_zorder(df, 'x', 'y', 9)
            ._jdf.queryExecution().executedPlan().toString())
    assert 'BatchEvalPython' not in plan


def test_zvalue_bits_validation():
    import pytest
    with pytest.raises(ValueError):
        zorder.zvalue_sql('x', 'y', 0)
    with pytest.raises(ValueError):
        zorder.zvalue_sql('x', 'y', 32)


def test_zvalue_int32_columns_high_bits(spark):
    """INT32 input columns with bits >= 16: the inner BIGINT cast keeps
    the shift amount out of Java's/DuckDB's mod-32 INT wrap (ADVICE r4).
    Both dialects must agree with python Morton on 20-bit coordinates."""
    rows = [(1 << 17, 1), (123456, 654321),
            ((1 << 20) - 1, (1 << 20) - 1), (0, 1 << 19)]
    df = spark.createDataFrame(rows, 'x long, y long').select(
        F.col('x').cast('int').alias('x'),
        F.col('y').cast('int').alias('y'))
    assert dict(df.dtypes) == {'x': 'int', 'y': 'int'}
    got = {(r['x'], r['y']): r['z'] for r in df.select(
        'x', 'y', F.expr(zorder.zvalue_sql('x', 'y', 20)).alias('z')
    ).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y, 20), (x, y)

    import duckdb
    expr = zorder.zvalue_sql('x', 'y', 20, dialect='duckdb')
    got2 = duckdb.sql(
        'SELECT x, y, ' + expr + ' AS z FROM (VALUES ' +
        ', '.join(f'(CAST({x} AS INTEGER), CAST({y} AS INTEGER))'
                  for x, y in rows) + ') t(x, y)').fetchall()
    for x, y, z in got2:
        assert z == _py_morton(x, y, 20), (x, y)
