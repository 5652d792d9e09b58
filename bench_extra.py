"""Extra benchmarks for optimization work (guide §1.4: noop-sink isolation).

Not part of the driver's measurement: bench.py is the frozen harness.
This file isolates pieces of the flagship job and individual queries so
before/after numbers in OPTIMIZATION_r06.md can be attributed to a stage.

Usage:
  python bench_extra.py flagship [master] [n_pages] [layout]
      stage-by-stage noop timings of the flagship pipeline
  python bench_extra.py query <name> [sf_dir] [reps]
      time one declared query with the noop sink
  python bench_extra.py explain <name> [sf_dir] [outfile]
      dump .explain('formatted') for one declared query
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format('noop').mode('overwrite').save()


def _t(label, fn):
    t0 = time.time()
    fn()
    dt = time.time() - t0
    print(f'{label:45s} {dt:8.3f}s')
    return dt


def flagship_stages(master: str, n_pages: int, layout: str) -> None:
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint
    from buzzard_spark.operators import spatial_join
    from buzzard_spark.session import get_session

    spark = get_session(master=master, app_name='bench-extra')
    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)

    def pages():
        return (synth.synthetic_pages(spark, n_pages, partitions=256,
                                      layout=layout)
                .withColumn('tile_x', F.expr(tx))
                .withColumn('tile_y', F.expr(ty)))

    regions = synth.regions(spark, 1000)

    def joined():
        return spatial_join.pip_join_rect(pages(), regions, 4,
                                          broadcast_cover=True)

    gk = '(region_id * 131072 + tile_y * 512 + tile_x)'

    def counts():
        return (joined()
                .groupBy(F.expr(gk).alias('gk'))
                .agg(F.count('*').alias('n')))

    # warmup: one full run so JIT/codegen tier-up doesn't land on a stage
    counts().agg(F.sum('n'), F.count('*')).collect()

    sc = spark.sparkContext
    sc.setJobDescription('gen only (lat/lng)')
    _t('gen: ids+lat+lng only', lambda: _noop(
        synth.synthetic_pages(spark, n_pages, partitions=256, layout=layout)
        .select('page_id', 'lat', 'lng')))
    sc.setJobDescription('gen+tiles+cell')
    _t('gen + tile_x/tile_y + cell', lambda: _noop(
        spatial_join.assign_cell(pages(), 4).select(
            'page_id', 'lat', 'lng', 'tile_x', 'tile_y', 'cell')))
    sc.setJobDescription('join')
    _t('  + broadcast cover join + refine', lambda: _noop(
        joined().select('page_id', 'region_id', 'tile_x', 'tile_y')))
    sc.setJobDescription('full agg collect')
    _t('  + groupBy(gk) count + final agg', lambda: (
        counts().agg(F.sum('n'), F.count('*')).collect()))
    n_out = joined().count()
    n_groups = counts().count()
    print(f'join output rows: {n_out}  groups: {n_groups}')
    spark.stop()


def time_query(name: str, sf_dir: str, reps: int) -> None:
    import __spark_entry__ as entrymod
    from buzzard_spark.session import get_session

    spark = get_session(app_name='bench-extra')
    items = entrymod.queries()
    items.update(entrymod.bench_extra_queries())
    fn = items[name]
    # one untimed warmup pass (same treatment bench.py's session warmup
    # gives the sweep)
    _noop(fn(spark, sf_dir))
    for i in range(reps):
        t0 = time.time()
        _noop(fn(spark, sf_dir))
        print(f'{name} rep{i}: {time.time() - t0:.3f}s')
    spark.stop()


def explain_query(name: str, sf_dir: str, outfile: str | None) -> None:
    import io
    from contextlib import redirect_stdout

    import __spark_entry__ as entrymod
    from buzzard_spark.session import get_session

    spark = get_session(app_name='bench-extra')
    items = entrymod.queries()
    items.update(entrymod.bench_extra_queries())
    df = items[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain('formatted')
    text = buf.getvalue()
    if outfile:
        with open(outfile, 'w') as f:
            f.write(text)
        print(f'wrote {outfile} ({len(text)} bytes)')
    else:
        print(text)
    spark.stop()


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else 'flagship'
    if cmd == 'flagship':
        master = sys.argv[2] if len(sys.argv) > 2 else 'local[32]'
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 64_000_000
        layout = sys.argv[4] if len(sys.argv) > 4 else 'clustered'
        flagship_stages(master, n, layout)
    elif cmd == 'query':
        time_query(sys.argv[2],
                   sys.argv[3] if len(sys.argv) > 3
                   else os.environ.get('SPARK_GRAFT_SF_DIR',
                                       '/root/testdata/sf0.1'),
                   int(sys.argv[4]) if len(sys.argv) > 4 else 3)
    elif cmd == 'explain':
        explain_query(sys.argv[2],
                      sys.argv[3] if len(sys.argv) > 3
                      else os.environ.get('SPARK_GRAFT_SF_DIR',
                                          '/root/testdata/sf0.1'),
                      sys.argv[4] if len(sys.argv) > 4 else None)
    else:
        raise SystemExit(f'unknown command {cmd!r}')


if __name__ == '__main__':
    main()
