"""Round-3 probe: decompose the flagship's 8→32 scaling loss (VERDICT r2:
8→32 raw 0.3611 vs host probe 0.7021 — flagship captures only ~51% of the
host-delivered scaling above 8 threads).

Stage variants, each timed at local[8] / local[16] / local[32] on identical
input (256M pages, clustered layout, 512 splits):

  gen      — synthetic_pages + tile_x/tile_y, plain count (codegen scan only)
  nojoin   — gen + cell-indexed PIP join, plain count (join, no group agg)
  flagship — full: join + packed-key groupBy + 2-value rollup (bench.py job)
  agg      — gen + packed (tile only) groupBy, no join (agg scaling alone)

Each worker also runs the pure-CPU host probe so contention is visible.

Usage:   python scripts/probe32.py [n_pages] [variant ...]
Worker:  python scripts/probe32.py --worker <master> <n_pages> <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REGIONS = 1000
JOIN_RES = 4
MASTERS = ('local[8]', 'local[16]', 'local[32]')


def _base(spark, n):
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint

    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)
    return (synth.synthetic_pages(spark, n, partitions=512,
                                  layout='clustered')
            .withColumn('tile_x', F.expr(tx))
            .withColumn('tile_y', F.expr(ty)))


def run_variant(spark, n, variant):
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.operators import spatial_join

    pages = _base(spark, n)
    t0 = time.time()
    if variant == 'gen':
        pages.agg(F.count('*').alias('n'), F.sum('tile_x').alias('s')).collect()
        return time.time() - t0
    if variant == 'agg':
        gk = '(tile_y * 512 + tile_x)'
        (pages.groupBy(F.expr(gk).alias('gk'))
         .agg(F.count('*').alias('n'))
         .agg(F.sum('n').alias('t'), F.count('*').alias('g'))).collect()
        return time.time() - t0
    regions = synth.regions(spark, N_REGIONS)
    joined = spatial_join.pip_join_rect(pages, regions, JOIN_RES,
                                        broadcast_cover=True)
    if variant == 'nojoin':
        joined.agg(F.count('*').alias('n')).collect()
    else:  # flagship
        gk = '(region_id * 131072 + tile_y * 512 + tile_x)'
        (joined.groupBy(F.expr(gk).alias('gk'))
         .agg(F.count('*').alias('n'))
         .agg(F.sum('n').alias('t'), F.count('*').alias('g'))).collect()
    return time.time() - t0


def _cpu_probe(spark):
    from pyspark.sql import functions as F
    df = spark.range(0, 150_000_000, 1, 64)
    expr = F.expr('sum(sqrt(CAST((id * 2654435761) % 4294967296 AS DOUBLE)) '
                  '+ sin(id))')
    df.select(expr).collect()
    t0 = time.time()
    df.select(expr).collect()
    return time.time() - t0


def worker(master, n, variant):
    from buzzard_spark.session import get_session
    spark = get_session(master=master, app_name=f'p32-{master}-{variant}')
    run_variant(spark, min(n, 500_000), variant)  # codegen warmup
    wall = run_variant(spark, n, variant)
    cpu = _cpu_probe(spark)
    spark.stop()
    print(json.dumps({'master': master, 'variant': variant, 'wall': wall,
                      'cpu': cpu}))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000_000
    variants = sys.argv[2:] or ['gen', 'agg', 'nojoin', 'flagship']
    out = {}
    for v in variants:
        out[v] = {}
        for master in MASTERS:
            best = None
            for _ in range(2):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     '--worker', master, str(n), v],
                    capture_output=True, text=True, timeout=1800)
                lines = [l for l in proc.stdout.splitlines()
                         if l.startswith('{')]
                if not lines:
                    print(proc.stdout[-2000:], proc.stderr[-2000:])
                    raise RuntimeError(f'worker failed: {master} {v}')
                r = json.loads(lines[-1])
                if best is None or r['wall'] < best['wall']:
                    best = r
            out[v][master] = best
            print(json.dumps({v: {master: best}}), flush=True)
        w8, w32 = out[v]['local[8]']['wall'], out[v]['local[32]']['wall']
        w16 = out[v]['local[16]']['wall']
        print(json.dumps({
            v + '_eff': {'8_16': round(w8 / w16 / 2, 3),
                         '16_32': round(w16 / w32 / 2, 3),
                         '8_32': round(w8 / w32 / 4, 3),
                         'cpu_8_32': round(out[v]['local[8]']['cpu'] /
                                           out[v]['local[32]']['cpu'] / 4, 3)},
        }), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    if sys.argv[1:2] == ['--worker']:
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
