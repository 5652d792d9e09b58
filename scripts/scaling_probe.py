"""Diagnose the flagship 2->8 scaling gap (VERDICT round 1: 0.356 vs >=0.8).

Runs flagship variants at local[2] and local[8] on identical input and
prints per-variant scaling efficiency. Hypothesis from BENCH_r01: the
(region, tile) partial aggregation emits ~#groups rows PER MAP TASK, so
shuffle volume grows linearly with parallelism.

Variants:
  base      — round-1 flagship exactly (random spatial order input)
  clustered — identical page set, emitted in lat-strip order (models an
              Iceberg table with a spatial sort order / Z-order clustering)
  region    — groupBy(region_id) only (G=1000: small group count control)
  nojoin    — tile assign + join, plain count (no per-group agg at all)

Usage: python scripts/scaling_probe.py [n_pages] [variant ...]
Worker: python scripts/scaling_probe.py --worker <master> <n_pages> <variant>
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


def _pages(spark, n, clustered):
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint

    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    pages = synth.synthetic_pages(spark, n)
    if clustered:
        # same id set, lat made monotone in id (strip layout): each input
        # split covers a contiguous latitude band
        lat = (f'(-8.5E1 + (CAST(page_id AS DOUBLE) / {float(n)}) * 1.7E2)')
        pages = pages.withColumn('lat', F.expr(lat))
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)
    return (pages
            .withColumn('tile_x', F.expr(tx))
            .withColumn('tile_y', F.expr(ty)))


def run_variant(spark, n, variant):
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.operators import spatial_join

    pages = _pages(spark, n,
                   clustered=variant in ('clustered', 'clustpack'))
    regions = synth.regions(spark, N_REGIONS)
    t0 = time.time()
    joined = spatial_join.pip_join_rect(pages, regions, JOIN_RES,
                                        broadcast_cover=True)
    if variant == 'nojoin':
        result = joined.agg(F.count('*').alias('n'))
    elif variant == 'region':
        result = (joined.groupBy('region_id')
                  .agg(F.count('*').alias('n'))
                  .agg(F.sum('n').alias('t'), F.count('*').alias('g')))
    elif variant in ('packed', 'clustpack'):
        key = '(region_id * 131072 + tile_y * 512 + tile_x)'
        result = (joined
                  .groupBy(F.expr(key).alias('gk'))
                  .agg(F.count('*').alias('n'))
                  .agg(F.sum('n').alias('t'), F.count('*').alias('g')))
    else:
        result = (joined
                  .groupBy('region_id', 'tile_x', 'tile_y')
                  .agg(F.count('*').alias('n'))
                  .agg(F.sum('n').alias('t'), F.count('*').alias('g')))
    result.collect()
    return time.time() - t0


def worker(master, n, variant):
    from buzzard_spark.session import get_session
    spark = get_session(master=master, app_name=f'probe-{master}-{variant}')
    run_variant(spark, min(n, 500_000), variant)  # codegen warmup
    wall = run_variant(spark, n, variant)
    spark.stop()
    print(json.dumps({'master': master, 'variant': variant, 'wall': wall}))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    variants = sys.argv[2:] or ['base', 'clustered', 'region', 'nojoin']
    results = {}
    for v in variants:
        walls = {}
        for master in ('local[2]', 'local[8]'):
            best = None
            for _ in range(2):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     '--worker-run', master, str(n), v],
                    capture_output=True, text=True, timeout=1200)
                line = [l for l in proc.stdout.splitlines()
                        if l.startswith('{')][-1]
                w = json.loads(line)['wall']
                best = w if best is None else min(best, w)
            walls[master] = best
        eff = (walls['local[2]'] / walls['local[8]']) / 4.0
        results[v] = {'wall2': round(walls['local[2]'], 2),
                      'wall8': round(walls['local[8]'], 2),
                      'eff_2_to_8': round(eff, 3)}
        print(json.dumps({v: results[v]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    if sys.argv[1:2] == ['--worker-run']:
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
