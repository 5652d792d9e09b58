"""A/B for the random (crawl-order / 'hash') layout flagship aggregation:

  direct  — groupBy(gk) straight on the joined stream: map-side combine
            emits ~O(groups × tasks) rows and each task's agg map holds
            the full group set (the round-2 measured 2× penalty at 8+
            threads on unclustered input).
  repart  — project (gk) then repartition(cores*4, gk) BEFORE the groupBy:
            shuffles every matched row (more bytes) but the post-shuffle
            agg sees groups/partitions-sized cache-resident maps and the
            map-side combine disappears.

Usage: python scripts/hashagg_ab.py [n_pages] [masters...]
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


def run(spark, n, strategy, ncores):
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint
    from buzzard_spark.operators import spatial_join

    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)
    pages = (synth.synthetic_pages(spark, n, partitions=512, layout='hash')
             .withColumn('tile_x', F.expr(tx))
             .withColumn('tile_y', F.expr(ty)))
    regions = synth.regions(spark, N_REGIONS)
    t0 = time.time()
    joined = spatial_join.pip_join_rect(pages, regions, JOIN_RES,
                                        broadcast_cover=True)
    gk = '(region_id * 131072 + tile_y * 512 + tile_x)'
    proj = joined.select(F.expr(gk).alias('gk'))
    if strategy == 'repart':
        proj = proj.repartition(ncores * 4, 'gk')
    (proj.groupBy('gk').agg(F.count('*').alias('n'))
     .agg(F.sum('n').alias('t'), F.count('*').alias('g'))).collect()
    return time.time() - t0


def worker(master, n, strategy):
    from buzzard_spark.session import get_session
    ncores = int(master.split('[')[1].rstrip(']'))
    spark = get_session(master=master, app_name=f'hab-{strategy}')
    run(spark, min(n, 500_000), strategy, ncores)
    wall = run(spark, n, strategy, ncores)
    spark.stop()
    print(json.dumps({'master': master, 'strategy': strategy, 'wall': wall}))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000_000
    masters = sys.argv[2:] or ['local[8]', 'local[32]']
    for strategy in ('direct', 'repart'):
        for master in masters:
            best = None
            for _ in range(2):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     '--worker', master, str(n), strategy],
                    capture_output=True, text=True, timeout=900)
                lines = [l for l in proc.stdout.splitlines()
                         if l.startswith('{')]
                if not lines:
                    print('FAILED', proc.stderr[-1000:])
                    return
                r = json.loads(lines[-1])
                if best is None or r['wall'] < best['wall']:
                    best = r
            print(json.dumps(best), flush=True)


if __name__ == '__main__':
    if sys.argv[1:2] == ['--worker']:
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
