"""Isolate the flagship's ~5.5s parallelism-independent component.

Worker: python scripts/serial_probe.py --run <master> <n> <mode>
Modes: join (no agg), agg (full), agg_nocoalesce, agg_parts256,
       agg_nobroadcast, cover (just build+collect the cover), gen
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


def build(spark, n, mode):
    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint
    from buzzard_spark.operators import spatial_join

    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    pages = synth.synthetic_pages(spark, n)
    lat = (f'(-8.5E1 + (CAST(page_id AS DOUBLE) / {float(n)}) * 1.7E2)')
    pages = pages.withColumn('lat', F.expr(lat))  # clustered layout
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)
    pages = (pages.withColumn('tile_x', F.expr(tx))
             .withColumn('tile_y', F.expr(ty)))
    regions = synth.regions(spark, N_REGIONS)
    if mode == 'gen':
        return pages.agg(F.count('*'))
    if mode == 'cover':
        return spatial_join.cover_cells_rect(regions, JOIN_RES).agg(
            F.count('*'))
    bc = mode != 'agg_nobroadcast'
    joined = spatial_join.pip_join_rect(pages, regions, JOIN_RES,
                                        broadcast_cover=bc)
    if mode == 'join':
        return joined.agg(F.count('*').alias('n'))
    key = '(region_id * 131072 + tile_y * 512 + tile_x)'
    return (joined.groupBy(F.expr(key).alias('gk'))
            .agg(F.count('*').alias('n'))
            .agg(F.sum('n').alias('t'), F.count('*').alias('g')))


def run(master, n, mode):
    from buzzard_spark.session import get_session
    os.environ.setdefault('SPARK_GRAFT_LOCAL_DIR', '/dev/shm/spark-local')
    extra = {}
    if mode == 'agg_nocoalesce':
        extra['spark.sql.adaptive.coalescePartitions.enabled'] = 'false'
    spark = get_session(master=master, app_name=f'sp-{mode}')
    for k, v in extra.items():
        spark.conf.set(k, v)
    if mode == 'agg_parts256':
        spark.conf.set('spark.sql.shuffle.partitions', '256')
    build(spark, min(n, 500_000), mode).collect()  # warmup
    walls = []
    for _ in range(2):
        t0 = time.time()
        build(spark, n, mode).collect()
        walls.append(time.time() - t0)
    spark.stop()
    print(json.dumps({'master': master, 'mode': mode, 'wall': min(walls)}))


def main():
    n = 16_000_000
    modes = sys.argv[1:] or ['gen', 'cover', 'join', 'agg',
                             'agg_nocoalesce', 'agg_parts256']
    for mode in modes:
        for master in ('local[2]', 'local[8]'):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), '--run',
                 master, str(n), mode],
                capture_output=True, text=True, timeout=1200)
            lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
            print(lines[-1] if lines else proc.stderr[-500:], flush=True)


if __name__ == '__main__':
    if sys.argv[1:2] == ['--run']:
        run(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
