"""A/B config experiments for the 16→32-thread regression in the flagship
aggregation (round-3 probe: agg variant 1.95s @16 → 2.33s @32 while the
host CPU probe improved). Each variant runs in its own JVM at local[32],
256M pages, and reports wall + GC time delta (all collectors).

Usage: python scripts/agg32_ab.py [n_pages] [variant ...]
Variants: base gc_parallel splits2048 shuffle128 nobroadcastvars
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    'base': {},
    'gc_parallel': {'spark.driver.extraJavaOptions': '-XX:+UseParallelGC'},
    'gc_bigyoung': {'spark.driver.extraJavaOptions':
                    '-XX:+UnlockExperimentalVMOptions -XX:G1NewSizePercent=40'},
    'shuffle128': {'spark.sql.shuffle.partitions': '128'},
    'offheap': {'spark.memory.offHeap.enabled': 'true',
                'spark.memory.offHeap.size': '8g'},
}


def _gc_ms(spark):
    jvm = spark._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    for i in range(beans.size()):
        total += beans.get(i).getCollectionTime()
    return total


def worker(variant, n_pages, splits):
    from pyspark.sql import functions as F

    from buzzard_spark import session as sess
    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint

    extra = json.loads(os.environ.get('SPARK_GRAFT_AB_CONF', '{}'))
    sess.ENGINE_CONFS = {**sess.ENGINE_CONFS, **extra}
    spark = sess.get_session(master='local[32]', app_name=f'ab-{variant}')

    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)

    def run(n):
        pages = (synth.synthetic_pages(spark, n, partitions=splits,
                                       layout='clustered')
                 .withColumn('tile_x', F.expr(tx))
                 .withColumn('tile_y', F.expr(ty)))
        gk = '(tile_y * 512 + tile_x)'
        (pages.groupBy(F.expr(gk).alias('gk'))
         .agg(F.count('*').alias('n'))
         .agg(F.sum('n').alias('t'), F.count('*').alias('g'))).collect()

    run(500_000)  # warmup
    g0 = _gc_ms(spark)
    t0 = time.time()
    run(n_pages)
    wall = time.time() - t0
    g1 = _gc_ms(spark)
    spark.stop()
    print(json.dumps({'variant': variant, 'wall': wall,
                      'gc_ms': g1 - g0, 'splits': splits}))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000_000
    variants = sys.argv[2:] or ['base', 'gc_parallel', 'shuffle128']
    for v in variants:
        splits = 2048 if v == 'splits2048' else 512
        vv = 'base' if v == 'splits2048' else v
        env = dict(os.environ)
        if vv in VARIANTS and VARIANTS[vv]:
            # ship configs via env var consumed below in worker subprocess
            env['SPARK_GRAFT_AB_CONF'] = json.dumps(VARIANTS[vv])
        best = None
        for _ in range(2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 '--worker', vv, str(n), str(splits)],
                capture_output=True, text=True, timeout=900, env=env)
            lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
            if not lines:
                print('FAILED', v, proc.stderr[-1500:])
                break
            r = json.loads(lines[-1])
            if best is None or r['wall'] < best['wall']:
                best = r
        if best:
            best['variant'] = v
            print(json.dumps(best), flush=True)


if __name__ == '__main__':
    if sys.argv[1:2] == ['--worker']:
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
