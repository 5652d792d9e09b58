#!/usr/bin/env python
"""spark-submit entrypoint for the flagship spatial-join + tile-assignment
job (north rule launch mode).

Cluster usage:

    cd /root/repo && python -m zipfile -c /tmp/buzzard_spark.zip buzzard_spark
    spark-submit --master <cluster> --py-files /tmp/buzzard_spark.zip \
        scripts/submit_flagship.py --pages 100000000 --regions 1000 \
        --output /data/out/flagship

Sandbox usage (local master from SPARK_GRAFT_CPUS):

    python scripts/submit_flagship.py --pages 4000000

Writes per-(region, tile) counts through the snapshot-manifest table
(atomic, resumable) and prints one JSON metrics line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pages', type=int, default=4_000_000)
    ap.add_argument('--regions', type=int, default=1000)
    ap.add_argument('--res', type=int, default=4)
    ap.add_argument('--master', default=None)
    ap.add_argument('--output', default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from buzzard_spark import synth
    from buzzard_spark.functions import sqlgen
    from buzzard_spark.kernels.footprint import Footprint
    from buzzard_spark.operators import spatial_join
    from buzzard_spark.session import get_session
    from buzzard_spark.sources.snapshot_table import SnapshotTable

    spark = get_session(master=args.master, app_name='buzzard-flagship')
    fp = Footprint(tl=(-180.0, 90.0), size=(360.0, 180.0), rsize=(512, 256))
    tx, ty = sqlgen.tile_xy_sql('lat', 'lng', fp)

    pages = (synth.synthetic_pages(spark, args.pages)
             .withColumn('tile_x', F.expr(tx))
             .withColumn('tile_y', F.expr(ty)))
    regions = synth.regions(spark, args.regions)
    t0 = time.time()
    result = (spatial_join.pip_join_rect(pages, regions, args.res)
              .groupBy('region_id', 'tile_x', 'tile_y')
              .agg(F.count('*').alias('n_pages')))

    if args.output:
        table = SnapshotTable(args.output)
        manifest = table.append(
            result, observe={'rows': F.count(F.lit(1)),
                             'pages': F.sum('n_pages')})
        rows = manifest['rows']
    else:
        agg = result.agg(F.sum('n_pages').alias('pages'),
                         F.count('*').alias('rows')).collect()[0]
        rows = agg['rows']
    wall = time.time() - t0
    print(json.dumps({
        'pages_in': args.pages,
        'result_rows': rows,
        'wall_sec': round(wall, 3),
        'pages_per_sec': round(args.pages / wall, 1),
    }))
    spark.stop()


if __name__ == '__main__':
    main()
