"""SparkSession factory with the engine's scale defaults.

These settings are the Spark-side counterpart of the reference's baked-in
dataflow optimizations (SURVEY.md §4): AQE replaces the actor scheduler's
runtime adaptivity, skew-join splitting replaces nothing the reference had
(single machine), Arrow makes the pandas-UDF tile kernels batch-columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS = {
    'spark.sql.adaptive.enabled': 'true',
    'spark.sql.adaptive.coalescePartitions.enabled': 'true',
    'spark.sql.adaptive.skewJoin.enabled': 'true',
    'spark.sql.execution.arrow.pyspark.enabled': 'true',
    'spark.sql.execution.arrow.maxRecordsPerBatch': '65536',
    # parquet scans: let min/max pruning see the bbox/cell columns
    'spark.sql.parquet.filterPushdown': 'true',
    'spark.sql.parquet.aggregatePushdown': 'true',
    # deterministic timestamps across engines
    'spark.sql.session.timeZone': 'UTC',
    'spark.ui.enabled': 'false',
    # local mode: shuffle files live in page cache — compression is pure
    # CPU overhead here (re-enable on a real cluster with slow disks/net)
    'spark.shuffle.compress': 'false',
}


def get_session(master: str | None = None, app_name: str = 'buzzard_spark',
                shuffle_partitions: int | None = None) -> SparkSession:
    if master is None:
        cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
        master = f'local[{cpus}]'
    if shuffle_partitions is None:
        n = master.split('[')[-1].rstrip(']*')
        shuffle_partitions = int(n) if n.isdigit() else 32
    local_dir = os.environ.get('SPARK_GRAFT_LOCAL_DIR', '/dev/shm/spark-local')
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = None
    builder = (SparkSession.builder.master(master).appName(app_name)
               .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
               .config('spark.driver.memory',
                       os.environ.get('SPARK_GRAFT_DRIVER_MEM', '48g')))
    if local_dir:
        # tmpfs shuffle dirs: immune to neighbor disk I/O on the shared host
        builder = builder.config('spark.local.dir', local_dir)
    for key, val in ENGINE_CONFS.items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
