"""Cache-lifetime contract: no operator leaves persisted RDDs behind once
its result is materialized (VERDICT r2 #6 — round 2 relied on callers
running spark.catalog.clearCache() between queries).

Operators that multi-scan an intermediate persist() it, materialize their
result through a reliable checkpoint (session.checkpoint_release) and
unpersist before returning — so a long-lived session embedding the library
never accumulates cached partitions.
"""

import os

import pytest

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR_TEST', '/root/testdata/sf0.001')


def _persistent_rdds(spark):
    return dict(spark.sparkContext._jsc.getPersistentRDDs())


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason='driver testdata absent')
def test_no_persistent_rdds_after_each_entry_query(spark):
    import __spark_entry__ as entrymod

    leaks = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        df.write.format('noop').mode('overwrite').save()
        left = _persistent_rdds(spark)
        if left:
            leaks[name] = [str(v.toString())[:80] for v in left.values()]
            spark.catalog.clearCache()  # isolate queries from each other
    assert not leaks, f'queries leaked persisted RDDs: {leaks}'
