"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, schema width and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, '/root/repo')

import __spark_entry__ as entrymod  # noqa: E402
from buzzard_spark.session import get_session  # noqa: E402

TABLES = ('region nation customer supplier part orders lineitem events '
          'documents embeddings').split()


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f'{v:.12g}'
            vals.append(str(v))
        out.append('|'.join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    only = set(sys.argv[2:])
    spark = get_session()
    # absorb JVM codegen / Python-worker-pool / window first-use costs up
    # front (same warmup bench.py runs) so the first query's wall — and
    # the gate's total budget — measures operators, not session spin-up
    from buzzard_spark.session import warm_session
    warm_session(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd name must not "pass" by checking nothing
        print(f'unknown query name(s): {sorted(unknown)}')
        sys.exit(2)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t1 = time.time()
        if name not in oracles:
            print(f'{name:28s} rows={len(srows):7d}  (rows-only, no oracle) '
                  f'spark={t1 - t0:.1f}s')
            continue
        orel = con.sql(oracles[name])
        orows = orel.fetchall()
        ocols = [d[0] for d in orel.description]
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_vals = ok_rows and ok_cols and \
            normalize(srows, scols) == normalize(orows, ocols)
        status = 'OK' if (ok_rows and ok_cols and ok_vals) else 'FAIL'
        print(f'{name:28s} rows={len(srows):7d}/{len(orows):7d} '
              f'cols={ok_cols} vals={ok_vals} spark={t1 - t0:.1f}s  {status}')
        if status == 'FAIL':
            failures.append(name)
            if not ok_cols:
                print('   spark cols:', scols, ' oracle cols:', ocols)
            elif ok_rows:
                a = normalize(srows, scols)
                b = normalize(orows, ocols)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diff:
                    print('   spark:', x, '\n   duck :', y)
    spark.stop()
    if failures:
        print('FAILURES:', failures)
        sys.exit(1)
    print('all oracle checks passed')


if __name__ == '__main__':
    main()
