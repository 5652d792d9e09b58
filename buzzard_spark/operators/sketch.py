"""Deterministic, cross-engine-exact sketches: HyperLogLog cardinality
and Count-Min frequency.

At the 100-TB design point a corpus build cannot afford exact
``COUNT(DISTINCT url)`` per group (a full shuffle of every distinct
value) or exact per-key counts just to FIND the hot keys it must salt —
both questions want a fixed-size mergeable summary. Spark ships
``approx_count_distinct`` (HLL++) and DataSketches, but their register
layout is engine-private, so none of their outputs can be value-checked
against the DuckDB oracle. These implementations take the opposite
trade: the sketch is ordinary integer SQL (md5-nibble hashing, bit
arithmetic, two-level aggregation) that BOTH engines evaluate
bit-identically, so the driver's hash gate applies to the sketch output
itself — while keeping the properties that matter at scale:

- **mergeable / map-side combinable**: registers are ``MAX`` per
  (group, bucket) and counters are ``SUM`` per (row, column) — Catalyst
  emits partial aggregation automatically, so executor-local sketches
  combine without shipping raw values, exactly how an HLL union works
  on a real cluster.
- **fixed size**: 2^p registers (HLL) / d·w counters (CM) per group, no
  matter how many rows feed them.
- **no floats in the data path**: the only float op is the final HLL
  estimate — one division of two dyadic-exact doubles (IEEE-754
  correctly rounded, deterministic in any engine) followed by FLOOR.

Papers (public): Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007); Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications" (J. Algorithms 2005).

The geometric observable here is LOW-bit position (trailing-zeros rank,
``rho = tz(w)+1``) rather than the paper's leading-zeros — same
geometric(1/2) law, but computable with two portable integer ops
(``bit_count((~w) & (w-1))``) instead of a 64-branch CASE.

No reference-repo analogue: buzzard has no sketching surface; this is
part of the training-data-pipeline extension mandated by the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from buzzard_spark.functions.sqlgen import dlit
from buzzard_spark.operators.text import _nibble_sql

__all__ = ['approx_distinct', 'approx_distinct_oracle_sql',
           'count_min_estimates', 'count_min_oracle_sql',
           'bloom_filter', 'bloom_filter_oracle_sql']

# w takes the first 10 md5 nibbles = 40 uniform bits; rho in 1..41
_W_NIBBLES = 10
_MAXR = 4 * _W_NIBBLES + 1


def _nibble_int_sql(h: str, lo: int, n: int, dialect: str) -> str:
    """Integer from ``n`` hex nibbles of pre-hashed hex column ``h``
    starting at 1-based position ``lo`` (branch-free ascii arithmetic,
    BIGINT per term — same construction as corpus._hash_u32_sql)."""
    return '(' + ' + '.join(
        f'(CAST({_nibble_sql(h, str(lo + j), dialect)} AS BIGINT) '
        f'* {16 ** (n - 1 - j)})'
        for j in range(n)) + ')'


def _hll_frags(value_sql: str, p: int, dialect: str):
    """Shared SQL fragments for one HLL pass: (hash, bucket, w, rho,
    per-register term, estimate-from-(sum, n_buckets))."""
    if p % 4 != 0 or not (4 <= p <= 12):
        raise ValueError(f'p must be 4, 8 or 12 (whole md5 nibbles): {p}')
    m = 1 << p
    cast_s = 'VARCHAR' if dialect == 'duckdb' else 'STRING'
    h = f'md5(CAST({value_sql} AS {cast_s}))'
    bucket = _nibble_int_sql('_h', _W_NIBBLES + 1, p // 4, dialect)
    w = _nibble_int_sql('_h', 1, _W_NIBBLES, dialect)
    # trailing-zeros rank: geometric(1/2) exactly like the paper's
    # leading-zeros rho; w = 0 (prob 2^-40) pins the max rank
    rho = (f'(CASE WHEN _w = 0 THEN {_MAXR} '
           f'ELSE CAST(bit_count((~_w) & (_w - 1)) AS BIGINT) + 1 END)')
    # per-register contribution 2^(maxr - M): SUM over m registers is
    # 2^maxr * sum(2^-M) <= m * 2^maxr = 2^(p+41) — exact in BIGINT
    one = 'CAST(1 AS BIGINT)'
    if dialect == 'duckdb':
        term = f'({one} << ({_MAXR} - _m))'
    else:
        term = f'shiftleft({one}, {_MAXR} - _m)'
    # alpha_m * m^2 * 2^maxr as ONE exact float64 literal; empty
    # registers (M = 0) contribute 2^maxr each
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = dlit(alpha * m * m * float(1 << _MAXR))
    raw = f'({num} / CAST(_s + ({m} - _nb) * {1 << _MAXR} AS DOUBLE))'
    # small-range correction (the paper's linear counting, E <= 2.5m
    # with V > 0 empty registers): m·ln(m/V) — but runtime ln is the one
    # transcendental whose last-bit rounding is libm-specific, so the
    # 255 possible values are PRE-COMPUTED in Python and emitted as a
    # CASE table of exact float64 literals both engines read identically
    import math
    lin = ('(CASE ({m} - _nb) '
           + ' '.join(f'WHEN {v} THEN {dlit(m * math.log(m / v))}'
                      for v in range(1, m))
           + f' ELSE {raw} END)').format(m=m)
    est = (f'CAST(FLOOR(CASE WHEN _nb < {m} AND {raw} <= {dlit(2.5 * m)} '
           f'THEN {lin} ELSE {raw} END) AS BIGINT)')
    return m, h, bucket, w, rho, term, est


def approx_distinct(df: DataFrame, value_col: str, group_col: str,
                    p: int = 8) -> DataFrame:
    """Per-group HLL cardinality estimate, value-checkable cross-engine.

    Output: ``(group, n_hll BIGINT, v_empty BIGINT)`` — the paper's
    full estimator (raw harmonic-mean estimate, switched to the
    linear-counting correction ``m·ln(m/V)`` in the small range
    ``E <= 2.5m, V > 0``) plus the empty-register count V. The
    correction's ``ln`` would be the one libm-specific transcendental
    in the engine, so its 255 possible values are pre-computed and
    emitted as exact float64 CASE literals — bit-identical in any
    engine. At ``p=12`` that table has 4095 branches: still correct,
    but large enough that Catalyst may drop the final (one-row-per-
    group) projection out of whole-stage codegen into interpreted mode
    — prefer ``p=8`` (±6.5% σ) unless the use case genuinely needs
    ±1.6%.

    Plan shape: project (group, bucket, rho) → ``MAX`` per
    (group, bucket) → ``SUM``/``COUNT`` per group. Both aggregations
    partial-combine map-side, so at any scale the shuffle carries at
    most m rows per group per task — never raw values.
    """
    m, h, bucket, w, rho, term, est = _hll_frags(value_col, p, 'spark')
    regs = (df.select(group_col, F.expr(h).alias('_h'))
              .select(group_col, F.expr(bucket).alias('_b'),
                      F.expr(w).alias('_w'))
              .select(group_col, '_b', F.expr(rho).alias('_r'))
              .groupBy(group_col, '_b').agg(F.max('_r').alias('_m')))
    agg = regs.groupBy(group_col).agg(
        F.count('*').alias('_nb'),
        F.expr(f'sum({term})').alias('_s'))
    return agg.select(
        group_col,
        F.expr(est).alias('n_hll'),
        F.expr(f'CAST({m} - _nb AS BIGINT)').alias('v_empty'))


def approx_distinct_oracle_sql(table: str, value_col: str, group_col: str,
                               p: int = 8) -> str:
    """DuckDB twin of :func:`approx_distinct` (same fragments; ``<<``
    for shiftleft, CAST on SUM — DuckDB widens SUM(BIGINT) to
    HUGEINT)."""
    m, h, bucket, w, rho, term, est = _hll_frags(value_col, p, 'duckdb')
    g = group_col
    return (
        f'WITH h AS (SELECT {g}, {h} AS _h FROM {table}), '
        f'b AS (SELECT {g}, {bucket} AS _b, {w} AS _w FROM h), '
        f'r AS (SELECT {g}, _b, {rho} AS _r FROM b), '
        f'regs AS (SELECT {g}, _b, MAX(_r) AS _m FROM r GROUP BY {g}, _b), '
        f'agg AS (SELECT {g}, COUNT(*) AS _nb, '
        f'CAST(SUM({term}) AS BIGINT) AS _s FROM regs GROUP BY {g}) '
        f'SELECT {g}, {est} AS n_hll, '
        f'CAST({m} - _nb AS BIGINT) AS v_empty FROM agg')


def _cm_hash_sql(value_sql: str, row: int, dialect: str) -> str:
    """Salted md5 for CM row ``row`` — hoist into a column and feed
    :func:`_nibble_int_sql` (per its pre-hashed-column contract)."""
    cast_s = 'VARCHAR' if dialect == 'duckdb' else 'STRING'
    if dialect == 'duckdb':
        return f"md5(CAST({value_sql} AS {cast_s}) || ':cm{row}:')"
    return f"md5(concat(CAST({value_sql} AS {cast_s}), ':cm{row}:'))"


def count_min_estimates(df: DataFrame, value_col: str,
                        d: int = 3, width: int = 512) -> DataFrame:
    """Count-Min frequency estimate for every distinct value: output
    ``(value, n_true BIGINT, cm_est BIGINT)`` with the sketch guarantee
    ``cm_est >= n_true`` (one-sided collision error, bounded by
    ``e·N/width`` with prob ``1 - e^-d``).

    The sketch itself is the d×width counter table — ``SUM`` per
    (row, column), fixed size, mergeable map-side; that is the object a
    streaming heavy-hitter pass or a skew-salting planner keeps at 100
    TB. Here it is immediately probed for every distinct value (explode
    over the d rows → join on (row, column) → MIN over rows) so the
    guarantee is value-checked cross-engine; ``n_true`` rides along from
    the same pre-aggregation that already shrank the probe side to one
    row per distinct value.
    """
    counts = (df.groupBy(F.col(value_col).alias('v'))
                .agg(F.count('*').alias('n_true')))
    # one (row, col, n) triple per CM row per distinct value — the
    # sketch is the SUM over values, the probe reuses the same cols;
    # salted hashes hoisted to columns (one md5 per row per CM row)
    hashed = counts.select(
        'v', 'n_true',
        *[F.expr(_cm_hash_sql('v', i, 'spark')).alias(f'_h{i}')
          for i in range(d)])
    tall = hashed.select(
        'v', 'n_true',
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias('i'),
                F.expr(f"({_nibble_int_sql(f'_h{i}', 1, 8, 'spark')} "
                       f'% {width})').alias('c'))
            for i in range(d)])).alias('rc')
    ).select('v', 'n_true', 'rc.i', 'rc.c')
    sketch = tall.groupBy('i', 'c').agg(F.sum('n_true').alias('cell'))
    probed = (tall.join(sketch, ['i', 'c'])
                  .groupBy('v', 'n_true')
                  .agg(F.min('cell').alias('cm_est')))
    return probed.select(F.col('v').alias(value_col), 'n_true', 'cm_est')


def count_min_oracle_sql(table: str, value_col: str,
                         d: int = 3, width: int = 512) -> str:
    """DuckDB twin of :func:`count_min_estimates` (UNION ALL instead of
    explode; same salted-md5 column hashes)."""
    hs = ', '.join(f"{_cm_hash_sql('v', i, 'duckdb')} AS _h{i}"
                   for i in range(d))
    cols = ' UNION ALL '.join(
        f'SELECT v, n_true, {i} AS i, '
        f"({_nibble_int_sql(f'_h{i}', 1, 8, 'duckdb')} % {width}) AS c "
        f'FROM hashed'
        for i in range(d))
    return (
        f'WITH counts AS (SELECT {value_col} AS v, COUNT(*) AS n_true '
        f'FROM {table} GROUP BY 1), '
        f'hashed AS (SELECT v, n_true, {hs} FROM counts), '
        f'tall AS ({cols}), '
        f'sketch AS (SELECT i, c, CAST(SUM(n_true) AS BIGINT) AS cell '
        f'FROM tall GROUP BY i, c) '
        f'SELECT t.v AS {value_col}, t.n_true, '
        f'CAST(MIN(s.cell) AS BIGINT) AS cm_est '
        f'FROM tall t JOIN sketch s USING (i, c) '
        f'GROUP BY t.v, t.n_true')


def _bloom_pos_sql(j: int, m_bits: int, dialect: str) -> str:
    """Bit position j of the Bloom filter for pre-hashed hex column
    ``_h``: 4 md5 nibbles (16 uniform bits) per hash function, modulo
    the power-of-two ``m_bits``."""
    return f'({_nibble_int_sql("_h", 1 + 4 * j, 4, dialect)} % {m_bits})'


def bloom_filter(probe: DataFrame, build: DataFrame,
                 probe_col: str, build_col: str,
                 m_bits: int = 8192, k: int = 4) -> DataFrame:
    """Runtime Bloom-filter pruning of a huge probe side (the engine-
    level analogue of Spark 3.3's runtime row-group filters, but
    deterministic and cross-engine-exact): the build side's keys set
    ``k`` md5-derived bits in an ``m_bits``-bit filter; probe rows whose
    bits are not all set are dropped BEFORE any join shuffle. Returns
    the passing probe rows (true members plus the filter's deterministic
    false positives — membership is a pure function of (key, m_bits, k),
    so the DuckDB oracle reproduces the exact row set, FPs included).

    Scale shape (100 TB): the build aggregates to ``m_bits/64`` BIGINT
    words via map-side-combinable ``bit_or`` — executor-local filters
    merge exactly like production bloom builds — and the finished words
    (~8 KiB at the default; packed 63 bits per BIGINT word so no shift
    ever touches the sign bit — DuckDB raises on 1<<63 where Java wraps) are embedded as a literal array in the probe
    predicate: whole-stage codegen, no join, no shuffle of the probe.
    The ONE driver action is collecting those words — bounded by
    ``m_bits``, never by data size (same bounded-collect contract as the
    IVF centroid sample). FP rate ≈ (1 - e^(-k·n/m))^k; size ``m_bits``
    ≥ ~10 bits/key for ~1% at k=4, and k·4 md5 nibbles must fit the 32
    available (k ≤ 8), m_bits ≤ 2^16 (16 bits per position).
    """
    if m_bits & (m_bits - 1) or not (64 <= m_bits <= 65536):
        raise ValueError(f'm_bits must be a power of two in [64, 65536]: '
                         f'{m_bits}')
    if not (1 <= k <= 8):
        raise ValueError(f'k must be in [1, 8]: {k}')
    # 63 bits per BIGINT word: the max shift is 62, which both Spark
    # and DuckDB evaluate without sign-bit overflow (DuckDB raises on
    # 1::BIGINT << 63 where Java silently wraps — the pairing rule)
    n_words = (m_bits + 62) // 63
    pos = [_bloom_pos_sql(j, m_bits, 'spark') for j in range(k)]
    built = (build
             .select(F.md5(F.col(build_col).cast('string')).alias('_h'))
             .select(F.explode(F.array(
                 *[F.expr(p) for p in pos])).alias('_p'))
             .select(F.expr('_p DIV 63').alias('_wi'),
                     F.expr('shiftleft(CAST(1 AS BIGINT), '
                            'CAST(_p % 63 AS INT))').alias('_b'))
             .groupBy('_wi').agg(F.bit_or('_b').alias('_w'))
             .collect())
    words = [0] * n_words
    for r in built:
        words[r['_wi']] = r['_w']
    arr = 'array(' + ', '.join(f'CAST({w} AS BIGINT)'
                               for w in words) + ')'
    # The probe predicate is ONE higher-order-function expression:
    # exists() binds the md5 hex to a lambda variable, so the hash is
    # computed ONCE per row — a plain _h projection gets collapsed into
    # the filter by Catalyst's CollapseProject and the md5 re-evaluates
    # inside every nibble use (measured 49 µs/row = 8.5 s on a 150 k-row
    # probe; this form runs it in ~0.4 s). Position extraction uses
    # conv() on the Spark side — one native call per position instead
    # of 4 ascii-arithmetic nibble chains; the DuckDB oracle keeps the
    # branch-free nibble arithmetic (VALUE parity, not text parity).
    def spark_pos(j):
        return (f'(CAST(conv(substring(bh, {1 + 4 * j}, 4), 16, 10) '
                f'AS BIGINT) % {m_bits})')

    checks = ' AND '.join(
        f'(element_at({arr}, CAST({spark_pos(j)} DIV 63 AS INT) + 1) & '
        f'shiftleft(CAST(1 AS BIGINT), '
        f'CAST({spark_pos(j)} % 63 AS INT))) != 0'
        for j in range(k))
    pred = (f'exists(array(md5(CAST({probe_col} AS STRING))), '
            f'bh -> {checks})')
    return probe.where(F.expr(pred))


def bloom_filter_oracle_sql(probe_cte: str, build_cte: str,
                            probe_col: str, build_col: str,
                            m_bits: int = 8192, k: int = 4,
                            select: str = '*') -> str:
    """DuckDB twin of :func:`bloom_filter`: identical md5-derived
    positions and word layout, membership via an explode + word join
    instead of the literal-array probe (same row set, FPs included).
    ``probe_cte``/``build_cte``: SQL for CTEs named probe/build."""
    pos_b = [_bloom_pos_sql(j, m_bits, 'duckdb') for j in range(k)]
    poslist = '[' + ', '.join(pos_b) + ']'
    return f"""
WITH probe AS ({probe_cte}), build AS ({build_cte}),
bh AS (SELECT md5(CAST({build_col} AS VARCHAR)) AS _h FROM build),
bp AS (SELECT unnest({poslist}) AS p FROM bh),
words AS (SELECT p // 63 AS wi,
                 bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS w
          FROM bp GROUP BY 1),
ph AS (SELECT DISTINCT {probe_col} AS pk,
               md5(CAST({probe_col} AS VARCHAR)) AS _h FROM probe),
pp AS (SELECT pk, unnest({poslist}) AS p FROM ph),
hits AS (SELECT pk, COUNT(*) AS nh FROM pp
         JOIN words ON pp.p // 63 = words.wi
                   AND (words.w & (CAST(1 AS BIGINT)
                        << CAST(pp.p % 63 AS INT))) <> 0
         GROUP BY pk),
pass AS (SELECT pk FROM hits WHERE nh = {k})
SELECT {select} FROM probe SEMI JOIN pass ON {probe_col} = pass.pk
"""
