"""Temporal joins for event streams: point-in-time (as-of) join.

The as-of join attaches to each left (probe) row the single newest right
(state) row with ``right_ts <= left_ts`` per key — the point-in-time
lookup every feature store / slowly-changing-dimension / crawl-snapshot
pipeline needs, and an operator the Spark DataFrame API lacks natively
(a naive range join explodes to O(probes × states) per key before
picking the max).

Spark-first shape: the UNION trick. State rows and probe rows are
unioned with a sort tag (state first at equal timestamps, so the match
is INCLUSIVE), one window per key ordered by (ts, tag) carries the
last non-null state struct forward, then probe rows are filtered back
out. Cost: ONE hash shuffle on the key + a per-key sort — the same
price as a groupBy, independent of how many probes share a state row,
and AQE-splittable on skewed keys. This is the standard formulation
(e.g. Flink's temporal join and Databricks' tempo both reduce to it);
DuckDB ships a native ASOF JOIN which the driver uses as the oracle.

Reference scope note: the reference engine (preligens-lab/buzzard) has
no event-time stack; this operator is part of the web-scale pipeline
surface built alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ['asof_join']


def asof_join(left: DataFrame, right: DataFrame, on: str | list,
              left_ts: str = 'ts', right_ts: str = 'ts',
              right_cols: list | None = None,
              tolerance_s: int | None = None,
              direction: str = 'backward') -> DataFrame:
    """Point-in-time join: every row of ``left`` gains the columns
    ``right_cols`` from the newest ``right`` row of the same key with
    ``right_ts <= left_ts`` (``direction='backward'``, inclusive) or the
    oldest with ``right_ts >= left_ts`` (``'forward'``). Rows with no
    match keep NULLs (left-join semantics).

    ``tolerance_s``: optional max staleness in whole seconds — a state
    row further than this from the probe is treated as no-match (pandas
    ``merge_asof`` semantics; staleness is compared on epoch seconds so
    the bound is integer-exact).

    Ties: if several state rows share (key, right_ts), the LAST one in
    the window order wins — nondeterministic across runs unless the
    caller makes (key, right_ts) unique (dedupe first; the driver oracle
    corpus does exactly that). DuckDB's ASOF JOIN has the same caveat.

    Scale shape (100 TB): one hash shuffle of probes+states on the key,
    one per-key sort, no range join, no per-key fan-out — a key with a
    million probes and one state row costs exactly its row count. The
    carried payload is one struct column of ``right_cols``.
    """
    if direction not in ('backward', 'forward'):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    # probe rows tagged so equal-timestamp state sorts FIRST under
    # backward (inclusive match); under forward the order flips and the
    # tag flips with it so state still sorts adjacent-inclusive.
    st = right.select(
        *keys,
        F.col(right_ts).alias('_t'),
        F.lit(0).alias('_tag'),
        F.struct(F.col(right_ts).alias('_rts'),
                 *[F.col(c) for c in right_cols]).alias('_rv'))
    pr = left.select(
        *keys,
        F.col(left_ts).alias('_t'),
        F.lit(1).alias('_tag'),
        F.lit(None).cast(st.schema['_rv'].dataType).alias('_rv'),
        F.struct(*[F.col(c) for c in left.columns]).alias('_lv'))
    st = st.withColumn('_lv', F.lit(None).cast(pr.schema['_lv'].dataType))
    both = pr.unionByName(st.select(pr.columns))
    order = [F.col('_t').asc(), F.col('_tag').asc()] \
        if direction == 'backward' else \
        [F.col('_t').desc(), F.col('_tag').asc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (both
               .withColumn('_m', F.last('_rv', ignorenulls=True).over(w))
               .where(F.col('_tag') == 1))
    if tolerance_s is not None:
        # CAST(timestamp AS LONG) is epoch seconds in Spark; on numeric
        # ts columns the cast is the identity — both stay integer-exact
        lag = (F.col('_t').cast('long')
               - F.col('_m._rts').cast('long')) \
            if direction == 'backward' else \
            (F.col('_m._rts').cast('long')
             - F.col('_t').cast('long'))
        matched = matched.withColumn(
            '_m', F.when(lag <= tolerance_s, F.col('_m')))
    return matched.select(
        *[F.col(f'_lv.{c}').alias(c) for c in left.columns],
        *[F.col(f'_m.{c}').alias(c) for c in right_cols])
