"""Streaming operators — the engine's answer to the reference's async
queue/backpressure machinery (reference: buzzard/_a_async_raster.py:23-160):
Structured Streaming owns ordering, micro-batch backpressure
(maxFilesPerTrigger / maxOffsetsPerTrigger) and recovery (checkpoints),
so the engine only declares the plan.

- ``read_events_stream`` — file-source stream over an events directory.
- ``windowed_event_counts`` — watermarked tumbling-window aggregation
  (late rows beyond the watermark are dropped, state is bounded).
- ``stateful_running_totals`` — applyInPandasWithState: per-key running
  totals carried across micro-batches (the custom-stateful-operator
  pattern for operators Spark lacks natively).
- ``stream_cell_assign`` — stateless per-row cell assignment on a stream
  (same Catalyst expression as the batch path — one definition, two
  execution modes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = ('event_id long, ts timestamp, user_id long, '
                 'event_type string, value double, props string')


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    return (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option('maxFilesPerTrigger', max_files_per_trigger)
            .parquet(path))


def windowed_event_counts(events: DataFrame, window: str = '1 hour',
                          watermark: str = '2 hours') -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a watermark
    bounding state (late data beyond `watermark` is dropped)."""
    return (events
            .withWatermark('ts', watermark)
            .groupBy(F.window('ts', window).alias('win'), 'event_type')
            .agg(F.count('*').alias('n_events'),
                 F.sum('value').alias('sum_value'))
            .select(F.col('win.start').alias('win_start'),
                    'event_type', 'n_events', 'sum_value'))


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Per-event_type running (count, sum) maintained in GroupState across
    micro-batches — emits the updated totals every batch."""

    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf['value'].sum())
        state.update((n, total))
        yield pd.DataFrame([{
            'event_type': key[0], 'n_events': n, 'sum_value': total}])

    return (events
            .groupBy('event_type')
            .applyInPandasWithState(
                _update,
                outputStructType='event_type string, n_events long, '
                                 'sum_value double',
                stateStructType='n_events long, sum_value double',
                outputMode='update',
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_sessionize(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = '1 hour', ts_col: str = 'ts',
                      user_col: str = 'user_id') -> DataFrame:
    """Streaming gap-based sessionization — the ingestion-side twin of
    the batch window-function sessionizer (``q_user_sessions``): an
    inactivity gap of ``gap_minutes`` closes a session.

    The canonical custom-stateful-operator pattern Spark has no built-in
    for: ``applyInPandasWithState`` with an EVENT-TIME TIMEOUT. Per-user
    state is the open session ``(start, last, n_events)`` (three longs —
    constant per user, no event buffering). A session is emitted when

    - a later event arrives past the gap (closed by evidence), or
    - the watermark passes ``last + gap`` with no such event (closed by
      timeout — without this, a user who never returns would hold state
      forever and their last session would never be reported).

    Output (append mode): ``(user_id, session_start, session_end,
    n_events)``. Within a micro-batch the segmentation is vectorized
    (pandas diff/cumsum — no per-event Python loop); the carried state
    merges with the first segment when no gap separates them. Late
    events older than the open session's ``last`` still count into the
    session (n_events += k), and one earlier than the recorded start
    (but within the merge gap) extends ``session_start`` backwards to
    match the batch sessionizer; late events cannot reopen a closed-by-
    timeout sessions are final, the same contract as every watermarked
    aggregation. Timeout registration clamps to watermark + 1 ms (Spark
    rejects a timeout at or before the current watermark, which happens
    when the closing gap has already elapsed in event time by the time
    the batch is processed — the next timeout sweep then fires it).
    """
    gap_us = gap_minutes * 60_000_000

    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ['user_id', 'session_start', 'session_end', 'n_events']

        def emit(rows):
            if not rows:
                return pd.DataFrame({
                    'user_id': pd.Series([], dtype='int64'),
                    'session_start': pd.Series([], dtype='datetime64[us]'),
                    'session_end': pd.Series([], dtype='datetime64[us]'),
                    'n_events': pd.Series([], dtype='int64')})
            return pd.DataFrame(
                [(key[0], pd.Timestamp(s, unit='us'),
                  pd.Timestamp(e, unit='us'), n) for s, e, n in rows],
                columns=cols)

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return
        ev = pd.concat(list(pdfs))
        us = (ev[ts_col].sort_values()
              .astype('datetime64[us]').astype('int64'))  # epoch µs
        closed = []
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        # vectorized segmentation: a new segment begins where the gap to
        # the previous event exceeds gap_us
        brk = (us.diff() > gap_us).cumsum()
        for _, seg in us.groupby(brk):
            s0, s1, k = int(seg.iloc[0]), int(seg.iloc[-1]), len(seg)
            if last is not None and s0 <= last + gap_us:
                # merges with the open session (late events with
                # s1 <= last extend n but not the end; a within-watermark
                # late event EARLIER than the recorded start extends
                # session_start backwards — min(start, s0) — so the
                # emitted session matches the batch gap sessionizer,
                # which sees all events sorted; ADVICE r4)
                start, last, n = min(start, s0), max(last, s1), n + k
            else:
                if last is not None:
                    closed.append((start, last, n))
                start, last, n = s0, s1, k
        state.update((int(start), int(last), int(n)))
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last // 1000 + gap_us // 1000,
                                      wm_ms + 1))
        yield emit(closed)

    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(
                _update,
                outputStructType='user_id long, session_start timestamp, '
                                 'session_end timestamp, n_events long',
                stateStructType='start long, last long, n long',
                outputMode='append',
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def stream_cell_assign(pages: DataFrame, res: int,
                       lat='lat', lng='lng') -> DataFrame:
    """Stateless cell assignment on a stream — literally the batch
    operator (operators.spatial_join.assign_cell) applied to a streaming
    DataFrame: one definition (including the -1 null-coordinate sentinel),
    two execution modes."""
    from buzzard_spark.operators.spatial_join import assign_cell
    return assign_cell(pages, res, lat=lat, lng=lng)


def stream_dedup_exact(docs: DataFrame, watermark: str = '2 hours',
                       ts_col: str = 'ts',
                       content_col: str = 'text') -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash passes,
    replays within the watermark horizon are dropped — the ingestion-side
    twin of ``operators.dedup.exact_dedup`` for a continuous crawl feed.

    Uses ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    with a non-event-time key subset, ``dropDuplicates`` never evicts its
    state rows — state grows with stream length, and a replay arriving
    weeks later is dropped forever. ``dropDuplicatesWithinWatermark``
    expires each hash's state row once the watermark passes the FIRST
    sighting's event time + horizon, so state is bounded by the
    distinct-content arrival rate within the horizon, and a re-fetch of a
    page beyond the horizon is re-admitted as a fresh first occurrence —
    the standard horizon semantics a forever-running 100-TB/day feed
    needs. The hash is the md5 fingerprint the batch path
    (``operators.dedup.exact_dedup``) groups by — one definition, two
    execution modes."""
    return (docs
            .withColumn('content_hash',
                        F.md5(F.encode(F.col(content_col), 'utf-8')))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(['content_hash']))


def stream_chunk_dedup(docs: DataFrame, watermark: str = '2 hours',
                       ts_col: str = 'ts', text_col: str = 'text',
                       id_col: str = 'doc_id',
                       chunk_words: int = 10) -> DataFrame:
    """Streaming sub-document (chunk-level) dedup — the ingestion-side
    twin of ``operators.corpus.chunk_dedup`` for a continuous crawl feed.

    Each arriving document explodes into fixed-width word chunks (the
    batch operator's chunking expression — one definition, two execution
    modes); a chunk whose 64-bit hash was already seen within the
    watermark horizon is dropped. Emits the SURVIVING chunk rows
    ``(doc_id, ts, idx, chunk)`` — reassembly into cleaned documents is a
    per-doc aggregation downstream (or the batch operator for bounded
    replays); emitting chunk rows keeps this a single stateful operator.

    State is bounded exactly as in :func:`stream_dedup_exact`: one state
    row per distinct chunk hash within the horizon
    (``dropDuplicatesWithinWatermark``), evicted when the watermark
    passes first-sighting + horizon, after which a boilerplate chunk is
    re-admitted as fresh — horizon semantics, not forever-state.

    First-seen-wins follows ARRIVAL order; the batch operator's
    (doc_id, idx) minimum coincides with it when doc ids ascend with
    arrival time (the streaming==batch conformance test's construction).
    """
    from buzzard_spark.operators.corpus import chunk_array_sql
    chunks = chunk_array_sql(text_col, chunk_words, 'spark')
    return (docs
            .withWatermark(ts_col, watermark)
            .select(F.col(id_col), F.col(ts_col),
                    F.posexplode(F.expr(chunks)).alias('idx', 'chunk'))
            .withColumn('chunk_hash', F.xxhash64('chunk'))
            .dropDuplicatesWithinWatermark(['chunk_hash'])
            .drop('chunk_hash'))


def snapshot_sink(table_root: str, key_cols: list[str] | None = None):
    """foreachBatch sink writing a stream into a :class:`SnapshotTable`
    with EXACTLY-ONCE snapshot commits across restarts.

    Structured Streaming's foreachBatch contract is at-least-once: after
    a crash between the batch function and the offset-log commit, the
    SAME epoch re-runs with the same ``epoch_id``.  The sink records the
    epoch id in the snapshot manifest (``app_meta.epoch_id``) and skips a
    batch whose epoch is already committed — idempotent replay, the same
    trick Spark's own DeltaSink uses (txn version = batchId).  Epoch ids
    are scanned from the CURRENT chain's manifests only — a driver-side
    walk over a handful of json files, never data.

    Use::

        q = (df.writeStream.option('checkpointLocation', ckpt)
               .foreachBatch(snapshot_sink(root)).start())

    Note ``compact()`` folds the chain into one snapshot whose manifest
    carries no epoch ids — run it only while the stream is stopped, or
    a post-compaction replay of the tip epoch would double-append (the
    same operational contract as Iceberg's expire-while-streaming).
    """
    from buzzard_spark.sources.snapshot_table import SnapshotTable

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        table = SnapshotTable(table_root)
        try:
            done = {m.get('app_meta', {}).get('epoch_id')
                    for m in table.manifests()}
        except FileNotFoundError:
            done = set()
        if epoch_id in done:
            return                      # replayed epoch — already committed
        table.append(batch_df, key_cols=key_cols,
                     extra_meta={'epoch_id': epoch_id})

    return _write


def stream_count_min(values: DataFrame, value_col: str,
                     d: int = 3, width: int = 256) -> DataFrame:
    """Streaming Count-Min sketch: maintains the d×width counter table
    over an unbounded value stream — the fixed-size heavy-hitter /
    skew-detection state a 100-TB ingest keeps while it runs (e.g. to
    pick the hot keys the batch planner salts). Stateless projection to
    (row, column) triples via the SAME salted-md5 column hashes as the
    batch sketch (operators.sketch), then a streaming groupBy-sum in
    update/complete mode: state is exactly d·width rows regardless of
    stream length, and the result is bit-identical to the batch sketch
    over the same rows (pinned by the streaming==batch pytest).

    Probing (min over the d cells of a key) is a batch join against the
    in-progress sketch table, identical to the batch path.
    """
    from buzzard_spark.operators.sketch import _cm_hash_sql, \
        _nibble_int_sql
    hashed = values.select(
        F.col(value_col).alias('v'),
        *[F.expr(_cm_hash_sql('v', i, 'spark')).alias(f'_h{i}')
          for i in range(d)])
    tall = hashed.select(F.explode(F.array(*[
        F.struct(
            F.lit(i).alias('i'),
            F.expr(f"({_nibble_int_sql(f'_h{i}', 1, 8, 'spark')} "
                   f'% {width})').alias('c'))
        for i in range(d)])).alias('rc')
    ).select('rc.i', 'rc.c')
    return tall.groupBy('i', 'c').agg(F.count('*').alias('cell'))


def stream_hll_registers(values: DataFrame, value_col: str,
                         group_col: str, p: int = 8) -> DataFrame:
    """Streaming HyperLogLog: maintains the per-(group, bucket) register
    table over an unbounded stream — bounded distinct-count state
    (2^p rows per group, forever) where exact streaming DISTINCT state
    grows with the stream. Same md5-nibble hash / trailing-zeros rank
    expressions as the batch sketch, then a streaming MAX aggregation,
    so the registers are bit-identical to batch over the same rows
    (pinned by the streaming==batch pytest); feed them to the batch
    estimator's final SELECT for the estimate.
    """
    from buzzard_spark.operators.sketch import _hll_frags
    _, h, bucket, w, rho, _, _ = _hll_frags(value_col, p, 'spark')
    return (values
            .select(group_col, F.expr(h).alias('_h'))
            .select(group_col, F.expr(bucket).alias('_b'),
                    F.expr(w).alias('_w'))
            .select(group_col, '_b', F.expr(rho).alias('_r'))
            .groupBy(group_col, '_b').agg(F.max('_r').alias('_m')))


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str = 'user_id',
                         left_ts: str = 'l_ts', right_ts: str = 'r_ts',
                         within: str = '10 minutes',
                         watermark: str = '20 minutes') -> DataFrame:
    """Watermarked stream-stream interval (attribution) join: each right
    event matches left events with the same key whose timestamp lies in
    ``[right_ts - within, right_ts]`` — the impression→click /
    fetch→response pairing. Both sides carry a watermark and the join
    condition bounds event-time distance in BOTH directions, which is
    exactly what lets Structured Streaming expire join state: a left
    row can be dropped once the right watermark passes
    ``left_ts + within`` (state is bounded by ``watermark + within`` of
    stream time, never by stream length). Results equal the batch join
    with the same predicate (pinned by the streaming==batch pytest).

    The two inputs must carry DISTINCT timestamp column names (rename
    upstream); output is (key, left_ts, right_ts, lag_sec).
    """
    lw = left.withWatermark(left_ts, watermark).alias('l')
    rw = right.withWatermark(right_ts, watermark).alias('r')
    cond = (
        (F.col(f'l.{key}') == F.col(f'r.{key}'))
        & (F.col(f'r.{right_ts}') >= F.col(f'l.{left_ts}'))
        & (F.col(f'r.{right_ts}')
           <= F.col(f'l.{left_ts}') + F.expr(f'INTERVAL {within}')))
    return (lw.join(rw, cond, 'inner')
            .select(F.col(f'l.{key}').alias(key),
                    F.col(f'l.{left_ts}').alias(left_ts),
                    F.col(f'r.{right_ts}').alias(right_ts),
                    (F.unix_timestamp(f'r.{right_ts}')
                     - F.unix_timestamp(f'l.{left_ts}'))
                    .cast('long').alias('lag_sec')))


def stream_weighted_sample(rows: DataFrame, weight_col: str, k: int,
                           id_col: str = 'doc_id', seed: int = 42,
                           strata_col: str = 'stratum') -> DataFrame:
    """Streaming deterministic priority sampling — the ingestion-side
    twin of ``operators.corpus.weighted_sample``. Because priorities are
    a pure function of (id, seed, weight), top-k-by-priority is order-
    insensitive: after any prefix of the stream the maintained sample
    equals the batch sampler over the rows seen so far, and after the
    whole stream it equals the batch result EXACTLY (the streaming==
    batch pytest pins priorities, membership, and the Horvitz-Thompson
    ``w_est``). This is the property that lets a 100-TB ingest keep a
    live weighted sample without ever re-scanning.

    State per stratum is the top-(k+1) (priority, id, weight) triples —
    three bounded arrays, no row buffering, no timeout (the sample only
    improves; nothing expires). Scoring is the batch operator's
    stateless expression; the merge is a vectorized pandas
    sort-and-truncate per micro-batch. Emits (update mode) the
    stratum's refreshed sample each batch it changes::

        (stratum, doc_id, w, priority, w_est, n_seen)

    ``n_seen`` (rows absorbed so far) lets a consumer pick each
    stratum's latest emission from an append-only sink.
    """
    from buzzard_spark.operators.corpus import score_priorities
    if k < 1:
        raise ValueError(f'k must be >= 1: {k}')
    scored = score_priorities(rows, weight_col, id_col, seed).select(
        F.col(strata_col).cast('string').alias('stratum'),
        F.col(id_col).cast('long').alias('id'),
        F.col(weight_col).cast('long').alias('w'),
        'priority')

    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        new = pd.concat(list(pdfs))
        if state.exists:
            ps, ids, ws, seen = state.get
            cur = pd.DataFrame({'priority': list(ps), 'id': list(ids),
                                'w': list(ws)})
            merged = pd.concat([cur, new[['priority', 'id', 'w']]])
        else:
            seen = 0
            merged = new[['priority', 'id', 'w']]
        seen += len(new)
        merged = (merged.sort_values(['priority', 'id'],
                                     ascending=[False, True])
                  .head(k + 1))
        state.update((merged['priority'].tolist(),
                      merged['id'].tolist(),
                      merged['w'].tolist(), int(seen)))
        tau = (float(merged['priority'].iloc[k])
               if len(merged) > k else 0.0)
        top = merged.head(k)
        yield pd.DataFrame({
            'stratum': key[0],
            'doc_id': top['id'].astype('int64'),
            'w': top['w'].astype('int64'),
            'priority': top['priority'].astype('float64'),
            'w_est': top['w'].astype('float64').clip(lower=tau),
            'n_seen': int(seen)})

    return (scored
            .groupBy('stratum')
            .applyInPandasWithState(
                _update,
                outputStructType='stratum string, doc_id long, w long, '
                                 'priority double, w_est double, '
                                 'n_seen long',
                stateStructType='ps array<double>, ids array<long>, '
                                'ws array<long>, seen long',
                outputMode='update',
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_pip_join(pages: DataFrame, regions: DataFrame, res: int,
                    salt: int = 1) -> DataFrame:
    """Geofence join on a stream: streaming pages × STATIC region table —
    literally the batch cover-cell PIP join (stream-static equi-joins are
    stateless in Structured Streaming; the small static side broadcasts
    exactly as in batch), one definition, two execution modes::

        (page columns…, region_id)  -- one row per (page, containing
                                    -- region); pages outside every
                                    -- region emit nothing

    The alerting shape: "page geoparsed inside a watched boundary" as a
    continuous query. Stateless — no watermark needed (each page row
    joins the static dimension and leaves; nothing is buffered), so late
    data is simply processed when it arrives. streaming == batch is
    pinned by test_streaming.
    """
    from buzzard_spark.operators.spatial_join import pip_join_rect
    return pip_join_rect(pages, regions, res, salt=salt)
