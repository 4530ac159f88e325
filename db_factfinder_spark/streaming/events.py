"""Event-stream operators: windowed aggregation and sessionization.

The reference is batch-only (SURVEY §2.8); these extend the engine to
the streaming shapes a production deployment needs.  Each operator has
a *batch* form (same expressions, runs on a static frame — used by the
correctness oracle) and a *streaming* form (readStream → watermark →
windowed agg) that shares the aggregation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums per event type (batch form).
    One shuffle on (window, type)."""
    return (
        events.groupBy(F.window(ts_col, window_duration).alias("w"), type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    path: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming form: parquet source → watermark (late-data bound,
    required for state cleanup) → tumbling windowed agg.  Returns the
    unstarted streaming DataFrame; callers pick the sink/trigger."""
    events = spark.readStream.schema(schema).parquet(path)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )


def run_available_now(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame over all currently-available data
    (``trigger(availableNow=True)``) through an in-memory sink and
    return the final result as a batch DataFrame.

    This is the bounded-replay harness: with a finite source and
    ``complete`` output mode the final sink state equals the batch
    aggregation over the same data, which makes a streaming pipeline
    oracle-checkable.  The memory sink collects to the driver — it is
    for verification/tests; production sinks are kafka/parquet/delta
    via the same ``writeStream`` call.  The query name is uniqued so
    concurrent or repeated invocations can't collide."""
    import uuid

    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic gap-based sessionization (batch): lag + cumulative sum of
    gap-breaks over a per-user window.  Two window passes over one
    shuffle on user_id.  (Streaming equivalent:
    ``session_window(ts, gap)`` in a streaming groupBy.)"""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_id = events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def stream_sessionize(
    events,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Custom *stateful* streaming sessionization via
    ``applyInPandasWithState`` — the arbitrary-state path for operators
    ``session_window`` can't express (e.g. carrying per-session
    aggregates that aren't algebraic).

    State per user: the open session (start, last event ts, counts).
    Each micro-batch folds its events into the state in timestamp
    order; a gap > ``gap_minutes`` closes the open session, which is
    EMITTED (append mode), and starts a new one.  The final open
    session per user stays in state until a later batch (or a timeout
    policy) closes it — exactly the semantics a batch ``sessionize``
    produces for every session except each user's last.

    Scale: state is one tiny tuple per user key, partitioned by the
    groupBy shuffle; Arrow batches keep the Python crossing amortized.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_s = gap_minutes * 60

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("sv", T.DoubleType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        (user,) = key
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = n = 0
            sv = 0.0
        closed = []
        chunks = [pdf for pdf in pdfs]
        if chunks:
            # concat THEN sort: Arrow hands a group over as multiple
            # chunks in shuffle-arrival order, so sorting each chunk
            # alone would interleave time ranges and split sessions at
            # chunk boundaries.  Memory = this user's rows in this
            # micro-batch (bounded by per-user batch volume).
            all_rows = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            pdf = all_rows.sort_values(ts_col)
            for ts, value in zip(pdf[ts_col], pdf["value"]):
                ts_us = ts.value // 1000  # pandas ns → µs
                if n == 0:
                    start_us, last_us, n, sv = ts_us, ts_us, 1, float(value)
                elif ts_us - last_us > gap_s * 1_000_000:
                    closed.append((user, start_us, last_us, n, sv))
                    start_us, last_us, n, sv = ts_us, ts_us, 1, float(value)
                else:
                    last_us, n, sv = ts_us, n + 1, sv + float(value)
        state.update((start_us, last_us, n, sv))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] for c in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_keys(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact deduplication — the ingest twin of
    ``llmdata.exact_dedup`` for a continuously-arriving corpus:
    ``dropDuplicatesWithinWatermark`` keeps the first-arriving row per
    key and expires each key's state once the event-time watermark
    passes it.

    The watermark is what makes this 100 TB-safe: state holds one
    entry per key seen within the horizon, not per key ever seen — a
    plain streaming ``dropDuplicates`` grows state forever and
    eventually OOMs the state store.  The tradeoff is explicit: a
    duplicate arriving later than ``watermark`` after its original is
    re-emitted (its state entry has expired), so the horizon is chosen
    to cover the source's real duplicate window (retries, replays,
    at-least-once queues).  Eviction is physical at micro-batch END:
    a duplicate landing in the same batch whose watermark first passed
    its key is still suppressed; re-emission starts the batch after
    (tested in test_streaming).

    Which ROW survives per key is arrival-order-dependent; the KEY SET
    is deterministic, so this returns only the key columns — exactly
    what a downstream anti-join needs to admit each document once.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
        .select(*key_cols)
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Stream↔static enrichment join: every micro-batch of the stream
    joins against the (bounded) dimension frame, explicitly broadcast
    — Structured Streaming's supported stream-static join shape.  The
    static side ships to executors once per batch and the stream side
    never shuffles for the join; at any throughput the cost is the
    map-side hash probe, which is why enrichment dims must be the
    SMALL side (lookup tables, not fact tables)."""
    return stream.join(F.broadcast(dim), on, how)


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered event-type path per session ("view>click>purchase") —
    the input to funnel mining and next-action models.  Session ids
    come from the same gap rule as ``sessionize``; the path is made
    deterministic on any cluster layout by collecting (ts, id, type)
    STRUCTS and array_sort-ing them (struct order = field order, so
    ties on ts break on the event id) before projecting the types —
    a bare ``collect_list(type)`` would be partition-order-dependent.
    One shuffle on the user key end to end."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    gap = (
        F.col(ts_col).cast("long")
        - F.lag(F.col(ts_col).cast("long")).over(w)
    )
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_id = events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
        )
    )
    return with_id.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(ordered, lambda x: x[type_col]), ">"
        ).alias("path"),
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream↔stream inner join: right-side rows match left-side rows
    with the same ``by`` key whose timestamp falls in
    ``[right_ts − lookback, right_ts]`` — the purchase-joins-recent-
    clicks shape.  BOTH sides carry event-time watermarks and the join
    condition bounds the time skew; together they let Structured
    Streaming expire buffered state (an unbounded stream-stream join
    would hold every row forever).  State per key is O(rows within
    the watermark+lookback horizon) — the property that makes this
    runnable continuously at ingest scale.
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[by] == r_wm[by])
        & (l_wm[left_ts] >= r_wm[right_ts] - F.expr(f"INTERVAL {lookback}"))
        & (l_wm[left_ts] <= r_wm[right_ts])
    )
    # drop the right side's duplicate key column from the output
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[by])


def stream_quota_cap_aiws(
    events: DataFrame,
    quota: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """``stream_quota_cap``'s dependency-free twin: the same
    cross-batch per-key admission quota expressed with
    ``applyInPandasWithState`` — no ``google.protobuf`` requirement,
    so it runs on a minimal pyspark install and is the DEFAULT engine
    entry for the operator.  Kept semantically interchangeable with
    the ``transformWithStateInPandas`` version (identical output
    schema and admitted set; an equivalence test drives both wherever
    the TWS runtime is present).

    State per key: one bigint (lifetime admitted count).  Per
    micro-batch the key's chunks are concatenated THEN sorted on
    (ts, id) — the same chunk-interleaving hazard every stateful fold
    here guards against — and the first ``quota − n`` rows are
    admitted with their 1-based lifetime ``admit_idx``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("admit_idx", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def fold(key, pdfs, state: GroupState):
        (k,) = key
        n = state.get[0] if state.exists else 0
        chunks = [pdf for pdf in pdfs]
        if chunks and n < quota:
            allr = (
                chunks[0]
                if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True)
            )
            allr = allr.sort_values([ts_col, id_col])
            take = allr.head(quota - n)
            m = len(take)
            if m:
                yield pd.DataFrame(
                    {
                        key_col: [k] * m,
                        id_col: list(take[id_col]),
                        ts_col: list(take[ts_col]),
                        "admit_idx": list(range(n + 1, n + m + 1)),
                    }
                )
            n += m
        state.update((n,))

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_with_state_available() -> bool:
    """True when Spark 4's transformWithStateInPandas can actually run:
    its driver/state-server protocol needs ``google.protobuf``, which
    is an optional pyspark dependency (pyspark's connect/streaming
    extras) not guaranteed in a minimal install."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_quota_cap(
    events: DataFrame,
    quota: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Cross-batch per-key admission quota via Spark 4's
    ``transformWithStateInPandas`` (the successor API to
    ``applyInPandasWithState``: explicit named state variables on a
    ``StatefulProcessorHandle`` instead of one opaque state tuple) —
    each key admits at most ``quota`` events over the STREAM'S
    LIFETIME, the per-domain/per-user crawl cap enforced online
    rather than in a nightly batch.

    Runtime dependency: the TWS state-server protocol requires
    ``google.protobuf`` (see ``transform_with_state_available``);
    plan construction works without it, execution does not — the
    same semantics are covered end-to-end by the
    ``applyInPandasWithState`` operators (stream_sessionize,
    stream_dedup_keys), which need no extra dependency.

    Per micro-batch the key's rows fold in (ts, id) order; a
    ``ValueState`` carries the admitted-so-far count, so a key that
    exhausts its quota in batch 3 admits nothing in batch 7.  Emitted
    rows carry their 1-based lifetime ``admit_idx``, making the output
    equivalent to the batch ``row_number() ≤ quota`` window whenever
    micro-batches arrive in event-time order.

    Scale: state is one bigint per key, partitioned by the groupBy
    shuffle and stored in the state store (RocksDB on a real cluster);
    Arrow batches amortize the Python crossing exactly as with
    applyInPandasWithState.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("admit_idx", T.LongType()),
        ]
    )

    class QuotaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("admitted", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            (k,) = key
            got = self._n.get()
            n = got[0] if got is not None else 0
            chunks = [pdf for pdf in rows]
            if chunks and n < quota:
                allr = (
                    chunks[0]
                    if len(chunks) == 1
                    else pd.concat(chunks, ignore_index=True)
                )
                # concat THEN sort — same chunk-interleaving hazard as
                # stream_sessionize's fold
                allr = allr.sort_values([ts_col, id_col])
                take = allr.head(quota - n)
                m = len(take)
                if m:
                    yield pd.DataFrame(
                        {
                            key_col: [k] * m,
                            id_col: list(take[id_col]),
                            ts_col: list(take[ts_col]),
                            "admit_idx": list(range(n + 1, n + m + 1)),
                        }
                    )
                n += m
            self._n.update((n,))

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=QuotaProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def hll_state_merger(state_dir: str, group_cols: list[str], value_col: str):
    """foreachBatch callable maintaining a PERSISTED HLL-partials
    state table across micro-batches — streaming cardinality
    maintenance without ever storing raw values: each batch
    contributes its (group, bucket, max-rank) partials
    (``hll_partials``), which merge into the stored state by
    bucket-wise max.  Because sketch merge is ALGEBRAIC, the state
    after any number of batches is bit-identical to a direct sketch
    of all the data — the oracle checks exactly that.

    State versioning mirrors the upsert sink's marker discipline:
    batch N reads the highest committed version, merges, and writes
    ``v{N}`` atomically (parquet dir + _SUCCESS); a replayed batch
    overwrites its own version with identical content, so the state
    is exactly-once under retries.  Per-batch cost is the batch scan
    plus a merge over ≤ m·groups state rows — constant in history
    length, the property that makes this viable as a 100 TB daily
    rollup keeper."""
    import os

    from db_factfinder_spark.llmdata.sketches import hll_partials

    def _versions(path):
        if not os.path.isdir(path):
            return []
        out = []
        for d in os.listdir(path):
            if d.startswith("v") and d[1:].isdigit() and os.path.exists(
                os.path.join(path, d, "_SUCCESS")
            ):
                out.append(int(d[1:]))
        return sorted(out)

    def merge(batch_df, batch_id):
        spark = batch_df.sparkSession
        new = hll_partials(batch_df, group_cols, value_col)
        prior = [v for v in _versions(state_dir) if v < batch_id]
        if prior:
            old = spark.read.parquet(
                os.path.join(state_dir, f"v{prior[-1]}")
            )
            new = (
                old.unionByName(new)
                .groupBy(*group_cols, "__bucket")
                .agg(F.max("__m").alias("__m"))
            )
        new.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    return merge


def read_hll_state(spark, state_dir: str):
    """Latest committed HLL state written by ``hll_state_merger``."""
    import os

    vs = [
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    ]
    return spark.read.parquet(os.path.join(state_dir, f"v{max(vs)}"))
