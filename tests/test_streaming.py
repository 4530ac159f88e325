"""Streaming operators: batch forms against the events table, plus a
real Structured Streaming run through the memory sink."""

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.streaming.events import (
    sessionize,
    stream_windowed_counts,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


from db_factfinder_spark.sources.readers import read_events


@pytest.fixture(scope="module")
def events(spark):
    return read_events(spark, f"{SF}/events.parquet")


def test_windowed_counts_batch(events):
    out = windowed_counts(events, "1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # windows align to the hour
    r = out.limit(1).collect()[0]
    assert r["window_start"].minute == 0 and r["window_start"].second == 0


def test_sessionize_invariants(events):
    sessions = sessionize(events, gap_minutes=30)
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # session bounds are ordered
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0
    # no user has more sessions than events
    per_user = sessions.groupBy("user_id").count()
    ev_per_user = events.groupBy("user_id").count().withColumnRenamed("count", "n")
    joined = per_user.join(ev_per_user, "user_id")
    assert joined.filter(F.col("count") > F.col("n")).count() == 0


def test_structured_streaming_matches_batch(spark, events, tmp_path):
    # stage the batch-read (timestamp-typed) events as the stream source
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)
    stream = stream_windowed_counts(spark, src, events.schema, "1 hour", "2 hours")
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n_events) FROM win_counts"
        ).collect()[0][0]
    finally:
        q.stop()
    assert got == events.count()


def test_stateful_stream_sessionize_matches_batch(spark, events, tmp_path):
    """stream_sessionize (applyInPandasWithState) over a one-batch
    stream must emit exactly the batch sessionize result minus each
    user's final (still-open) session."""
    from pyspark.sql import functions as F

    from db_factfinder_spark.streaming.events import sessionize, stream_sessionize

    src = tmp_path / "events_in"
    events.write.parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    out = stream_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("closed_sessions").collect()
    }

    batch = sessionize(events, gap_minutes=30)
    w_last = F.max("session_seq").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
            "user_id"
        )
    )
    expected = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.withColumn("last_seq", w_last)
        .filter(F.col("session_seq") != F.col("last_seq"))
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_normalize_event_ts_detects_epoch_unit(spark):
    """The long branch scales by per-row magnitude: nanos, micros,
    millis, and seconds encodings of the same instant all normalize to
    the identical TIMESTAMP (ADVICE r2: a plain-INT64 micros/millis
    writer must not be silently mis-scaled 1000x)."""
    from db_factfinder_spark.sources.readers import normalize_event_ts

    base_us = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456Z
    encodings = {
        "nanos": base_us * 1_000,
        "micros": base_us,
        "millis": base_us // 1_000,
        "seconds": base_us // 1_000_000,
    }
    expect = {
        "nanos": "2023-11-14 22:13:20.123456",
        "micros": "2023-11-14 22:13:20.123456",
        "millis": "2023-11-14 22:13:20.123",
        "seconds": "2023-11-14 22:13:20",
    }
    for unit, v in encodings.items():
        df = spark.createDataFrame([(v,)], "ts long")
        out = normalize_event_ts(df).select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")
        ).first()["s"]
        want = expect[unit]
        assert out.startswith(want), f"{unit}: {out} !~ {want}"


def test_normalize_event_ts_ntz_requires_fixed_offset_zone(spark):
    from db_factfinder_spark.sources.readers import normalize_event_ts

    df = spark.sql("SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="fixed-offset"):
            normalize_event_ts(df)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert normalize_event_ts(df).first()["ts"] is not None
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_stateful_sessionize_state_carries_across_microbatches(
    spark, events, tmp_path
):
    """The point of applyInPandasWithState: an open session must carry
    across micro-batches.  The source is split into two time-ordered
    files processed as separate batches (maxFilesPerTrigger=1); a
    session straddling the split must be stitched by the state, so the
    final closed-session set still equals batch-sessionize minus each
    user's last session."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from db_factfinder_spark.streaming.events import (
        sessionize,
        stream_sessionize,
    )

    mid = events.selectExpr("percentile(cast(ts as long), 0.5) p").first()["p"]
    src = tmp_path / "events_split"
    (events.filter(F.col("ts").cast("long") <= mid)
        .coalesce(1).write.parquet(str(src / "a=0")))
    (events.filter(F.col("ts").cast("long") > mid)
        .coalesce(1).write.parquet(str(src / "a=1")))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/a=*")
    )
    out = stream_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("split_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2, "expected multiple micro-batches"

    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.table("split_sessions").collect()
    }
    batch = sessionize(events, gap_minutes=30)
    w_last = F.max("session_seq").over(Window.partitionBy("user_id"))
    expected = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.withColumn("last_seq", w_last)
        .filter(F.col("session_seq") != F.col("last_seq"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_stream_dedup_matches_batch_distinct(spark, events, tmp_path):
    from db_factfinder_spark.streaming.events import (
        run_available_now,
        stream_dedup_keys,
    )

    src = str(tmp_path / "events_dedup")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    kept = run_available_now(
        stream_dedup_keys(stream, ["user_id", "event_type"], watermark="365 days"),
        output_mode="append",
    )
    got = {(r["user_id"], r["event_type"]) for r in kept.collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in events.select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    # first-arrival semantics: exactly one emit per key
    assert kept.count() == len(want)


def test_stream_dedup_reemits_after_watermark_expiry(spark, tmp_path):
    """The state bound is real: a duplicate arriving after its key's
    watermark horizon has passed is re-emitted — the documented
    tradeoff that keeps state finite on an endless stream."""
    import time

    from db_factfinder_spark.streaming.events import stream_dedup_keys

    src = tmp_path / "late_dupes"
    src.mkdir()
    schema = "k string, ts timestamp"
    # batch 1: key X at 00:00; key Y at 01:00 advances the watermark
    # (horizon 10s) far past X's state entry
    spark.createDataFrame(
        [("X", "2024-01-01 00:00:00"), ("Y", "2024-01-01 01:00:00")],
        "k string, ts string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts").coalesce(1).write.parquet(
        str(src / "b1")
    )
    time.sleep(1.1)  # file mtime orders the micro-batches
    # batch 2: a duplicate X in the SAME batch the watermark advances
    # is still suppressed — expired entries are evicted at the END of
    # the micro-batch, after lookup
    spark.createDataFrame(
        [("X", "2024-01-01 01:00:01")], "k string, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts").coalesce(1).write.parquet(
        str(src / "b2")
    )
    time.sleep(1.1)
    # batch 3: X's entry is now physically evicted → this one re-emits
    spark.createDataFrame(
        [("X", "2024-01-01 01:00:02")], "k string, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts").coalesce(1).write.parquet(
        str(src / "b3")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    kept = stream_dedup_keys(stream, ["k"], watermark="10 seconds")
    import uuid

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        kept.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r["k"] for r in spark.table(name).collect()]
    assert sorted(rows) == ["X", "X", "Y"]


def test_stream_static_enrich_left_join_and_broadcast(spark, tmp_path):
    from db_factfinder_spark.streaming.events import (
        run_available_now,
        stream_static_enrich,
    )

    src = str(tmp_path / "enrich_src")
    rows = spark.createDataFrame(
        [(1, "click", 2.0), (2, "click", 3.0), (3, "mystery", 5.0)],
        "event_id long, event_type string, value double",
    )
    rows.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(rows.schema).parquet(src)
    dim = spark.createDataFrame(
        [("click", "engage")], "event_type string, category string"
    )
    out = run_available_now(
        stream_static_enrich(stream, dim, on="event_type", how="left"),
        output_mode="append",
    )
    got = {r.event_id: r.category for r in out.collect()}
    # left join keeps unmatched stream rows with NULL enrichment
    assert got == {1: "engage", 2: "engage", 3: None}


def test_stream_parquet_sink_checkpoint_resumes_exactly_once(spark, tmp_path):
    """The production sink: file stream → parquet sink with a
    checkpoint.  A restart with the same checkpoint must process ONLY
    the new input files — every input row lands in the sink exactly
    once across runs (the file-source offset log + sink commit log
    give end-to-end exactly-once for file→file pipelines)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    first = spark.range(0, 50).selectExpr("id", "id * 2 AS v")
    first.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("id long, v long").parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 50

    second = spark.range(50, 80).selectExpr("id", "id * 2 AS v")
    second.coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(80)), "restart must be exactly-once"


def test_session_paths_deterministic_ordering(spark):
    import datetime as dt

    from db_factfinder_spark.streaming.events import session_paths

    base = dt.datetime(2024, 1, 1)

    def t(s):
        return base + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            # user 1, one session with a TS TIE broken by event_id
            (1, 3, t(10), "b"),
            (1, 2, t(10), "a"),
            (1, 1, t(0), "view"),
            # gap > 30 min → second session
            (1, 4, t(10 + 31 * 60), "purchase"),
            (2, 5, t(0), "click"),
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    out = {
        (r.user_id, r.session_seq): (r.n_events, r.path)
        for r in session_paths(ev, gap_minutes=30).collect()
    }
    assert out[(1, 1)] == (3, "view>a>b")  # tie a(id2) before b(id3)
    assert out[(1, 2)] == (1, "purchase")
    assert out[(2, 1)] == (1, "click")


def test_stream_quota_cap_plan_builds_and_gate_reports(spark, events):
    """transformWithStateInPandas needs google.protobuf at runtime
    (optional pyspark dependency); the plan must still CONSTRUCT
    without it — schema, grouping, processor wiring — and the gate
    must answer honestly."""
    from db_factfinder_spark.streaming.events import (
        stream_quota_cap,
        transform_with_state_available,
    )

    stream = (
        spark.readStream.schema(events.schema)
        .parquet("/root/testdata/sf0.001/events.parquet")
    )
    out = stream_quota_cap(stream, quota=3)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "event_id", "ts", "admit_idx",
    ]
    assert isinstance(transform_with_state_available(), bool)


def _tws_runtime_available():
    from db_factfinder_spark.streaming.events import (
        transform_with_state_available,
    )

    return transform_with_state_available()


def _drive_quota(spark, events, src, builder, qname):
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/a=*")
    )
    out = builder(stream, quota=3)
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["user_id"], r["event_id"], r["admit_idx"])
        for r in spark.table(qname).collect()
    }


def test_stream_quota_cap_state_carries_across_microbatches(
    spark, events, tmp_path
):
    """Full cross-batch drive — ALWAYS runs, via the dependency-free
    ``applyInPandasWithState`` twin: a key that exhausts its quota in
    an early micro-batch must admit nothing later, and the admitted
    set must equal the batch row_number() ≤ quota window when batches
    arrive in time order.  Where the ``transformWithStateInPandas``
    runtime is present (google.protobuf installed) the TWS original is
    driven on the SAME fixture and must produce the identical admitted
    set — the committed equivalence the twins promise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from db_factfinder_spark.streaming.events import (
        stream_quota_cap,
        stream_quota_cap_aiws,
    )

    mid = events.selectExpr("percentile(cast(ts as long), 0.5) p").first()["p"]
    src = tmp_path / "events_split"
    (events.filter(F.col("ts").cast("long") <= mid)
        .coalesce(1).write.parquet(str(src / "a=0")))
    (events.filter(F.col("ts").cast("long") > mid)
        .coalesce(1).write.parquet(str(src / "a=1")))

    got = _drive_quota(spark, events, src, stream_quota_cap_aiws, "quota_aiws")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exp = {
        (r["user_id"], r["event_id"], r["rn"])
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .collect()
    }
    assert got == exp

    if _tws_runtime_available():
        got_tws = _drive_quota(
            spark, events, src, stream_quota_cap, "quota_tws"
        )
        assert got_tws == got


def test_hll_state_merger_batches_and_replay(spark, tmp_path):
    """Three manual batches through the merger must equal the direct
    sketch of the union (algebraic merge), and replaying a batch must
    leave the state identical (exactly-once under retries)."""
    from db_factfinder_spark.llmdata.sketches import hll_merge, hll_partials
    from db_factfinder_spark.streaming.events import (
        hll_state_merger,
        read_hll_state,
    )

    rows = [(i, "t", f"u{i % 37}") for i in range(300)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id string"
    )
    state = str(tmp_path / "state")
    merge = hll_state_merger(state, ["event_type"], "user_id")
    for b in range(3):
        merge(df.filter(F.col("event_id") % 3 == b), b)
    got = hll_merge(
        read_hll_state(spark, state), ["event_type"]
    ).collect()[0]
    want = hll_merge(
        hll_partials(df, ["event_type"], "user_id"), ["event_type"]
    ).collect()[0]
    assert got["n_buckets"] == want["n_buckets"]
    assert got["hll_raw"] == want["hll_raw"]
    # replay batch 1: identical state content
    before = sorted(map(tuple, read_hll_state(spark, state).collect()))
    merge(df.filter(F.col("event_id") % 3 == 1), 1)
    # latest version is still v2; and re-merging v0's prior into v1
    # reproduces identical content
    after = sorted(map(tuple, read_hll_state(spark, state).collect()))
    assert before == after
