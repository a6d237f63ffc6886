"""Structured Streaming: incremental ingest with resume (T1/T5) and
watermarked windowed metrics (T2) — SURVEY §2.9."""

import time

import pytest
from pyspark.sql import functions as F

from music_dedupe_spark.streaming.incremental import (
    incremental_ingest,
    stream_event_metrics,
    streaming_dedupe,
    windowed_event_metrics,
)


def test_streaming_dedupe_within_watermark(spark, corpus, tmp_path):
    src = str(tmp_path / "sd_src")
    sink = str(tmp_path / "sd_sink")
    ckpt = str(tmp_path / "sd_ckpt")
    full = spark.createDataFrame(corpus.files)
    full.write.mode("overwrite").parquet(src)

    q = streaming_dedupe(spark, src, sink, ckpt)
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(sink)
    from music_dedupe_spark.pipeline import eligible_files

    n_distinct = (
        eligible_files(full).selectExpr("sha2(content, 256) h").distinct().count()
    )
    # exactly one survivor per distinct content
    assert out.select("content_sha256").distinct().count() == n_distinct
    assert out.count() == n_distinct


def test_incremental_ingest_and_resume(spark, corpus, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    full = spark.createDataFrame(corpus.files)
    half1 = full.filter(F.crc32("path") % 2 == 0)
    half2 = full.filter(F.crc32("path") % 2 == 1)
    half1.write.mode("overwrite").parquet(src)

    q = incremental_ingest(spark, src, sink, ckpt)
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(sink).count()
    assert n1 > 0

    # new files arrive; a NEW query with the same checkpoint resumes
    # from committed offsets and processes only the delta
    half2.write.mode("append").parquet(src)
    q2 = incremental_ingest(spark, src, sink, ckpt)
    q2.processAllAvailable()
    q2.stop()
    out = spark.read.parquet(sink)
    from music_dedupe_spark.pipeline import eligible_files

    expected = eligible_files(full).count()
    assert out.count() == expected
    # no duplicates from the resume (exactly-once file source offsets)
    assert out.select("file_id").distinct().count() == expected


def test_windowed_event_metrics_batch_parity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = windowed_event_metrics(ev)
    total = agg.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()


def test_stream_event_metrics_memory_sink(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000).write.parquet(src)
    q = stream_event_metrics(spark, src, queryName="ev_metrics_test")
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM ev_metrics_test")
    # append mode only emits windows the watermark has closed; with a
    # bounded source the final windows stay open -> emitted count is a
    # subset, but schema + rows must be well-formed
    assert set(out.columns) == {"window_start", "event_type", "n", "total_value"}
    assert out.count() >= 0


def test_stateful_sessionize_stream(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): in-batch gaps
    close sessions immediately; the final open session closes when the
    event-time watermark passes last_ts + gap (timeout path). State per
    user is O(1)."""
    import time as _time

    import pandas as pd

    from music_dedupe_spark.streaming.sessionize import run_sessionize_on_directory

    src = tmp_path / "events_src"
    src.mkdir()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)

    def write(name, rows):
        pd.DataFrame(
            {"user_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}
        ).to_parquet(src / name, coerce_timestamps="us")  # Spark can't read NANOS
        _time.sleep(1.05)  # file source orders batches by mtime

    # batch 1: user 1 — burst A (2 events), 2h gap, burst B (2 events)
    write("f1.parquet", [(1, t0), (1, t0 + 5 * m), (1, t0 + 120 * m), (1, t0 + 121 * m)])
    # batch 2: far-future dummy advances the watermark way past user 1
    write("f2.parquet", [(99, t0 + pd.Timedelta(days=30))])
    # batch 3: another event so a micro-batch runs WITH the advanced
    # watermark and fires user 1's timeout
    write("f3.parquet", [(98, t0 + pd.Timedelta(days=30, hours=1))])

    q = run_sessionize_on_directory(spark, str(src), query_name="sess_test", gap_seconds=1800)
    try:
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["n_events"], r["closed_by"]): r
            for r in spark.sql("SELECT * FROM sess_test").collect()
        }
    finally:
        q.stop()

    us = lambda td: int(td.value // 1_000)  # pandas ns -> us epoch
    a = rows[(1, 2, "gap")]
    assert a["session_start_us"] == us(t0)
    assert a["session_end_us"] == us(t0 + 5 * m)
    b = rows[(1, 2, "timeout")]
    assert b["session_start_us"] == us(t0 + 120 * m)
    assert b["session_end_us"] == us(t0 + 121 * m)


def test_stateful_sessionize_matches_batch_semantics(spark, tmp_path):
    """The streaming sessionizer must produce the same sessions as the
    batch lag+cumsum query (w1_sessionize) once every session is closed
    by the watermark."""
    import time as _time

    import pandas as pd

    from music_dedupe_spark.streaming.sessionize import run_sessionize_on_directory

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 8)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    pdf = ev.toPandas()
    assert len(pdf) > 50

    src = tmp_path / "ev_src"
    src.mkdir()
    pdf.to_parquet(src / "f1.parquet", coerce_timestamps="us")
    _time.sleep(1.05)
    far = pdf["ts"].max() + pd.Timedelta(days=30)
    pd.DataFrame({"user_id": [99], "ts": [far]}).to_parquet(
        src / "f2.parquet", coerce_timestamps="us"
    )
    _time.sleep(1.05)
    pd.DataFrame({"user_id": [98], "ts": [far + pd.Timedelta(hours=2)]}).to_parquet(
        src / "f3.parquet", coerce_timestamps="us"
    )

    q = run_sessionize_on_directory(spark, str(src), query_name="sess_parity", gap_seconds=1800)
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM sess_parity")
            .filter(F.col("user_id") < 8)
            .select("user_id", "session_start_us", "n_events")
        )
        got_rows = {tuple(r) for r in got.collect()}
    finally:
        q.stop()

    # batch oracle: identical lag+cumsum sessionization at us precision
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.unix_micros(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    want = (
        ev.withColumn("is_new", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
        .withColumn("sid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.min(epoch).alias("session_start_us"), F.count("*").alias("n_events"))
        .select("user_id", "session_start_us", "n_events")
    )
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows


def test_stateful_sessionize_late_event(spark, tmp_path):
    """A late-but-within-watermark event must never regress the open
    session's end (inverted sessions) — it is absorbed when within gap
    of the session window, else emitted as a 'late' singleton."""
    import time as _time

    import pandas as pd

    from music_dedupe_spark.streaming.sessionize import run_sessionize_on_directory

    src = tmp_path / "late_src"
    src.mkdir()
    t0 = pd.Timestamp("2026-01-01 12:00:00")
    m = pd.Timedelta(minutes=1)

    def write(name, rows):
        pd.DataFrame(
            {"user_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}
        ).to_parquet(src / name, coerce_timestamps="us")
        _time.sleep(1.05)

    # batch 1 opens a session at [12:00, 12:01]; watermark advances to
    # 11:01 (1h delay) for subsequent batches
    write("f1.parquet", [(1, t0), (1, t0 + m)])
    # batch 2: one absorbable late event (11:50, within gap of the
    # session start), one within-watermark-but-unabsorbable event
    # (11:10 — newer than the 11:01 watermark, but more than gap behind
    # the session start: its own 'late' singleton), plus an in-order
    # event extending the session to 12:10
    write("f2.parquet", [(1, t0 - 10 * m), (1, t0 - 50 * m), (1, t0 + 10 * m)])
    # advance watermark, then trigger the timeout
    write("f3.parquet", [(99, t0 + pd.Timedelta(days=30))])
    write("f4.parquet", [(98, t0 + pd.Timedelta(days=30, hours=1))])

    q = run_sessionize_on_directory(spark, str(src), query_name="sess_late", gap_seconds=1800)
    try:
        q.processAllAvailable()
        rows = [
            tuple(r)
            for r in spark.sql(
                "SELECT session_start_us, session_end_us, n_events, closed_by "
                "FROM sess_late WHERE user_id = 1 ORDER BY session_start_us"
            ).collect()
        ]
    finally:
        q.stop()

    us = lambda td: int(td.value // 1_000)
    assert rows == [
        (us(t0 - 50 * m), us(t0 - 50 * m), 1, "late"),
        # main session: start extended down to 11:50 by the absorbed
        # late event, end NEVER regressed, 4 events total
        (us(t0 - 10 * m), us(t0 + 10 * m), 4, "timeout"),
    ]
    for start, end, *_ in rows:
        assert end >= start


def test_stateful_sessionize_straddles_watermark(spark, tmp_path):
    """Adversarial out-of-order batches STRADDLING the watermark: an
    event older than the current watermark is dropped by the OPERATOR's
    own watermark filter (applyInPandasWithState hands pre-watermark
    rows to the state function verbatim — the sessionize.py module
    docstring pins that engine behavior — so the operator drops them:
    no session, no 'late' singleton), while an out-of-order event NEWER
    than the watermark follows the documented absorbed/late policy.
    This pins the boundary between the operator's watermark filter and
    its late policy."""
    import time as _time

    import pandas as pd

    from music_dedupe_spark.streaming.sessionize import run_sessionize_on_directory

    src = tmp_path / "straddle_src"
    src.mkdir()
    t0 = pd.Timestamp("2026-02-01 12:00:00")
    h = pd.Timedelta(hours=1)
    m = pd.Timedelta(minutes=1)

    def write(name, rows):
        pd.DataFrame(
            {"user_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}
        ).to_parquet(src / name, coerce_timestamps="us")
        _time.sleep(1.05)

    # batch 1: user 1 opens a session at [12:00, 12:01]
    write("f1.parquet", [(1, t0), (1, t0 + m)])
    # batch 2: user 2 at 20:00 -> watermark (1h delay) advances to 19:00
    # for SUBSEQUENT batches
    write("f2.parquet", [(2, t0 + 8 * h)])
    # batch 3 straddles that 19:00 watermark for user 1:
    #   18:00 — OLDER than the watermark: the engine drops it
    #   19:30 — newer than the watermark, in-order for user 1's state
    #           (> last=12:01), gap > 30 min: closes [12:00,12:01] as
    #           'gap' and opens a new session at 19:30
    write("f3.parquet", [(1, t0 + 6 * h), (1, t0 + 7 * h + 30 * m)])
    # advance the watermark far ahead, then fire the timeouts
    write("f4.parquet", [(99, t0 + pd.Timedelta(days=30))])
    write("f5.parquet", [(98, t0 + pd.Timedelta(days=30, hours=1))])

    q = run_sessionize_on_directory(
        spark, str(src), query_name="sess_straddle", gap_seconds=1800
    )
    try:
        q.processAllAvailable()
        rows = [
            tuple(r)
            for r in spark.sql(
                "SELECT session_start_us, session_end_us, n_events, closed_by "
                "FROM sess_straddle WHERE user_id = 1 ORDER BY session_start_us"
            ).collect()
        ]
    finally:
        q.stop()

    us = lambda td: int(td.value // 1_000)
    dropped = us(t0 + 6 * h)
    # the pre-watermark event appears NOWHERE — not as a session member
    # (no session covers 18:00), not as a 'late' singleton
    assert rows == [
        (us(t0), us(t0 + m), 2, "gap"),
        (us(t0 + 7 * h + 30 * m), us(t0 + 7 * h + 30 * m), 1, "timeout"),
    ]
    assert all(not (start <= dropped <= end) for start, end, *_ in rows)
