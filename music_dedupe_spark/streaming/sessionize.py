"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY §2.9 / builder brief "custom stateful
operators").

The batch analog is ``queries.w1_sessionize`` (lag + cumulative sum);
streams can't look at the whole history, so the state machine keeps ONE
open session per user:

- each micro-batch merges the group's new events (sorted by event time)
  into the open session; a gap > ``gap_seconds`` closes the current
  session and opens a new one — closed sessions are emitted immediately;
- the surviving open session is stored in state with an EVENT-TIME
  timeout at ``last_ts + gap``: when the watermark passes it, no
  in-order event can extend the session any more, so the timeout
  callback emits it and clears the state;
- an event OLDER than the current watermark is dropped (Spark's
  ``applyInPandasWithState`` does not filter late input rows itself —
  verified empirically; tests/test_streaming.py pins it — so the
  operator enforces the same contract the built-in stateful operators
  have: data behind the watermark is gone);
- a late-but-within-watermark event behind the open session is absorbed
  into the open session when it lies within ``gap`` of its window,
  else emitted as a ``late`` singleton session — the documented
  approximation of O(1) summary state (exact replay would need the
  full event history; the batch w1 query is the exact oracle).

State per user is O(1) (three longs), so total state is O(active users
within the watermark horizon) — bounded regardless of stream length,
the property the reference's batch-scan emulation lacks
(/root/reference/app/core.py:655-663 re-reads everything each cycle).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout | late
    ]
)

# open-session state: (start_us, last_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(gap_us: int):
    """Build the per-group state function (closure over the gap)."""

    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return

        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        # event time as int64 microseconds (pandas datetime64[ns] -> us)
        us = (ts.astype("int64") // 1_000).to_numpy()
        # engine-contract late filtering: applyInPandasWithState hands us
        # pre-watermark rows verbatim (unlike the built-in stateful ops);
        # drop them here so "late" below always means within-watermark
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us > 0:
            us = us[us >= wm_us]
        if us.size == 0:
            if state.exists:
                # nothing survived the cut: keep the open session and its
                # pending timeout alive (timeouts are cleared per
                # invocation unless re-armed)
                _, last_us, _ = state.get
                timeout_ms = last_us // 1_000 + gap_us // 1_000
                state.setTimeoutTimestamp(
                    max(timeout_ms, state.getCurrentWatermarkMs() + 1)
                )
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(us[0]), int(us[0]) - 1, 0
            # last_us sentinel guarantees the first event never "gaps"

        out = {k.name: [] for k in SESSION_SCHEMA.fields}
        for t in us:
            t = int(t)
            if t < last_us:
                # late-but-within-watermark event from a PREVIOUS batch's
                # range (this batch itself is sorted). Summary state can't
                # replay history, so: absorb it into the open session when
                # it's within gap of the session window (extending the
                # start downward), else emit it as its own late singleton
                # session — the documented approximation of summary-state
                # sessionizers (the batch w1 query is the exact oracle).
                if t >= start_us - gap_us:
                    start_us = min(start_us, t)
                    n += 1
                else:
                    out["user_id"].append(user_id)
                    out["session_start_us"].append(t)
                    out["session_end_us"].append(t)
                    out["n_events"].append(1)
                    out["closed_by"].append("late")
                continue
            if n > 0 and t - last_us > gap_us:
                out["user_id"].append(user_id)
                out["session_start_us"].append(start_us)
                out["session_end_us"].append(last_us)
                out["n_events"].append(n)
                out["closed_by"].append("gap")
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # no in-order event after watermark > last + gap can extend this
        # session: emit-by-timeout then. Spark requires the timeout to
        # sit beyond the current watermark — a group fed only late
        # events gets the earliest legal timeout instead.
        timeout_ms = last_us // 1_000 + gap_us // 1_000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour") -> DataFrame:
    """Apply the stateful sessionizer to a (streaming or batch-test)
    events DataFrame with columns (user_id long, ts timestamp-castable).

    Returns (user_id, session_start_us, session_end_us, n_events,
    closed_by). Use microsecond epochs downstream to avoid the
    whole-second truncation trap (see w1_sessionize)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group(gap_seconds * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_on_directory(
    spark, source_dir: str, query_name: str = "sessions", gap_seconds: int = 1800
):
    """File-source driver: sessionize a growing parquet directory of
    events into an in-memory sink (test/demo harness; production points
    the writeStream at a table + checkpointLocation)."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    sess = sessionize_stream(stream, gap_seconds=gap_seconds)
    return (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
