"""Streaming metrics + stateful sessionization — the live-ops analogs.

The reference exposes live queue/throughput stats over its job store
(/root/reference/src/services/queue_manager.py:740-790 get_storage_stats;
src/routes/jobs.py:12-64 polling) and tracks per-job lifecycles. On a
continuously-arriving corpus those become:

- windowed_method_counts: event-time tumbling-window counts of
  conversion_method with a WATERMARK, so late-arriving documents fold
  into the right window and state is bounded (the per-window state is
  dropped once the watermark passes — at 100 TB/day this is the only
  shape that doesn't grow without bound).
- stateful_sessionize: gap-based session windows over a user event
  stream with applyInPandasWithState — the custom stateful operator
  surface (GroupState timeout drives session emission). The batch twin
  (`relational.q_sessionize`, oracle-checked) defines the semantics; the
  streaming form proves the engine carries per-key state across
  micro-batches with bounded memory (one (last_ts, start_ts, count)
  triple per live user, timeout-evicted).

Both are pure Structured Streaming: no driver-side loops, no collect;
state lives in the checkpointed state store, sized by live keys only.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 30 * 60  # same 30-min gap as the batch sessionize


def windowed_method_counts(
    extracted_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Tumbling event-time histogram of conversion methods with bounded
    state. Input stream needs an `event_time` timestamp column (arrival
    time of the document batch)."""
    return (
        extracted_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "conversion_method")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conversion_method",
            "n_docs",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session state: extend the open session with in-gap events,
    emit a session row whenever a gap (or the processing-time timeout)
    closes it. State is one (start, last, count) triple per live user."""
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(last_ms, unit="ms")],
                "n_events": [n],
            }
        )
        return
    ts_ms: list[int] = []
    for pdf in pdfs:
        ts_ms.extend(int(t.value // 1_000_000) for t in pdf["event_time"])
    ts_ms.sort()
    start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
    out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
    for t in ts_ms:
        if last_ms is not None and t - last_ms > SESSION_GAP_S * 1000:
            out["user_id"].append(user_id)
            out["session_start"].append(pd.Timestamp(start_ms, unit="ms"))
            out["session_end"].append(pd.Timestamp(last_ms, unit="ms"))
            out["n_events"].append(n)
            start_ms, last_ms, n = t, t, 1
        else:
            if last_ms is None:
                start_ms = t
            last_ms = t
            n += 1
    state.update((start_ms, last_ms, n))
    state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if out["user_id"]:
        yield pd.DataFrame(out)


def stateful_sessionize(events_stream: DataFrame) -> DataFrame:
    """Gap-based session windows over a (user_id, event_time) stream via
    applyInPandasWithState. Sessions close when a later event arrives
    beyond the gap, or when the processing-time timeout fires with no new
    events. Output rows are closed sessions only."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
