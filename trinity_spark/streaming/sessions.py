"""Streaming event analytics: watermarked window aggregation + stateful
gap sessionization.

Two Structured Streaming counterparts to ``dataops/sessions.py``:

- ``windowed_event_counts``: tumbling-window counts per event_type with a
  watermark, the built-in late-data story (late events inside the watermark
  update their window; older ones drop).  Pure built-in operators —
  ``withWatermark`` + ``window()`` + groupBy — so state eviction, partial
  aggregation, and exactly-once all come from the engine.

- ``sessionize_stream``: the custom stateful operator the built-ins can't
  express — gap-based sessions ACROSS micro-batches, implemented with
  ``applyInPandasWithState`` keyed on user_id.  Per-key state is three
  scalars (last event time, current session id, session start); each batch
  sorts its own events (arbitrary intra-batch arrival order) and continues
  from the stored state, so a session spanning many micro-batches keeps one
  id.  State is evicted via processing-time timeout after ``state_ttl_min``
  of key inactivity — at 10^9 users the state store holds only the active
  tail, which is what makes this viable on a real cluster.

Semantics match the batch ``dataops.sessions.sessionize`` exactly when
events arrive in event-time order across batches (the replay/backfill
case); out-of-order arrival ACROSS batches follows arrival semantics, as in
any singleton-state streaming sessionizer (tested).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window event counts per type with late-data handling.

    Returns (window_start, window_end, event_type, n_events); append-mode
    compatible (windows finalize once the watermark passes window_end)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            type_col,
            "n_events",
        )
    )


_SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("session_id", LongType()),
        StructField("session_start_sec", DoubleType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("last_sec", DoubleType()),
        StructField("session_id", LongType()),
        StructField("start_sec", DoubleType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    state_ttl_min: float | None = 120.0,
) -> DataFrame:
    """Assign gap-based session ids on a stream of (user_id, event_id, ts).

    Stateful per-user continuation across micro-batches (see module doc).
    Returns a streaming DataFrame (user_id, event_id, ts, session_id,
    session_start_sec) in append mode.

    Identity caveat: ``session_id`` is dense 0-based per user WITHIN one
    state lifetime (matching the batch ``dataops.sessions.sessionize``).
    TTL eviction removes the counter, so a user returning after
    ``state_ttl_min`` restarts at 0 — downstream keys that must stay unique
    across evictions should prefer (user_id, session_start_sec), the
    session's first event time.  That key is unique for a user whose events
    arrive in event-time order; under OUT-OF-ORDER arrival it can repeat:
    a late event can regress an open session's last_sec below an earlier
    start, letting a later session re-open at a start_sec an older session
    already used (same after a replayed first event post-eviction).
    Pipelines that must survive disorder should add a processing-time
    component (e.g. the batch/epoch id) to the key.

    ``state_ttl_min=None`` disables the processing-time state eviction —
    use for bounded replays and for ``trigger(availableNow=True)`` runs
    (a query with registered processing-time timeouts does not terminate
    under availableNow: it keeps waiting for the timeouts to fire).  Keep
    the TTL for long-running production streams so the state store holds
    only the active-user tail."""
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    gap_sec = gap_minutes * 60.0
    use_ttl = state_ttl_min is not None

    def assign(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_sec, session_id, start_sec = (
            state.get if state.exists else (None, -1, None)
        )
        # the runtime hands one key's micro-batch as SEVERAL pandas chunks
        # (split at arrow maxRecordsPerBatch) in arbitrary relative order —
        # sort must span the whole batch, not each chunk, or a hot key's
        # later-chunk-but-earlier-time events would regress last_sec and
        # land in the wrong session
        chunks = [c for c in batches if len(c)]
        if not chunks:
            if state.exists and use_ttl:
                state.setTimeoutDuration(int(state_ttl_min * 60 * 1000))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        # NULL keys fail loudly (the batch sessionize / split_bucket rule):
        # a NULL user_id would run one pseudo-user's session counter over
        # every anonymous event, and a NaT ts would silently become the
        # int64 sentinel (year ~-292e9) under .astype("int64"), gluing or
        # splitting sessions arbitrarily
        if key[0] is None:
            raise ValueError(
                "sessionize_stream: NULL user_id row — filter or fill "
                "anonymous events before sessionizing"
            )
        if pdf["ts"].isna().any():
            raise ValueError(
                "sessionize_stream: NULL ts row(s) for user "
                f"{key[0]!r} — filter or fill them before sessionizing"
            )
        secs = pdf["ts"].astype("int64") / 1e9
        out_sessions = []
        out_starts = []
        for s in secs:
            if last_sec is None or s - last_sec > gap_sec:
                session_id += 1
                start_sec = float(s)
            last_sec = s
            out_sessions.append(session_id)
            out_starts.append(start_sec)
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": pdf["event_id"].values,
                "ts": pdf["ts"].values,
                "session_id": out_sessions,
                "session_start_sec": out_starts,
            }
        )
        state.update((float(last_sec), int(session_id), float(start_sec)))
        if use_ttl:
            state.setTimeoutDuration(int(state_ttl_min * 60 * 1000))

    return (
        stream.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            assign,
            outputStructType=_SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_ttl
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
