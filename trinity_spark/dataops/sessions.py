"""Event-stream sessionization: gap-based session assignment + rollups.

A transcripts/telemetry pipeline at the 100 TB tier carries an event stream
next to the text corpus (the driver's ``events`` table: event_id, ts,
user_id, event_type, value, props).  The standard first transformation is
sessionization — group a user's events into sessions separated by idle gaps
— and the per-session rollup that feeds downstream aggregation.

Scale shape: ONE shuffle on user_id (the window partition key); session ids
come from a running sum of gap-break flags inside each user partition —
no self-join, no driver state, no UDF.  Skew bound: the heaviest user's
event count; at 10^12 events a hot user is still one partition-local sort
(salt by time range first if a single user exceeds executor memory).
``session_stats`` adds one map-side-combined aggregation on the assigned
(user_id, session_id) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a per-user session_id to every event.

    A new session starts when the gap to the user's previous event exceeds
    ``gap_minutes`` (strictly greater, so an exact-gap event continues the
    session).  session_id is 0-based and dense per user; ties on ts keep a
    deterministic order via a secondary sort on event_id when present.

    NULL keys fail the job (the split_bucket / build NULL-conv_id rule):
    a NULL ``user_col`` would glue every anonymous event into one pseudo-
    user's sessions, and a NULL (or unparseable-string) ``ts_col`` poisons
    the lag-gap so every event AFTER it silently starts a new session.
    Filter or fill such rows explicitly before sessionizing.
    """
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be > 0")
    # NTZ timestamps cannot cast straight to double; epoch seconds via an
    # intermediate timestamp cast.  CAVEAT: for TIMESTAMP_NTZ inputs the
    # cast maps wall time through spark.sql.session.timeZone, so in a
    # DST-observing session zone the repeated/skipped hour can distort a
    # gap by +/-1h — run with a fixed-offset session tz (UTC is this
    # deployment's default) for reproducible gaps on NTZ data
    raw_sec = F.col(ts_col).cast("timestamp").cast("double")
    # per-row guard, no extra action: the assert branch only evaluates on a
    # NULL key (the brute_force_topk dim-mismatch idiom)
    sec = F.when(
        F.col(user_col).isNull() | raw_sec.isNull(),
        F.assert_true(
            F.col(user_col).isNotNull() & raw_sec.isNotNull(),
            f"sessionize: NULL {user_col} or NULL/unparseable {ts_col} row — "
            "filter or fill these before sessionizing",
        ).cast("double"),
    ).otherwise(raw_sec)
    # The window MUST order by the same epoch-seconds value the gap is
    # computed from: a raw string ts column with mixed UTC offsets sorts
    # lexicographically (offset order, not chronological order), which
    # would hand lag() out-of-order neighbors and negative gaps that
    # silently glue separated events into one session.
    order = [sec] + ([F.col("event_id")] if "event_id" in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_sec = sec - F.lag(sec).over(w)
    new_session = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("long"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: event count, span seconds, value sum, first/last ts.

    Columns: user_id, session_id, n_events, duration_sec, value_sum,
    ts_first, ts_last.  One window shuffle (sessionize) + one
    map-side-combined aggregation on (user, session)."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.max(F.col(ts_col).cast("timestamp").cast("double"))
            - F.min(F.col(ts_col).cast("timestamp").cast("double")),
            6,
        ).alias("duration_sec"),
        F.round(F.sum(value_col), 6).alias("value_sum"),
        # chronological first/last, not lexicographic: string timestamps
        # with mixed UTC offsets sort wrong (even swapped) as raw strings —
        # order by the same cast the gap/duration math uses
        F.min_by(ts_col, F.col(ts_col).cast("timestamp")).alias("ts_first"),
        F.max_by(ts_col, F.col(ts_col).cast("timestamp")).alias("ts_last"),
    )
