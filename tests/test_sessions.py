"""Gap-based event sessionization: hand-computed fixtures + validation."""

from datetime import datetime

import pytest

from trinity_spark.dataops.sessions import session_stats, sessionize


def _events(spark):
    rows = [
        # user 1: 3 events 10 min apart, then a 2h gap, then 2 more
        (0, datetime(2024, 1, 1, 8, 0, 0), 1, 2.0),
        (1, datetime(2024, 1, 1, 8, 10, 0), 1, 3.0),
        (2, datetime(2024, 1, 1, 8, 20, 0), 1, 4.0),
        (3, datetime(2024, 1, 1, 10, 20, 0), 1, 5.0),
        (4, datetime(2024, 1, 1, 10, 40, 0), 1, 6.0),
        # user 2: single event
        (5, datetime(2024, 1, 1, 9, 0, 0), 2, 1.5),
        # user 3: exact-gap boundary (gap == 30 min continues the session)
        (6, datetime(2024, 1, 1, 9, 0, 0), 3, 1.0),
        (7, datetime(2024, 1, 1, 9, 30, 0), 3, 1.0),
        (8, datetime(2024, 1, 1, 10, 0, 1), 3, 1.0),  # 30m01s -> new session
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_sessionize_gap_semantics(spark):
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(_events(spark), gap_minutes=30).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0, 7: 0, 8: 1}


def test_session_stats_rollup(spark):
    rows = {(r["user_id"], r["session_id"]): r.asDict()
            for r in session_stats(_events(spark), gap_minutes=30).collect()}
    s = rows[(1, 0)]
    assert s["n_events"] == 3
    assert s["duration_sec"] == pytest.approx(1200.0)
    assert s["value_sum"] == pytest.approx(9.0)
    assert rows[(2, 0)]["n_events"] == 1
    assert rows[(2, 0)]["duration_sec"] == 0.0
    # exact 30-min gap stayed one session; the 30m01s gap split
    assert rows[(3, 0)]["n_events"] == 2
    assert rows[(3, 1)]["n_events"] == 1


def test_sessionize_validates(spark):
    with pytest.raises(ValueError, match="gap_minutes"):
        sessionize(_events(spark), gap_minutes=0)


def test_sessionize_null_keys_fail_loudly(spark):
    """NULL user_id would merge every anonymous event into one pseudo-user;
    a NULL (or unparseable) ts poisons the lag-gap so every later event
    silently starts a new session — both fail the job instead (the
    split_bucket NULL-key rule)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    base = [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:05:00")]
    schema = "event_id long, user_id long, ts string"
    null_user = spark.createDataFrame(
        base + [(3, None, "2024-01-01 10:06:00")], schema
    )
    with pytest.raises(SparkRuntimeException, match="sessionize"):
        sessionize(null_user).collect()
    null_ts = spark.createDataFrame(base + [(3, 1, None)], schema)
    with pytest.raises(SparkRuntimeException, match="sessionize"):
        sessionize(null_ts).collect()
    # unparseable string: ANSI mode's cast throws its own DateTimeException
    # before the guard; non-ANSI sessions hit the guard — loud either way
    bad_ts = spark.createDataFrame(base + [(3, 1, "not-a-time")], schema)
    with pytest.raises(Exception, match="sessionize|CAST_INVALID_INPUT"):
        sessionize(bad_ts).collect()
    # clean input unaffected
    ok = sessionize(spark.createDataFrame(base, schema)).collect()
    assert {r["session_id"] for r in ok} == {0}


def test_sessionize_string_ts_mixed_offsets_orders_chronologically(spark):
    """String ts with mixed UTC offsets sorts lexicographically by OFFSET,
    not time — the window must order by the same epoch seconds the gap is
    computed from, or lag() sees out-of-order neighbors and negative gaps
    glue separated events into one session."""
    rows = [
        # chronological: 06:30Z, 06:40Z, then a 3h gap to 09:40Z — but the
        # '+05:00' strings sort FIRST lexicographically ('+' < '2'... and
        # '2024-03-01T11:' < '2024-03-01T06:' is false, so offset forms
        # interleave wrongly with Z forms)
        (0, "2024-03-01T06:30:00Z", 1),
        (1, "2024-03-01T11:40:00+05:00", 1),  # == 06:40Z
        (2, "2024-03-01T09:40:00Z", 1),
    ]
    events = spark.createDataFrame(rows, "event_id long, ts string, user_id long")
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(events, gap_minutes=30).collect()}
    # 06:30 and 06:40 share a session; 09:40 (3h later) starts a new one
    assert got == {0: 0, 1: 0, 2: 1}


def test_sessionize_single_window_shuffle(spark):
    """One exchange (the user_id window partition), no joins."""
    plan = sessionize(_events(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan


def test_session_stats_mixed_offset_string_ts_chronological(spark):
    """ts_first/ts_last must be chronological, not lexicographic: string
    timestamps with mixed UTC offsets sort wrong (even swapped) as raw
    strings — the same hardening sessionize's ordering already has."""
    rows = [
        ("u1", 1, "2024-03-01T11:40:00+05:00", 1.0),  # == 06:40Z (earlier)
        ("u1", 2, "2024-03-01T09:40:00Z", 2.0),       # later instant
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts string, value double"
    )
    out = session_stats(df, gap_minutes=600).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ts_first"] == "2024-03-01T11:40:00+05:00"
    assert r["ts_last"] == "2024-03-01T09:40:00Z"
    assert r["duration_sec"] == 10800.0
