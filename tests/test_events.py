"""Batch event-analytics operator tests (linkgraph.pipeline.events):
hand-built fixtures with known sessions/funnels, batch-vs-streaming
sessionization consistency, and plan-shape (single shuffle) checks."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline.events import (
    funnel,
    props_stats,
    retention_cohorts,
    session_stats,
    sessionize,
    windowed_counts,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(eid, user, minutes, etype="click", value=1.0, props='{"k": 1}'):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, value, props)


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def tiny_events(spark):
    rows = [
        # user 1: two sessions (gap 40 min between #2 and #3)
        _ev(1, 1, 0.0),
        _ev(2, 1, 10.0),
        _ev(3, 1, 50.0),
        _ev(4, 1, 55.0),
        # user 2: single event
        _ev(5, 2, 5.0),
        # user 3: boundary — exactly 30 min gap stays in-session,
        # 30 min + 1 sec starts a new one
        _ev(6, 3, 0.0),
        _ev(7, 3, 30.0),
        _ev(8, 3, 60.0 + 1 / 60),
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_sessionize_gap_semantics(spark, tiny_events):
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(tiny_events, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1, 8: 2}


def test_session_stats_aggregates(spark, tiny_events):
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(tiny_events, gap_minutes=30).collect()
    }
    assert len(got) == 5
    s11 = got[(1, 1)]
    assert s11["n_events"] == 2
    assert s11["duration_sec"] == 600.0
    assert s11["total_value"] == 2.0
    assert got[(2, 1)]["duration_sec"] == 0.0
    assert got[(3, 1)]["n_events"] == 2  # exactly-30-min gap keeps session


def test_windowed_counts(spark, tiny_events):
    got = {
        (r["bucket_start"], r["event_type"]): r["n"]
        for r in windowed_counts(tiny_events, bucket="hour").collect()
    }
    h0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[(h0, "click")] == 7  # minutes 0..55 across all three users
    assert got[(h0 + 3600, "click")] == 1  # user 3's 60-min event


def test_funnel_greedy_order(spark):
    rows = [
        # user 1 completes in order
        _ev(1, 1, 0, "view"),
        _ev(2, 1, 5, "click"),
        _ev(3, 1, 10, "purchase"),
        # user 2: click BEFORE first view never counts for step 2
        _ev(4, 2, 0, "click"),
        _ev(5, 2, 5, "view"),
        _ev(6, 2, 10, "purchase"),
        # user 3: stops after view
        _ev(7, 3, 0, "view"),
        _ev(8, 3, 5, "purchase"),
    ]
    events = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {
        r["step"]: r["users"]
        for r in funnel(events, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_within_minutes(spark):
    rows = [
        _ev(1, 1, 0, "view"),
        _ev(2, 1, 5, "click"),
        _ev(3, 1, 500, "purchase"),  # outside the 60-min budget
        _ev(4, 2, 0, "view"),
        _ev(5, 2, 5, "click"),
        _ev(6, 2, 30, "purchase"),
    ]
    events = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {
        r["step"]: r["users"]
        for r in funnel(
            events, ["view", "click", "purchase"], within_minutes=60
        ).collect()
    }
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_retention_cohorts(spark):
    day = 24 * 60.0
    rows = [
        _ev(1, 1, 0),           # user 1 cohort day 0
        _ev(2, 1, 2 * day),     # active again day 2
        _ev(3, 2, 0),           # user 2 cohort day 0, never returns
        _ev(4, 3, day),         # user 3 cohort day 1
        _ev(5, 3, day + 60),    # same day — one active row
    ]
    events = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {
        (r["cohort_day"], r["day_offset"]): r["users"]
        for r in retention_cohorts(events).collect()
    }
    d0 = int(
        T0.replace(hour=0, minute=0, second=0, tzinfo=dt.timezone.utc).timestamp()
    )
    assert got == {(d0, 0): 2, (d0, 2): 1, (d0 + 86400, 0): 1}


def test_props_stats_missing_and_invalid_json(spark):
    rows = [
        _ev(1, 1, 0, "click", props='{"k": 10}'),
        _ev(2, 1, 1, "click", props='{"other": 1}'),
        _ev(3, 1, 2, "click", props="not json"),
        _ev(4, 1, 3, "view", props='{"k": 4}'),
    ]
    events = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {r["event_type"]: r for r in props_stats(events, field="k").collect()}
    assert got["click"]["n"] == 3
    assert got["click"]["n_with_field"] == 1
    assert got["click"]["sum_field"] == 10.0
    assert got["view"]["avg_field"] == 4.0


def test_batch_matches_streaming_sessions(spark, tmp_path):
    """Every CLOSED session the streaming operator emits must exist in
    the batch sessionization with identical (user, start, end, count) —
    the two operators implement one gap-session contract."""
    from linkgraph.streaming import run_available_now
    from linkgraph.streaming import sessionize as stream_sessionize

    src = str(tmp_path / "events_in")
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .write.parquet(src)
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    run_available_now(
        stream_sessionize(stream, gap_minutes=30),
        "sess_stream_x",
        str(tmp_path / "ckpt"),
    )
    emitted = spark.sql("SELECT * FROM sess_stream_x").collect()
    assert len(emitted) > 0

    batch = {
        (r["user_id"], r["start_epoch"], r["end_epoch"]): r["n_events"]
        for r in session_stats(
            spark.read.parquet(src), gap_minutes=30
        ).collect()
    }
    for r in emitted:
        key = (
            r["user_id"],
            int(r["session_start"].timestamp()),
            int(r["session_end"].timestamp()),
        )
        assert key in batch, f"streaming session {key} missing from batch"
        assert batch[key] == r["n_events"]


def test_session_stats_single_shuffle(spark, tiny_events):
    """The window and the session groupBy share one user-key exchange:
    hashpartitioning(user_id) satisfies the (user_id, session_idx)
    clustering, so session_stats plans exactly one shuffle."""
    plan = (
        session_stats(tiny_events, gap_minutes=30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_transition_matrix_golden(spark):
    import datetime as dt

    from linkgraph.pipeline.events import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> view;  user 2: view -> view
        (1, 1, t0, "view"), (2, 1, t0 + dt.timedelta(minutes=1), "click"),
        (3, 1, t0 + dt.timedelta(minutes=2), "view"),
        (4, 2, t0, "view"), (5, 2, t0 + dt.timedelta(minutes=5), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {(r.from_type, r.to_type): (r.n, r.p)
           for r in transition_matrix(ev).collect()}
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_top_session_paths_golden(spark):
    import datetime as dt

    from linkgraph.pipeline.events import top_session_paths

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, minutes, typ):
        return (eid, uid, t0 + dt.timedelta(minutes=minutes), typ, 1.0)

    rows = [
        # user 1, one session: view > click
        ev(1, 1, 0, "view"), ev(2, 1, 5, "click"),
        # user 1, second session (gap > 30): view > click
        ev(3, 1, 60, "view"), ev(4, 1, 61, "click"),
        # user 2: view only
        ev(5, 2, 0, "view"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = [(r.path, r.n_sessions) for r in top_session_paths(e, k=5).collect()]
    assert got == [("view>click", 2), ("view", 1)]
    # max_len truncates
    got2 = [(r.path, r.n_sessions) for r in top_session_paths(e, k=5, max_len=1).collect()]
    assert got2 == [("view", 3)]


def test_windowed_anomalies_spike_quiet_and_flat(spark):
    from linkgraph.pipeline.events import windowed_anomalies

    rows = []
    eid = 0
    # "spiky": hourly counts [1,1,1,1,6] -> mean 2, std sqrt(5);
    # only hour 4 has |z| = 4/sqrt(5) = 1.788854 >= 1.5.
    for h in range(4):
        eid += 1
        rows.append(_ev(eid, 1, 60.0 * h, "spiky"))
    for i in range(6):
        eid += 1
        rows.append(_ev(eid, 1, 60.0 * 4 + i, "spiky"))
    # "quiet": [5,5,5,5,0] -- the dark hour comes ONLY from the
    # zero-filled grid (no row at hour 4); z = -4/sqrt(5).
    for h in range(4):
        for i in range(5):
            eid += 1
            rows.append(_ev(eid, 2, 60.0 * h + i, "quiet"))
    # "flat": constant 2/hour across the full range -> zero variance,
    # must emit nothing.
    for h in range(5):
        for i in range(2):
            eid += 1
            rows.append(_ev(eid, 3, 60.0 * h + i, "flat"))
    e = spark.createDataFrame(rows, EVENTS_SCHEMA)

    got = {
        (r["event_type"], r["bucket_start"]): (r["n"], r["z"])
        for r in windowed_anomalies(e, bucket="hour", z_thresh=1.5).collect()
    }
    h0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        ("spiky", h0 + 4 * 3600): (6, 1.788854),
        ("quiet", h0 + 4 * 3600): (0, -1.788854),
    }

    # threshold just above the spike's |z| empties the result
    assert windowed_anomalies(e, bucket="hour", z_thresh=1.8).count() == 0
    with pytest.raises(ValueError):
        windowed_anomalies(e, bucket="week")
