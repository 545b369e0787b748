"""Temporal earliest-arrival paths (linkgraph/temporal.py)."""

import pytest

from linkgraph.temporal import earliest_arrival, earliest_arrival_sql


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, ts long")


def test_time_respecting_only(spark):
    # 0 -(t5)-> 1 -(t3)-> 2: the second edge departs BEFORE arrival at
    # 1, so 2 is unreachable; 1 -(t7)-> 3 works
    e = _edges(spark, [(0, 1, 5), (1, 2, 3), (1, 3, 7)])
    res = earliest_arrival(e, source=0, start_ts=0)
    got = {r.id: r.arrival for r in res.arrivals.collect()}
    assert got == {0: 0, 1: 5, 3: 7}


def test_earliest_not_fewest_hops(spark):
    # direct edge at t10 vs two-hop journey arriving t4: earliest wins
    e = _edges(spark, [(0, 3, 10), (0, 1, 1), (1, 3, 4)])
    res = earliest_arrival(e, source=0)
    got = {r.id: r.arrival for r in res.arrivals.collect()}
    assert got[3] == 4


def test_strict_requires_increasing_ts(spark):
    e = _edges(spark, [(0, 1, 5), (1, 2, 5)])
    non_strict = earliest_arrival(e, source=0)
    assert {r.id: r.arrival for r in non_strict.arrivals.collect()}[2] == 5
    strict = earliest_arrival(e, source=0, strict=True)
    assert 2 not in {r.id for r in strict.arrivals.collect()}


def test_start_ts_gates_departure(spark):
    e = _edges(spark, [(0, 1, 5)])
    assert earliest_arrival(e, source=0, start_ts=6).arrivals.count() == 1
    assert earliest_arrival(e, source=0, start_ts=5).arrivals.count() == 2


def test_later_round_can_improve_arrival(spark):
    # long chain reaching node 4 at t4; a slow direct edge t9 first —
    # the min lattice must settle to 4
    e = _edges(
        spark,
        [(0, 4, 9), (0, 1, 1), (1, 2, 2), (2, 3, 3), (3, 4, 4)],
    )
    res = earliest_arrival(e, source=0)
    assert {r.id: r.arrival for r in res.arrivals.collect()}[4] == 4


def test_duckdb_twin_randomized(spark):
    import random

    import duckdb

    rng = random.Random(9)
    rows = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(1, 20))
        for _ in range(40)
    ]
    rows = [r for r in rows if r[0] != r[1]]
    e = _edges(spark, rows)
    got = {
        (r.id, r.arrival)
        for r in earliest_arrival(e, source=rows[0][0]).arrivals.collect()
    }
    con = duckdb.connect()
    con.register("tedges", e.toPandas())
    sql = earliest_arrival_sql(
        "SELECT src, dst, ts FROM tedges", str(rows[0][0])
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_resume_matches_uninterrupted(spark, tmp_path):
    e = _edges(
        spark, [(0, 1, 1), (1, 2, 2), (2, 3, 3), (3, 4, 4), (4, 5, 5)]
    )
    want = {
        (r.id, r.arrival)
        for r in earliest_arrival(e, source=0).arrivals.collect()
    }
    ckpt = str(tmp_path / "ea")
    partial = earliest_arrival(
        e, source=0, max_rounds=2, checkpoint_dir=ckpt, checkpoint_every=1
    )
    assert partial.rounds == 2
    res = earliest_arrival(
        e, source=0, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
    )
    got = {(r.id, r.arrival) for r in res.arrivals.collect()}
    assert got == want


def test_duration_aware_journeys(spark):
    # 0 -(dep1,dur3)-> 1 arrives t4; edge 1->2 departing t3 is MISSED
    # (arrival 4 > 3); departing t6 works, arriving 6+2=8
    rows = [(0, 1, 1, 3), (1, 2, 3, 1), (1, 2, 6, 2)]
    e = spark.createDataFrame(rows, "src long, dst long, ts long, dur long")
    res = earliest_arrival(e, source=0, dur_col="dur")
    got = {r.id: r.arrival for r in res.arrivals.collect()}
    assert got == {0: 0, 1: 4, 2: 8}


def test_duration_duckdb_twin(spark):
    import random

    import duckdb

    rng = random.Random(41)
    rows = [
        (rng.randrange(10), rng.randrange(10), rng.randrange(1, 12),
         rng.randrange(0, 5))
        for _ in range(40)
    ]
    rows = [r for r in rows if r[0] != r[1]]
    e = spark.createDataFrame(rows, "src long, dst long, ts long, dur long")
    got = {
        (r.id, r.arrival)
        for r in earliest_arrival(e, source=rows[0][0], dur_col="dur").arrivals.collect()
    }
    con = duckdb.connect()
    con.register("wedges", e.toPandas())
    sql = earliest_arrival_sql(
        "SELECT src, dst, ts, dur FROM wedges", str(rows[0][0]),
        with_duration=True,
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_resume_rejects_changed_parameters(spark, tmp_path):
    e = _edges(spark, [(0, 1, 1), (1, 2, 2), (2, 3, 3)])
    ckpt = str(tmp_path / "ea2")
    earliest_arrival(e, source=0, max_rounds=1,
                     checkpoint_dir=ckpt, checkpoint_every=1)
    with pytest.raises(ValueError, match="resume mismatch"):
        earliest_arrival(e, source=1, checkpoint_dir=ckpt,
                         checkpoint_every=1, resume=True)
    with pytest.raises(ValueError, match="resume mismatch"):
        earliest_arrival(e, source=0, strict=True, checkpoint_dir=ckpt,
                         checkpoint_every=1, resume=True)


def test_temporal_closeness_golden_and_twin(spark):
    import duckdb

    from linkgraph.temporal import temporal_closeness, temporal_closeness_sql

    rows = [(0, 1, 5), (1, 2, 7), (0, 3, 20), (2, 4, 3), (1, 4, 9)]
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    got = [tuple(r) for r in temporal_closeness(e, 0, start_ts=0).collect()]
    # arrivals: 1@5, 2@7, 3@20, 4@9 (the ts=3 hop to 4 precedes
    # arrival at 2, so it is not time-respecting)
    assert got == [(0, 4, round((int(1e9 / 5) + round(1e9 / 7)
                                 + int(1e9 / 20) + round(1e9 / 9)) / 1e9, 6))]
    vs = ("SELECT * FROM (VALUES "
          + ", ".join(f"({a},{b},{t})" for a, b, t in rows)
          + ") t(src,dst,ts)")
    want = [tuple(r) for r in duckdb.connect().execute(
        temporal_closeness_sql(vs, 0, start_ts=0)
    ).fetchall()]
    assert got == want
    # unreachable-only source: zero closeness, zero reached
    got4 = [tuple(r) for r in temporal_closeness(e, 4, start_ts=0).collect()]
    assert got4 == [(4, 0, 0.0)]
