"""Maximal matching (linkgraph/matching.py) and latest-departure paths."""

import random

from linkgraph.matching import maximal_matching, maximal_matching_sql
from linkgraph.temporal import latest_departure, latest_departure_sql


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _check_maximal(pairs, matched):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = set()
    for a, b in matched:
        assert (a, b) in und
        assert a not in nodes and b not in nodes, "matched edges share a node"
        nodes.update((a, b))
    for a, b in und:
        assert a in nodes or b in nodes, f"edge ({a},{b}) could still be added"


def test_single_edge_and_triangle(spark):
    m = maximal_matching(_edges(spark, [(0, 1)]))
    assert {(r.src, r.dst) for r in m.matching.collect()} == {(0, 1)}
    tri = [(0, 1), (1, 2), (2, 0)]
    got = {(r.src, r.dst) for r in maximal_matching(_edges(spark, tri)).matching.collect()}
    assert len(got) == 1  # any one triangle edge is maximal
    _check_maximal(tri, got)


def test_random_graphs_valid_maximal_and_deterministic(spark):
    rng = random.Random(13)
    pairs = []
    for _ in range(30):
        a, b = rng.randrange(14), rng.randrange(14)
        if a != b:
            pairs.append((a, b))
    e = _edges(spark, pairs)
    got1 = {(r.src, r.dst) for r in maximal_matching(e).matching.collect()}
    got2 = {(r.src, r.dst) for r in maximal_matching(e).matching.collect()}
    assert got1 == got2
    _check_maximal(pairs, got1)


def test_matching_duckdb_twin(spark):
    import duckdb

    rng = random.Random(21)
    pairs = [(rng.randrange(12), rng.randrange(12)) for _ in range(25)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    res = maximal_matching(e)
    assert res.rounds <= 12  # the oracle unrolls 12 rounds
    got = {(r.src, r.dst) for r in res.matching.collect()}
    con = duckdb.connect()
    con.register("medges", e.toPandas())
    want = {
        tuple(r)
        for r in con.execute(
            maximal_matching_sql("SELECT src, dst FROM medges", rounds=12)
        ).fetchall()
    }
    assert got == want
    _check_maximal(pairs, got)


# --------------------------------------------------- latest departure

def _tedges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, ts long")


def test_latest_departure_chain(spark):
    e = _tedges(spark, [(0, 1, 1), (1, 2, 5)])
    res = latest_departure(e, target=2, deadline=10)
    got = {r.id: r.departure for r in res.arrivals.collect()}
    assert got == {2: 10, 1: 5, 0: 1}


def test_latest_departure_prefers_later_route(spark):
    # two routes 0->2: direct at t2, via 1 departing t4 (needs 1->2 at t6)
    e = _tedges(spark, [(0, 2, 2), (0, 1, 4), (1, 2, 6)])
    got = {
        r.id: r.departure
        for r in latest_departure(e, target=2, deadline=10).arrivals.collect()
    }
    assert got[0] == 4


def test_latest_departure_deadline_gates(spark):
    e = _tedges(spark, [(0, 1, 5)])
    got = {
        r.id: r.departure
        for r in latest_departure(e, target=1, deadline=4).arrivals.collect()
    }
    assert got == {1: 4}  # the t5 edge misses the deadline


def test_latest_departure_duckdb_twin(spark):
    import duckdb

    rng = random.Random(31)
    rows = [
        (rng.randrange(10), rng.randrange(10), rng.randrange(1, 15))
        for _ in range(35)
    ]
    rows = [r for r in rows if r[0] != r[1]]
    e = _tedges(spark, rows)
    got = {
        (r.id, r.departure)
        for r in latest_departure(e, target=rows[0][1], deadline=20).arrivals.collect()
    }
    con = duckdb.connect()
    con.register("tedges", e.toPandas())
    want = {
        tuple(r)
        for r in con.execute(
            latest_departure_sql(
                "SELECT src, dst, ts FROM tedges", str(rows[0][1]), 20
            )
        ).fetchall()
    }
    assert got == want
