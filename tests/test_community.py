"""Community module tests: exact-rational modularity goldens, Louvain
local-move DuckDB twins (sync + alternate sweeps), multilevel Louvain
quality/determinism, and input hygiene."""

import random

from linkgraph.checkpoint import release_caches
from linkgraph.community import (
    community_stats,
    community_stats_sql,
    louvain,
    louvain_local_move,
    louvain_local_sql,
    modularity,
)

# barbell: triangle 1-2-3 and triangle 4-5-6 joined by bridge 3-4.
# m = 7; optimal split = the two triangles:
#   E_in = 6, sum D_c^2 = 7^2 + 7^2 = 98 -> Q = (4*7*6 - 98)/(4*49) = 70/196
BARBELL = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
Q_BARBELL = 70 / 196
# singletons: sum d^2 = 4+4+9+9+4+4 = 34 -> Q = -34/196
Q_SINGLETON = -34 / 196


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _assign(spark, pairs):
    return spark.createDataFrame(list(pairs), "id long, community long")


def test_modularity_exact_barbell_split(spark):
    asg = _assign(spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)])
    assert modularity(_edges(spark, BARBELL), asg) == Q_BARBELL


def test_modularity_singletons_and_missing_rows_default_to_own_id(spark):
    e = _edges(spark, BARBELL)
    empty = _assign(spark, [])
    assert modularity(e, empty) == Q_SINGLETON
    # one community = everything intra: Q = (4m*m - (2m)^2)/(4m^2) = 0
    one = _assign(spark, [(i, 1) for i in range(1, 7)])
    assert modularity(e, one) == 0.0


def test_community_stats_rows_sum_to_modularity(spark):
    e = _edges(spark, BARBELL)
    asg = _assign(spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)])
    rows = {r["community"]: r for r in community_stats(e, asg).collect()}
    assert rows[1]["intra_edges"] == 3 and rows[1]["degree_sum"] == 7
    # each contribution: 3/7 - (7/14)^2 = 25/140... computed as doubles
    want = 3.0 / 7.0 - (7.0 / 14.0) * (7.0 / 14.0)
    assert rows[1]["contribution"] == want == rows[4]["contribution"]


def test_louvain_finds_barbell_triangles(spark):
    res = louvain(_edges(spark, BARBELL), max_levels=3, rounds_per_level=8)
    got = {r["id"]: r["community"] for r in res.assignment.collect()}
    res.release()
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[4], got[5], got[6]}) == 1
    assert got[1] != got[4]
    assert res.modularity == Q_BARBELL


def test_louvain_q_never_below_singletons(spark):
    # dense bipartite-ish random graph — the sync-sweep trap fixture
    rng = random.Random(11)
    pairs = {(rng.randrange(8), 100 + rng.randrange(8)) for _ in range(40)}
    e = _edges(spark, list(pairs))
    res = louvain(e, max_levels=3, rounds_per_level=6)
    q0 = modularity(e, _assign(spark, []))
    res.release()
    assert res.modularity >= q0


def test_louvain_deterministic(spark):
    rng = random.Random(23)
    pairs = [(a, b) for a, b in {(rng.randrange(14), rng.randrange(14)) for _ in range(50)} if a != b]
    e = _edges(spark, pairs)
    r1 = louvain(e, max_levels=3, rounds_per_level=4)
    a1 = sorted(map(tuple, r1.assignment.collect()))
    r1.release()
    r2 = louvain(e, max_levels=3, rounds_per_level=4)
    a2 = sorted(map(tuple, r2.assignment.collect()))
    r2.release()
    assert a1 == a2 and r1.modularity == r2.modularity


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def test_louvain_local_sync_duckdb_twin(spark):
    import duckdb

    rng = random.Random(31)
    pairs = [(a, b) for a, b in {(rng.randrange(16), rng.randrange(16)) for _ in range(70)} if a != b]
    res = louvain_local_move(_edges(spark, pairs), rounds=2, sweep="sync")
    got = sorted(map(tuple, res.assignment.collect()))
    res.release()
    want = sorted(
        map(tuple, duckdb.connect().execute(
            louvain_local_sql(_values_sql(pairs), 2, sweep="sync")
        ).fetchall())
    )
    assert got == want


def test_louvain_local_alternate_duckdb_twin(spark):
    import duckdb

    rng = random.Random(37)
    pairs = [(a, b) for a, b in {(rng.randrange(16), rng.randrange(16)) for _ in range(70)} if a != b]
    res = louvain_local_move(_edges(spark, pairs), rounds=3, sweep="alternate")
    got = sorted(map(tuple, res.assignment.collect()))
    res.release()
    want = sorted(
        map(tuple, duckdb.connect().execute(
            louvain_local_sql(_values_sql(pairs), 3, sweep="alternate")
        ).fetchall())
    )
    assert got == want


def test_community_stats_duckdb_twin(spark):
    import duckdb

    rng = random.Random(41)
    pairs = [(a, b) for a, b in {(rng.randrange(12), rng.randrange(12)) for _ in range(45)} if a != b]
    e = _edges(spark, pairs)
    res = louvain_local_move(e, rounds=2, sweep="alternate")
    got = sorted(map(tuple, community_stats(e, res.assignment).collect()))
    res.release()
    esql = _values_sql(pairs)
    want = sorted(
        map(tuple, duckdb.connect().execute(
            community_stats_sql(esql, louvain_local_sql(esql, 2, sweep="alternate"))
        ).fetchall())
    )
    assert got == want  # contributions are pinned-order doubles: exact


def test_local_move_ignores_self_loops_and_duplicates(spark):
    noisy = BARBELL + [(2, 1), (3, 3), (1, 2), (6, 4)]
    r1 = louvain_local_move(_edges(spark, BARBELL), rounds=2)
    r2 = louvain_local_move(_edges(spark, noisy), rounds=2)
    a1 = sorted(map(tuple, r1.assignment.collect()))
    a2 = sorted(map(tuple, r2.assignment.collect()))
    r1.release()
    r2.release()
    assert a1 == a2


def test_local_move_early_stops_at_fixpoint(spark):
    # alternate sweep on one edge: node 1 joins 2's community in round
    # 1, then two consecutive no-move rounds end the loop early. (The
    # sync sweep would swap 1<->2 forever — the oscillation the parity
    # gate exists to break.)
    res = louvain_local_move(_edges(spark, [(1, 2)]), rounds=6, sweep="alternate")
    assert res.stats["rounds"] < 6
    got = {r["id"]: r["community"] for r in res.assignment.collect()}
    res.release()
    assert got == {1: 2, 2: 2}


def test_conductance_barbell(spark):
    """Two 4-cliques joined by one bridge edge: each community's cut
    is 1, volume is 2*6+1 = 13, phi = 1/13."""
    from linkgraph.community import community_conductance

    clique_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique_b = [(a + 10, b + 10) for a, b in clique_a]
    e = _edges(spark, clique_a + clique_b + [(0, 10)])
    asg = spark.createDataFrame(
        [(i, 1) for i in range(4)] + [(i + 10, 2) for i in range(4)],
        "id long, community long",
    )
    got = {r.community: (r.cut_edges, r.volume, r.conductance) for r in
           community_conductance(e, asg).collect()}
    assert got[1] == (1, 13, round(1 / 13, 6))
    assert got[2] == (1, 13, round(1 / 13, 6))
    # one community holding EVERYTHING: min(vol, rest)=0 -> 0.0
    all_one = spark.createDataFrame(
        [(i, 7) for i in list(range(4)) + [i + 10 for i in range(4)]],
        "id long, community long",
    )
    got = {r.community: r.conductance for r in community_conductance(e, all_one).collect()}
    assert got == {7: 0.0}


def test_conductance_python_replay_and_twin(spark):
    import random as _random

    import duckdb

    from linkgraph.community import (
        community_conductance,
        community_conductance_sql,
    )

    rng = _random.Random(53)
    pairs = [(a, b) for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(45)} if a != b]
    asg_rows = [(i, i % 3) for i in range(15)]
    e = _edges(spark, pairs)
    asg = spark.createDataFrame(asg_rows, "id long, community long")
    got = {r.community: (r.cut_edges, r.volume, r.conductance) for r in
           community_conductance(e, asg).collect()}
    # pure-python replay
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    com = dict(asg_rows)
    cut, vol = {}, {}
    for a, b in es:
        for u, v in ((a, b), (b, a)):
            vol[com[u]] = vol.get(com[u], 0) + 1
            if com[u] != com[v]:
                cut[com[u]] = cut.get(com[u], 0) + 1
    tot = sum(vol.values())
    want = {
        c: (cut.get(c, 0), vol[c],
            round(cut.get(c, 0) / min(vol[c], tot - vol[c]), 6)
            if min(vol[c], tot - vol[c]) > 0 else 0.0)
        for c in vol
    }
    assert got == want
    # DuckDB twin
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    avals = ", ".join(f"({i}, {c})" for i, c in asg_rows)
    sql = community_conductance_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
        f"SELECT * FROM (VALUES {avals}) AS s(id, community)",
    )
    twin = {r[0]: (r[1], r[2], r[3]) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == twin


def _asg(spark, mapping):
    return spark.createDataFrame(
        [(int(i), int(c)) for i, c in mapping.items()], "id long, community long"
    )


def test_compare_assignments_contracts(spark):
    from linkgraph.community import compare_assignments

    ids = range(12)
    x = _asg(spark, {i: i % 3 for i in ids})
    # identical up to relabeling: ARI = NMI = 1
    y = _asg(spark, {i: (i % 3) + 100 for i in ids})
    row = compare_assignments(x, y).first()
    assert (row.n_nodes, row.ari, row.nmi) == (12, 1.0, 1.0)
    # both one-block (trivial): degenerate contract -> 1.0 / 1.0
    t1 = _asg(spark, {i: 0 for i in ids})
    t2 = _asg(spark, {i: 5 for i in ids})
    row = compare_assignments(t1, t2).first()
    assert (row.ari, row.nmi) == (1.0, 1.0)
    # one trivial vs a real split: NMI 0 (one zero entropy)
    row = compare_assignments(t1, x).first()
    assert row.nmi == 0.0


def test_compare_assignments_python_replay(spark):
    import math
    import random as _random

    import pytest

    from linkgraph.community import compare_assignments

    rng = _random.Random(59)
    xm = {i: rng.randrange(4) for i in range(30)}
    ym = {i: rng.randrange(3) for i in range(30)}
    row = compare_assignments(_asg(spark, xm), _asg(spark, ym)).first()
    # replay
    n = 30
    cont = {}
    for i in range(n):
        cont[(xm[i], ym[i])] = cont.get((xm[i], ym[i]), 0) + 1
    a, b = {}, {}
    for (cx, cy), c in cont.items():
        a[cx] = a.get(cx, 0) + c
        b[cy] = b.get(cy, 0) + c
    comb2 = lambda c: c * (c - 1) // 2
    sij = sum(comb2(c) for c in cont.values())
    sa, sb = sum(map(comb2, a.values())), sum(map(comb2, b.values()))
    cn2 = comb2(n)
    exp = sa * sb / cn2
    ari = (sij - exp) / ((sa + sb) / 2 - exp)
    mi = sum(
        (c / n) * round(math.log(n * c / (a[cx] * b[cy])), 7)
        for (cx, cy), c in sorted(cont.items())
    )
    hx = -sum((c / n) * round(math.log(c / n), 7) for _, c in sorted(a.items()))
    hy = -sum((c / n) * round(math.log(c / n), 7) for _, c in sorted(b.items()))
    assert row.n_nodes == 30
    assert row.ari == pytest.approx(round(ari, 6), abs=1e-9)
    assert row.nmi == pytest.approx(round(mi / math.sqrt(hx * hy), 6), abs=1e-9)
    assert 0.0 <= row.nmi <= 1.0 and -0.5 <= row.ari <= 1.0


def test_refine_communities_splits_disconnected(spark):
    import duckdb

    from linkgraph.community import refine_communities, refine_communities_sql

    # community 100 = two disconnected triangles {1,2,3} and {7,8,9};
    # community 200 = connected path {4,5,6}; node 10 isolated in 200
    edges = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9),
             (4, 5), (5, 6), (3, 4)]  # 3-4 crosses communities
    asg = [(i, 100) for i in (1, 2, 3, 7, 8, 9)] + [
        (i, 200) for i in (4, 5, 6, 10)
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = spark.createDataFrame(asg, "id long, community long")
    got = {r["id"]: r["community"] for r in refine_communities(e, a).collect()}
    assert {got[1], got[2], got[3]} == {1}
    assert {got[7], got[8], got[9]} == {7}
    assert {got[4], got[5], got[6]} == {4}
    assert got[10] == 10  # no intra edge -> singleton

    e_sql = ("SELECT * FROM (VALUES "
             + ", ".join(f"({a_}, {b_})" for a_, b_ in edges) + ") t(src, dst)")
    a_sql = ("SELECT * FROM (VALUES "
             + ", ".join(f"({i}, {c})" for i, c in asg) + ") t(id, community)")
    want = dict(duckdb.sql(refine_communities_sql(e_sql, a_sql)).fetchall())
    assert got == want


def test_contract_graph_hand_and_twin(spark):
    """Contraction of a two-community fixture: intra mass becomes
    self-loops, inter mass one canonical super-edge; fractional
    weights sum exactly through the micro domain; twin value-exact."""
    import duckdb

    from linkgraph.community import contract_graph, contract_graph_sql

    edges = spark.createDataFrame(
        [
            (1, 2, 0.5), (2, 3, 1.5), (3, 1, 1.0),   # community 10
            (4, 5, 2.25),                             # community 20
            (1, 4, 0.1), (2, 5, 0.2),                 # across
        ],
        "src long, dst long, weight double",
    )
    asg = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20)], "id long, community long"
    )
    got = sorted(map(tuple, contract_graph(edges, asg).collect()))
    assert got == [
        (10, 10, 3.0, 3),      # 0.5 + 1.5 + 1.0
        (10, 20, 0.3, 2),      # 0.1 + 0.2 (exact through micro ints)
        (20, 20, 2.25, 1),
    ]
    con = duckdb.connect()
    ev = ", ".join(f"({a}, {b}, {w})" for a, b, w in
                   [(1, 2, 0.5), (2, 3, 1.5), (3, 1, 1.0), (4, 5, 2.25), (1, 4, 0.1), (2, 5, 0.2)])
    av = ", ".join(f"({i}, {c})" for i, c in [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20)])
    sql = contract_graph_sql(
        f"SELECT * FROM (VALUES {ev}) t(src, dst, weight)",
        f"SELECT * FROM (VALUES {av}) t(id, community)",
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_louvain_hub_split_equals_plain(spark):
    """hub_cap routes hub-keyed vote rows through the broadcast-state
    path (linkgraph/skew.py); the integer vote sums — and therefore the
    argmax communities — are split-invariant. Star+ring fixture forces
    the hub hot; multi-round so split state feeds later probes."""
    from linkgraph.community import louvain, louvain_local_move

    pairs = (
        [(0, i) for i in range(1, 41)]
        + [(i, i % 40 + 1) for i in range(1, 41)]
        + [(100, 101)]
    )
    e = spark.createDataFrame(pairs, "src long, dst long")
    plain = {
        (r["id"], r["community"])
        for r in louvain_local_move(e, rounds=3, sweep="alternate").assignment.collect()
    }
    forced = louvain_local_move(e, rounds=3, sweep="alternate", hub_cap=20)
    assert forced.stats["hub_split"] == 1  # only the hub exceeds nbr-degree 20
    assert {(r["id"], r["community"]) for r in forced.assignment.collect()} == plain
    auto = louvain_local_move(e, rounds=3, sweep="alternate", hub_cap="auto")
    assert {(r["id"], r["community"]) for r in auto.assignment.collect()} == plain

    # multilevel: the whole hierarchy is bit-identical under the split
    ml_plain = {
        (r["id"], r["community"])
        for r in louvain(
            e, max_levels=2, rounds_per_level=4, compute_modularity=False
        ).assignment.collect()
    }
    ml_hub = {
        (r["id"], r["community"])
        for r in louvain(
            e, max_levels=2, rounds_per_level=4, compute_modularity=False, hub_cap=20
        ).assignment.collect()
    }
    assert ml_hub == ml_plain

    # auto disengages on a uniform ring (no qualifying key)
    ring = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)], "src long, dst long"
    )
    off = louvain_local_move(ring, rounds=2, hub_cap="auto")
    assert off.stats["hub_split"] == 0
