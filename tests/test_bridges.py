"""Bridges (distributed Euler-tour/XOR path) and articulation points.

Every bridge result is cross-checked against a brute-force
reference (remove each edge, recount components via union-find) —
the same definition the driver's DuckDB oracle evaluates at sf0.01.
"""

import random

import pytest

from linkgraph.bridges import articulation_points, bridges


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _brute_bridges(pairs):
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    nodes = sorted({x for e in und for x in e})

    def n_comps(excl):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in und:
            if e == excl:
                continue
            ra, rb = find(e[0]), find(e[1])
            if ra != rb:
                parent[ra] = rb
        return len({find(n) for n in nodes})

    base = n_comps(None)
    return {e for e in und if n_comps(e) > base}


def _brute_articulation(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({x for e in und for x in e})

    def n_comps(excl_node):
        live = [n for n in nodes if n != excl_node]
        parent = {n: n for n in live}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in und:
            if excl_node in (a, b):
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(n) for n in live})

    base = n_comps(None)
    return {v for v in nodes if n_comps(v) > base}


def test_path_graph_all_bridges(spark):
    pairs = [(i, i + 1) for i in range(6)]
    res = bridges(_edges(spark, pairs))
    got = {(r.src, r.dst) for r in res.bridges.collect()}
    assert got == set(pairs)
    assert res.nontree_edges == 0


def test_cycle_has_no_bridges(spark):
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    res = bridges(_edges(spark, pairs))
    assert res.bridges.count() == 0


def test_barbell_bridge_only(spark):
    # two triangles joined by one edge: only the joining edge is a bridge
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    res = bridges(_edges(spark, pairs))
    got = {(r.src, r.dst) for r in res.bridges.collect()}
    assert got == {(2, 3)}


def test_multiple_components_and_direction_ignored(spark):
    # component A: square with a pendant; component B: single edge
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 10), (20, 21)]
    # feed reversed/duplicated rows: canonicalization must dedup
    noisy = pairs + [(b, a) for a, b in pairs]
    res = bridges(_edges(spark, noisy))
    got = {(r.src, r.dst) for r in res.bridges.collect()}
    assert got == {(2, 10), (20, 21)}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_bruteforce(spark, seed):
    rng = random.Random(seed)
    n = 14
    pairs = []
    # random sparse graph: ~1.3 edges per node leaves plenty of bridges
    for _ in range(18):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.append((a, b))
    want = _brute_bridges(pairs)
    res = bridges(_edges(spark, pairs))
    got = {(r.src, r.dst) for r in res.bridges.collect()}
    assert got == want


def test_articulation_points_golden_and_brute(spark):
    # barbell: node 2 and 3 are cut vertices
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    got = {r.id for r in articulation_points(_edges(spark, pairs)).collect()}
    assert got == {2, 3}
    assert got == _brute_articulation(pairs)


@pytest.mark.parametrize("seed", [4, 5])
def test_articulation_random_match_bruteforce(spark, seed):
    rng = random.Random(seed)
    pairs = []
    for _ in range(20):
        a, b = rng.randrange(12), rng.randrange(12)
        if a != b:
            pairs.append((a, b))
    got = {r.id for r in articulation_points(_edges(spark, pairs)).collect()}
    assert got == _brute_articulation(pairs)


def test_articulation_gate_raises(spark):
    # the size gate now guards only the driver-DFS path; the default
    # (Tarjan–Vishkin) is distributed and ungated
    e = _edges(spark, [(0, 1), (1, 2)])
    with pytest.raises(ValueError, match="local_threshold"):
        articulation_points(e, method="local", local_threshold=1)
    got = sorted(r["id"] for r in articulation_points(e, local_threshold=1).collect())
    assert got == [1]


def test_duckdb_twins_match_engine(spark):
    import duckdb

    from linkgraph.bridges import articulation_points_sql, bridges_sql

    rng = random.Random(11)
    pairs = [(rng.randrange(10), rng.randrange(10)) for _ in range(16)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    con = duckdb.connect()
    con.register("edges_tbl", e.toPandas())
    sql_edges = "SELECT src, dst FROM edges_tbl"
    want_b = {tuple(r) for r in con.execute(bridges_sql(sql_edges)).fetchall()}
    got_b = {(r.src, r.dst) for r in bridges(e).bridges.collect()}
    assert got_b == want_b == _brute_bridges(pairs)
    want_a = {r[0] for r in con.execute(articulation_points_sql(sql_edges)).fetchall()}
    got_a = {r.id for r in articulation_points(e).collect()}
    assert got_a == want_a == _brute_articulation(pairs)


def test_articulation_tv_matches_local_tarjan(spark):
    """The distributed Tarjan–Vishkin path must agree with the exact
    driver Tarjan DFS on random graphs across densities — trees,
    sparse (bridge-heavy), and dense (cross-edge-heavy) regimes, plus
    multi-component inputs."""
    import random

    from linkgraph.bridges import articulation_points

    rng = random.Random(71)
    cases = []
    for n, m in [(10, 9), (12, 16), (12, 30), (9, 20), (14, 14)]:
        pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        cases.append([(a, b) for a, b in pairs if a != b])
    cases.append([(i, i + 1) for i in range(8)] + [(20, 21), (21, 22), (20, 22)])
    for pairs in cases:
        if not pairs:
            continue
        e = spark.createDataFrame(pairs, "src long, dst long")
        tv = sorted(r["id"] for r in articulation_points(e, method="tv").collect())
        loc = sorted(
            r["id"] for r in articulation_points(e, method="local").collect()
        )
        assert tv == loc, (pairs, tv, loc)


def test_articulation_tv_default_no_size_gate(spark):
    """method='tv' is the default and must not raise on inputs above
    the local gate; method='local' keeps the gated contract."""
    import pytest

    from linkgraph.bridges import articulation_points

    e = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    got = sorted(r["id"] for r in articulation_points(e).collect())
    assert got == list(range(1, 40))
    with pytest.raises(ValueError, match="exceeds local_threshold"):
        articulation_points(e, method="local", local_threshold=10)
