"""Degree assortativity + deterministic graph sampling."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph.graphs import (
    degree_assortativity,
    induced_subgraph,
    induced_subgraph_sql,
    sample_edges,
    sample_edges_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _assort_py(pairs):
    es = set()
    for a, b in pairs:
        es.add((a, b))
        es.add((b, a))
    deg = {}
    for a, _ in es:
        deg[a] = deg.get(a, 0) + 1
    n = len(es)
    sx = sum(deg[a] for a, _ in es)
    sxy = sum(deg[a] * deg[b] for a, b in es)
    sxx = sum(deg[a] * deg[a] for a, _ in es)
    den = n * sxx - sx * sx
    return round((n * sxy - sx * sx) / den, 6) if den > 0 else 0.0


def test_assortativity_star_is_negative(spark):
    # star: hub degree 4, leaves degree 1 -> strongly disassortative
    res = degree_assortativity(_edges(spark, [(0, i) for i in range(1, 5)])).collect()
    assert res[0].n_endpoints == 8
    assert res[0].assortativity == -1.0


def test_assortativity_regular_graph_degenerate(spark):
    # 4-cycle: every degree 2 -> zero variance -> defined as 0
    res = degree_assortativity(_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])).collect()
    assert res[0].assortativity == 0.0


def test_assortativity_random_python_oracle(spark):
    rng = random.Random(43)
    pairs = [(a, b) for a, b in {(rng.randrange(20), rng.randrange(20)) for _ in range(60)} if a != b]
    got = degree_assortativity(_edges(spark, pairs)).collect()[0]
    assert got.assortativity == pytest.approx(_assort_py(pairs), abs=2e-6)


def test_sample_edges_deterministic_and_twin(spark):
    import duckdb

    rng = random.Random(3)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(300)]
    e = _edges(spark, pairs)
    s1 = {tuple(r) for r in sample_edges(e, 0.3, seed=1).collect()}
    s2 = {tuple(r) for r in sample_edges(e, 0.3, seed=1).collect()}
    assert s1 == s2
    assert 0 < len(s1) < len(pairs)
    # repartitioning must not change the sample
    s3 = {tuple(r) for r in sample_edges(e.repartition(7), 0.3, seed=1).collect()}
    assert s1 == s3
    con = duckdb.connect()
    con.register("edges", e.toPandas())
    want = {tuple(r) for r in
            con.execute(sample_edges_sql("SELECT * FROM edges", 0.3, seed=1)).fetchall()}
    assert s1 == want
    with pytest.raises(ValueError):
        sample_edges(e, 1.5)


def test_induced_subgraph_closed_and_twin(spark):
    import duckdb

    rng = random.Random(9)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    e = _edges(spark, pairs)
    sub = induced_subgraph(e, 0.6, seed=2)
    rows = sub.collect()
    kept_nodes = {r.src for r in rows} | {r.dst for r in rows}
    # closure: every edge of the original graph between kept nodes is kept
    full = {(r.src, r.dst) for r in e.collect()}
    got = {(r.src, r.dst) for r in rows}
    for a, b in full:
        if a in kept_nodes and b in kept_nodes:
            assert (a, b) in got
    con = duckdb.connect()
    con.register("edges", e.toPandas())
    want = {tuple(r) for r in
            con.execute(induced_subgraph_sql("SELECT * FROM edges", 0.6, seed=2)).fetchall()}
    assert {tuple(r) for r in rows} == want
    with pytest.raises(ValueError):
        induced_subgraph(e, -0.1)


def test_degree_centrality_contract(spark):
    from linkgraph.graphs import degree_centrality

    e = spark.createDataFrame(
        [(1, 2, 2.5), (1, 2, 1.0), (2, 3, 4.0), (3, 1, 0.5)],
        "src long, dst long, weight double",
    )
    out = {r.id: r.degree for r in degree_centrality(e, "OUTGOING").collect()}
    assert out == {1: 2, 2: 1, 3: 1}  # parallel edges counted
    inn = {r.id: r.degree for r in degree_centrality(e, "INCOMING").collect()}
    assert inn == {1: 1, 2: 2, 3: 1}
    both = {
        r.id: (r.degree, r.weighted_degree)
        for r in degree_centrality(e, "BOTH", weighted=True).collect()
    }
    assert both[1] == (3, 4.0)   # out 2.5+1.0, in 0.5
    assert both[2] == (3, 7.5)   # in 2.5+1.0, out 4.0
    assert both[3] == (2, 4.5)
    import pytest as _pt
    with _pt.raises(ValueError, match="direction"):
        degree_centrality(e, "NOPE")


def test_degree_centrality_duckdb_twin(spark):
    import random

    import duckdb

    from linkgraph.graphs import degree_centrality, degree_centrality_sql

    rng = random.Random(97)
    t = [
        (rng.randrange(9), rng.randrange(9), rng.randrange(1, 20) / 4.0)
        for _ in range(50)
    ]
    e = spark.createDataFrame(t, "src long, dst long, weight double")
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in t)
    edge_sql = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    con = duckdb.connect()
    for d in ("OUTGOING", "INCOMING", "BOTH"):
        got = {tuple(r) for r in degree_centrality(e, d, weighted=True).collect()}
        want = {tuple(r) for r in con.execute(
            degree_centrality_sql(edge_sql, d, weighted=True)).fetchall()}
        assert got == want, d


def test_degree_centrality_weightless_frame(spark):
    from linkgraph.graphs import degree_centrality

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r.id: r.degree for r in degree_centrality(e, "BOTH").collect()}
    assert got == {1: 1, 2: 2, 3: 1}
    # weighted=True on a weightless frame: default weight 1.0
    w = {r.id: r.weighted_degree for r in
         degree_centrality(e, "BOTH", weighted=True).collect()}
    assert w == {1: 1.0, 2: 2.0, 3: 1.0}


def _richclub_py(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in range(max(deg.values())):
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in es if a in rich and b in rich)
        nk = len(rich)
        phi = (2.0 * ek) / (nk * (nk - 1)) if nk > 1 else 0.0
        out[k] = (nk, ek, round(phi, 6))
    return out


def test_richclub_random_python_oracle(spark):
    from linkgraph.graphs import rich_club_coefficients

    rng = random.Random(17)
    pairs = [(a, b) for a, b in {(rng.randrange(25), rng.randrange(25)) for _ in range(120)} if a != b]
    got = {r.k: (r.n_nodes, r.n_edges, r.phi) for r in rich_club_coefficients(_edges(spark, pairs)).collect()}
    assert got == _richclub_py(pairs)


def test_richclub_star_vs_clique(spark):
    from linkgraph.graphs import rich_club_coefficients

    # clique on 4: every node degree 3, phi(k)=1 for k<3
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r.k: r.phi for r in rich_club_coefficients(_edges(spark, clique)).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0}
    # star: hub degree 5, leaves degree 1 — no edges among deg>1 nodes
    star = [(0, i) for i in range(1, 6)]
    got = {r.k: (r.n_nodes, r.n_edges, r.phi) for r in rich_club_coefficients(_edges(spark, star)).collect()}
    assert got[1] == (1, 0, 0.0)  # only the hub survives k=1, no club
    assert got[0][2] == round(2 * 5 / (6 * 5), 6)  # phi is rounded to 6


def test_richclub_duckdb_twin(spark):
    import duckdb

    from linkgraph.graphs import RICH_CLUB_SQL_TEMPLATE, rich_club_coefficients

    rng = random.Random(19)
    pairs = [(a, b) for a, b in {(rng.randrange(20), rng.randrange(20)) for _ in range(90)} if a != b]
    got = {tuple(r) for r in rich_club_coefficients(_edges(spark, pairs)).collect()}
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = RICH_CLUB_SQL_TEMPLATE.format(edges=f"SELECT * FROM (VALUES {vals}) AS t(src, dst)")
    want = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == want


def test_reciprocity_contract(spark):
    from linkgraph.graphs import reciprocity

    # 1<->2 mutual, 1->3 and 4->1 one-way, self-loop dropped,
    # parallel duplicate collapsed
    e = _edges(spark, [(1, 2), (2, 1), (1, 3), (4, 1), (5, 5), (1, 3)])
    row = reciprocity(e).first()
    assert (row.n_edges, row.n_reciprocal) == (4, 2)
    assert row.reciprocity == 0.5

    # fully mutual triangle
    full = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)])
    assert reciprocity(full).first().reciprocity == 1.0

    # empty after self-loop filter -> 0.0, no divide-by-zero
    empty = _edges(spark, [(7, 7)])
    row = reciprocity(empty).first()
    assert (row.n_edges, row.n_reciprocal, row.reciprocity) == (0, 0, 0.0)


def test_reciprocity_duckdb_twin(spark):
    import duckdb

    from linkgraph.graphs import RECIPROCITY_SQL_TEMPLATE, reciprocity

    rng = random.Random(23)
    pairs = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
    got = tuple(reciprocity(_edges(spark, pairs)).first())
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = RECIPROCITY_SQL_TEMPLATE.format(edges=f"SELECT * FROM (VALUES {vals}) AS t(src, dst)")
    want = duckdb.connect().execute(sql).fetchone()
    assert got == tuple(want)


def test_graphlet_counts_golden(spark):
    import duckdb

    from linkgraph.graphs import GRAPHLET_COUNTS_SQL_TEMPLATE, graphlet_counts

    # K4 on 1-4 (4 tri, 3 chorded C4s, 1 K4), a pure C4 ring 5-8,
    # a pendant (wedge mass only), duplicate + reversed + loop edges
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (5, 6), (6, 7), (7, 8), (8, 5), (1, 9),
             (2, 1), (3, 3), (1, 2)]
    sql = ("SELECT * FROM (VALUES "
           + ", ".join(f"({a}, {b})" for a, b in edges) + ") t(src, dst)")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = tuple(graphlet_counts(e).collect()[0])
    assert got == (19, 4, 4, 1)
    want = duckdb.sql(GRAPHLET_COUNTS_SQL_TEMPLATE.format(edges=sql)).fetchall()[0]
    assert got == want


def test_graphlet_counts_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    from linkgraph.graphs import graphlet_counts

    assert tuple(graphlet_counts(e).collect()[0]) == (0, 0, 0, 0)


def test_attr_assortativity_extremes_and_twin(spark):
    """Newman categorical assortativity: +1 on label-pure components,
    -1 on a 2-label bipartite graph, 0 convention when a single label
    makes the coefficient undefined; DuckDB twin value-exact on a
    mixed fixture."""
    import duckdb

    from linkgraph.graphs import attr_assortativity, attr_assortativity_sql

    def run(pairs, labels):
        e = spark.createDataFrame(pairs, "src long, dst long")
        l = spark.createDataFrame(labels, "id long, label long")
        return attr_assortativity(e, l).collect()[0]

    # two same-label triangles -> perfectly assortative
    r = run(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)],
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)],
    )
    assert r["assortativity"] == 1.0
    # complete bipartite across two labels -> perfectly disassortative
    r = run(
        [(1, 4), (1, 5), (2, 4), (2, 5), (3, 4), (3, 5)],
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)],
    )
    assert r["assortativity"] == -1.0
    # single label: undefined -> 0 by convention
    r = run([(1, 2), (2, 3)], [(1, 7), (2, 7), (3, 7)])
    assert r["assortativity"] == 0.0

    # mixed random fixture: twin value-exact
    import random

    rng = random.Random(3)
    pairs = sorted({(rng.randrange(10), rng.randrange(10)) for _ in range(20)})
    pairs = [(a, b) for a, b in pairs if a != b]
    labels = [(i, i % 3) for i in range(10)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    l = spark.createDataFrame(labels, "id long, label long")
    got = sorted(map(tuple, attr_assortativity(e, l).collect()))
    con = duckdb.connect()
    ev = ", ".join(f"({a}, {b})" for a, b in pairs)
    lv = ", ".join(f"({i}, {g})" for i, g in labels)
    sql = attr_assortativity_sql(
        f"SELECT * FROM (VALUES {ev}) t(src, dst)",
        f"SELECT * FROM (VALUES {lv}) t(id, label)",
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
