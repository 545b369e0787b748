"""Directed triad census tests: hand goldens, networkx parity (the
naming-convention pin), the independent brute-SQL twin, and totals."""

import random

import pytest

from linkgraph.triads import TRIAD_NAMES, triad_census, triad_census_sql


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _counts(df):
    return {r["triad_type"]: r["count"] for r in df.collect()}


def test_hand_goldens(spark):
    # 3-cycle
    got = _counts(triad_census(_edges(spark, [(0, 1), (1, 2), (2, 0)])))
    assert got["030C"] == 1 and sum(got.values()) == 1
    # transitive triangle
    got = _counts(triad_census(_edges(spark, [(0, 1), (0, 2), (1, 2)])))
    assert got["030T"] == 1
    # complete mutual
    got = _counts(
        triad_census(_edges(spark, [(0, 1), (1, 0), (0, 2), (2, 0),
                                    (1, 2), (2, 1)]))
    )
    assert got["300"] == 1
    # out-star (021D) and in-star (021U) and chain (021C)
    assert _counts(triad_census(_edges(spark, [(0, 1), (0, 2)])))["021D"] == 1
    assert _counts(triad_census(_edges(spark, [(1, 0), (2, 0)])))["021U"] == 1
    assert _counts(triad_census(_edges(spark, [(0, 1), (1, 2)])))["021C"] == 1


def test_empty_pairs_class(spark):
    # a single arc among 4 nodes: C(4,3)=4 triples; 2 hold the arc
    # (012), 2 are empty... the arc (0,1) is in triples {0,1,2} and
    # {0,1,3}; {0,2,3} and {1,2,3} hold no pair -> 003
    got = _counts(triad_census(_edges(spark, [(0, 1), (2, 3)])))
    assert sum(got.values()) == 4
    assert got["012"] == 4  # every triple holds exactly one arc here
    got2 = _counts(triad_census(_edges(spark, [(0, 1), (0, 2), (3, 4)])))
    assert sum(got2.values()) == 10 and got2["003"] > 0


@pytest.mark.parametrize("seed", [5, 13, 21])
def test_networkx_parity(spark, seed):
    nx = pytest.importorskip("networkx")
    rng = random.Random(seed)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(40)} if p[0] != p[1]]
    got = _counts(triad_census(_edges(spark, pairs)))
    G = nx.DiGraph()
    G.add_edges_from(pairs)
    want = nx.triadic_census(G)
    assert got == {k: want.get(k, 0) for k in TRIAD_NAMES}


def test_duckdb_twin_independent_derivation(spark):
    import duckdb

    rng = random.Random(9)
    pairs = [p for p in {(rng.randrange(10), rng.randrange(10))
                         for _ in range(30)} if p[0] != p[1]]
    got = _counts(triad_census(_edges(spark, pairs)))
    duck = dict(duckdb.connect().execute(
        triad_census_sql(_values_sql(pairs))
    ).fetchall())
    assert got == duck


def test_total_is_n_choose_3(spark):
    rng = random.Random(2)
    pairs = [p for p in {(rng.randrange(9), rng.randrange(9))
                         for _ in range(26)} if p[0] != p[1]]
    n = len({x for p in pairs for x in p})
    got = _counts(triad_census(_edges(spark, pairs)))
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
    assert set(got) == set(TRIAD_NAMES)
