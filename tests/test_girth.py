"""Girth tests: cycle goldens (odd exact), the Itai-Rodeh [g, g+1]
interval on random graphs, acyclic None, sampled upper bound, the
DuckDB twin, validation."""

import collections
import random

import pytest

from linkgraph.girth import girth, girth_sql


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _brute_girth(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    best = None
    for a, b in und:
        dq = collections.deque([(a, 0)])
        seen = {a}
        while dq:
            u, d = dq.popleft()
            if u == b:
                best = min(best or 10 ** 9, d + 1)
                break
            for v in adj[u]:
                if v in seen or (u, v) in ((a, b), (b, a)):
                    continue
                seen.add(v)
                dq.append((v, d + 1))
    return best


@pytest.mark.parametrize("n,exact", [(3, True), (5, True), (7, True),
                                     (4, False), (6, False)])
def test_pure_cycles(spark, n, exact):
    pairs = [(i, (i + 1) % n) for i in range(n)]
    res = girth(_edges(spark, pairs), max_hops=6)
    if exact:  # odd girth is exact per Itai-Rodeh
        assert res.girth_upper == n
    else:
        assert n <= res.girth_upper <= n + 1
    res.release()


def test_acyclic_none(spark):
    res = girth(_edges(spark, [(0, 1), (1, 2), (2, 3), (1, 4)]), max_hops=6)
    assert res.girth_upper is None
    assert res.witnesses.count() == 0
    res.release()


@pytest.mark.parametrize("seed", range(5))
def test_random_interval(spark, seed):
    rng = random.Random(seed)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(28)} if p[0] != p[1]]
    res = girth(_edges(spark, pairs), max_hops=8)
    bg = _brute_girth(pairs)
    if bg is None:
        assert res.girth_upper is None
    else:
        assert bg <= res.girth_upper <= bg + 1
    res.release()


def test_sampled_is_upper_bound(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
    full = girth(_edges(spark, pairs), max_hops=6)
    samp = girth(_edges(spark, pairs), sources=[4], max_hops=6)
    assert full.girth_upper == 3
    assert samp.girth_upper >= full.girth_upper
    full.release()
    samp.release()


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(77)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(30)} if p[0] != p[1]]
    res = girth(_edges(spark, pairs), max_hops=6)
    got = sorted(tuple(r) for r in res.witnesses.collect())
    res.release()
    duck = duckdb.connect().execute(
        girth_sql(_values_sql(pairs), max_hops=6)
    ).fetchall()
    assert got == sorted(duck)


def test_validates(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="max_hops"):
        girth(e, max_hops=0)
    with pytest.raises(ValueError, match="distinct"):
        girth(e, sources=[0, 0])
