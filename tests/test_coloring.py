"""Luby MIS + Jones-Plassmann tests: structural invariants
(independence/maximality/properness), python priority replay, DuckDB
oracle twins, determinism, input hygiene."""

import hashlib
import random

from linkgraph.coloring import (
    jones_plassmann,
    jones_plassmann_sql,
    luby_mis,
    luby_mis_sql,
)

BARBELL = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _und(pairs):
    return {tuple(sorted(p)) for p in pairs if p[0] != p[1]}


def _pri(n, seed):
    return int(hashlib.md5(f"{n}#{seed}".encode()).hexdigest()[:15], 16)


def _py_luby(pairs, seed):
    und = _und(pairs)
    nbrs = {}
    nodes = {a for p in pairs for a in p}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    active = set(nodes)
    out = {}
    r = 0
    while active:
        r += 1
        win = {
            v for v in active
            if all((_pri(v, seed), v) > (_pri(u, seed), u)
                   for u in nbrs.get(v, ()) if u in active)
        }
        lose = {u for v in win for u in nbrs.get(v, ()) if u in active} - win
        for v in win:
            out[v] = (True, r)
        for v in lose:
            out[v] = (False, r)
        active -= win | lose
    return out


def _py_jp(pairs, seed):
    und = _und(pairs)
    nbrs = {}
    nodes = {a for p in pairs for a in p}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    active = set(nodes)
    color = {}
    rnd = {}
    r = 0
    while active:
        r += 1
        win = {
            v for v in active
            if all((_pri(v, seed), v) > (_pri(u, seed), u)
                   for u in nbrs.get(v, ()) if u in active)
        }
        for v in win:
            used = {color[u] for u in nbrs.get(v, ()) if u in color}
            k = 0
            while k in used:
                k += 1
            color[v], rnd[v] = k, r
        active -= win
    return {v: (color[v], rnd[v]) for v in color}


def test_luby_matches_python_replay_and_invariants(spark):
    rng = random.Random(107)
    pairs = [(a, b) for a, b in
             {(rng.randrange(30), rng.randrange(30)) for _ in range(120)} if a != b]
    res = luby_mis(_edges(spark, pairs), seed=7)
    got = {r["id"]: (r["in_mis"], r["round"]) for r in res.assignment.collect()}
    res.release()
    assert got == _py_luby(pairs, 7)
    mis = {v for v, (m, _r) in got.items() if m}
    und = _und(pairs)
    assert not any((a in mis and b in mis) for a, b in und)  # independent
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    assert all(v in mis or (nbrs.get(v, set()) & mis)
               for v in got)  # maximal


def test_jp_matches_python_replay_and_is_proper(spark):
    rng = random.Random(109)
    pairs = [(a, b) for a, b in
             {(rng.randrange(25), rng.randrange(25)) for _ in range(110)} if a != b]
    res = jones_plassmann(_edges(spark, pairs), seed=11)
    got = {r["id"]: (r["color"], r["round"]) for r in res.assignment.collect()}
    res.release()
    assert got == _py_jp(pairs, 11)
    for a, b in _und(pairs):
        assert got[a][0] != got[b][0]
    assert res.n_colors == len({c for c, _ in got.values()})


def test_luby_duckdb_twin(spark):
    import duckdb

    rng = random.Random(113)
    pairs = [(a, b) for a, b in
             {(rng.randrange(18), rng.randrange(18)) for _ in range(70)} if a != b]
    res = luby_mis(_edges(spark, pairs), seed=3)
    got = sorted(map(tuple, res.assignment.collect()))
    rounds = res.rounds
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        luby_mis_sql(_values_sql(pairs), 3, rounds + 2)
    ).fetchall()))
    assert got == want


def test_jp_duckdb_twin(spark):
    import duckdb

    rng = random.Random(127)
    pairs = [(a, b) for a, b in
             {(rng.randrange(16), rng.randrange(16)) for _ in range(60)} if a != b]
    res = jones_plassmann(_edges(spark, pairs), seed=5)
    got = sorted(map(tuple, res.assignment.collect()))
    rounds = res.rounds
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        jones_plassmann_sql(_values_sql(pairs), 5, rounds + 2)
    ).fetchall()))
    assert got == want


def test_coloring_ignores_loops_duplicates_direction(spark):
    noisy = BARBELL + [(2, 1), (3, 3), (6, 4), (1, 2)]
    for fn in (luby_mis, jones_plassmann):
        r1 = fn(_edges(spark, BARBELL), seed=1)
        r2 = fn(_edges(spark, noisy), seed=1)
        a1 = sorted(map(tuple, r1.assignment.collect()))
        a2 = sorted(map(tuple, r2.assignment.collect()))
        r1.release()
        r2.release()
        assert a1 == a2, fn.__name__


def test_coloring_empty_graph_raises(spark):
    import pytest

    empty = spark.createDataFrame([], "src long, dst long, weight double")
    with pytest.raises(ValueError, match="empty graph"):
        luby_mis(empty)
    with pytest.raises(ValueError, match="empty graph"):
        jones_plassmann(empty)


def test_jp_triangle_uses_three_colors_and_star_two(spark):
    res = jones_plassmann(_edges(spark, [(1, 2), (2, 3), (1, 3)]), seed=2)
    assert res.n_colors == 3
    res.release()
    star = [(0, i) for i in range(1, 9)]
    res2 = jones_plassmann(_edges(spark, star), seed=2)
    got = {r["id"]: r["color"] for r in res2.assignment.collect()}
    res2.release()
    assert res2.n_colors == 2
    assert len({got[i] for i in range(1, 9)}) == 1 and got[0] != got[1]
