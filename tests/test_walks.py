"""Deterministic random-walk tests: python replay oracle, dead-end
termination, seed independence, sequence assembly, cache release."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from linkgraph.checkpoint import release_caches
from linkgraph.walks import random_walks, walks_as_sequences


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _h(start, walk_no, step, dst, seed):
    s = f"{start}|{walk_no}|{step}|{dst}#{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(pairs, walk_length, walks_per_node, seed, direction="OUTGOING"):
    adj: dict[int, set[int]] = {}
    es = set()
    for a, b in pairs:
        es.add((a, b))
        if direction == "BOTH":
            es.add((b, a))
    if direction == "INCOMING":
        es = {(b, a) for a, b in pairs}
    nodes = {x for e in es for x in e}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    rows = set()
    for n in sorted(nodes):
        for w in range(walks_per_node):
            cur = n
            rows.add((n, w, 0, n))
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs, key=lambda d: (_h(n, w, t, d, seed), d))
                rows.add((n, w, t, cur))
    return rows


def test_python_replay_oracle(spark):
    rng = random.Random(11)
    pairs = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    for direction in ("OUTGOING", "BOTH"):
        res = random_walks(
            _edges(spark, pairs), walk_length=5, walks_per_node=2, seed=3,
            direction=direction,
        )
        got = {(r.start, r.walk_no, r.step, r.node) for r in res.collect()}
        assert got == _replay(pairs, 5, 2, 3, direction)
        release_caches(res)


def test_dead_end_stops_walk(spark):
    e = _edges(spark, [(1, 2), (2, 3)])  # 3 is a sink
    res = random_walks(e, walk_length=5)
    rows = {(r.start, r.step): r.node for r in res.collect()}
    assert rows[(1, 0)] == 1 and rows[(1, 1)] == 2 and rows[(1, 2)] == 3
    assert (1, 3) not in rows  # stopped at the sink
    assert (3, 1) not in rows  # sink's own walk is just step 0
    release_caches(res)


def test_seed_changes_walks_same_seed_repeats(spark):
    rng = random.Random(5)
    pairs = [(a, b) for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(80)} if a != b]
    e = _edges(spark, pairs)
    r1 = random_walks(e, walk_length=6, seed=0)
    r2 = random_walks(e, walk_length=6, seed=0)
    r3 = random_walks(e, walk_length=6, seed=1)
    s1 = {tuple(r) for r in r1.collect()}
    s2 = {tuple(r) for r in r2.collect()}
    s3 = {tuple(r) for r in r3.collect()}
    assert s1 == s2
    assert s1 != s3  # a different family (overwhelmingly likely)
    for r in (r1, r2, r3):
        release_caches(r)


def test_walks_as_sequences(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    res = random_walks(e, walk_length=5)
    seqs = {(r.start, r.walk_no): (r.length, r.sequence)
            for r in walks_as_sequences(res).collect()}
    assert seqs[(1, 0)] == (3, "1 2 3")
    assert seqs[(3, 0)] == (1, "3")
    release_caches(res)


def test_walks_per_node_and_args(spark):
    e = _edges(spark, [(1, 2), (2, 1)])
    res = random_walks(e, walk_length=2, walks_per_node=3)
    assert res.filter((F.col("start") == 1) & (F.col("step") == 0)).count() == 3
    release_caches(res)
    with pytest.raises(ValueError):
        random_walks(e, walk_length=-1)
    with pytest.raises(ValueError):
        random_walks(e, walk_length=1, walks_per_node=0)
    with pytest.raises(ValueError):
        random_walks(e, walk_length=1, direction="UP")


def test_duckdb_sql_twin(spark):
    """random_walks_sql replays the engine exactly (the driver-oracle
    contract, pinned here on a random graph)."""
    import duckdb

    from linkgraph.walks import random_walks_sql

    rng = random.Random(23)
    pairs = [(a, b) for a, b in {(rng.randrange(12), rng.randrange(12)) for _ in range(40)} if a != b]
    res = random_walks(_edges(spark, pairs), walk_length=4, walks_per_node=2, seed=7,
                       direction="BOTH")
    got = {(r.start, r.walk_no, r.step, r.node) for r in res.collect()}
    release_caches(res)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = random_walks_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 4, 2, 7, "BOTH"
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def _replay_n2v(pairs, L, p, q, wpn, seed, direction="OUTGOING"):
    es = set()
    for a, b in pairs:
        es.add((a, b))
        if direction == "BOTH":
            es.add((b, a))
    if direction == "INCOMING":
        es = {(b, a) for a, b in pairs}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    nodes = {x for e in es for x in e}
    rows = set()
    U53 = 1 << 53
    for n in sorted(nodes):
        for w in range(wpn):
            rows.add((n, w, 0, n))
            nbrs = adj.get(n)
            if not nbrs or L < 1:
                continue
            cur = min(nbrs, key=lambda d: (_h(n, w, 1, d, seed), d))
            prev = n
            rows.add((n, w, 1, cur))
            for t in range(2, L + 1):
                cands = sorted(adj.get(cur, ()))
                if not cands:
                    break
                cum, cums = 0.0, []
                for d in cands:
                    if d == prev:
                        a = 1.0 / p
                    elif d in adj.get(prev, ()):
                        a = 1.0
                    else:
                        a = 1.0 / q
                    cum += a
                    cums.append(cum)
                hs = f"n2v|{n}|{w}|{t}#{seed}"
                import hashlib as _hl
                h = int(_hl.md5(hs.encode()).hexdigest()[:15], 16)
                th = ((h % U53) / U53) * cums[-1]
                nxt = next(d for d, c in zip(cands, cums) if c >= th)
                prev, cur = cur, nxt
                rows.add((n, w, t, cur))
    return rows


def test_node2vec_python_replay(spark):
    from linkgraph.walks import node2vec_walks

    rng = random.Random(31)
    pairs = [(a, b) for a, b in {(rng.randrange(18), rng.randrange(18)) for _ in range(70)} if a != b]
    for p, q, direction in [(2.0, 0.5, "OUTGOING"), (1.0, 1.0, "BOTH"), (3.0, 0.7, "BOTH")]:
        res = node2vec_walks(
            _edges(spark, pairs), walk_length=5, p=p, q=q, walks_per_node=2,
            seed=9, direction=direction,
        )
        got = {(r.start, r.walk_no, r.step, r.node) for r in res.collect()}
        assert got == _replay_n2v(pairs, 5, p, q, 2, 9, direction), (p, q, direction)
        release_caches(res)


def test_node2vec_duckdb_twin(spark):
    import duckdb

    from linkgraph.walks import node2vec_walks, node2vec_walks_sql

    rng = random.Random(41)
    pairs = [(a, b) for a, b in {(rng.randrange(14), rng.randrange(14)) for _ in range(50)} if a != b]
    res = node2vec_walks(
        _edges(spark, pairs), walk_length=4, p=3.0, q=0.7, walks_per_node=2,
        seed=5, direction="BOTH",
    )
    got = {(r.start, r.walk_no, r.step, r.node) for r in res.collect()}
    release_caches(res)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = node2vec_walks_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 4, p=3.0, q=0.7,
        walks_per_node=2, seed=5, direction="BOTH",
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_node2vec_bias_direction(spark):
    """On a path A-B with a triangle hanging off B, tiny q (DFS-ish)
    must explore outward while huge p forbids returning."""
    from linkgraph.walks import node2vec_walks

    # star: 1 -- 2 -- {3, 4}; 3 -- 4 (triangle 2,3,4)
    pairs = [(1, 2), (2, 3), (2, 4), (3, 4)]
    res = node2vec_walks(
        _edges(spark, pairs), walk_length=2, p=1e9, q=1e-9, direction="BOTH",
    )
    rows = {(r.start, r.step): r.node for r in res.collect()}
    # from 1: step1 -> 2 (only nbr); step2: return weight ~0, distance-2
    # nodes 3,4 get weight 1/q >> 1 -> never returns to 1
    assert rows[(1, 1)] == 2 and rows[(1, 2)] in (3, 4)
    release_caches(res)
    with pytest.raises(ValueError):
        node2vec_walks(_edges(spark, pairs), walk_length=1, p=0.0)


def test_weighted_walks_python_replay_and_twin(spark):
    import duckdb

    from linkgraph.walks import weighted_walks, weighted_walks_sql

    rng = random.Random(53)
    triples = [(a, b, float(rng.randrange(1, 6)))
               for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(60)}
               if a != b]
    e = spark.createDataFrame(triples, "src long, dst long, weight double")
    res = weighted_walks(e, walk_length=5, walks_per_node=2, seed=11)
    got = {(r.start, r.walk_no, r.step, r.node) for r in res.collect()}
    release_caches(res)

    # python replay (same prefix-sum + exact-double uniform)
    adj: dict[int, list[tuple[int, float]]] = {}
    for a, b, w in triples:
        adj.setdefault(a, []).append((b, w))
    nodes = {x for a, b, _ in triples for x in (a, b)}
    U53 = 1 << 53
    want = set()
    for n in sorted(nodes):
        for wk in range(2):
            cur = n
            want.add((n, wk, 0, n))
            for t in range(1, 6):
                cands = sorted(adj.get(cur, ()))
                if not cands:
                    break
                cum, cums = 0.0, []
                for d, wt in cands:
                    cum += wt
                    cums.append((d, cum))
                hs = f"ww|{n}|{wk}|{t}#11"
                h = int(hashlib.md5(hs.encode()).hexdigest()[:15], 16)
                th = ((h % U53) / U53) * cums[-1][1]
                cur = next(d for d, c in cums if c >= th)
                want.add((n, wk, t, cur))
    assert got == want

    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, {w!r})" for a, b, w in triples)
    sql = weighted_walks_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)", 5,
        walks_per_node=2, seed=11,
    )
    assert got == {tuple(r) for r in con.execute(sql).fetchall()}


def test_weighted_walks_bias(spark):
    """A 1000:1 weight split must essentially always take the heavy
    edge (checked over many independent walk draws)."""
    from linkgraph.walks import weighted_walks

    e = spark.createDataFrame(
        [(1, 2, 1000.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, weight double",
    )
    res = weighted_walks(e, walk_length=1, walks_per_node=40, seed=0)
    picks = [r.node for r in res.collect() if r.start == 1 and r.step == 1]
    assert len(picks) == 40
    assert picks.count(2) >= 38  # ~1/1001 chance per draw to pick 3
    release_caches(res)
