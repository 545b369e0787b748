"""Eigenvector centrality: numpy replay, decay/normalization
contracts, DuckDB twin, resume-equals-uninterrupted."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph.checkpoint import release_caches
from linkgraph.eigenvector import eigenvector_centrality, eigenvector_sql


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _replay(pairs, iters, direction="OUTGOING"):
    es = set()
    for a, b in pairs:
        es.add((a, b))
        if direction == "BOTH":
            es.add((b, a))
    if direction == "INCOMING":
        es = {(b, a) for a, b in pairs}
    nodes = sorted({x for e in es for x in e})
    x = {n: 1.0 for n in nodes}
    for _ in range(iters):
        nx = {n: 0.0 for n in nodes}
        for a, b in es:
            nx[b] += x[a]
        mx = max(nx.values())
        x = {n: (v / mx if mx > 0 else 0.0) for n, v in nx.items()}
    return x


def test_numpy_style_replay(spark):
    rng = random.Random(13)
    pairs = [(a, b) for a, b in {(rng.randrange(20), rng.randrange(20)) for _ in range(70)} if a != b]
    for direction in ("OUTGOING", "BOTH"):
        res = eigenvector_centrality(_edges(spark, pairs), max_iter=6, direction=direction)
        got = {r.id: r.score for r in res.collect()}
        want = _replay(pairs, 6, direction)
        assert set(got) == set(want)
        for n in want:
            assert got[n] == pytest.approx(want[n], abs=1e-9), (direction, n)
        release_caches(res)


def test_star_center_dominates(spark):
    e = _edges(spark, [(1, 9), (2, 9), (3, 9), (9, 4)])
    res = eigenvector_centrality(e, max_iter=4, direction="BOTH")
    got = {r.id: r.score for r in res.collect()}
    assert got[9] == max(got.values()) == 1.0
    release_caches(res)


def test_source_decays_to_zero(spark):
    # directed chain 1 -> 2 -> 3: node 1 has no in-edges -> exactly 0
    res = eigenvector_centrality(_edges(spark, [(1, 2), (2, 3)]), max_iter=3)
    got = {r.id: r.score for r in res.collect()}
    assert got[1] == 0.0
    release_caches(res)


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(29)
    pairs = [(a, b) for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(60)} if a != b]
    res = eigenvector_centrality(_edges(spark, pairs), max_iter=5, direction="BOTH")
    got = {(r.id, round(r.score, 6)) for r in res.collect()}
    release_caches(res)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    sql = eigenvector_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)", 5, "BOTH"
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_resume_equals_uninterrupted(spark, tmp_path):
    rng = random.Random(37)
    pairs = [(a, b) for a, b in {(rng.randrange(12), rng.randrange(12)) for _ in range(50)} if a != b]
    e = _edges(spark, pairs)
    full = eigenvector_centrality(e, max_iter=6, direction="BOTH")
    want = {r.id: r.score for r in full.collect()}
    release_caches(full)
    ckpt = str(tmp_path / "eig")
    part = eigenvector_centrality(
        e, max_iter=3, direction="BOTH", checkpoint_dir=ckpt, checkpoint_every=1
    )
    part.count()
    release_caches(part)
    res = eigenvector_centrality(
        e, max_iter=6, direction="BOTH", checkpoint_dir=ckpt,
        checkpoint_every=1, resume=True,
    )
    got = {r.id: r.score for r in res.collect()}
    release_caches(res)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    # resuming against a different graph must refuse
    other = _edges(spark, pairs[:-1])
    with pytest.raises(ValueError, match="resume mismatch"):
        eigenvector_centrality(
            other, max_iter=6, direction="BOTH", checkpoint_dir=ckpt, resume=True
        )


def test_bad_args(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        eigenvector_centrality(e, max_iter=-1)
    with pytest.raises(ValueError):
        eigenvector_centrality(e, max_iter=1, direction="DOWN")


def _katz_replay(pairs, iters, alpha, beta, direction="OUTGOING"):
    es = set()
    for a, b in pairs:
        es.add((a, b))
        if direction == "BOTH":
            es.add((b, a))
    nodes = sorted({x for e in es for x in e})
    x = {n: beta for n in nodes}
    for _ in range(iters):
        nx = {n: 0.0 for n in nodes}
        for a, b in es:
            nx[b] += x[a]
        x = {n: beta + alpha * v for n, v in nx.items()}
    return x


def test_katz_replay_and_twin(spark):
    import duckdb

    from linkgraph.eigenvector import katz_centrality, katz_sql

    rng = random.Random(61)
    pairs = [(a, b) for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(55)} if a != b]
    res = katz_centrality(_edges(spark, pairs), alpha=0.05, beta=1.0, max_iter=5)
    got = {r.id: r.score for r in res.collect()}
    want = _katz_replay(pairs, 5, 0.05, 1.0)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)
    release_caches(res)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    res2 = katz_centrality(_edges(spark, pairs), alpha=0.05, beta=1.0, max_iter=5)
    got6 = {(r.id, round(r.score, 6)) for r in res2.collect()}
    release_caches(res2)
    sql = katz_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)", 5, alpha=0.05
    )
    assert got6 == {tuple(r) for r in con.execute(sql).fetchall()}


def test_katz_resume_and_args(spark, tmp_path):
    from linkgraph.eigenvector import katz_centrality

    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    e = _edges(spark, pairs)
    full = {r.id: r.score
            for r in katz_centrality(e, max_iter=6, direction="BOTH").collect()}
    ckpt = str(tmp_path / "katz")
    part = katz_centrality(e, max_iter=3, direction="BOTH",
                           checkpoint_dir=ckpt, checkpoint_every=1)
    part.count()
    release_caches(part)
    res = katz_centrality(e, max_iter=6, direction="BOTH",
                          checkpoint_dir=ckpt, checkpoint_every=1, resume=True)
    got = {r.id: r.score for r in res.collect()}
    release_caches(res)
    for n in full:
        assert got[n] == pytest.approx(full[n], abs=1e-12)
    with pytest.raises(ValueError, match="resume mismatch"):
        katz_centrality(e, max_iter=6, direction="BOTH", alpha=0.2,
                        checkpoint_dir=ckpt, resume=True)
    with pytest.raises(ValueError):
        katz_centrality(e, max_iter=1, alpha=0.0)


def _hits_replay(pairs, iters):
    es = set(pairs)
    nodes = sorted({x for e in es for x in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    for _ in range(iters):
        a = {n: 0.0 for n in nodes}
        for s, d in es:
            a[d] += hub[s]
        amx = max(a.values())
        a = {n: (v / amx if amx > 0 else 0.0) for n, v in a.items()}
        h = {n: 0.0 for n in nodes}
        for s, d in es:
            h[s] += a[d]
        hmx = max(h.values())
        h = {n: (v / hmx if hmx > 0 else 0.0) for n, v in h.items()}
        hub, auth = h, a
    return hub, auth


def test_hits_replay_and_twin(spark):
    import duckdb

    from linkgraph.eigenvector import hits, hits_sql

    rng = random.Random(67)
    pairs = [(a, b) for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(55)} if a != b]
    res = hits(_edges(spark, pairs), max_iter=5)
    rows = res.collect()
    hub_want, auth_want = _hits_replay(pairs, 5)
    assert {r.id for r in rows} == set(hub_want)
    for r in rows:
        assert r.hub == pytest.approx(hub_want[r.id], abs=1e-9)
        assert r.auth == pytest.approx(auth_want[r.id], abs=1e-9)
    got6 = {(r.id, round(r.hub, 6), round(r.auth, 6)) for r in rows}
    release_caches(res)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    sql = hits_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)", 5)
    assert got6 == {tuple(r) for r in con.execute(sql).fetchall()}


def test_hits_hub_authority_split(spark):
    # bipartite fan: 1,2 -> 8,9 — sources are pure hubs, sinks pure
    # authorities
    from linkgraph.eigenvector import hits

    res = hits(_edges(spark, [(1, 8), (1, 9), (2, 8), (2, 9)]), max_iter=3)
    got = {r.id: (r.hub, r.auth) for r in res.collect()}
    assert got[1] == (1.0, 0.0) and got[2] == (1.0, 0.0)
    assert got[8] == (0.0, 1.0) and got[9] == (0.0, 1.0)
    release_caches(res)


def _salsa_replay(pairs, iters):
    es = sorted(set(pairs))
    nodes = sorted({x for e in es for x in e})
    od = {n: 0 for n in nodes}
    idg = {n: 0 for n in nodes}
    for s, d in es:
        od[s] += 1
        idg[d] += 1
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    for _ in range(iters):
        a = {n: 0.0 for n in nodes}
        for s, d in es:
            a[d] += hub[s] / od[s]
        amx = max(a.values())
        a = {n: (v / amx if amx > 0 else 0.0) for n, v in a.items()}
        h = {n: 0.0 for n in nodes}
        for s, d in es:
            h[s] += a[d] / idg[d]
        hmx = max(h.values())
        h = {n: (v / hmx if hmx > 0 else 0.0) for n, v in h.items()}
        hub, auth = h, a
    return hub, auth


def test_salsa_replay_and_twin(spark):
    import duckdb

    from linkgraph.eigenvector import salsa, salsa_sql

    rng = random.Random(71)
    pairs = [(a, b) for a, b in {(rng.randrange(15), rng.randrange(15)) for _ in range(55)} if a != b]
    res = salsa(_edges(spark, pairs), max_iter=5)
    rows = res.collect()
    hub_want, auth_want = _salsa_replay(pairs, 5)
    assert {r.id for r in rows} == set(hub_want)
    for r in rows:
        assert r.hub == pytest.approx(hub_want[r.id], abs=1e-9)
        assert r.auth == pytest.approx(auth_want[r.id], abs=1e-9)
    got6 = {(r.id, round(r.hub, 6), round(r.auth, 6)) for r in rows}
    release_caches(res)
    con = duckdb.connect()
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    sql = salsa_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)", 5)
    assert got6 == {tuple(r) for r in con.execute(sql).fetchall()}


def test_salsa_tkc_debias(spark):
    # HITS's tightly-knit-community bias: a dense 3x3 biclique
    # (1,2,3 -> 11,12,13) vs a single popular page (4,5 -> 14 plus
    # 4 -> 15).  HITS concentrates all authority in the biclique;
    # SALSA's degree normalization keeps the outside component's
    # authority alive (the Lempel-Moran motivating example).
    from linkgraph.eigenvector import hits, salsa

    pairs = [(s, d) for s in (1, 2, 3) for d in (11, 12, 13)]
    pairs += [(4, 14), (5, 14), (4, 15)]
    rh = hits(_edges(spark, pairs), max_iter=12)
    rs = salsa(_edges(spark, pairs), max_iter=12)
    hits_auth = {r.id: r.auth for r in rh.collect()}
    salsa_auth = {r.id: r.auth for r in rs.collect()}
    release_caches(rh)
    release_caches(rs)
    assert hits_auth[14] < 1e-5          # HITS starves the outside page
    # SALSA's degree normalization FLIPS the ranking: the popular page
    # (indegree 2) becomes the global maximum while each biclique
    # authority settles at 0.75 — indegree-proportional, per component
    assert salsa_auth[14] == 1.0
    assert salsa_auth[11] == pytest.approx(0.75, abs=1e-6)


def test_salsa_resume_equals_uninterrupted(spark, tmp_path):
    from linkgraph.eigenvector import salsa

    rng = random.Random(73)
    pairs = [(a, b) for a, b in {(rng.randrange(12), rng.randrange(12)) for _ in range(40)} if a != b]
    e = _edges(spark, pairs)
    full = salsa(e, max_iter=6)
    want = {(r.id, round(r.hub, 9), round(r.auth, 9)) for r in full.collect()}
    release_caches(full)
    ckpt = str(tmp_path / "salsa")
    part = salsa(e, max_iter=3, checkpoint_dir=ckpt, checkpoint_every=1)
    part.collect()
    release_caches(part)
    res = salsa(e, max_iter=6, checkpoint_dir=ckpt, checkpoint_every=1, resume=True)
    got = {(r.id, round(r.hub, 9), round(r.auth, 9)) for r in res.collect()}
    release_caches(res)
    assert got == want
    # resume against a DIFFERENT graph must refuse
    other = _edges(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError, match="resume mismatch"):
        salsa(other, max_iter=6, checkpoint_dir=ckpt, resume=True)
