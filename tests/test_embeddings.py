"""FastRP embeddings: exact python replay, DuckDB twin, knn contract."""

import hashlib
import math
import random

import pytest

from linkgraph.embeddings import (
    fastrp_embeddings,
    fastrp_knn,
    fastrp_knn_sql,
    fastrp_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _replay(pairs, dim, weights, direction, seed):
    msg = set()
    for a, b in pairs:
        if direction in ("OUTGOING", "BOTH"):
            msg.add((a, b))
        if direction in ("INCOMING", "BOTH"):
            msg.add((b, a))
    msg = {(u, v) for u, v in msg if u != v}
    nodes = sorted({x for e in pairs for x in e})

    def init(n, j):
        m = _h60(f"{n}#fastrp-{seed}-{j}") % 6
        return 1 if m == 0 else (-1 if m == 1 else 0)

    x = {n: [init(n, j) for j in range(dim)] for n in nodes}
    acc = {n: [0] * dim for n in nodes}
    for w in weights:
        nx = {n: [0] * dim for n in nodes}
        for u, v in msg:
            for j in range(dim):
                nx[v][j] += x[u][j]
        x = nx
        for n in nodes:
            for j in range(dim):
                acc[n][j] += w * x[n][j]
    return acc


def _rand_pairs(seed, n=14, m=55):
    rng = random.Random(seed)
    return [(a, b) for a, b in {(rng.randrange(n), rng.randrange(n)) for _ in range(m)} if a != b]


def test_python_replay_exact(spark):
    pairs = _rand_pairs(11)
    for direction in ("OUTGOING", "BOTH"):
        res = fastrp_embeddings(
            _edges(spark, pairs), dim=6, iterations=2, weights=[1, 2],
            direction=direction, seed=7,
        ).collect()
        want = _replay(pairs, 6, [1, 2], direction, 7)
        got = {(r.id, r.d): (r.v, r.nv) for r in res}
        assert len(got) == len(want) * 6
        for n, vec in want.items():
            nrm = math.sqrt(sum(v * v for v in vec))
            for j, v in enumerate(vec):
                gv, gnv = got[(n, j)]
                assert gv == v, (direction, n, j)
                expect_nv = round(v / nrm, 6) if nrm > 0 else 0.0
                assert gnv == pytest.approx(expect_nv, abs=0), (direction, n, j)


def test_signature_distribution_and_determinism(spark):
    # a no-edge-influence check: one isolated pair keeps init-only zeros
    pairs = [(1, 2)]
    a = fastrp_embeddings(_edges(spark, pairs), dim=16, iterations=1, seed=3).collect()
    b = fastrp_embeddings(_edges(spark, pairs), dim=16, iterations=1, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = fastrp_embeddings(_edges(spark, pairs), dim=16, iterations=1, seed=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_duckdb_twin(spark):
    import duckdb

    pairs = _rand_pairs(23)
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    edge_sql = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    res = fastrp_embeddings(
        _edges(spark, pairs), dim=5, iterations=3, weights=[2, 1, 3],
        direction="BOTH", seed=42,
    ).collect()
    got = {(r.id, r.d, r.v, r.nv) for r in res}
    con = duckdb.connect()
    sql = fastrp_sql(edge_sql, dim=5, iterations=3, weights=[2, 1, 3],
                     direction="BOTH", seed=42)
    want = {(r[0], r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_knn_matches_brute_force(spark):
    pairs = _rand_pairs(31, n=16, m=70)
    dim, weights, seed = 6, [1, 1], 5
    res = fastrp_knn(
        _edges(spark, pairs), query_mod=3, k=4, dim=dim, iterations=2,
        weights=weights, direction="BOTH", seed=seed,
    ).collect()
    acc = _replay(pairs, dim, weights, "BOTH", seed)
    nrm = {n: math.sqrt(sum(v * v for v in vec)) for n, vec in acc.items()}
    live = {n for n in acc if nrm[n] > 0}
    want = {}
    for q in sorted(live):
        if q % 3 != 0:
            continue
        scored = []
        for c in sorted(live):
            if c == q:
                continue
            dp = sum(a * b for a, b in zip(acc[q], acc[c]))
            scored.append((round(dp / (nrm[q] * nrm[c]), 6), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rk, (cos, c) in enumerate(scored[:4], 1):
            want[(q, c)] = (cos, rk)
    got = {(r.query_id, r.neighbor_id): (r.cosine, r.rk) for r in res}
    assert got == want


def test_knn_duckdb_twin(spark):
    import duckdb

    pairs = _rand_pairs(47, n=12, m=50)
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    edge_sql = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    res = fastrp_knn(
        _edges(spark, pairs), query_mod=2, k=3, dim=4, iterations=2, seed=9,
    ).collect()
    got = {(r.query_id, r.neighbor_id, r.cosine, r.rk) for r in res}
    con = duckdb.connect()
    sql = fastrp_knn_sql(edge_sql, query_mod=2, k=3, dim=4, iterations=2, seed=9)
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_param_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="dim"):
        fastrp_embeddings(e, dim=0)
    with pytest.raises(ValueError, match="weights"):
        fastrp_embeddings(e, iterations=2, weights=[1])
    with pytest.raises(ValueError, match="ints"):
        fastrp_embeddings(e, iterations=1, weights=[0.5])
    with pytest.raises(ValueError, match="direction"):
        fastrp_embeddings(e, direction="SIDEWAYS")
    with pytest.raises(ValueError, match="query_mod"):
        fastrp_knn(e, query_mod=0)


# --------------------------------------------- k-hop feature propagation

def test_propagate_features_hand_computed(spark):
    """Hand-derived 2-round closed-neighborhood means on a path graph
    with a featureless node and a .5-tie rounding case (416666.67 ->
    417; 458333.5 -> half-away 458334)."""
    from linkgraph.embeddings import propagate_features

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    feats = spark.createDataFrame(
        [(1, [1.0]), (2, [0.0]), (4, [0.25]), (5, [0.7])],
        "id long, features array<double>",
    )
    out = {
        r.id: r.features
        for r in propagate_features(edges, feats, dim=1, rounds=2).collect()
    }
    # node 3 has no feature row: absent (not imputed); node 5 isolated:
    # unchanged
    assert set(out) == {1, 2, 4, 5}
    assert out[1] == [0.458334]   # (0.5 + 0.416667)/2 = .4583335 -> away
    assert out[2] == [0.347222]   # (0.416667 + 0.625)/3 floor-rounds
    assert out[4] == [0.270834]   # (0.125 + 0.416667)/2 tie -> away
    assert out[5] == [0.7]


def test_propagate_features_modes_and_twin(spark):
    """Exploded output equals the array output; the unrolled DuckDB
    twin is value-exact on a random graph with real-valued dim-3
    features, all three directions."""
    import duckdb

    from linkgraph.embeddings import propagate_features, propagate_features_sql

    rng = random.Random(13)
    pairs = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(25)})
    pairs = [(a, b) for a, b in pairs if a != b]
    feats = [
        (i, [round(rng.uniform(-5, 5), 3) for _ in range(3)]) for i in range(10)
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    fdf = spark.createDataFrame(feats, "id long, features array<double>")
    evals = ", ".join(f"({a}, {b})" for a, b in pairs)
    edge_sql = f"SELECT * FROM (VALUES {evals}) AS t(src, dst)"
    fvals = ", ".join(
        f"({i}, {v[0]!r}, {v[1]!r}, {v[2]!r})" for i, v in feats
    )
    feat_sql = f"SELECT * FROM (VALUES {fvals}) AS t(id, f0, f1, f2)"
    con = duckdb.connect()
    for direction in ("BOTH", "OUTGOING", "INCOMING"):
        arr = propagate_features(
            edges, fdf, dim=3, rounds=2, direction=direction
        ).collect()
        expl = propagate_features(
            edges, fdf, dim=3, rounds=2, direction=direction, exploded=True
        ).collect()
        from_arr = {(r.id, d, v) for r in arr for d, v in enumerate(r.features)}
        from_expl = {(r.id, r.d, r.value) for r in expl}
        assert from_arr == from_expl
        sql = propagate_features_sql(
            edge_sql, feat_sql, dim=3, rounds=2, direction=direction,
            exploded=True,
        )
        want = {(r[0], r[1], r[2]) for r in con.execute(sql).fetchall()}
        assert from_expl == want, direction


def test_propagate_features_dim_mismatch_raises(spark):
    from linkgraph.embeddings import propagate_features

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    f = spark.createDataFrame([(1, [1.0, 2.0])], "id long, features array<double>")
    with pytest.raises(ValueError, match="dim 2, expected 3"):
        propagate_features(e, f, dim=3, rounds=1)


# ---- sgns_embeddings ------------------------------------------------

import itertools

import numpy as np

from linkgraph.embeddings import sgns_embeddings, sgns_embeddings_sql


def _sg_edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _sg_values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _vecs(rows, dim):
    V = {}
    for r in rows:
        V.setdefault(r["id"], [0.0] * dim)[r["d"]] = r["value"]
    return {k: np.array(v) for k, v in V.items()}


def test_sgns_duckdb_twin_bit_exact(spark):
    import duckdb
    import random

    rng = random.Random(7)
    pairs = [p for p in {(rng.randrange(10), rng.randrange(10))
                         for _ in range(28)} if p[0] != p[1]]
    got = sorted(tuple(r) for r in sgns_embeddings(
        _sg_edges(spark, pairs), dim=4, walk_length=3, walks_per_node=3,
        epochs=3, lr=0.3,
    ).collect())
    duck = duckdb.connect().execute(
        sgns_embeddings_sql(
            _sg_values_sql(pairs), dim=4, walk_length=3, walks_per_node=3,
            epochs=3, lr=0.3,
        )
    ).fetchall()
    assert got == sorted(duck)


def test_sgns_separates_cliques(spark):
    K1 = list(itertools.combinations(range(4), 2))
    K2 = list(itertools.combinations(range(4, 8), 2))
    rows = sgns_embeddings(
        _sg_edges(spark, K1 + K2 + [(3, 4)]), dim=8, walk_length=4,
        walks_per_node=6, window=2, negatives=3, epochs=15, lr=0.3,
    ).collect()
    V = _vecs(rows, 8)

    def cos(a, b):
        na, nb = np.linalg.norm(V[a]), np.linalg.norm(V[b])
        return float(V[a] @ V[b] / (na * nb)) if na > 0 and nb > 0 else 0.0

    intra = np.mean([cos(a, b) for a, b in K1 + K2])
    inter = np.mean([cos(a, b) for a in range(4) for b in range(4, 8)])
    assert intra > inter + 0.3  # measured 0.69 vs -0.06


def test_sgns_deterministic_and_epoch0_is_init(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    a = sorted(tuple(r) for r in sgns_embeddings(
        _sg_edges(spark, pairs), dim=4, epochs=2).collect())
    b = sorted(tuple(r) for r in sgns_embeddings(
        _sg_edges(spark, pairs), dim=4, epochs=2).collect())
    assert a == b
    # epochs=0 returns the hash init untouched, bounded by 0.5/dim
    init = sgns_embeddings(_sg_edges(spark, pairs), dim=4, epochs=0).collect()
    assert all(abs(r["value"]) <= 0.5 / 4 + 1e-9 for r in init)


def test_sgns_updates_stay_clamped(spark):
    # adversarial lr: values must never exceed the +-8.0 clamp
    pairs = [(0, 1), (1, 2), (2, 0)]
    rows = sgns_embeddings(
        _sg_edges(spark, pairs), dim=2, walk_length=4, walks_per_node=8,
        epochs=25, lr=5.0,
    ).collect()
    assert all(abs(r["value"]) <= 8.0 for r in rows)


def test_sgns_validates(spark):
    e = _sg_edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="hyperparameters"):
        sgns_embeddings(e, dim=0)
    with pytest.raises(ValueError, match="hyperparameters"):
        sgns_embeddings(e, negatives=-1)


def test_sgns_resume_equals_uninterrupted(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    kw = dict(dim=4, walk_length=3, walks_per_node=3, epochs=4, lr=0.2)
    full = sorted(tuple(r) for r in sgns_embeddings(
        _sg_edges(spark, pairs), **kw).collect())
    ckpt = str(tmp_path / "sg")
    kw2 = dict(kw)
    kw2["epochs"] = 2
    sgns_embeddings(
        _sg_edges(spark, pairs), checkpoint_dir=ckpt, checkpoint_every=1,
        **kw2,
    ).count()
    resumed = sorted(tuple(r) for r in sgns_embeddings(
        _sg_edges(spark, pairs), checkpoint_dir=ckpt, checkpoint_every=1,
        resume=True, **kw,
    ).collect())
    assert resumed == full
    bad = dict(kw)
    bad["lr"] = 0.5
    with pytest.raises(ValueError, match="resume mismatch"):
        sgns_embeddings(
            _sg_edges(spark, pairs), checkpoint_dir=ckpt,
            checkpoint_every=1, resume=True, **bad,
        )
