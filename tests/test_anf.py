"""ANF / HyperBall tests: exact-equality replay against an
independent pure-python register simulation, ball semantics on
structured graphs, and the saturation/fill contract."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from linkgraph.anf import anf, effective_diameter, neighborhood_function
from linkgraph.checkpoint import release_caches


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _py_hash(node_id: int, seed: int) -> int:
    s = f"{node_id}#{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_anf(pairs, max_t, m, seed):
    """Independent replay: python dict/set BFS over balls + the same
    HLL register definition and estimator."""
    b = int(math.log2(m))
    w = 60 - b
    adj = {}
    for x, y in pairs:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    nodes = sorted(adj)

    def register(v):
        h = _py_hash(v, seed)
        bucket = h % m
        h2 = h >> b
        hb = max((i for i in range(w) if (h2 >> i) & 1), default=-1)
        return bucket, w - hb

    def estimate(sk):
        z = sum(2.0 ** -r for r in sk)
        zeros = sum(1 for r in sk if r == 0)
        raw = (0.673 if m == 16 else 0.697 if m == 32 else 0.709) * m * m / z
        if raw <= 2.5 * m and zeros > 0:
            return round(m * math.log(m / zeros), 6)
        return round(raw, 6)

    # exact balls by BFS, then HLL state of the ball as a set
    out = {}
    for u in nodes:
        ball = {u}
        for t in range(0, max_t + 1):
            sk = [0] * m
            for v in ball:
                bu, rho = register(v)
                sk[bu] = max(sk[bu], rho)
            out[(t, u)] = estimate(sk)
            ball = ball | {w2 for v in ball for w2 in adj[v]}
    return out


def test_anf_matches_independent_python_replay(spark):
    import random
    rng = random.Random(7)
    nodes = list(range(40))
    pairs = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(80))
        if a != b
    })
    res = anf(_edges(spark, pairs), max_t=3, m=16, seed=5)
    got = {(r["t"], r["id"]): r["est"] for r in res.balls.collect()}
    release_caches(res.balls)
    want = _py_anf(pairs, max_t=3, m=16, seed=5)
    assert got == want


def test_anf_ball_estimates_track_truth_on_a_clique(spark):
    # K12: ball(t>=1) = all 12 nodes; HLL at m=64 has ~13% std err
    pairs = [(i, j) for i in range(12) for j in range(i + 1, 12)]
    res = anf(_edges(spark, pairs), max_t=2, m=64, seed=0)
    rows = {(r["t"], r["id"]): r["est"] for r in res.balls.collect()}
    release_caches(res.balls)
    for u in range(12):
        assert rows[(1, u)] == rows[(2, u)]  # saturated after 1 hop
        assert abs(rows[(1, u)] - 12) / 12 < 0.5
    assert effective_diameter(res, q=0.99) == 1


def test_anf_saturation_fills_requested_radii(spark):
    # path of 3 nodes saturates at t=2 but max_t=5 rows must exist
    res = anf(_edges(spark, [(1, 2), (2, 3)]), max_t=5, m=16)
    ts = sorted({r["t"] for r in res.balls.collect()})
    n_rows = res.balls.count()
    release_caches(res.balls)
    assert ts == [0, 1, 2, 3, 4, 5]
    assert n_rows == 3 * 6
    assert res.rounds <= 3  # stopped early, snapshots filled


def test_neighborhood_function_monotone(spark):
    pairs = [(i, i + 1) for i in range(9)]  # 10-chain
    res = anf(_edges(spark, pairs), max_t=4, m=32)
    nf = neighborhood_function(res)
    release_caches(res.balls)
    assert [t for t, _ in nf] == [0, 1, 2, 3, 4]
    assert all(nf[i][1] <= nf[i + 1][1] + 1e-9 for i in range(len(nf) - 1))


def test_anf_rejects_bad_m(spark):
    with pytest.raises(ValueError, match="power of two"):
        anf(_edges(spark, [(1, 2)]), m=24)
    with pytest.raises(ValueError, match="power of two"):
        anf(_edges(spark, [(1, 2)]), m=8)


def test_hyperball_harmonic_matches_ring_fold(spark):
    """The sketch harmonic equals the growth-ring fold over the anf
    estimates, and on a star graph it tracks the exact harmonic
    (center: n-1 at distance 1) within HLL error at m=64."""
    from linkgraph.anf import hyperball_harmonic

    pairs = [(0, i) for i in range(1, 13)]  # star, center 0
    res = anf(_edges(spark, pairs), max_t=2, m=64, seed=0)
    balls = {(r["t"], r["id"]): r["est"] for r in res.balls.collect()}
    release_caches(res.balls)
    out = hyperball_harmonic(_edges(spark, pairs), max_t=2, m=64, seed=0)
    got = {r["id"]: r["harmonic"] for r in out.collect()}
    release_caches(out)
    for u in got:
        want = sum(
            (balls[(t, u)] - balls[(t - 1, u)]) / t for t in range(1, 3)
        )
        assert abs(got[u] - round(want, 6)) < 2e-6
    # exact harmonic of the center is 12; leaves: 1 + 11/2 = 6.5
    assert abs(got[0] - 12) / 12 < 0.5
    assert abs(got[1] - 6.5) / 6.5 < 0.5
