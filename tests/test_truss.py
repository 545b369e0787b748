"""k-truss tests: golden fixtures (barbell / K4+tail), brute-force
random cross-check, DuckDB oracle twins, and peel-round accounting."""

import itertools
import random

from linkgraph.truss import (
    edge_support,
    edge_support_sql,
    k_truss,
    k_truss_sql,
)

# barbell: triangle 1-2-3 and triangle 4-5-6 joined by bridge 3-4
BARBELL = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
# K4 on 1..4 with a pendant triangle 4-5-6 hanging off node 4
K4_TAIL = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5), (5, 6), (4, 6)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _brute_support(pairs):
    """support(a,b) = |N(a) ∩ N(b)| on the undirected simple view."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return {(a, b): len(nbrs[a] & nbrs[b]) for a, b in und}


def _brute_truss(pairs, k):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        sup = _brute_support(edges)
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return {(a, b, sup[(a, b)]) for a, b in edges}
        edges = keep


def test_edge_support_barbell(spark):
    got = {(r["a"], r["b"]): r["support"]
           for r in edge_support(_edges(spark, BARBELL)).collect()}
    assert got == _brute_support(BARBELL)
    assert got[(3, 4)] == 0  # the bridge closes nothing


def test_ktruss3_drops_the_bridge(spark):
    res = k_truss(_edges(spark, BARBELL), k=3)
    got = {(r["a"], r["b"]) for r in res.edges.collect()}
    res.release()
    assert got == {(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)}


def test_ktruss4_keeps_only_k4(spark):
    res = k_truss(_edges(spark, K4_TAIL), k=4)
    got = {(r["a"], r["b"], r["support"]) for r in res.edges.collect()}
    res.release()
    # the pendant triangle peels (support 1 < 2), then K4 stands with
    # every edge closing exactly 2 triangles
    assert got == {(a, b, 2) for a, b in itertools.combinations([1, 2, 3, 4], 2)}
    # cascade: round 1 drops the tail, round 2 re-measures, fixpoint
    assert res.rounds >= 2


def test_ktruss_random_matches_bruteforce(spark):
    rng = random.Random(53)
    pairs = [(a, b) for a, b in
             {(rng.randrange(15), rng.randrange(15)) for _ in range(60)} if a != b]
    for k in (3, 4, 5):
        res = k_truss(_edges(spark, pairs), k=k)
        got = {(r["a"], r["b"], r["support"]) for r in res.edges.collect()}
        res.release()
        assert got == _brute_truss(pairs, k), f"k={k}"


def test_edge_support_duckdb_twin(spark):
    import duckdb

    rng = random.Random(59)
    pairs = [(a, b) for a, b in
             {(rng.randrange(14), rng.randrange(14)) for _ in range(55)} if a != b]
    got = sorted(map(tuple, edge_support(_edges(spark, pairs)).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        edge_support_sql(_values_sql(pairs))
    ).fetchall()))
    assert got == want


def test_ktruss_duckdb_twin(spark):
    import duckdb

    rng = random.Random(61)
    pairs = [(a, b) for a, b in
             {(rng.randrange(14), rng.randrange(14)) for _ in range(55)} if a != b]
    res = k_truss(_edges(spark, pairs), k=4)
    got = sorted(map(tuple, res.edges.collect()))
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        k_truss_sql(_values_sql(pairs), 4, n_rounds=8)
    ).fetchall()))
    assert got == want


def test_ktruss_ignores_duplicates_loops_and_direction(spark):
    noisy = K4_TAIL + [(2, 1), (3, 3), (4, 1), (6, 5)]
    r1 = k_truss(_edges(spark, K4_TAIL), k=4)
    r2 = k_truss(_edges(spark, noisy), k=4)
    a1 = sorted(map(tuple, r1.edges.collect()))
    a2 = sorted(map(tuple, r2.edges.collect()))
    r1.release()
    r2.release()
    assert a1 == a2


def test_ktruss_k2_is_whole_simple_graph(spark):
    res = k_truss(_edges(spark, BARBELL), k=2)
    got = {(r["a"], r["b"]) for r in res.edges.collect()}
    res.release()
    assert got == {tuple(sorted(p)) for p in BARBELL}


def test_ktruss_decremental_equals_recompute(spark):
    """The decremental support maintenance must produce the SAME edge
    set, supports, and round count as the from-scratch recompute —
    the support invariant proof, exercised on random graphs with
    multi-round cascades."""
    rng = random.Random(67)
    pairs = [(a, b) for a, b in
             {(rng.randrange(16), rng.randrange(16)) for _ in range(70)} if a != b]
    for k in (3, 4, 5):
        r_dec = k_truss(_edges(spark, pairs), k=k, method="decremental")
        r_rec = k_truss(_edges(spark, pairs), k=k, method="recompute")
        got = sorted(map(tuple, r_dec.edges.collect()))
        want = sorted(map(tuple, r_rec.edges.collect()))
        assert got == want, f"k={k}"
        assert r_dec.rounds == r_rec.rounds, f"k={k}"
        r_dec.release()
        r_rec.release()


def test_ktruss_resume_equals_uninterrupted(spark, tmp_path):
    """A run killed mid-peel and resumed from the manifest equals the
    uninterrupted run (killed-equals-uninterrupted, SURVEY.md §5.5);
    resuming with a different k or method raises."""
    import pytest

    full = k_truss(_edges(spark, K4_TAIL), k=4)
    want = sorted(map(tuple, full.edges.collect()))
    full.release()

    ckpt = str(tmp_path / "ktruss_ckpt")
    killed = k_truss(_edges(spark, K4_TAIL), k=4, max_rounds=1,
                     checkpoint_dir=ckpt, checkpoint_every=1)
    killed.release()
    res = k_truss(_edges(spark, K4_TAIL), k=4,
                  checkpoint_dir=ckpt, checkpoint_every=1, resume=True)
    got = sorted(map(tuple, res.edges.collect()))
    res.release()
    assert got == want

    with pytest.raises(ValueError, match="resume mismatch"):
        k_truss(_edges(spark, K4_TAIL), k=5, checkpoint_dir=ckpt, resume=True)
    with pytest.raises(ValueError, match="resume mismatch"):
        k_truss(_edges(spark, K4_TAIL), k=4, method="recompute",
                checkpoint_dir=ckpt, resume=True)
