"""Local community sweep tests: barbell golden, an independent
pure-Python micro-domain replay on random graphs, the DuckDB twin,
max_sweep, input hygiene, and resume."""

import random

import pytest

from linkgraph.localcom import local_community_sweep, local_community_sweep_sql

# two triangles joined by one bridge edge: the community of any node
# in the left triangle is exactly the left triangle
BARBELL = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect(res):
    got = sorted((r["id"], r["rnk"], r["score"]) for r in res.members.collect())
    res.release()
    return got


def test_barbell_golden(spark):
    res = local_community_sweep(_edges(spark, BARBELL), seed_node=0, iterations=6)
    members = _collect(res)
    assert [m[0] for m in members] == [0, 1, 2]
    assert res.best_k == 3
    # cut = 1 bridge, vol(S) = 2+2+3 = 7, vol(G) - vol(S) = 7
    assert res.best_phi == pytest.approx(1 / 7, abs=1e-9)


def test_seed_in_other_triangle_mirrors(spark):
    res = local_community_sweep(_edges(spark, BARBELL), seed_node=5, iterations=6)
    members = _collect(res)
    assert sorted(m[0] for m in members) == [3, 4, 5]


def _brute_local_sweep(pairs, seed, iterations, a_num=3, a_den=20,
                       max_sweep=None):
    """Independent oracle: dict-based integer micro-domain PPR + sweep."""
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    restart = (2 * 1_000_000 * a_num + a_den) // (2 * a_den)
    p = {seed: 1_000_000}
    for _ in range(iterations):
        nxt = {seed: restart}
        for node, mass in p.items():
            d = deg[node]
            v = (2 * mass * (a_den - a_num) + a_den * d) // (2 * a_den * d)
            for a, b in sym:
                if a == node:
                    nxt[b] = nxt.get(b, 0) + v
        p = {k: v for k, v in nxt.items() if v > 0}
    ranked = sorted(p, key=lambda n: (-(p[n] * 1_000_000) // deg[n], n))
    if max_sweep is not None:
        ranked = ranked[:max_sweep]
    vol_total = len(sym)
    inset, vol, intra = set(), 0, 0
    best = None  # (phi, k)
    for k, node in enumerate(ranked, start=1):
        inset.add(node)
        vol += deg[node]
        intra += sum(
            1 for a, b in sym if (a == node and b in inset)
            or (b == node and a in inset)
        )
        denom = min(vol, vol_total - vol)
        if denom <= 0:
            continue
        phi = round((vol - intra) / denom, 9)
        if best is None or (phi, k) < best:
            best = (phi, k)
    assert best is not None
    _, bk = best
    return sorted(
        (n, k, round(p[n] / 1_000_000.0, 6))
        for k, n in enumerate(ranked, start=1) if k <= bk
    )


@pytest.mark.parametrize("seed_node", [0, 3, 7])
def test_random_vs_brute(spark, seed_node):
    rng = random.Random(41)
    pairs = list({(rng.randrange(14), rng.randrange(14)) for _ in range(40)})
    pairs = [p for p in pairs if p[0] != p[1]]
    res = local_community_sweep(
        _edges(spark, pairs), seed_node=seed_node, iterations=4
    )
    assert _collect(res) == _brute_local_sweep(pairs, seed_node, 4)


def test_max_sweep_matches_brute_and_caps(spark):
    rng = random.Random(7)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(36)} if p[0] != p[1]]
    res = local_community_sweep(
        _edges(spark, pairs), seed_node=0, iterations=4, max_sweep=3
    )
    got = _collect(res)
    assert len(got) <= 3
    assert got == _brute_local_sweep(pairs, 0, 4, max_sweep=3)


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(29)
    pairs = [p for p in {(rng.randrange(13), rng.randrange(13))
                         for _ in range(34)} if p[0] != p[1]]
    res = local_community_sweep(_edges(spark, pairs), seed_node=1, iterations=5)
    got = _collect(res)
    rows = duckdb.connect().execute(
        local_community_sweep_sql(_values_sql(pairs), 1, iterations=5)
    ).fetchall()
    assert got == sorted(rows)


def test_validates_arguments(spark):
    e = _edges(spark, BARBELL)
    with pytest.raises(ValueError, match="alpha"):
        local_community_sweep(e, seed_node=0, a_num=20, a_den=20)
    with pytest.raises(ValueError, match="iterations"):
        local_community_sweep(e, seed_node=0, iterations=0)
    with pytest.raises(ValueError, match="no edges"):
        local_community_sweep(e, seed_node=99)


def test_resume_equals_uninterrupted(spark, tmp_path):
    pairs = BARBELL + [(2, 6), (6, 7), (7, 0), (5, 8)]
    full = local_community_sweep(_edges(spark, pairs), seed_node=0, iterations=6)
    want = _collect(full)
    ckpt = str(tmp_path / "lc")
    partial = local_community_sweep(
        _edges(spark, pairs), seed_node=0, iterations=3,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    partial.members.count()
    partial.release()
    resumed = local_community_sweep(
        _edges(spark, pairs), seed_node=0, iterations=6,
        checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
    )
    assert _collect(resumed) == want


def test_resume_rejects_changed_graph_or_params(spark, tmp_path):
    ckpt = str(tmp_path / "lc2")
    first = local_community_sweep(
        _edges(spark, BARBELL), seed_node=0, iterations=2,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    first.members.count()
    first.release()
    with pytest.raises(ValueError, match="resume mismatch"):
        local_community_sweep(
            _edges(spark, BARBELL + [(5, 9)]), seed_node=0, iterations=3,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
    with pytest.raises(ValueError, match="resume mismatch"):
        local_community_sweep(
            _edges(spark, BARBELL), seed_node=1, iterations=3,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )


# ---- ppr_batch ------------------------------------------------------

from linkgraph.localcom import ppr_batch, ppr_batch_sql  # noqa: E402


def _brute_ppr(pairs, seed, iterations, a_num=3, a_den=20, direction="BOTH"):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        if direction in ("OUTGOING", "BOTH"):
            adj.setdefault(a, set()).add(b)
        if direction in ("INCOMING", "BOTH"):
            adj.setdefault(b, set()).add(a)
    restart = (2 * 1_000_000 * a_num + a_den) // (2 * a_den)
    p = {seed: 1_000_000}
    for _ in range(iterations):
        nxt = {seed: restart}
        for node, mass in p.items():
            nbrs = adj[node]
            d = len(nbrs)
            v = (2 * mass * (a_den - a_num) + a_den * d) // (2 * a_den * d)
            for b in nbrs:
                nxt[b] = nxt.get(b, 0) + v
        p = {k: v for k, v in nxt.items() if v > 0}
    return p


@pytest.mark.parametrize("direction", ["BOTH", "OUTGOING", "INCOMING"])
def test_ppr_batch_vs_brute(spark, direction):
    rng = random.Random(53)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(40)} if p[0] != p[1]]
    srcs = sorted({a for a, _ in pairs})[:2]
    dsts = sorted({b for _, b in pairs})[:2]
    seeds = srcs if direction != "INCOMING" else dsts
    got = sorted(
        tuple(r)
        for r in ppr_batch(
            _edges(spark, pairs), seeds, iterations=4, direction=direction
        ).collect()
    )
    want = sorted(
        (s, n, round(v / 1_000_000.0, 6))
        for s in seeds
        for n, v in _brute_ppr(pairs, s, 4, direction=direction).items()
    )
    assert got == want


def test_ppr_batch_duckdb_twin(spark):
    import duckdb

    rng = random.Random(61)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(34)} if p[0] != p[1]]
    seeds = sorted({a for a, _ in pairs})[:3]
    got = sorted(
        tuple(r)
        for r in ppr_batch(_edges(spark, pairs), seeds, iterations=5).collect()
    )
    duck = duckdb.connect().execute(
        ppr_batch_sql(_values_sql(pairs), seeds, iterations=5)
    ).fetchall()
    assert got == sorted(duck)


def test_ppr_batch_validates(spark):
    e = _edges(spark, BARBELL)
    with pytest.raises(ValueError, match="non-empty"):
        ppr_batch(e, [])
    with pytest.raises(ValueError, match="distinct"):
        ppr_batch(e, [0, 0])
    with pytest.raises(ValueError, match="no out-edges"):
        ppr_batch(e, [0, 99])
    with pytest.raises(ValueError, match="direction"):
        ppr_batch(e, [0], direction="SIDEWAYS")


def test_ppr_batch_resume_equals_uninterrupted(spark, tmp_path):
    pairs = BARBELL + [(2, 6), (6, 7)]
    full = sorted(
        tuple(r)
        for r in ppr_batch(_edges(spark, pairs), [0, 4], iterations=6).collect()
    )
    ckpt = str(tmp_path / "pb")
    ppr_batch(
        _edges(spark, pairs), [0, 4], iterations=3,
        checkpoint_dir=ckpt, checkpoint_every=1,
    ).count()
    resumed = sorted(
        tuple(r)
        for r in ppr_batch(
            _edges(spark, pairs), [0, 4], iterations=6,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        ).collect()
    )
    assert resumed == full
    with pytest.raises(ValueError, match="resume mismatch"):
        ppr_batch(
            _edges(spark, pairs), [0, 1], iterations=6,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
