"""SimRank tests: hand goldens (bipartite co-citation, triangle),
an independent pure-Python micro-domain oracle on random directed
graphs, the DuckDB unrolled-CTE twin, input hygiene, and resume."""

import random

import pytest

from linkgraph.simrank import simrank, simrank_sql

# classic co-citation shape: 1 and 2 both point at 3 and 4
COCITE = [(1, 3), (2, 3), (1, 4), (2, 4)]
TRIANGLE = [(1, 2), (2, 3), (3, 1)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect_pairs(res):
    got = {(r["node1"], r["node2"]): r["score"] for r in res.pairs.collect()}
    res.release()
    return got


def test_simrank_golden_cocited_pair(spark):
    # I(3) = I(4) = {1, 2}; s1(3,4) = C/4 * (s0(1,1) + s0(2,2)) = C/2 = 0.4
    # and it is already the fixpoint (1 and 2 have no in-neighbors).
    for iters in (1, 3):
        got = _collect_pairs(simrank(_edges(spark, COCITE), iterations=iters))
        assert got == {(3, 4): 0.4}


def test_simrank_golden_triangle_both(spark):
    # undirected triangle: every pair shares neighborhoods {2,3} vs {1,3};
    # s1 = C/4 * 1e6 = 0.2 for all pairs, s2 = C/4 * (3 * 0.2e6 + 1e6) = 0.32
    got1 = _collect_pairs(
        simrank(_edges(spark, TRIANGLE), direction="BOTH", iterations=1)
    )
    assert got1 == {(1, 2): 0.2, (1, 3): 0.2, (2, 3): 0.2}
    got2 = _collect_pairs(
        simrank(_edges(spark, TRIANGLE), direction="BOTH", iterations=2)
    )
    assert got2 == {(1, 2): 0.32, (1, 3): 0.32, (2, 3): 0.32}


def test_simrank_ignores_self_loops_and_duplicate_edges(spark):
    noisy = COCITE + [(1, 3), (3, 3), (2, 4)]
    clean = _collect_pairs(simrank(_edges(spark, COCITE), iterations=2))
    dirty = _collect_pairs(simrank(_edges(spark, noisy), iterations=2))
    assert clean == dirty


def _brute_simrank_micro(pairs, direction, iterations, c_num=4, c_den=5):
    """Independent oracle: dict-based truncated SimRank in the same
    integer micro-domain with the same round-half-up contract."""
    ine = {}
    for a, b in pairs:
        if a == b:
            continue
        if direction in ("OUTGOING", "BOTH"):
            ine.setdefault(b, set()).add(a)
        if direction in ("INCOMING", "BOTH"):
            ine.setdefault(a, set()).add(b)
    nodes = sorted({n for p in pairs for n in p})
    s = {(n, n): 1_000_000 for n in nodes}
    for _ in range(iterations):
        nxt = {(n, n): 1_000_000 for n in nodes}
        for a in nodes:
            for b in nodes:
                if a == b or a not in ine or b not in ine:
                    continue
                num = sum(s.get((i, j), 0) for i in ine[a] for j in ine[b])
                da, db = len(ine[a]), len(ine[b])
                v = (2 * c_num * num + c_den * da * db) // (2 * c_den * da * db)
                if v >= 1:
                    nxt[(a, b)] = v
        s = nxt
    return {
        (a, b): round(v / 1_000_000.0, 6)
        for (a, b), v in s.items()
        if a < b and v >= 1
    }


@pytest.mark.parametrize("direction", ["OUTGOING", "INCOMING", "BOTH"])
def test_simrank_random_vs_brute(spark, direction):
    rng = random.Random(17)
    pairs = list({(rng.randrange(12), rng.randrange(12)) for _ in range(28)})
    got = _collect_pairs(
        simrank(_edges(spark, pairs), direction=direction, iterations=3)
    )
    assert got == _brute_simrank_micro(pairs, direction, 3)


def test_simrank_duckdb_twin(spark):
    import duckdb

    rng = random.Random(23)
    pairs = list({(rng.randrange(10), rng.randrange(10)) for _ in range(24)})
    got = _collect_pairs(simrank(_edges(spark, pairs), iterations=3))
    rows = duckdb.connect().execute(
        simrank_sql(_values_sql(pairs), iterations=3)
    ).fetchall()
    want = {(a, b): s for a, b, s in rows}
    assert got == want


def test_simrank_resume_equals_uninterrupted(spark, tmp_path):
    pairs = COCITE + TRIANGLE + [(4, 5), (5, 1), (2, 5)]
    full = _collect_pairs(
        simrank(_edges(spark, pairs), direction="BOTH", iterations=4)
    )
    ckpt = str(tmp_path / "sr")
    # run 2 rounds durably, then resume to 4
    partial = simrank(
        _edges(spark, pairs), direction="BOTH", iterations=2,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    partial.pairs.count()
    partial.release()
    resumed = _collect_pairs(
        simrank(
            _edges(spark, pairs), direction="BOTH", iterations=4,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
    )
    assert resumed == full


def test_simrank_resume_rejects_changed_graph_or_params(spark, tmp_path):
    ckpt = str(tmp_path / "sr2")
    first = simrank(
        _edges(spark, COCITE), iterations=2,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    first.pairs.count()
    first.release()
    with pytest.raises(ValueError, match="resume mismatch"):
        simrank(
            _edges(spark, COCITE + [(4, 1)]), iterations=3,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
    with pytest.raises(ValueError, match="resume mismatch"):
        simrank(
            _edges(spark, COCITE), iterations=3, c_num=1, c_den=2,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )


def test_simrank_validates_arguments_and_warns_on_size(spark):
    e = _edges(spark, COCITE)
    with pytest.raises(ValueError, match="direction"):
        simrank(e, direction="SIDEWAYS")
    with pytest.raises(ValueError, match="c_num"):
        simrank(e, c_num=5, c_den=5)
    with pytest.warns(UserWarning, match="O\\(n\\^2\\)"):
        simrank(e, iterations=1, exact_warn_nodes=2).release()


# ---- simrank_sampled ------------------------------------------------

import hashlib

from linkgraph.simrank import simrank_sampled, simrank_sampled_sql


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_sampled(pairs, q, walk_length, walks_per_node, c_num=4, c_den=5,
                   seed=0, direction="OUTGOING"):
    """Independent oracle: hash-argmin reverse walks + first meeting."""
    walk_dir = {"OUTGOING": "INCOMING", "INCOMING": "OUTGOING",
                "BOTH": "BOTH"}[direction]
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        if walk_dir in ("OUTGOING", "BOTH"):
            adj.setdefault(a, set()).add(b)
        if walk_dir in ("INCOMING", "BOTH"):
            adj.setdefault(b, set()).add(a)
    nodes = sorted({n for p in pairs for n in p})

    def walk(start, wno):
        pos = [start]
        cur = start
        for t in range(1, walk_length + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                break
            cur = min(nbrs, key=lambda d: (
                _h60(f"{start}|{wno}|{t}|{d}#{seed}"), d))
            pos.append(cur)
        return pos

    qwalks = [walk(q, r) for r in range(walks_per_node)]
    out = {}
    for v in nodes:
        if v == q:
            continue
        sv = 0
        for r in range(walks_per_node):
            vw = walk(v, r)
            tau = None
            for t in range(1, min(len(vw), len(qwalks[r]))):
                if vw[t] == qwalks[r][t]:
                    tau = t
                    break
            if tau is not None:
                sv += (2 * 1_000_000 * c_num ** tau + c_den ** tau) // (
                    2 * c_den ** tau)
        if sv > 0:
            r_ = walks_per_node
            out[v] = round(((2 * sv + r_) // (2 * r_)) / 1_000_000.0, 6)
    return sorted(out.items())


@pytest.mark.parametrize("direction", ["OUTGOING", "INCOMING", "BOTH"])
def test_sampled_vs_brute(spark, direction):
    rng = random.Random(71)
    pairs = [p for p in {(rng.randrange(10), rng.randrange(10))
                         for _ in range(32)} if p[0] != p[1]]
    got = sorted(
        tuple(r) for r in simrank_sampled(
            _edges(spark, pairs), 1, walk_length=4, walks_per_node=5,
            direction=direction,
        ).collect()
    )
    assert got == _brute_sampled(pairs, 1, 4, 5, direction=direction)


def test_sampled_duckdb_twin(spark):
    import duckdb

    rng = random.Random(83)
    pairs = [p for p in {(rng.randrange(9), rng.randrange(9))
                         for _ in range(26)} if p[0] != p[1]]
    got = sorted(
        tuple(r) for r in simrank_sampled(
            _edges(spark, pairs), 2, walk_length=5, walks_per_node=6,
            direction="BOTH",
        ).collect()
    )
    duck = duckdb.connect().execute(
        simrank_sampled_sql(
            _values_sql(pairs), 2, walk_length=5, walks_per_node=6,
            direction="BOTH",
        )
    ).fetchall()
    assert got == sorted(duck)


def test_sampled_cocite_tracks_exact(spark):
    # exact fixpoint: s(3, 4) = 0.4. With enough paired walks the
    # estimate approaches C * P(meet at t=1) = 0.8 * 0.5 = 0.4
    got = dict(
        (r["node"], r["score"]) for r in simrank_sampled(
            _edges(spark, COCITE), 3, walk_length=3, walks_per_node=64,
        ).collect()
    )
    assert 4 in got
    assert abs(got[4] - 0.4) < 0.15  # Monte-Carlo tolerance at R=64
    # dead-end starts (1, 2 have no in-edges) never meet
    assert 1 not in got and 2 not in got


def test_sampled_validates(spark):
    e = _edges(spark, COCITE)
    with pytest.raises(ValueError, match="direction"):
        simrank_sampled(e, 3, direction="X")
    with pytest.raises(ValueError, match="rational"):
        simrank_sampled(e, 3, c_num=5, c_den=5)
    with pytest.raises(ValueError, match=">= 1"):
        simrank_sampled(e, 3, walk_length=0)
