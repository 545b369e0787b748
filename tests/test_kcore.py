"""k-core / coreness tests: hand goldens, a random-graph oracle
against an independent textbook peeling implementation, and input
hygiene (self-loops, duplicate + symmetric edges)."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph.kcore import core_numbers, k_core


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


# triangle 1-2-3 with a pendant chain 3-4-5
CHAIN = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]


def test_k_core_golden_multi_round_peel(spark):
    # k=2: round 1 drops 5 (deg 1), round 2 drops 4 (deg fell to 1),
    # round 3 confirms the triangle is stable -> 3 rounds total
    res = k_core(_edges(spark, CHAIN), k=2)
    got = {r["id"]: r["degree"] for r in res.members.collect()}
    res.release()
    assert got == {1: 2, 2: 2, 3: 2}
    assert res.rounds == 3


def test_k_core_empty_when_k_exceeds_graph(spark):
    res = k_core(_edges(spark, CHAIN), k=3)
    n = res.members.count()
    res.release()
    assert n == 0


def test_core_numbers_golden(spark):
    res = core_numbers(_edges(spark, CHAIN))
    got = {r["id"]: r["coreness"] for r in res.coreness.collect()}
    res.release()
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_kcore_ignores_self_loops_and_duplicate_directions(spark):
    noisy = CHAIN + [(2, 1), (3, 3), (1, 2), (5, 4)]
    r1, r2 = core_numbers(_edges(spark, CHAIN)), core_numbers(_edges(spark, noisy))
    clean = r1.coreness.collect()
    dirty = r2.coreness.collect()
    r1.release(); r2.release()
    assert sorted(map(tuple, clean)) == sorted(map(tuple, dirty))


def _peel_coreness(pairs):
    """Independent oracle: textbook min-degree peeling (Batagelj-
    Zaversnik order), no h-index anywhere."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in adj.items()}
    core = {}
    alive = set(adj)
    while alive:
        n = min(alive, key=lambda x: (deg[x], x))
        core[n] = max(core.get(n, 0), deg[n])
        k = core[n]
        alive.remove(n)
        for m in adj[n]:
            if m in alive:
                deg[m] -= 1
                core[m] = k  # floor propagates: later pops take max
        core[n] = k
    return core


def _true_coreness(pairs):
    """Classic definition: largest k such that the node survives
    k-core peeling — computed by brute peeling per k."""
    nodes = set()
    for a, b in pairs:
        if a != b:
            nodes.update((a, b))
    core = {n: 0 for n in nodes}
    k = 1
    while True:
        alive = set(nodes)
        changed = True
        while changed:
            deg = {}
            for a, b in pairs:
                if a != b and a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
            drop = {n for n in alive if deg.get(n, 0) < k}
            changed = bool(drop)
            alive -= drop
        if not alive:
            return core
        for n in alive:
            core[n] = k
        k += 1


def test_core_numbers_random_graph_oracle(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    pairs = sorted({
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
        )
        if a != b
    })
    want = _true_coreness(pairs)
    cres = core_numbers(_edges(spark, pairs))
    got = {r["id"]: r["coreness"] for r in cres.coreness.collect()}
    cres.release()
    assert got == want
    # and k_core membership agrees with the coreness threshold for a
    # mid-range k
    kmax = max(want.values())
    k = max(2, kmax - 1)
    kres = k_core(_edges(spark, pairs), k=k)
    members = {r["id"] for r in kres.members.collect()}
    kres.release()
    assert members == {n for n, c in want.items() if c >= k}


def test_s_core_textbook_peel(spark):
    """Weighted triangle {1,2,3} with heavy edges plus a light
    pendant: peeling at s=3.0 drops the pendant AND recomputes the
    anchor's strength without it."""
    from linkgraph.kcore import s_core

    e = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 2.0), (1, 3, 2.0), (3, 4, 1.5)],
        "src long, dst long, weight double",
    )
    res = s_core(e, s=3.0)
    got = {r.id: r.strength for r in res.members.collect()}
    res.release()
    # pendant 4 (strength 1.5) peels; 3's strength drops 5.5 -> 4.0
    assert got == {1: 4.0, 2: 4.0, 3: 4.0}
    # s above the cascade point empties the core (total collapse)
    res = s_core(e, s=4.5)
    assert res.members.count() == 0
    res.release()
    # unweighted frame (no weight column): s_core == k_core on counts
    e2 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], "src long, dst long"
    )
    res = s_core(e2, s=3.0)
    assert {r.id: r.strength for r in res.members.collect()} == {i: 3.0 for i in range(4)}
    res.release()


def test_s_core_python_replay_and_twin(spark):
    import random as _random

    import duckdb

    from linkgraph.kcore import s_core, s_core_sql

    rng = _random.Random(67)
    tri = [
        (a, b, float(rng.randint(1, 5)))
        for a, b in {(rng.randrange(12), rng.randrange(12)) for _ in range(40)}
        if a != b
    ]
    e = spark.createDataFrame(tri, "src long, dst long, weight double")
    res = s_core(e, s=7.0)
    got = {(r.id, r.strength) for r in res.members.collect()}
    res.release()
    # python replay of the peel
    pair_w = {}
    for a, b, w in tri:
        key = (min(a, b), max(a, b))
        # distinct (src,dst,w) triples then per-pair sums, both orientations
        pair_w.setdefault(key, set()).add((a, b, w))
    wsum = {k: sum(w for _, _, w in v) for k, v in pair_w.items()}
    alive = {x for k in wsum for x in k}
    while True:
        st = {u: 0.0 for u in alive}
        for (a, b), w in wsum.items():
            if a in alive and b in alive:
                st[a] += w
                st[b] += w
        nxt = {u for u in alive if st[u] >= 7.0}
        if nxt == alive:
            break
        alive = nxt
    want = {(u, round(st[u], 6)) for u in alive}
    assert got == want
    # DuckDB twin
    vals = ", ".join(f"({a}, {b}, {w!r})" for a, b, w in tri)
    sql = s_core_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)", 7.0, n_rounds=8)
    twin = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == twin


def test_s_core_resume_equals_uninterrupted(spark, tmp_path):
    import random as _random

    from linkgraph.kcore import s_core

    rng = _random.Random(71)
    tri = [
        (a, b, float(rng.randint(1, 4)))
        for a, b in {(rng.randrange(10), rng.randrange(10)) for _ in range(30)}
        if a != b
    ]
    e = spark.createDataFrame(tri, "src long, dst long, weight double")
    full = s_core(e, s=6.0)
    want = {(r.id, r.strength) for r in full.members.collect()}
    full.release()
    ckpt = str(tmp_path / "score")
    part = s_core(e, s=6.0, max_iter=1, checkpoint_dir=ckpt)
    part.members.count()
    part.release()
    res = s_core(e, s=6.0, checkpoint_dir=ckpt, resume=True)
    got = {(r.id, r.strength) for r in res.members.collect()}
    res.release()
    assert got == want
    # resuming with a different s must refuse
    import pytest

    with pytest.raises(ValueError, match="s_core resume mismatch"):
        s_core(e, s=9.0, checkpoint_dir=ckpt, resume=True)
