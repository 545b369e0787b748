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
