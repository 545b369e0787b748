"""Influence maximization tests: p=1 structural goldens, an
independent pure-Python md5-world oracle, the DuckDB twin, roots
override, and validation."""

import hashlib
import random

import pytest

from linkgraph.influence import (
    influence_maximization,
    influence_maximization_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect(res):
    return sorted(tuple(r) for r in res.seeds.collect())


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_im(pairs, k, n_samples, p_num, p_den, max_hops=12, roots=None):
    """Independent oracle replicating the stable_hash64 world draw."""
    ed = sorted({p for p in pairs if p[0] != p[1]})
    nodes = sorted({n for p in ed for n in p})
    rr = {}
    for s in range(n_samples):
        if roots is not None:
            root = roots[s]
        else:
            root = min(nodes, key=lambda i: (_h(f"{i}|{s}#ic-root"), i))
        live = {
            (u, v) for u, v in ed
            if _h(f"{u}|{v}|{s}#ic-live") % p_den < p_num
        }
        reach = {root}
        for _ in range(max_hops):
            new = {u for u, v in live if v in reach} - reach
            if not new:
                break
            reach |= new
        rr[s] = reach
    out, covered = [], set()
    for r in range(1, k + 1):
        cnt = {}
        for s, rs in rr.items():
            if s in covered:
                continue
            for n in rs:
                cnt[n] = cnt.get(n, 0) + 1
        if not cnt:
            break
        best = min(cnt, key=lambda n: (-cnt[n], n))
        out.append((r, best, cnt[best]))
        covered |= {s for s, rs in rr.items() if best in rs and s not in covered}
    return sorted(out)


def test_star_p1_single_seed(spark):
    # p = 1: every world is the full graph; node 0 reaches every root,
    # so it covers all worlds in round 1 and greedy stops.
    pairs = [(0, i) for i in range(1, 6)]
    res = influence_maximization(
        _edges(spark, pairs), k=3, n_samples=8, p_num=1, p_den=1
    )
    got = _collect(res)
    assert got == [(1, 0, 8)]
    assert res.covered == 8


def test_chain_p1(spark):
    res = influence_maximization(
        _edges(spark, [(0, 1), (1, 2)]), k=2, n_samples=6, p_num=1, p_den=1
    )
    assert _collect(res) == [(1, 0, 6)]


@pytest.mark.parametrize("pd", [(1, 3), (1, 2)])
def test_random_vs_brute(spark, pd):
    p_num, p_den = pd
    rng = random.Random(13)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(40)} if p[0] != p[1]]
    res = influence_maximization(
        _edges(spark, pairs), k=3, n_samples=16,
        p_num=p_num, p_den=p_den, max_hops=8,
    )
    assert _collect(res) == _brute_im(pairs, 3, 16, p_num, p_den, max_hops=8)


def test_roots_override(spark):
    rng = random.Random(3)
    pairs = [p for p in {(rng.randrange(10), rng.randrange(10))
                         for _ in range(30)} if p[0] != p[1]]
    roots = {s: (s * 3) % 10 for s in range(8)}
    # ensure the forced roots exist in the graph's node set
    nodes = {n for p in pairs for n in p}
    roots = {s: r for s, r in roots.items() if r in nodes}
    roots_df = spark.createDataFrame(
        [(s, r) for s, r in roots.items()], "s long, node long"
    )
    res = influence_maximization(
        _edges(spark, pairs), k=2, n_samples=len(roots),
        p_num=1, p_den=2, max_hops=8, roots=roots_df,
    )
    want = _brute_im(
        pairs, 2, len(roots), 1, 2, max_hops=8,
        roots=[roots[s] for s in sorted(roots)],
    )
    assert _collect(res) == want


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(31)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(36)} if p[0] != p[1]]
    res = influence_maximization(
        _edges(spark, pairs), k=3, n_samples=12, p_num=1, p_den=3, max_hops=8
    )
    got = _collect(res)
    rows = duckdb.connect().execute(
        influence_maximization_sql(
            _values_sql(pairs), k=3, n_samples=12,
            p_num=1, p_den=3, max_hops=8,
        )
    ).fetchall()
    assert got == sorted(rows)


def test_validates_arguments(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="k and n_samples"):
        influence_maximization(e, k=0)
    with pytest.raises(ValueError, match="rational"):
        influence_maximization(e, p_num=5, p_den=4)
