"""Triangle (k=3) clique-percolation tests: overlap/merge goldens, a
brute-force union-find oracle on random graphs, the DuckDB twin, and
hygiene."""

import random

import pytest

from linkgraph.percolation import clique_percolation, clique_percolation_sql

# two triangles overlapping at ONE NODE (not an edge): two communities
NODE_OVERLAP = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (5, 6)]
# two triangles sharing the EDGE (1,2): one community
EDGE_SHARE = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect(res):
    got = sorted((r["id"], r["community"]) for r in res.memberships.collect())
    res.release()
    return got


def test_node_overlap_two_communities(spark):
    res = clique_percolation(_edges(spark, NODE_OVERLAP))
    got = _collect(res)
    assert got == [
        (0, "0|1|2"), (1, "0|1|2"), (2, "0|1|2"),
        (2, "2|3|4"), (3, "2|3|4"), (4, "2|3|4"),
    ]
    assert res.community_count == 2 and res.triangle_count == 2


def test_edge_share_merges(spark):
    res = clique_percolation(_edges(spark, EDGE_SHARE))
    got = _collect(res)
    assert got == [(n, "0|1|2") for n in (0, 1, 2, 3)]
    assert res.community_count == 1 and res.triangle_count == 2


def test_no_triangles_empty(spark):
    res = clique_percolation(_edges(spark, [(0, 1), (1, 2), (3, 4)]))
    assert _collect(res) == []
    assert res.community_count == 0


def test_k_not_3_raises(spark):
    with pytest.raises(ValueError, match="k=3"):
        clique_percolation(_edges(spark, EDGE_SHARE), k=4)


def _brute_percolation(pairs):
    """Independent oracle: enumerate triangles, union-find over shared
    edges, label = min 'a|b|c' key, explode memberships."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = sorted(
        (a, b, c)
        for a, b in und
        for c in sorted(adj[a] & adj[b])
        if c > b
    )
    parent = {i: i for i in range(len(tris))}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    by_edge = {}
    for i, (a, b, c) in enumerate(tris):
        for e in ((a, b), (a, c), (b, c)):
            by_edge.setdefault(e, []).append(i)
    for members in by_edge.values():
        for j in members[1:]:
            parent[find(j)] = find(members[0])
    comps = {}
    for i, t in enumerate(tris):
        comps.setdefault(find(i), []).append(t)
    out = set()
    for ts in comps.values():
        label = min("|".join(map(str, t)) for t in ts)
        for t in ts:
            for n in t:
                out.add((n, label))
    return sorted(out)


@pytest.mark.parametrize("seed", [3, 11])
def test_random_vs_brute(spark, seed):
    rng = random.Random(seed)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(34)} if p[0] != p[1]]
    res = clique_percolation(_edges(spark, pairs))
    assert _collect(res) == _brute_percolation(pairs)


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(19)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(30)} if p[0] != p[1]]
    res = clique_percolation(_edges(spark, pairs))
    got = _collect(res)
    rows = duckdb.connect().execute(
        clique_percolation_sql(_values_sql(pairs))
    ).fetchall()
    assert got == sorted(rows)


def test_checkpointed_equals_plain(spark, tmp_path):
    pairs = NODE_OVERLAP + EDGE_SHARE + [(4, 5), (5, 0), (6, 0)]
    plain = _collect(clique_percolation(_edges(spark, pairs)))
    ck = _collect(
        clique_percolation(
            _edges(spark, pairs),
            checkpoint_dir=str(tmp_path / "cpm"), checkpoint_every=1,
        )
    )
    assert ck == plain
