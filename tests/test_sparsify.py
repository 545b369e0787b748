"""Local-degree sparsifier tests: hand golden, either-endpoint-keeps
semantics, connectivity floor, python brute oracle, DuckDB twin."""

import math
import random

from linkgraph.graphs import sparsify_local_degree, sparsify_local_degree_sql


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _values_sql(rows):
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def _brute(rows, min_keep=1):
    w6m = {}
    seen = set()
    for a, b, w in rows:
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        k = (min(a, b), max(a, b))
        w6m[k] = w6m.get(k, 0) + int(round(w * 1e6))
    adj = {}
    for (a, b), w6 in w6m.items():
        adj.setdefault(a, []).append((b, w6))
        adj.setdefault(b, []).append((a, w6))
    kept = set()
    for n, nbrs in adj.items():
        d = len(nbrs)
        budget = max(min_keep, math.isqrt(d) + (0 if math.isqrt(d) ** 2 == d else 1))
        for b, _ in sorted(nbrs, key=lambda x: (-x[1], x[0]))[:budget]:
            kept.add((min(n, b), max(n, b)))
    return sorted((a, b, round(w6m[(a, b)] / 1e6, 6)) for a, b in kept)


def test_star_keeps_everything_via_leaves(spark):
    rows = [(0, i, float(i)) for i in range(1, 8)]
    got = _collect(sparsify_local_degree(_edges(spark, rows)))
    assert got == [(0, i, float(i)) for i in range(1, 8)]


def test_hand_golden_hub_prunes(spark):
    # node 0 has degree 4 -> keeps ceil(sqrt(4)) = 2 strongest; the
    # weakest edges survive only if the leaf side keeps them (it does,
    # leaves have degree 1) — so prune requires leaves of degree > 1
    rows = [(0, 1, 9.0), (0, 2, 8.0), (0, 3, 2.0), (0, 4, 1.0),
            (3, 4, 5.0), (3, 5, 6.0), (4, 5, 7.0)]
    got = _collect(sparsify_local_degree(_edges(spark, rows)))
    assert got == _brute(rows)
    # 0's weak edges to 3 and 4: 3 keeps {5:6, 4:5} (degree 3, budget
    # 2), 4 keeps {5:7, 3:5} — so (0,3) and (0,4) are pruned
    kept_pairs = {(a, b) for a, b, _ in got}
    assert (0, 3) not in kept_pairs and (0, 4) not in kept_pairs
    assert (0, 1) in kept_pairs and (0, 2) in kept_pairs


def test_every_node_keeps_at_least_one(spark):
    rng = random.Random(5)
    rows = [(a, b, float(rng.randrange(1, 20)))
            for a, b in {(rng.randrange(16), rng.randrange(16))
                         for _ in range(60)} if a != b]
    got = _collect(sparsify_local_degree(_edges(spark, rows)))
    nodes_in = {n for a, b, _ in rows for n in (a, b)}
    nodes_out = {n for a, b, _ in got for n in (a, b)}
    assert nodes_out == nodes_in
    assert got == _brute(rows)


def test_unweighted_ties_by_id(spark):
    rows = [(0, 5, 1.0), (0, 3, 1.0), (0, 7, 1.0), (0, 1, 1.0),
            (3, 5, 1.0), (5, 7, 1.0), (1, 3, 1.0), (1, 7, 1.0)]
    got = _collect(sparsify_local_degree(_edges(spark, rows)))
    assert got == _brute(rows)


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(23)
    rows = [(a, b, float(rng.randrange(1, 15)))
            for a, b in {(rng.randrange(13), rng.randrange(13))
                         for _ in range(44)} if a != b]
    got = _collect(sparsify_local_degree(_edges(spark, rows)))
    duck = duckdb.connect().execute(
        sparsify_local_degree_sql(_values_sql(rows))
    ).fetchall()
    assert got == sorted(duck)


# ---- configuration_model --------------------------------------------

import collections

import pytest

from linkgraph.graphs import configuration_model, configuration_model_sql


def _deg(rows):
    d = collections.Counter()
    for a, b in rows:
        d[a] += 1
        d[b] += 1
    return d


def test_configmodel_preserves_degrees(spark):
    rng = random.Random(11)
    pairs = [p for p in {(rng.randrange(14), rng.randrange(14))
                         for _ in range(44)} if p[0] != p[1]]
    e = _edges(spark, [(a, b, 1.0) for a, b in pairs])
    got = [(r["a"], r["b"]) for r in configuration_model(e, seed=5).collect()]
    und = {tuple(sorted(p)) for p in pairs}
    assert _deg(got) == _deg(und)
    assert all(a <= b for a, b in got)


def test_configmodel_seed_changes_pairing_not_degrees(spark):
    rng = random.Random(2)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(40)} if p[0] != p[1]]
    e = _edges(spark, [(a, b, 1.0) for a, b in pairs])
    g1 = sorted((r["a"], r["b"]) for r in configuration_model(e, seed=1).collect())
    g2 = sorted((r["a"], r["b"]) for r in configuration_model(e, seed=2).collect())
    assert _deg(g1) == _deg(g2)
    assert g1 != g2  # different worlds
    # same seed is reproducible
    g1b = sorted((r["a"], r["b"]) for r in configuration_model(e, seed=1).collect())
    assert g1 == g1b


def test_configmodel_duckdb_twin(spark):
    import duckdb

    rng = random.Random(29)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(34)} if p[0] != p[1]]
    rows = [(a, b, 1.0) for a, b in pairs]
    got = sorted(tuple(r)
                 for r in configuration_model(_edges(spark, rows), seed=9).collect())
    duck = duckdb.connect().execute(
        configuration_model_sql(_values_sql(rows), seed=9)
    ).fetchall()
    assert got == sorted(duck)


# ---- robustness_curve -----------------------------------------------

from linkgraph.graphs import robustness_curve, robustness_curve_sql


def _brute_robustness(pairs, steps, frac, strategy, seed=0):
    import hashlib
    import math

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    if strategy == "degree":
        order = sorted(deg, key=lambda n: (-deg[n], n))
    else:
        order = sorted(
            deg,
            key=lambda n: (int(hashlib.md5(f"{n}#{seed}".encode())
                               .hexdigest()[:15], 16), n),
        )
    n = len(order)
    f6 = int(round(frac * 1e6))
    out = []
    for s in range(steps + 1):
        k = -(-(n * s * f6) // 1_000_000)
        alive = set(order[k:])
        parent = {x: x for x in alive}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in und:
            if a in alive and b in alive and find(a) != find(b):
                parent[find(a)] = find(b)
        sizes = collections.Counter(find(x) for x in alive)
        out.append((s, k, max(sizes.values()) if sizes else 0))
    return out


@pytest.mark.parametrize("strategy", ["degree", "hash"])
def test_robustness_vs_brute(spark, strategy):
    rng = random.Random(13)
    pairs = [p for p in {(rng.randrange(15), rng.randrange(15))
                         for _ in range(40)} if p[0] != p[1]]
    e = _edges(spark, [(a, b, 1.0) for a, b in pairs])
    got = sorted(tuple(r) for r in robustness_curve(
        e, steps=3, frac_per_step=0.2, strategy=strategy).collect())
    assert got == sorted(_brute_robustness(pairs, 3, 0.2, strategy))


def test_robustness_attack_collapses_faster_on_star(spark):
    # star + ring: removing the hub first disconnects the leaves
    rows = [(0, i, 1.0) for i in range(1, 9)]
    e = _edges(spark, rows)
    atk = {r["step"]: r["giant_size"] for r in robustness_curve(
        e, steps=1, frac_per_step=0.12, strategy="degree").collect()}
    rnd = {r["step"]: r["giant_size"] for r in robustness_curve(
        e, steps=1, frac_per_step=0.12, strategy="hash", seed=3).collect()}
    assert atk[0] == 9
    assert atk[1] == 1  # hub removed -> isolated leaves
    assert rnd[1] >= atk[1]


def test_robustness_duckdb_twin(spark):
    import duckdb

    rng = random.Random(31)
    pairs = [p for p in {(rng.randrange(13), rng.randrange(13))
                         for _ in range(36)} if p[0] != p[1]]
    rows = [(a, b, 1.0) for a, b in pairs]
    got = sorted(tuple(r) for r in robustness_curve(
        _edges(spark, rows), steps=3, frac_per_step=0.15).collect())
    duck = duckdb.connect().execute(
        robustness_curve_sql(_values_sql(rows), steps=3, frac_per_step=0.15)
    ).fetchall()
    assert got == sorted(duck)


def test_robustness_validates(spark):
    e = _edges(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError, match="steps"):
        robustness_curve(e, steps=0)
    with pytest.raises(ValueError, match="frac_per_step"):
        robustness_curve(e, frac_per_step=1.5)
    with pytest.raises(ValueError, match="strategy"):
        robustness_curve(e, strategy="x")


# ---- motif_significance ---------------------------------------------

from linkgraph.graphs import motif_significance, motif_significance_sql


def test_motif_significance_triangle_rich_is_positive(spark):
    import itertools

    # two K5 cliques: far more triangles than any degree-preserving
    # rewiring of the same sequence
    K = list(itertools.combinations(range(5), 2)) + \
        list(itertools.combinations(range(5, 10), 2))
    row = motif_significance(
        _edges(spark, [(a, b, 1.0) for a, b in K]), n_samples=4
    ).collect()[0]
    assert row["observed"] == 20.0
    assert row["z"] is None or row["z"] > 1.0
    assert row["null_mean"] < row["observed"]


def test_motif_significance_duckdb_twin(spark):
    import duckdb

    rng = random.Random(3)
    pairs = [p for p in {(rng.randrange(14), rng.randrange(14))
                         for _ in range(50)} if p[0] != p[1]]
    rows = [(a, b, 1.0) for a, b in pairs]
    got = [tuple(r) for r in motif_significance(
        _edges(spark, rows), n_samples=3).collect()]
    duck = duckdb.connect().execute(
        motif_significance_sql(_values_sql(rows), n_samples=3)
    ).fetchall()
    assert got == duck


def test_motif_significance_zero_variance_null_z(spark):
    # a single edge: every rewiring has 0 triangles -> std 0 -> z NULL
    row = motif_significance(
        _edges(spark, [(0, 1, 1.0)]), n_samples=2
    ).collect()[0]
    assert row["z"] is None and row["null_std"] == 0.0


def test_motif_significance_validates(spark):
    with pytest.raises(ValueError, match="n_samples"):
        motif_significance(_edges(spark, [(0, 1, 1.0)]), n_samples=0)


# ---- forest_fire_sample ---------------------------------------------

import hashlib

from linkgraph.graphs import forest_fire_sample, forest_fire_sample_sql


def _brute_ff(pairs, seeds, p_num, p_den, max_rounds, burn_seed=0,
              direction="BOTH"):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        if direction in ("OUTGOING", "BOTH"):
            adj.setdefault(a, set()).add(b)
        if direction in ("INCOMING", "BOTH"):
            adj.setdefault(b, set()).add(a)

    def coin(u, v):
        h = int(hashlib.md5(f"{u}|{v}#ff-{burn_seed}".encode())
                .hexdigest()[:15], 16)
        return h % p_den < p_num

    burned = {s: 0 for s in seeds}
    frontier = set(seeds)
    for t in range(1, max_rounds + 1):
        new = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in burned and coin(u, v):
                    new.add(v)
        for v in new:
            burned[v] = t
        frontier = new
        if not new:
            break
    return sorted(burned.items())


@pytest.mark.parametrize("direction", ["BOTH", "OUTGOING"])
def test_forest_fire_vs_brute(spark, direction):
    rng = random.Random(19)
    pairs = [p for p in {(rng.randrange(15), rng.randrange(15))
                         for _ in range(46)} if p[0] != p[1]]
    e = _edges(spark, [(a, b, 1.0) for a, b in pairs])
    got = sorted(tuple(r) for r in forest_fire_sample(
        e, [0, 7], p_num=1, p_den=2, max_rounds=6, direction=direction,
    ).collect())
    assert got == _brute_ff(pairs, [0, 7], 1, 2, 6, direction=direction)


def test_forest_fire_p1_is_bfs_reachability(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (5, 6)]
    e = _edges(spark, [(a, b, 1.0) for a, b in pairs])
    got = sorted(tuple(r) for r in forest_fire_sample(
        e, [0], p_num=1, p_den=1, max_rounds=6).collect())
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_forest_fire_duckdb_twin(spark):
    import duckdb

    rng = random.Random(5)
    pairs = [p for p in {(rng.randrange(16), rng.randrange(16))
                         for _ in range(50)} if p[0] != p[1]]
    rows = [(a, b, 1.0) for a, b in pairs]
    got = sorted(tuple(r) for r in forest_fire_sample(
        _edges(spark, rows), [0], max_rounds=5).collect())
    duck = duckdb.connect().execute(
        forest_fire_sample_sql(_values_sql(rows), [0], max_rounds=5)
    ).fetchall()
    assert got == sorted(duck)


def test_forest_fire_validates(spark):
    e = _edges(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError, match="seeds"):
        forest_fire_sample(e, [])
    with pytest.raises(ValueError, match="rational"):
        forest_fire_sample(e, [0], p_num=3, p_den=2)
    with pytest.raises(ValueError, match="direction"):
        forest_fire_sample(e, [0], direction="X")
