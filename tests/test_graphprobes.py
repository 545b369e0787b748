"""Doulion sampled triangles, Burt effective size, power-law MLE:
hand-derived goldens, python oracles, DuckDB twins."""

import math
import random

import duckdb
import pytest

from linkgraph.graphs import (
    effective_size,
    effective_size_sql,
    powerlaw_fit,
    powerlaw_fit_sql,
)
from linkgraph.triangles import approx_triangle_count, approx_triangle_sql


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    rows = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst, weight)"


def _rand_pairs(seed, n=20, m=80):
    rng = random.Random(seed)
    return [(a, b) for a, b in
            {(rng.randrange(n), rng.randrange(n)) for _ in range(m)} if a != b]


def test_doulion_p1_is_exact_and_twin(spark):
    pairs = _rand_pairs(73)
    e = _edges(spark, pairs)
    row = approx_triangle_count(e, p=1.0).first()
    # p=1: sampled == exact count
    from linkgraph.triangles import triangle_count
    exact = triangle_count(e).triangles.count()
    assert row["sampled_triangles"] == exact
    assert row["est_triangles"] == pytest.approx(exact)
    got = sorted(map(tuple, approx_triangle_count(e, p=0.6, seed=5).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        approx_triangle_sql(_values_sql(pairs), p=0.6, seed=5)
    ).fetchall()))
    assert got == want
    with pytest.raises(ValueError):
        approx_triangle_count(e, p=0.0)


def test_effective_size_star_and_clique(spark):
    # star center: no alter ties -> eff_size == degree; K4: every
    # node deg 3, 3 triangles each -> redundancy 2, eff_size 1
    star = [(0, i) for i in range(1, 5)]
    es = {r["id"]: (r["eff_size"], r["redundancy"])
          for r in effective_size(_edges(spark, star)).collect()}
    assert es[0] == (4.0, 0.0)
    assert es[1] == (1.0, 0.0)
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    es4 = {r["id"]: (r["eff_size"], r["redundancy"])
           for r in effective_size(_edges(spark, k4)).collect()}
    assert all(v == (1.0, 2.0) for v in es4.values())


def test_effective_size_twin(spark):
    pairs = _rand_pairs(79)
    got = sorted(map(tuple, effective_size(_edges(spark, pairs)).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        effective_size_sql(_values_sql(pairs))
    ).fetchall()))
    assert got == want


def test_powerlaw_fit_python_oracle_and_twin(spark):
    pairs = _rand_pairs(83, n=30, m=120)
    row = powerlaw_fit(_edges(spark, pairs), xmin=2).first()
    deg = {}
    for a, b in {(min(p), max(p)) for p in pairs}:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ds = [d for d in deg.values() if d >= 2]
    s7 = sum(int(round(round(math.log(d / 1.5), 7) * 1e7)) for d in ds)
    assert row["n_nodes"] == len(ds)
    assert row["alpha"] == pytest.approx(round(1.0 + len(ds) * 1e7 / s7, 6))
    got = sorted(map(tuple, powerlaw_fit(_edges(spark, pairs), xmin=2).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        powerlaw_fit_sql(_values_sql(pairs), xmin=2)
    ).fetchall()))
    assert got == want
    with pytest.raises(ValueError):
        powerlaw_fit(_edges(spark, pairs), xmin=0)


def test_powerlaw_no_qualifying_degrees_is_null(spark):
    row = powerlaw_fit(_edges(spark, [(0, 1)]), xmin=5).first()
    assert row["n_nodes"] == 0 and row["alpha"] is None


def test_degree_knn_star_and_twin(spark):
    from linkgraph.graphs import degree_knn, degree_knn_sql

    star = _edges(spark, [(0, i) for i in range(1, 5)])
    got = {r["k"]: (r["n_nodes"], r["knn"]) for r in degree_knn(star).collect()}
    assert got == {1: (4, 4.0), 4: (1, 1.0)}
    pairs = _rand_pairs(89)
    got2 = sorted(map(tuple, degree_knn(_edges(spark, pairs)).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        degree_knn_sql(_values_sql(pairs))
    ).fetchall()))
    assert got2 == want


def test_clustering_by_degree_goldens_and_twin(spark):
    from linkgraph.graphs import clustering_by_degree, clustering_by_degree_sql

    tri = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    got = sorted(map(tuple, clustering_by_degree(tri).collect()))
    assert got == [(2, 3, 1.0)]
    star = _edges(spark, [(0, i) for i in range(1, 5)])
    got_s = {r["k"]: r["c"] for r in clustering_by_degree(star).collect()}
    assert got_s == {1: None, 4: 0.0}
    pairs = _rand_pairs(113)
    got2 = sorted(map(tuple,
                      clustering_by_degree(_edges(spark, pairs)).collect()),
                  key=lambda t: t[0])
    want = sorted(map(tuple, duckdb.connect().execute(
        clustering_by_degree_sql(_values_sql(pairs))
    ).fetchall()), key=lambda t: t[0])
    assert got2 == want


def test_ifub_diameter_matches_all_pairs(spark):
    from linkgraph.paths import graph_diameter, ifub_diameter

    # path P7: diameter 6
    path = _edges(spark, [(i, i + 1) for i in range(6)])
    assert ifub_diameter(path).first()["diameter"] == 6
    # random CONNECTED graphs: chain backbone + random chords
    for seed in (127, 131):
        rng = random.Random(seed)
        chords = [(rng.randrange(18), rng.randrange(18)) for _ in range(14)]
        pairs = [(i, i + 1) for i in range(17)] + [
            (a, b) for a, b in chords if a != b
        ]
        e = _edges(spark, pairs)
        want = graph_diameter(e, direction="BOTH").first()["diameter"]
        got = ifub_diameter(e).first()["diameter"]
        assert got == want, seed
    with pytest.raises(ValueError):
        ifub_diameter(path.filter("src < 0"))
