"""Affinity clustering: hand-derived dendrogram levels, idempotent
trailing levels, and the DuckDB twin (recursive-closure components)."""

import random

import duckdb
import pytest

from linkgraph.affinity import affinity_clustering, affinity_clustering_sql


def _edges(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _values_sql(triples):
    rows = ", ".join(f"({a}, {b}, {w})" for a, b, w in triples)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst, weight)"


def _levels(rows):
    out = {}
    for r in rows:
        out.setdefault(r["level"], {})[r["id"]] = r["cluster"]
    return out


def test_chain_dendrogram(spark):
    res = affinity_clustering(
        _edges(spark, [(0, 1, 1.0), (1, 2, 3.0), (2, 3, 2.0)]), levels=2
    )
    lv = _levels(res.assignments.collect())
    res.release()
    # level 1: nearest-neighbor pairs (0,1) and (2,3)
    assert lv[1] == {0: 0, 1: 0, 2: 2, 3: 2}
    # level 2: the two clusters merge over the remaining (1,2) edge
    assert lv[2] == {0: 0, 1: 0, 2: 0, 3: 0}
    assert res.stats["clusters_per_level"] == [2, 1]


def test_trailing_levels_idempotent(spark):
    e = _edges(spark, [(0, 1, 1.0), (1, 2, 3.0), (2, 3, 2.0)])
    r5 = affinity_clustering(e, levels=5)
    lv = _levels(r5.assignments.collect())
    r5.release()
    assert lv[5] == lv[2] == lv[3] == lv[4]
    assert r5.stats["merged_levels"] == 2


def test_duckdb_twin(spark):
    rng = random.Random(53)
    triples = [
        (a, b, round(rng.uniform(0.5, 9.5), 2))
        for a, b in {(rng.randrange(24), rng.randrange(24)) for _ in range(70)}
        if a != b
    ]
    res = affinity_clustering(_edges(spark, triples), levels=3)
    got = sorted(map(tuple, res.assignments.collect()))
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        affinity_clustering_sql(_values_sql(triples), levels=3)
    ).fetchall()))
    assert got == want


def test_bad_params(spark):
    with pytest.raises(ValueError):
        affinity_clustering(_edges(spark, [(0, 1, 1.0)]), levels=0)
    with pytest.raises(ValueError):
        affinity_clustering_sql("SELECT 1", levels=0)
