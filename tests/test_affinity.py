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


def test_resume_equals_uninterrupted(spark, tmp_path):
    rng = random.Random(71)
    triples = [
        (a, b, round(rng.uniform(0.5, 9.5), 2))
        for a, b in {(rng.randrange(18), rng.randrange(18)) for _ in range(50)}
        if a != b
    ]
    e = _edges(spark, triples)
    full = affinity_clustering(e, levels=3)
    want = sorted(map(tuple, full.assignments.collect()))
    want_cl = full.stats["clusters_per_level"]
    full.release()
    ckpt = str(tmp_path / "af")
    part = affinity_clustering(e, levels=1, checkpoint_dir=ckpt,
                               checkpoint_every=1)
    part.assignments.count()
    part.release()
    res = affinity_clustering(e, levels=3, checkpoint_dir=ckpt,
                              checkpoint_every=1, resume=True)
    got = sorted(map(tuple, res.assignments.collect()))
    got_cl = res.stats["clusters_per_level"]
    res.release()
    assert got == want
    assert got_cl == want_cl


def test_resume_rejects_changed_graph(spark, tmp_path):
    e = _edges(spark, [(0, 1, 1.0), (1, 2, 2.0)])
    ckpt = str(tmp_path / "af2")
    r = affinity_clustering(e, levels=1, checkpoint_dir=ckpt)
    r.assignments.count()
    r.release()
    with pytest.raises(ValueError, match="resume mismatch"):
        affinity_clustering(_edges(spark, [(0, 1, 1.0), (1, 2, 3.0)]),
                            levels=2, checkpoint_dir=ckpt, resume=True)
