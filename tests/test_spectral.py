"""Spectral bipartition: known Fiedler splits on fixtures, the
canonical side contract, and the DuckDB twin (bit-exact)."""

import random

import duckdb
import pytest

from linkgraph.spectral import spectral_bipartition, spectral_bipartition_sql


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    rows = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst, weight)"


def test_path_graph_splits_in_the_middle(spark):
    res = spectral_bipartition(_edges(spark, [(i, i + 1) for i in range(5)]),
                               rounds=40)
    sides = {r["id"]: r["side"] for r in res.sides.collect()}
    res.release()
    assert sides[0] == 0  # canonical anchor
    assert {sides[0], sides[1], sides[2]} == {0}
    assert {sides[3], sides[4], sides[5]} == {1}
    assert res.stats["edge_cut"] == pytest.approx(1 / 5)


def test_two_cliques_bridge(spark):
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i + 10, j + 10) for i in range(5) for j in range(i + 1, 5)]
    res = spectral_bipartition(_edges(spark, c1 + c2 + [(4, 10)]), rounds=30)
    sides = {r["id"]: r["side"] for r in res.sides.collect()}
    res.release()
    assert len({sides[i] for i in range(5)}) == 1
    assert len({sides[i + 10] for i in range(5)}) == 1
    assert sides[0] != sides[10]
    assert res.stats["conductance"] == pytest.approx(1 / 21)


def test_duckdb_twin(spark):
    rng = random.Random(47)
    pairs = [(a, b) for a, b in
             {(rng.randrange(16), rng.randrange(16)) for _ in range(50)} if a != b]
    res = spectral_bipartition(_edges(spark, pairs), rounds=12, seed=3)
    got = sorted(map(tuple, res.sides.collect()))
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        spectral_bipartition_sql(_values_sql(pairs), rounds=12, seed=3)
    ).fetchall()))
    assert got == want


def test_bad_params(spark):
    with pytest.raises(ValueError):
        spectral_bipartition(_edges(spark, [(0, 1)]), rounds=0)
    with pytest.raises(ValueError):
        spectral_bipartition_sql("SELECT 1", rounds=0)
    with pytest.raises(ValueError):
        spectral_bipartition(
            _edges(spark, [(0, 1)]).filter("src < 0"), rounds=2
        )


def test_resume_equals_uninterrupted(spark, tmp_path):
    rng = random.Random(67)
    pairs = [(a, b) for a, b in
             {(rng.randrange(14), rng.randrange(14)) for _ in range(45)} if a != b]
    e = _edges(spark, pairs)
    full = spectral_bipartition(e, rounds=8, seed=2)
    want = sorted(map(tuple, full.sides.collect()))
    full.release()
    ckpt = str(tmp_path / "sp")
    part = spectral_bipartition(e, rounds=3, seed=2, checkpoint_dir=ckpt,
                                checkpoint_every=1)
    part.sides.count()
    part.release()
    res = spectral_bipartition(e, rounds=8, seed=2, checkpoint_dir=ckpt,
                               checkpoint_every=1, resume=True)
    got = sorted(map(tuple, res.sides.collect()))
    res.release()
    assert got == want


def test_resume_rejects_changed_graph(spark, tmp_path):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    ckpt = str(tmp_path / "sp2")
    r = spectral_bipartition(e, rounds=2, seed=2, checkpoint_dir=ckpt)
    r.sides.count()
    r.release()
    with pytest.raises(ValueError, match="resume mismatch"):
        spectral_bipartition(_edges(spark, [(0, 1), (1, 2), (2, 3)]),
                             rounds=3, seed=2, checkpoint_dir=ckpt,
                             resume=True)
