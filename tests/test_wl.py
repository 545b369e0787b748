"""WL color refinement: hand-derived partitions on fixtures, the
sort-vs-sum encoding cross-check, monotone class counts, and the
DuckDB twin (value-exact)."""

import random

import pytest

from linkgraph.wl import wl_refinement, wl_refinement_sql


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    rows = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst, weight)"


def _partition(colors):
    """{color: frozenset(ids)} → set of frozensets (colors are opaque)."""
    groups = {}
    for r in colors:
        groups.setdefault(r["wl_color"], set()).add(r["id"])
    return {frozenset(g) for g in groups.values()}


def test_path_graph_role_classes(spark):
    res = wl_refinement(_edges(spark, [(0, 1), (1, 2), (2, 3)]), rounds=2)
    part = _partition(res.colors.collect())
    res.release()
    assert part == {frozenset({0, 3}), frozenset({1, 2})}


def test_cycle_is_one_class_every_round(spark):
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    res = wl_refinement(_edges(spark, c6), rounds=3)
    assert res.n_classes == 1
    assert res.stats["classes_per_round"] == [1, 1, 1, 1]
    res.release()


def test_triangle_plus_path_components(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5)]
    res = wl_refinement(_edges(spark, pairs), rounds=3)
    part = _partition(res.colors.collect())
    res.release()
    assert part == {frozenset({0, 1, 2}), frozenset({3, 5}), frozenset({4})}


def test_classes_monotone_and_sum_matches_sort(spark):
    rng = random.Random(31)
    pairs = [(a, b) for a, b in
             {(rng.randrange(20), rng.randrange(20)) for _ in range(70)} if a != b]
    edges = _edges(spark, pairs)
    rs = wl_refinement(edges, rounds=3, combine="sort")
    rm = wl_refinement(edges, rounds=3, combine="sum")
    ps = _partition(rs.colors.collect())
    pm = _partition(rm.colors.collect())
    cls = rs.stats["classes_per_round"]
    rs.release()
    rm.release()
    assert ps == pm
    assert all(a <= b for a, b in zip(cls, cls[1:]))


@pytest.mark.parametrize("combine", ["sort", "sum"])
def test_duckdb_twin(spark, combine):
    import duckdb

    rng = random.Random(37)
    pairs = [(a, b) for a, b in
             {(rng.randrange(14), rng.randrange(14)) for _ in range(40)} if a != b]
    res = wl_refinement(_edges(spark, pairs), rounds=3, seed=7, combine=combine)
    got = sorted(map(tuple, res.colors.collect()))
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        wl_refinement_sql(_values_sql(pairs), 3, seed=7, combine=combine)
    ).fetchall()))
    assert got == want


def test_bad_params(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        wl_refinement(e, rounds=-1)
    with pytest.raises(ValueError):
        wl_refinement(e, combine="xor")
    with pytest.raises(ValueError):
        wl_refinement_sql("SELECT 1", 2, combine="xor")


def test_resume_equals_uninterrupted(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 5)]
    e = _edges(spark, pairs)
    full = wl_refinement(e, rounds=4, seed=3)
    want = sorted(map(tuple, full.colors.collect()))
    want_classes = full.stats["classes_per_round"]
    full.release()
    ckpt = str(tmp_path / "wl")
    part = wl_refinement(e, rounds=2, seed=3, checkpoint_dir=ckpt,
                         checkpoint_every=1)
    part.colors.count()
    part.release()
    res = wl_refinement(e, rounds=4, seed=3, checkpoint_dir=ckpt,
                        checkpoint_every=1, resume=True)
    got = sorted(map(tuple, res.colors.collect()))
    got_classes = res.stats["classes_per_round"]
    res.release()
    assert got == want
    assert got_classes == want_classes


def test_resume_rejects_changed_graph_or_params(spark, tmp_path):
    e = _edges(spark, [(0, 1), (1, 2)])
    ckpt = str(tmp_path / "wl2")
    r = wl_refinement(e, rounds=2, seed=3, checkpoint_dir=ckpt)
    r.colors.count()
    r.release()
    with pytest.raises(ValueError, match="resume mismatch"):
        wl_refinement(_edges(spark, [(0, 1), (1, 3)]), rounds=3, seed=3,
                      checkpoint_dir=ckpt, resume=True)
    with pytest.raises(ValueError, match="resume mismatch"):
        wl_refinement(e, rounds=3, seed=4, checkpoint_dir=ckpt, resume=True)
