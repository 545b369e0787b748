"""Onion decomposition tests: chain+triangle golden, coreness
consistency with core_numbers, a brute-force python peel oracle, the
DuckDB twin, and resume."""

import random

import pytest

from linkgraph.kcore import core_numbers, onion_layers, onion_layers_sql

CHAIN_TRI = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (3, 5)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect(res):
    got = sorted(tuple(r) for r in res.coreness.collect())
    res.release()
    return got


def _brute_onion(pairs):
    sym = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    alive = {n for p in sym for n in p}
    out, k, layer = [], 0, 0
    while alive:
        deg = {n: 0 for n in alive}
        for a, b in sym:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        k = max(k, min(deg.values()))
        layer += 1
        peel = {n for n, d in deg.items() if d <= k}
        out += [(n, layer, k) for n in peel]
        alive -= peel
    return sorted(out)


def test_chain_triangle_golden(spark):
    res = onion_layers(_edges(spark, CHAIN_TRI))
    got = _collect(res)
    # chain end 0 peels first, then 1, then 2; the triangle {3,4,5}
    # is the 2-core and peels together as the deepest layer
    assert got == [(0, 1, 1), (1, 2, 1), (2, 3, 1),
                   (3, 4, 2), (4, 4, 2), (5, 4, 2)]
    assert res.rounds == 4 and res.stats["max_coreness"] == 2


@pytest.mark.parametrize("seed", [2, 9])
def test_random_vs_brute_and_coreness(spark, seed):
    rng = random.Random(seed)
    pairs = [p for p in {(rng.randrange(14), rng.randrange(14))
                         for _ in range(36)} if p[0] != p[1]]
    got = _collect(onion_layers(_edges(spark, pairs)))
    assert got == _brute_onion(pairs)
    cres = core_numbers(_edges(spark, pairs))
    cn = {r["id"]: r["coreness"] for r in cres.coreness.collect()}
    cres.release()
    assert {i: c for i, _, c in got} == cn


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(27)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(30)} if p[0] != p[1]]
    got = _collect(onion_layers(_edges(spark, pairs)))
    rows = duckdb.connect().execute(
        onion_layers_sql(_values_sql(pairs), n_rounds=16)
    ).fetchall()
    assert got == sorted(rows)


def test_resume_equals_uninterrupted(spark, tmp_path):
    pairs = CHAIN_TRI + [(5, 6), (6, 7), (7, 3), (2, 8)]
    want = _collect(onion_layers(_edges(spark, pairs)))
    ckpt = str(tmp_path / "on")
    partial = onion_layers(
        _edges(spark, pairs), max_iter=2,
        checkpoint_dir=ckpt, checkpoint_every=1,
    )
    partial.coreness.count()
    partial.release()
    resumed = onion_layers(
        _edges(spark, pairs),
        checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
    )
    assert _collect(resumed) == want


def test_resume_rejects_changed_graph(spark, tmp_path):
    ckpt = str(tmp_path / "on2")
    first = onion_layers(
        _edges(spark, CHAIN_TRI), checkpoint_dir=ckpt, checkpoint_every=1
    )
    first.coreness.count()
    first.release()
    with pytest.raises(ValueError, match="resume mismatch"):
        onion_layers(
            _edges(spark, CHAIN_TRI + [(5, 9)]),
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
