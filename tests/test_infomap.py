"""InfoMap (two-level map equation local moves): clique recovery,
codelength monotonicity, determinism, and the DuckDB twin replay."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linkgraph.infomap import (
    infomap_local_move,
    infomap_sql,
    map_equation,
)

# two 4-cliques bridged by one edge (4-5)
CLIQUES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (7, 8),
    (4, 5),
]
EDGES_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"({a}, {b})" for a, b in CLIQUES)
    + ") t(src, dst)"
)


@pytest.fixture()
def cliques(spark):
    return spark.createDataFrame(CLIQUES, "src long, dst long")


def test_infomap_recovers_cliques(spark, cliques):
    res = infomap_local_move(cliques, rounds=12)
    got = {r["id"]: r["module"] for r in res.assignment.collect()}
    assert len(set(got.values())) == 2
    assert len({got[i] for i in (1, 2, 3, 4)}) == 1
    assert len({got[i] for i in (5, 6, 7, 8)}) == 1
    assert res.stats["n_modules"] == 2
    res.release()


def test_infomap_codelength_improves(spark, cliques):
    singles = spark.range(1, 9).select(
        F.col("id"), F.col("id").alias("module")
    )
    l0 = map_equation(cliques, singles)
    res = infomap_local_move(cliques, rounds=12)
    assert res.codelength < l0
    # the known-true partition scores at least as well as anything
    # the greedy sweep found
    truth = spark.createDataFrame(
        [(i, 1 if i <= 4 else 2) for i in range(1, 9)], "id long, module long"
    )
    assert abs(map_equation(cliques, truth) - res.codelength) < 1e-9
    res.release()


def test_infomap_deterministic(spark, cliques):
    a = infomap_local_move(cliques, rounds=3, sweep="sync")
    b = infomap_local_move(cliques, rounds=3, sweep="sync")
    assert sorted(map(tuple, a.assignment.collect())) == sorted(
        map(tuple, b.assignment.collect())
    )
    a.release()
    b.release()


@pytest.mark.parametrize("sweep,rounds", [("sync", 2), ("alternate", 3), ("hash", 4)])
def test_infomap_duckdb_twin(spark, cliques, sweep, rounds):
    """The unrolled SQL replays the Spark sweep VALUE-exactly — the
    ΔL expression is literally the same string in both engines."""
    res = infomap_local_move(cliques, rounds=rounds, sweep=sweep)
    got = sorted((r["id"], r["module"]) for r in res.assignment.collect())
    res.release()
    oracle = duckdb.sql(infomap_sql(EDGES_SQL, rounds, sweep=sweep)).fetchall()
    assert got == sorted(oracle)


def test_infomap_bad_sweep(spark, cliques):
    with pytest.raises(ValueError):
        infomap_local_move(cliques, sweep="zigzag")


def test_infomap_multilevel_ring_of_cliques(spark):
    from linkgraph.infomap import infomap

    # three 4-cliques ring-connected by single bridges
    edges = []
    for base in (0, 10, 20):
        nodes = [base + i for i in range(1, 5)]
        edges += [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    edges += [(4, 11), (14, 21), (24, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    res = infomap(e, max_levels=3, rounds_per_level=10)
    got = {r["id"]: r["module"] for r in res.assignment.collect()}
    assert res.stats["n_modules"] == 3
    for base in (0, 10, 20):
        assert len({got[base + i] for i in range(1, 5)}) == 1
    # guard: the returned codelength equals the assignment's true L
    truth = spark.createDataFrame(
        [(i, b) for b in (0, 10, 20) for i in range(b + 1, b + 5)],
        "id long, module long",
    )
    assert abs(map_equation(e, truth) - res.codelength) < 1e-9
    res.release()


def test_infomap_hub_split_equals_plain(spark):
    """hub_cap routes hub-keyed rows of BOTH per-round per-edge probes
    (cut census + candidate vote) through the broadcast-state path
    (linkgraph/skew.py); modules are bit-identical and the codelength
    agrees to fp-association tolerance."""
    from linkgraph.infomap import infomap_local_move

    pairs = (
        [(0, i) for i in range(1, 41)]
        + [(i, i % 40 + 1) for i in range(1, 41)]
        + [(100, 101)]
    )
    e = spark.createDataFrame(pairs, "src long, dst long")
    plain = infomap_local_move(e, rounds=3, sweep="hash")
    base = {(r["id"], r["module"]) for r in plain.assignment.collect()}
    forced = infomap_local_move(e, rounds=3, sweep="hash", hub_cap=20)
    assert forced.stats["hub_split"] == 1
    assert {(r["id"], r["module"]) for r in forced.assignment.collect()} == base
    assert abs(forced.codelength - plain.codelength) < 1e-9
    auto = infomap_local_move(e, rounds=3, sweep="hash", hub_cap="auto")
    assert {(r["id"], r["module"]) for r in auto.assignment.collect()} == base
    plain.release()
    forced.release()
    auto.release()


def test_infomap_multilevel_resume_equals_uninterrupted(spark, tmp_path):
    """Multilevel infomap killed at a level boundary and resumed from
    the manifest equals the uninterrupted run; fingerprint and
    sweep/rounds mismatches raise."""
    import pytest

    from linkgraph.infomap import infomap

    edges = []
    for base in (0, 10, 20):
        nodes = [base + i for i in range(1, 5)]
        edges += [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    edges += [(4, 11), (14, 21), (24, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")

    full = infomap(e, max_levels=3, rounds_per_level=10)
    want = sorted((r["id"], r["module"]) for r in full.assignment.collect())
    full.release()

    ckpt = str(tmp_path / "im_ckpt")
    killed = infomap(e, max_levels=1, rounds_per_level=10,
                     checkpoint_dir=ckpt, checkpoint_every=1)
    killed.release()
    res = infomap(e, max_levels=3, rounds_per_level=10,
                  checkpoint_dir=ckpt, checkpoint_every=1, resume=True)
    got = sorted((r["id"], r["module"]) for r in res.assignment.collect())
    assert got == want
    assert abs(res.codelength - full.codelength) < 1e-9 if full.codelength else True
    res.release()

    with pytest.raises(ValueError, match="resume mismatch"):
        infomap(e, max_levels=3, rounds_per_level=7,
                checkpoint_dir=ckpt, resume=True)
    other = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError):
        infomap(other, max_levels=3, rounds_per_level=10,
                checkpoint_dir=ckpt, resume=True)
