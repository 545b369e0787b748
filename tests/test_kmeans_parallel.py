"""k-means‖ init: cluster-structure sanity, determinism, and the
DuckDB twin (value-exact including the coin draws)."""

import random

import duckdb
import pytest

from linkgraph.pipeline.simsearch import (
    kmeans_parallel_init,
    kmeans_parallel_init_sql,
)


def _vectors(n=30, dim=3, seed=17, clusters=3, spread=0.05):
    rng = random.Random(seed)
    cents = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(clusters)]
    return {
        i: [round(cents[i % clusters][d] + rng.uniform(-spread, spread), 3)
            for d in range(dim)]
        for i in range(n)
    }


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )


def test_centers_cover_clusters_and_deterministic(spark):
    vecs = _vectors()
    e = _emb(spark, vecs)
    r1 = kmeans_parallel_init(e, k=3, l=6, rounds=3, seed=5).collect()
    r2 = kmeans_parallel_init(e, k=3, l=6, rounds=3, seed=5).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    # the 3 chosen centers should come from 3 DIFFERENT true clusters
    picked_clusters = {r["vec_id"] % 3 for r in r1}
    assert len(picked_clusters) == 3
    assert sum(r["weight"] for r in r1) <= 30
    assert len(r1) == 3 and [r["rank"] for r in
                             sorted(r1, key=lambda x: x["rank"])] == [0, 1, 2]


def test_duckdb_twin(spark):
    vecs = _vectors(n=24, dim=4, seed=23)
    got = sorted(map(tuple,
                     kmeans_parallel_init(_emb(spark, vecs), k=4, l=8,
                                          rounds=3, seed=9).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v!r}::DOUBLE[])" for i, v in vecs.items())
        + ") t(vec_id, embedding)"
    )
    want = sorted(map(tuple, con.execute(
        kmeans_parallel_init_sql(4, k=4, l=8, rounds=3, seed=9)
    ).fetchall()))
    assert got == want


def test_degenerate_and_bad_params(spark):
    # identical points: phi hits 0 after the seed; only 1 candidate
    same = _emb(spark, {i: [1.0, 2.0] for i in range(5)})
    with pytest.raises(ValueError, match="candidates"):
        kmeans_parallel_init(same, k=2, l=4, rounds=2)
    one = kmeans_parallel_init(same, k=1, l=4, rounds=2).collect()
    assert len(one) == 1 and one[0]["vec_id"] == 0 and one[0]["weight"] == 5
    with pytest.raises(ValueError):
        kmeans_parallel_init(same, k=0)
    with pytest.raises(ValueError):
        kmeans_parallel_init_sql(2, rounds=0)
