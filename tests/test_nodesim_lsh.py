"""LSH-accelerated node similarity (linkgraph/similarity.py)."""

import random

from pyspark.sql import functions as F

from linkgraph.similarity import (
    node_similarity,
    node_similarity_lsh,
    node_similarity_lsh_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_high_similarity_pairs_all_found(spark):
    # nodes 0 and 1 share 9 of 10 neighbors (jaccard 9/11 ~ 0.818):
    # at 32/8 banding the miss probability is ~1e-9
    pairs = [(0, 100 + i) for i in range(10)] + [(1, 100 + i) for i in range(1, 11)]
    pairs += [(2, 200), (2, 201)]  # unrelated node
    e = _edges(spark, pairs)
    exact = {
        (r.node1, r.node2, r.similarity)
        for r in node_similarity(e, min_similarity=0.8).collect()
    }
    lsh = {
        (r.node1, r.node2, r.similarity)
        for r in node_similarity_lsh(e, min_similarity=0.8).collect()
    }
    assert lsh == exact and len(lsh) == 1


def test_verified_values_are_exact_subset(spark):
    # whatever candidates banding surfaces, their scores must equal the
    # exact operator's for the same pairs
    rng = random.Random(3)
    pairs = [(rng.randrange(20), 100 + rng.randrange(15)) for _ in range(120)]
    e = _edges(spark, pairs)
    exact = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity(e, min_similarity=0.0).collect()
    }
    lsh = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity_lsh(e, min_similarity=0.05, bands=16).collect()
    }
    assert lsh, "banding should surface something on a 120-edge graph"
    for k, v in lsh.items():
        assert exact[k] == v


def test_duckdb_twin_row_exact(spark):
    import duckdb

    rng = random.Random(8)
    pairs = [(rng.randrange(15), 100 + rng.randrange(12)) for _ in range(80)]
    e = _edges(spark, pairs).distinct()
    got = {
        (r.node1, r.node2, r.similarity)
        for r in node_similarity_lsh(
            e, min_similarity=0.1, bands=16
        ).collect()
    }
    con = duckdb.connect()
    con.register("edges_tbl", e.toPandas())
    nbr = "SELECT DISTINCT src, dst AS nbr FROM edges_tbl WHERE src != dst"
    want = {
        tuple(r)
        for r in con.execute(
            node_similarity_lsh_sql(nbr, min_similarity=0.1, bands=16)
        ).fetchall()
    }
    assert got == want and len(got) > 0
