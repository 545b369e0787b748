"""Bow-tie decomposition: a hand-built bow-tie fixture exercising all
eight classes, and the DuckDB closure twin on random digraphs."""

import random

import duckdb
import pytest

from linkgraph.bowtie import bowtie_decomposition, bowtie_sql

# core cycle 1->2->3->1; 0 = IN; 4 = OUT; 5 = TUBE (0->5->4);
# 6 = TENDRIL_IN (0->6); 7 = TENDRIL_OUT (7->4); 8,9 = DISCONNECTED;
# 10 = OTHER (10->6: hangs on a tendril, touches neither closure)
BOWTIE = [
    (1, 2), (2, 3), (3, 1),
    (0, 1),
    (3, 4),
    (0, 5), (5, 4),
    (0, 6),
    (7, 4),
    (8, 9),
    (10, 6),
]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _values_sql(pairs):
    rows = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {rows}) AS t(src, dst, weight)"


def test_all_eight_classes(spark):
    res = bowtie_decomposition(_edges(spark, BOWTIE))
    cls = {r["id"]: r["cls"] for r in res.classes.collect()}
    res.release()
    assert cls == {
        1: "CORE", 2: "CORE", 3: "CORE",
        0: "IN", 4: "OUT", 5: "TUBE",
        6: "TENDRIL_IN", 7: "TENDRIL_OUT",
        8: "DISCONNECTED", 9: "DISCONNECTED",
        10: "OTHER",
    }
    assert res.core_label == 1
    assert res.stats["class_counts"]["CORE"] == 3


@pytest.mark.parametrize("seed", [91, 97])
def test_duckdb_twin_random(spark, seed):
    rng = random.Random(seed)
    pairs = [(a, b) for a, b in
             {(rng.randrange(16), rng.randrange(16)) for _ in range(40)} if a != b]
    res = bowtie_decomposition(_edges(spark, pairs))
    got = sorted(map(tuple, res.classes.collect()))
    res.release()
    want = sorted(map(tuple, duckdb.connect().execute(
        bowtie_sql(_values_sql(pairs))
    ).fetchall()))
    assert got == want


def test_empty_raises(spark):
    with pytest.raises(ValueError):
        bowtie_decomposition(_edges(spark, [(0, 1)]).filter("src < 0"))
