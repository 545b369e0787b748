"""Dense-id dictionary: bijection + determinism (SURVEY.md §5.4)."""

from pyspark.sql import functions as F

from linkgraph.ids import dense_ids


def test_dense_ids_bijection_and_range(spark):
    keys = spark.createDataFrame([(f"k{i:04d}",) for i in range(500)], "key string")
    d = dense_ids(keys, num_buckets=16)
    rows = d.collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(500))
    assert len({r["key"] for r in rows}) == 500


def test_dense_ids_deterministic_under_repartitioning(spark):
    keys = spark.createDataFrame([(f"k{i:04d}",) for i in range(300)], "key string")
    a = {r["key"]: r["id"] for r in dense_ids(keys.repartition(1), num_buckets=8).collect()}
    b = {r["key"]: r["id"] for r in dense_ids(keys.repartition(7), num_buckets=8).collect()}
    assert a == b


def test_dense_ids_ordered_mode_matches_sorted_keys(spark):
    keys = spark.createDataFrame([("b",), ("a",), ("c",), ("a",)], "key string")
    d = {r["key"]: r["id"] for r in dense_ids(keys, ordered=True).collect()}
    assert d == {"a": 0, "b": 1, "c": 2}


def test_dense_ids_duplicates_collapse(spark):
    keys = spark.createDataFrame([("x",)] * 10 + [("y",)] * 5, "key string")
    d = dense_ids(keys, num_buckets=4)
    assert d.count() == 2
    assert d.agg(F.min("id"), F.max("id")).first() == (0, 1)
