"""algo.list / isFinite / isInfinite analogs (linkgraph/registry.py)."""

import importlib
import math

from pyspark.sql import functions as F

from linkgraph import algo_list, is_finite, is_infinite


def test_algo_list_entries_resolve():
    entries = algo_list()
    assert len(entries) >= 34
    names = {e["name"] for e in entries}
    for must in ("pagerank", "connected_components", "k_spanning_tree",
                 "minhash_lsh_pairs", "ann_ivf_topk"):
        assert must in names
    # every registered impl path must import and resolve to a callable
    for e in entries:
        mod, _, fn = e["impl"].rpartition(".")
        assert callable(getattr(importlib.import_module(mod), fn)), e["impl"]


def test_is_finite_is_infinite(spark):
    rows = [
        (0, 1.5, True, False),
        (1, float("inf"), False, True),
        (2, float("-inf"), False, True),
        (3, float("nan"), False, False),
        (4, None, False, False),
        (5, 0.0, True, False),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _, _ in rows], "id long, v double"
    )
    got = {
        r["id"]: (r["fin"], r["inf"])
        for r in df.select(
            "id", is_finite("v").alias("fin"), is_infinite(F.col("v")).alias("inf")
        ).collect()
    }
    for i, v, fin, inf in rows:
        assert got[i] == (fin, inf), (i, v, got[i])
