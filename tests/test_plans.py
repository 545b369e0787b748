"""Physical-plan assertions: Catalyst must push filters and prune
columns into the parquet scans, and the iterative engines must reuse
cached layouts (SURVEY.md §4 — 'verify with explain()')."""

import re

from pyspark.sql import functions as F

from linkgraph.graphs import purchase_edges

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_purchase_edges_column_pruning(spark):
    plan = _plan(purchase_edges(spark, SF_DIR))
    # orders scan must read exactly the join/select columns, never the
    # wide remainder (o_totalprice, o_comment, ...)
    m = re.search(r"ReadSchema: struct<([^>]*)>.*orders|orders.*ReadSchema: struct<([^>]*)>", plan)
    assert "o_comment" not in plan and "o_totalprice" not in plan
    assert "l_extendedprice" not in plan  # lineitem pruned too


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters" in plan and "IsNotNull(lang)" in plan
    assert re.search(r"PushedFilters:.*EqualTo\(lang,en\)", plan)
    # column pruning: text (the wide column) must not be read
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "text" not in m.group(1)


def test_partition_filter_on_synthetic_edges(spark):
    from linkgraph.synth import synth_edge_table
    e = synth_edge_table(spark, n_nodes=1 << 10, n_edges=1 << 12)
    plan = _plan(e.filter(F.col("src") < 10))
    # generated table: filter must be applied before any exchange
    assert "Exchange" not in plan  # pure map pipeline, no shuffle


def test_pagerank_iteration_has_single_exchange_on_big_side(spark):
    """The cached, pre-sorted edge table must not be re-sorted or
    re-shuffled inside the superstep; the only exchanges operate on
    the (small) rank state and aggregation output."""
    from linkgraph.ids import edges_from_pairs
    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ep = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("share"))
        .repartition("src").sortWithinPartitions("src").persist()
    )
    ep.count()
    ranks = nodes.select("id", F.lit(0.15).alias("rank")).localCheckpoint(eager=True)
    step = (
        ep.join(ranks, ep.src == ranks.id)
        .select(ep.dst.alias("dst"), (F.col("rank") * F.col("share")).alias("c"))
        .groupBy("dst").agg(F.sum("c").alias("s"))
    )
    plan = _plan(step)
    # everything below InMemoryRelation ran ONCE at cache time; the
    # per-iteration cost is the region above the cached scan. There,
    # at most: one exchange for the aggregation (+ possibly one for a
    # non-broadcast rank side) — and never a re-shuffle of the edges.
    upstream = plan[: plan.index("InMemoryRelation")]
    assert upstream.count("Exchange hashpartitioning") <= 2, upstream
    ep.unpersist()
