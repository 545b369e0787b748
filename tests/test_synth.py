"""Synthetic source table + ingestion invariants (SURVEY.md §5.4).

Covers the BASELINE.json input_hint contract: the engine ingests an
Iceberg-style table (repo, path, commit, lang, content), preserves
per-row sha256(content), and derives the link graph deterministically
regardless of partitioning.
"""

from pyspark.sql import functions as F

from linkgraph.ingest import derive_graph
from linkgraph.synth import content_manifest, generate_source_table, verify_ingestion


def test_sha256_preserved_through_ingestion(spark, tmp_path):
    src = generate_source_table(spark, repos=4, files_per_repo=10, seed=42)
    manifest = content_manifest(src).persist()
    out = str(tmp_path / "ingested")
    src.write.mode("overwrite").parquet(out)
    ingested = spark.read.parquet(out)
    assert verify_ingestion(ingested, manifest) == 0
    manifest.unpersist()


def test_synth_deterministic_across_partitionings(spark):
    a = generate_source_table(spark, repos=3, files_per_repo=8, seed=7, num_partitions=1)
    b = generate_source_table(spark, repos=3, files_per_repo=8, seed=7, num_partitions=16)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_edge_derivation_deterministic_and_valid(spark):
    src = generate_source_table(spark, repos=5, files_per_repo=12, seed=42)
    nodes, file_edges, repo_edges = derive_graph(src)
    nodes = nodes.persist()
    # dense-id dictionary is a bijection 0..n-1
    n = nodes.count()
    assert nodes.select("id").distinct().count() == n
    assert nodes.select("key").distinct().count() == n
    mm = nodes.agg(F.min("id"), F.max("id")).first()
    assert mm[0] == 0 and mm[1] == n - 1

    e1 = sorted(map(tuple, file_edges.collect()))
    # same table through a different partitioning -> same edges
    nodes2, file_edges2, _ = derive_graph(src.repartition(13))
    e2 = sorted(map(tuple, file_edges2.collect()))
    assert e1 == e2
    assert len(e1) > 0
    # all endpoints resolve inside the dictionary
    ids = {r["id"] for r in nodes.select("id").collect()}
    assert all(s in ids and d in ids for s, d, _ in e1)
    # repo-level co-occurrence edges are cross-repo with positive weight
    assert repo_edges.filter(
        (F.col("src_repo") == F.col("dst_repo")) | (F.col("weight") <= 0)
    ).count() == 0
    nodes.unpersist()


def test_imports_follow_powerlaw_hubs(spark):
    """Low-index files must be in-degree hubs (the skew that salting /
    AQE must absorb — SURVEY.md §7)."""
    src = generate_source_table(spark, repos=10, files_per_repo=20, seed=42)
    _, file_edges, _ = derive_graph(src)
    indeg = file_edges.groupBy("dst").agg(F.count("*").alias("d"))
    stats = indeg.agg(F.max("d").alias("mx"), F.avg("d").alias("avg")).first()
    assert stats["mx"] >= 5 * stats["avg"], "expected power-law in-degree skew"


def test_linkgraph_loader_facade(spark):
    """GraphLoader-builder surface (SURVEY §2.5): both edge strategies
    produce a (nodes, edges, degrees) bundle; direction symmetrizes."""
    from linkgraph import LinkGraph
    from linkgraph.synth import generate_source_table

    src = generate_source_table(spark, repos=4, files_per_repo=20, seed=7)
    g = LinkGraph.from_source_table(src, edge_strategy="imports")
    assert set(g.edges.columns) == {"src", "dst", "weight"}
    n_edges = g.edges.count()
    assert n_edges > 0
    assert g.degrees.count() > 0
    both = LinkGraph.from_source_table(src, edge_strategy="imports", direction="BOTH")
    assert both.edges.count() == 2 * n_edges

    co = LinkGraph.from_source_table(src, edge_strategy="path_cooccurrence")
    assert co.edges.count() > 0
    # co-occurrence is canonical src<dst
    assert co.edges.filter("src >= dst").count() == 0


def test_derive_graph_release_frees_caches(spark):
    """DerivedGraph.release() unpersists the import-token/node/
    resolution caches (round-2 advice: repeated derivations leaked
    cached copies with no handle), and the lazy frames still
    recompute correctly afterwards."""
    from linkgraph.ingest import derive_graph
    from linkgraph.synth import generate_source_table

    sc = spark.sparkContext
    spark.catalog.clearCache()
    # compare RDD-id SETS, not counts: the async ContextCleaner may
    # reclaim other tests' stale checkpoint blocks between calls,
    # shrinking the total while OUR new caches (still referenced)
    # cannot be collected
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    source = generate_source_table(spark, repos=4, files_per_repo=20, seed=7)
    g = derive_graph(source)
    n_edges = g[1].count()
    added = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before
    assert added, "derive_graph must persist its caches"
    g.release()
    remaining = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert not (added & remaining), "release() must unpersist the caches"
    # frames recompute from source after release
    assert g[1].count() == n_edges
