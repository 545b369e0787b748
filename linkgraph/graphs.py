"""Edge-table builders over the driver's TPC-H-ish parquet tables.

These make the graph procedures SQL-oracle-checkable (FIXTURES.md §5):
DuckDB runs the equivalent ANSI SQL on the same parquet files and the
driver compares row counts / schemas / value hashes.

Two graphs:
  * purchase graph   — directed customer -> supplier, from
                       orders JOIN lineitem; disjoint id spaces
                       (suppliers offset by 1_000_000).
  * co-supplier graph— undirected supplier -- supplier, edge when two
                       suppliers co-occur in the same order; weight =
                       number of distinct co-occurrence orders
                       (a power-law-ish co-occurrence graph, the same
                       shape as the repo-level import co-occurrence
                       edges of the north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPLIER_OFFSET = 1_000_000


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


PURCHASE_EDGES_SQL = """
SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst, CAST(1.0 AS DOUBLE) AS weight
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = l.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = l.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2"))
    return (
        a.join(b, "ok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )


COSUPPLIER_EDGES_SQL = """
SELECT a.l_suppkey AS src, b.l_suppkey AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
GROUP BY a.l_suppkey, b.l_suppkey
"""


def degree_histogram(edges: DataFrame, direction: str = "OUTGOING") -> DataFrame:
    """(degree, n_nodes) — the degree distribution of the edge table.

    The skew probe SURVEY.md §7 calls for: run it before choosing
    hot-key salting / hub caps (a power-law tail in this table is the
    signal that the 1000-executor plan needs the skew paths). Two
    aggregations, both map-side combinable; no joins.
    """
    d = direction.upper()
    if d == "OUTGOING":
        ends = edges.select(F.col("src").alias("id"))
    elif d == "INCOMING":
        ends = edges.select(F.col("dst").alias("id"))
    elif d == "BOTH":
        ends = edges.select(F.col("src").alias("id")).union(
            edges.select(F.col("dst").alias("id"))
        )
    else:
        raise ValueError(f"bad direction {direction}")
    deg = ends.groupBy("id").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))
