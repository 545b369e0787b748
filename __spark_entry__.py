"""Driver contract for the spark-graft builder (PySpark target).

Wires the linkgraph engine's procedures (SURVEY.md §2) to the driver's
correctness harness: each ``queries()`` entry runs on Spark and is
compared against ``oracle_sql()`` executed by DuckDB on the same
parquet tables (row count + schema + order-insensitive value hash).

Floating-point columns are rounded to 6 decimals on BOTH sides so that
summation-order differences between engines (~1e-13 relative) cannot
flip the value hash; the BASELINE correctness gate is allclose 1e-6.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph import connected_components, label_propagation, pagerank, triangle_count
from linkgraph.graphs import (
    COSUPPLIER_EDGES_SQL,
    PURCHASE_EDGES_SQL,
    cosupplier_edges,
    purchase_edges,
)

DAMPING = 0.85
PR_ITERS = 5


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PageRank over the customer->supplier purchase
    graph derived from sf0.001 orders/lineitem."""
    edges = purchase_edges(spark, "/root/testdata/sf0.001")
    res = pagerank(edges, damping=DAMPING, max_iter=PR_ITERS)
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


# ----------------------------------------------------------------- queries

def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = pagerank(purchase_edges(spark, sf_dir), damping=DAMPING, max_iter=PR_ITERS)
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(purchase_edges(spark, sf_dir))
    return res.components.select("id", "comp")


def _q_wcc_setcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(purchase_edges(spark, sf_dir))
    return res.components.agg(F.countDistinct("comp").alias("set_count"))


def _q_wcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(cosupplier_edges(spark, sf_dir), threshold=2.0)
    return res.components.select("id", "comp")


def _q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = label_propagation(cosupplier_edges(spark, sf_dir), direction="BOTH", max_iter=1)
    return res.labels.select("id", "label")


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    return res.triangles.agg(F.count("*").alias("triangle_count"))


def _q_triangles_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    return res.counts.select(
        "id",
        F.col("triangles").cast("long").alias("triangles"),
        F.col("degree").cast("long").alias("degree"),
        F.round("coefficient", 6).alias("coefficient"),
    )


def _q_triangle_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    return res.triangles.select("node_a", "node_b", "node_c")


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        purchase_edges(spark, sf_dir)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("outdeg"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pagerank_purchase_5iter": _q_pagerank,
        "wcc_purchase": _q_wcc,
        "wcc_purchase_setcount": _q_wcc_setcount,
        "wcc_threshold_cosupplier": _q_wcc_threshold,
        "labelprop_cosupplier_1iter": _q_labelprop,
        "triangle_count_cosupplier": _q_triangle_count,
        "triangles_per_node_cosupplier": _q_triangles_per_node,
        "triangle_stream_cosupplier": _q_triangle_stream,
        "degrees_purchase": _q_degrees,
    }


# ------------------------------------------------------------- oracle SQL

def _pagerank_sql(iters: int = PR_ITERS, d: float = DAMPING) -> str:
    alpha = repr(1.0 - d)  # same IEEE double literal the engine uses
    parts = [
        f"WITH edges AS ({PURCHASE_EDGES_SQL}),",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        f"p0 AS (SELECT id, CAST({alpha} AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""", p{k} AS (
  SELECT n.id AS id, {alpha} + {d!r} * COALESCE(s.s, 0.0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS dst, SUM(p.rank / od.outdeg) AS s
    FROM edges e JOIN p{k-1} p ON p.id = e.src JOIN outdeg od ON od.src = e.src
    GROUP BY e.dst) s ON s.dst = n.id)"""
        )
    parts.append(f"\nSELECT id, ROUND(CAST(rank AS DOUBLE), 6) AS rank FROM p{iters}")
    return "\n".join(parts)


def _wcc_reach_sql(edge_sql: str, where: str = "") -> str:
    return f"""
WITH RECURSIVE
e AS ({edge_sql}),
und AS (SELECT src, dst FROM e {where} UNION ALL SELECT dst, src FROM e {where}),
nodes AS (SELECT DISTINCT src AS id FROM und),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT u.dst, r.comp FROM reach r JOIN und u ON u.src = r.id
)
SELECT id, MIN(comp) AS comp FROM reach GROUP BY id
"""


TRI_SQL_BASE = f"""
e AS ({COSUPPLIER_EDGES_SQL}),
und AS (SELECT src AS a, dst AS b FROM e),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)"""


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank_purchase_5iter": _pagerank_sql(),
        "wcc_purchase": _wcc_reach_sql(PURCHASE_EDGES_SQL),
        "wcc_purchase_setcount": (
            f"SELECT COUNT(DISTINCT comp) AS set_count FROM ({_wcc_reach_sql(PURCHASE_EDGES_SQL)})"
        ),
        "wcc_threshold_cosupplier": _wcc_reach_sql(
            COSUPPLIER_EDGES_SQL, where="WHERE weight >= 2.0"
        ),
        "labelprop_cosupplier_1iter": f"""
WITH e AS ({COSUPPLIER_EDGES_SQL}),
sym AS (SELECT src AS node, dst AS nbr, weight FROM e
        UNION ALL SELECT dst, src, weight FROM e),
votes AS (SELECT node, nbr AS label, SUM(weight) AS v FROM sym GROUP BY node, nbr),
best AS (SELECT node AS id, label,
                ROW_NUMBER() OVER (PARTITION BY node ORDER BY v DESC, label ASC) AS rk
         FROM votes)
SELECT id, label FROM best WHERE rk = 1
""",
        "triangle_count_cosupplier": f"WITH {TRI_SQL_BASE}\nSELECT COUNT(*) AS triangle_count FROM tri",
        "triangles_per_node_cosupplier": f"""
WITH {TRI_SQL_BASE},
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
deg AS (SELECT id, COUNT(*) AS degree
        FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) GROUP BY id),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id)
SELECT d.id,
       CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles,
       CAST(d.degree AS BIGINT) AS degree,
       ROUND(CAST(CASE WHEN d.degree >= 2
             THEN 2.0 * COALESCE(c.triangles, 0) / (d.degree * (d.degree - 1))
             ELSE 0.0 END AS DOUBLE), 6) AS coefficient
FROM deg d LEFT JOIN cnt c ON c.id = d.id
""",
        "triangle_stream_cosupplier": f"WITH {TRI_SQL_BASE}\nSELECT x AS node_a, y AS node_b, z AS node_c FROM tri",
        "degrees_purchase": f"""
WITH edges AS ({PURCHASE_EDGES_SQL})
SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src
""",
    }
