"""Graph projection from SQL and result write-back.

Re-creates the two remaining GraphLoader/sink surfaces (SURVEY.md
§2.3/§2.5):

  * ``edges_from_sql`` — the reference's ``graph:'cypher'`` projection
    (pub:core/.../CypherGraphFactory lineage): the edge set is DEFINED
    by a user query instead of a fixed label/type scan. On Spark the
    query is ANSI SQL planned by Catalyst, so projection pushdown /
    partition pruning apply to whatever scans the query touches.
  * ``write_results`` — the write-mode sink (every reference
    ``*Proc`` write path reports writeMillis/nodes): writes a results
    DataFrame to a table path and returns the reference-shaped stats
    dict instead of mutating a store.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def edges_from_sql(
    spark: SparkSession,
    sql: str,
    tables: dict[str, DataFrame] | None = None,
    weight_default: float = 1.0,
) -> DataFrame:
    """Edge table from a SQL projection (Cypher-projection analog).

    The query must produce ``src`` and ``dst`` columns (node ids) and
    may produce ``weight``; a missing weight column or NULL weights
    coalesce to ``weight_default`` (GraphLoader
    withRelationshipWeightsFromProperty default semantics).

    tables: optional {name: DataFrame} registered as temp views before
    the query runs — lets callers project edges out of DataFrames they
    built programmatically, not just catalog tables.
    """
    if tables:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    e = spark.sql(sql)
    cols = set(e.columns)
    missing = {"src", "dst"} - cols
    if missing:
        raise ValueError(f"edge SQL must yield src and dst columns; missing {sorted(missing)}")
    w = (
        F.coalesce(F.col("weight").cast("double"), F.lit(float(weight_default)))
        if "weight" in cols
        else F.lit(float(weight_default))
    )
    return e.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        w.alias("weight"),
    )


def write_results(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    format: str = "parquet",
    partition_by: list[str] | None = None,
) -> dict:
    """Write a results DataFrame to ``path`` and return write stats.

    Returns {path, format, mode, rows, files, bytes, write_millis} —
    the engine analog of the reference's YIELD writeMillis/nodes row.
    Row count comes from the written parquet footers (metadata-only
    second job, no recompute of the result plan).
    """
    t0 = time.time()
    writer = df.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    write_millis = int((time.time() - t0) * 1000)

    spark = df.sparkSession
    rows = spark.read.format(format).load(path).count()
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    summary = fs.getContentSummary(jvm_path)
    return {
        "path": path,
        "format": format,
        "mode": mode,
        "rows": rows,
        "files": int(summary.getFileCount()),
        "bytes": int(summary.getLength()),
        "write_millis": write_millis,
    }
