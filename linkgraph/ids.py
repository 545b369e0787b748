"""Dense-id dictionary — the Spark-native analog of the reference IdMap.

The reference compacts Neo4j long ids to dense ints with a single-JVM
dictionary (pub:core/.../core/IdMap.java, SURVEY.md §1.2). At cluster
scale a global ``row_number() over (order by key)`` window would funnel
every key through ONE partition, so the default here is a two-phase
deterministic scheme that stays fully parallel:

  1. hash-bucket each distinct key into ``num_buckets`` groups,
  2. rank within each bucket (window partitioned BY bucket — parallel),
  3. broadcast the tiny per-bucket count vector as cumulative offsets.

The resulting id assignment is a deterministic bijection (independent
of input partitioning — required by the edge-derivation determinism
test, SURVEY.md §5.4). ``ordered=True`` switches to the exact
``row_number() over (order by key)`` semantics of FIXTURES.md §0 (ids
in global key order) — fine for fixtures/tests, not for 10^12 keys.

Never ``monotonically_increasing_id`` — partition-dependent (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    keys: DataFrame,
    key_col: str = "key",
    num_buckets: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """Map distinct ``key_col`` values to dense ids ``0..n-1``.

    Returns DataFrame(id: long, key: <input type>). Deterministic for a
    given key set regardless of partitioning.

    num_buckets defaults to 4x spark.sql.shuffle.partitions (min 64):
    each bucket is ranked by a window sorted within one task, so a
    FIXED bucket count turns into ~n/64-row single-task sorts at
    10^10+ keys; tying it to the shuffle width keeps per-task rank
    work O(n / cluster-width). The id assignment itself is independent
    of num_buckets only in being a bijection — the exact ids change
    with the bucket count, so pin num_buckets when ids must be stable
    across differently-sized clusters.
    """
    if num_buckets is None:
        sp = int(keys.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        num_buckets = max(64, 4 * sp)
    distinct = keys.select(F.col(key_col).alias("key")).distinct()
    if ordered:
        w = Window.orderBy("key")
        return distinct.select(
            (F.row_number().over(w) - F.lit(1)).cast("long").alias("id"), "key"
        )
    bucketed = distinct.withColumn(
        "_b", F.pmod(F.xxhash64(F.col("key")), F.lit(num_buckets)).cast("int")
    )
    # tiny: num_buckets rows to the driver
    counts = {r["_b"]: r["c"] for r in bucketed.groupBy("_b").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    spark = keys.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(b, o) for b, o in offsets.items()], "_b int, _off long"
        )
    )
    w = Window.partitionBy("_b").orderBy("key")
    return (
        bucketed.join(offsets_df, "_b")
        .select(
            (F.col("_off") + F.row_number().over(w) - F.lit(1)).cast("long").alias("id"),
            "key",
        )
    )


def edges_from_pairs(spark, pairs, extra_keys=None, ordered: bool = True):
    """Build (nodes, edges) DataFrames from a python list of key pairs.

    ``pairs``: list of (src_key, dst_key) or (src_key, dst_key, weight).
    ``extra_keys``: keys for isolated nodes with no edges (e.g. nodes
    g..j of the reference PageRankTest wiki fixture, FIXTURES.md §1).

    This is the pytest-facing analog of the reference's embedded API
    (entry point C, SURVEY.md §3): Cypher CREATE fixture -> GraphLoader.
    Returns (nodes DataFrame(id, key), edges DataFrame(src, dst, weight)).
    """
    norm = [(str(a), str(b), float(w[0]) if w else 1.0) for a, b, *w in pairs]
    keys = [(k,) for k in sorted({p[0] for p in norm} | {p[1] for p in norm} | set(extra_keys or []))]
    key_df = spark.createDataFrame(keys, "key string")
    nodes = dense_ids(key_df, ordered=ordered).persist()
    pair_df = spark.createDataFrame(norm, "sk string, dk string, weight double")
    s = nodes.withColumnRenamed("key", "sk").withColumnRenamed("id", "src")
    d = nodes.withColumnRenamed("key", "dk").withColumnRenamed("id", "dst")
    edges = pair_df.join(s, "sk").join(d, "dk").select("src", "dst", "weight")
    return nodes, edges
