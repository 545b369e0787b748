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


def distributed_rank(
    df: DataFrame,
    order_by: list[tuple[str, str]],
    name: str = "rn",
    mode: str = "row_number",
    num_parts: int | None = None,
) -> DataFrame:
    """EXACT global ``row_number()/rank() OVER (ORDER BY ...)`` without
    the single-task sort an unpartitioned window materializes.

    order_by: [(column_name, "asc"|"desc"), ...] — computed sort keys
    must be withColumn'd by the caller first.

    Three-phase (the zipWithIndex shape, DataFrame-native):

      1. ``repartitionByRange`` on the sort key — Spark's range
         partitioner samples split points, so partition p holds a
         CONTIGUOUS slice of the total order and every slice is
         balanced (no skew assumption on the key distribution; equal
         keys always land in one partition).
      2. rank within each partition (window partitioned by the range
         bucket — parallel), which is the global order restricted to
         the slice.
      3. add the broadcast cumulative row-count offsets (``num_parts``
         driver rows).

    The output rank values equal the global window's for ANY split-
    point placement — range partitioning preserves the key order
    across partitions — so SQL oracle twins written against the plain
    ``OVER (ORDER BY ...)`` stay value-exact. ``mode="rank"`` keeps
    tie semantics exactly: a tie group never straddles partitions, so
    local rank of its first row + offset = global rank.

    The range-bucketed frame is persisted (it is scanned twice: the
    count census and the ranked output); the cache is attached to the
    result for ``release_caches`` hygiene.
    """
    if mode not in ("row_number", "rank"):
        raise ValueError(f"mode must be row_number|rank: got {mode}")
    from linkgraph.checkpoint import attach_caches

    spark = df.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cols = [
        F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
        for c, d in order_by
    ]
    parted = (
        df.repartitionByRange(num_parts, *cols)
        .withColumn("_rb", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_rb"]: r["c"]
        for r in parted.groupBy("_rb").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    if not offsets:
        offsets = [(0, 0)]
    off = F.broadcast(spark.createDataFrame(offsets, "_rb int, _off long"))
    w = Window.partitionBy("_rb").orderBy(*cols)
    rk = F.row_number() if mode == "row_number" else F.rank()
    out = (
        parted.join(off, "_rb")
        .withColumn(name, (F.col("_off") + rk.over(w)).cast("long"))
        .drop("_rb", "_off")
    )
    return attach_caches(out, [parted])
