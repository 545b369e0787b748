"""SparkSession builder with the engine's default tuning.

Defaults follow SURVEY.md §4: AQE on (runtime re-plan + skew-join
splitting replaces the reference's hand-rolled degree-balanced
partitions, pub:algo/.../impl/PageRank.java#Partition), Arrow on (all
Python UDFs in this engine are vectorized pandas/Arrow — per
BASELINE.json input_hint there is zero per-row Python), shuffle
partitions sized to cores (not the 200 default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linkgraph",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the link-graph engine.

    ``cores`` sets ``local[N]`` — used by the scaling bench to run the
    same job at two parallelism levels (the sandbox stand-in for the
    north rule's N vs 4N executor clusters). On a real cluster the
    master comes from spark-submit and these settings ride along.
    """
    if cores is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if isinstance(cores, int):
            n = cores
        shuffle_partitions = max(4, n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # shuffle/spill to tmpfs: this sandbox's /tmp sits on a slow
        # virtual disk that serializes shuffle I/O (the cluster analog
        # is executor-local NVMe); RAM-backed local dirs keep the
        # engine CPU-bound, which is what the scaling bench measures
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
