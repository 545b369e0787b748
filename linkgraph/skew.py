"""Power-law hub split, shared by the community-detection vote probes.

The per-round vote aggregate in LPA / Louvain / InfoMap probes a
symmetric pair table (node, nbr, ...) — hash-partitioned on ``nbr`` so
iterations reuse the layout — with the current per-node state. On a
power-law web graph a hub's entire neighborhood lives in ONE partition
of that probe, and that straggler task caps the high-parallelism
level (the exact regime the reference's LabelPropagation / Louvain
lineage hits on link graphs; pub:algo/.../impl/LabelPropagation.java
partitions nodes, not incident edges, and has the same skew exposure).

The validated fix (label_propagation(hub_cap="auto"), A/B-measured
1.30x at 8 cores in BENCH/BASELINE.md): split pair rows whose ``nbr``
degree exceeds a cap into a ROUND-ROBIN-partitioned hot table, and
join them per round against a BROADCAST of just the hub rows of the
state (a hub's state is one row) — map-side, no shuffle, no straggler
— while the cold side keeps the pre-partitioned sort-merge join. The
split partitions the pair rows exactly, and every consumer aggregates
over the UNION, so results are bit-identical with the split on, off,
or forced (tests/test_community.py, tests/test_infomap.py).

This module factors the probe/split/join triple out of labelprop.py /
components.py so Louvain (community.py) and InfoMap (infomap.py) use
the same thresholds and the same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# auto-mode thresholds (same numbers as labelprop.py / components.py):
# engage only when the top key is > 32x the mean AND > a quarter of an
# average shuffle partition; give up above 1024 qualifying keys
# (uniform density — the broadcast would grow with the graph).
AUTO_MEAN_FACTOR = 32.0
AUTO_PART_FRACTION = 4.0
MAX_HUBS = 1024


def probe_hubs(pairs: DataFrame, key: str, hub_cap: int | float | str | None):
    """Degree-probe ``pairs`` on ``key``; return the list of hub key
    values (1..MAX_HUBS) or None when the split should stay off.

    hub_cap: explicit numeric cap, ``"auto"`` (probe the degree
    distribution and engage only for genuinely hub-skewed tables), or
    None (off). The caller should hand in a cheap-to-scan ``pairs``
    (pinned upstream, or persist around this call + the split).
    """
    if hub_cap is None:
        return None
    spark = pairs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    deg = pairs.groupBy(key).agg(F.count("*").alias("c")).persist()
    try:
        if hub_cap == "auto":
            agg = deg.agg(
                F.sum("c").alias("m"), F.count("*").alias("n"), F.max("c").alias("mx")
            ).first()
            m_pairs, n_keys, mx = agg["m"] or 0, agg["n"] or 1, agg["mx"] or 0
            cap = max(
                AUTO_MEAN_FACTOR * m_pairs / n_keys,
                m_pairs / n_part / AUTO_PART_FRACTION,
            )
            hub_cap = cap if mx > cap else None
        if hub_cap is None:
            return None
        # size-gated driver collect: > MAX_HUBS qualifying keys means
        # uniform density, where the split would broadcast too much
        rows = deg.filter(F.col("c") > hub_cap).select(key).limit(MAX_HUBS + 1).collect()
        if 0 < len(rows) <= MAX_HUBS:
            return [r[key] for r in rows]
        return None
    finally:
        deg.unpersist()


def split_hot(pairs: DataFrame, key: str, hub_ids: list) -> tuple[DataFrame, DataFrame]:
    """(cold, hot): cold = non-hub rows repartitioned + sorted on
    ``key`` (the layout the per-round sort-merge probe reuses); hot =
    hub rows ROUND-ROBIN repartitioned — no key grouping, the whole
    point is spreading one key's rows across every task slot. Caller
    pins both (they are loop-invariant)."""
    spark = pairs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cold = (
        pairs.filter(~F.col(key).isin(hub_ids))
        .repartition(key)
        .sortWithinPartitions(key)
    )
    hot = pairs.filter(F.col(key).isin(hub_ids)).repartition(n_part)
    return cold, hot


def hub_join(
    cold: DataFrame,
    hot: DataFrame | None,
    hub_ids: list | None,
    state: DataFrame,
    key: str,
) -> DataFrame:
    """cold ⋈ state (sort-merge over the pinned layout) UNIONed with
    hot ⋈ broadcast(state restricted to the hubs) — the hub side is
    map-side over the round-robin partitions. Exact under any
    downstream aggregate: the two sides partition the pair rows."""
    joined = cold.join(state, key)
    if hot is not None:
        hub_state = state.filter(F.col(key).isin(hub_ids))
        joined = joined.unionByName(hot.join(F.broadcast(hub_state), key))
    return joined
