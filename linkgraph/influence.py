"""Influence maximization — reverse-reachable sampling + greedy cover.

An engine extension beyond the reference procedure list (SURVEY.md §2
is 100% covered elsewhere): the RIS/IMM recipe (Borgs-Brautbar-Chayes-
Lucier SODA'14; Tang-Xiao-Shi SIGMOD'14 — public results) for the
independent-cascade (IC) model. Pick sampled "worlds" where each
directed edge is live with probability p; for each world draw a root
and collect its REVERSE-reachable (RR) set — every node that can
reach the root over live edges; the greedy max-coverage over RR sets
is the (1 - 1/e)-approximate seed set of the influence function.

Determinism (the cross-engine exactness contract): randomness is the
engine's ``stable_hash64`` —

* edge (u, v) is live in world s  iff  H(u|v|s # ic-live) % p_den < p_num
* the root of world s is argmin over nodes of H(id|s # ic-root)
  (uniform in the hash order, deterministic, id tie-break)

so the Spark run and the DuckDB twin (`influence_maximization_sql`)
construct bit-identical worlds and RR sets, and the greedy picks —
argmax marginal coverage, min-id tie-break — are hash-exact. The
output is ``(seed_rank, id, marginal)``: the r-th seed and how many
yet-uncovered RR sets it covers (``sum(marginal) / n_samples * |V|``
is the spread estimate; the integer marginals are what's compared).

Scale notes (100TB): all worlds advance in ONE batched frontier
keyed (s, node) — per round one join against the pinned reversed edge
table with the liveness predicate evaluated in-task (the live
subgraph is never materialized), then a distinct. This is the MS-BFS
shape (linkgraph/paths.py) over worlds instead of sources. Greedy is
k rounds of (map-side-combined count, TakeOrdered-1 argmax, covered-
worlds anti-join) on the shrinking RR table. Root selection as
written scores |V| x n_samples hash rows (one agg); at web scale pass
``roots`` explicitly (e.g. a degree-stratified sample) — the RR
machinery is unchanged. n_samples bounds error as O(sqrt(1/S)) per
the RIS analysis; worlds are embarrassingly independent, so S scales
with executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql


@dataclass
class InfluenceResult:
    seeds: DataFrame  # (seed_rank: long, id: long, marginal: long)
    n_samples: int
    covered: int  # worlds covered by the k seeds
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _live_pred(p_num: int, p_den: int):
    h = stable_hash64(
        F.concat_ws("|", F.col("src"), F.col("dst"), F.col("s")), salt="ic-live"
    )
    return F.pmod(h, F.lit(p_den)) < F.lit(p_num)


def influence_maximization(
    edges: DataFrame,
    k: int = 3,
    n_samples: int = 32,
    p_num: int = 1,
    p_den: int = 4,
    max_hops: int = 12,
    roots: DataFrame | None = None,
) -> InfluenceResult:
    """Greedy IC-model seed selection over deterministic RR samples.

    ``roots``: optional (s, node) DataFrame overriding the hash-argmin
    root draw (must cover s in [0, n_samples)). ``max_hops`` bounds
    the reverse BFS (RR sets saturate quickly at sub-critical p; the
    bound is the exactness contract the SQL twin unrolls to).
    """
    if k < 1 or n_samples < 1:
        raise ValueError(f"k and n_samples must be >= 1: {k}, {n_samples}")
    if not (0 < p_num <= p_den):
        raise ValueError(f"p must be a rational in (0, 1]: {p_num}/{p_den}")
    spark = edges.sparkSession
    ed = pin_table(
        edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    samples = spark.range(n_samples).select(F.col("id").cast("long").alias("s"))
    if roots is None:
        nodes = (
            ed.select(F.col("src").alias("id"))
            .unionByName(ed.select(F.col("dst").alias("id")))
            .distinct()
        )
        scored = samples.crossJoin(nodes).select(
            "s", "id",
            stable_hash64(F.concat_ws("|", F.col("id"), F.col("s")),
                          salt="ic-root").alias("h"),
        )
        roots = scored.groupBy("s").agg(
            F.min_by(F.struct("h", "id"), F.struct("h", "id")).alias("m")
        ).select("s", F.col("m.id").alias("node"))
    rr = pin_table(roots.select("s", "node"))
    loop = SuperstepLoop(spark, name="rrsets", max_steps=max_hops)
    prev_n = rr.count()
    rev = ed  # probe (src, dst) with dst = frontier node
    for it in range(1, max_hops + 1):
        expanded = (
            rr.withColumnRenamed("node", "dst")
            .join(rev, "dst")
            .filter(_live_pred(p_num, p_den))
            .select("s", F.col("src").alias("node"))
        )
        nxt = rr.unionByName(expanded).distinct()
        rr = loop.advance(it, nxt, metrics={"hop": it})
        n = rr.count()
        if n == prev_n:
            break
        prev_n = n
    # greedy max coverage, k rounds
    seeds_rows = []
    remaining = rr
    caches = [rr, ed]
    covered_total = 0
    for r in range(1, k + 1):
        top = (
            remaining.groupBy("node")
            .agg(F.count("*").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("node").asc())
            .first()
        )
        if top is None:
            break
        seeds_rows.append((r, int(top["node"]), int(top["c"])))
        covered_total += int(top["c"])
        if r == k:
            break
        cov = remaining.filter(F.col("node") == int(top["node"])).select("s")
        remaining = pin_table(remaining.join(cov, "s", "left_anti"))
        caches.append(remaining)
    seeds = spark.createDataFrame(
        seeds_rows, "seed_rank long, id long, marginal long"
    )
    for c in caches:
        release_state(c)
    return InfluenceResult(
        seeds=seeds,
        n_samples=n_samples,
        covered=covered_total,
        stats={"k": k, "p": f"{p_num}/{p_den}", "max_hops": max_hops},
    )


def influence_maximization_sql(
    edges_sql: str,
    k: int = 3,
    n_samples: int = 32,
    p_num: int = 1,
    p_den: int = 4,
    max_hops: int = 12,
) -> str:
    """DuckDB twin of `influence_maximization`: identical hash-derived
    live worlds and roots, reverse reachability unrolled ``max_hops``
    rounds (idempotent at the fixpoint), greedy unrolled ``k`` rounds
    (ORDER BY count DESC, node ASC LIMIT 1 + covered-world anti-join)."""
    live_h = stable_hash64_sql(
        "ed.src || '|' || ed.dst || '|' || sm.s", salt="ic-live"
    )
    root_h = stable_hash64_sql("n.id || '|' || sm.s", salt="ic-root")
    parts = [
        f"WITH e AS ({edges_sql})",
        "ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM e WHERE src <> dst)",
        """nodes AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM ed UNION ALL SELECT dst FROM ed))""",
        f"sm AS (SELECT CAST(range AS BIGINT) AS s FROM range(0, {n_samples}))",
        f"""roots AS MATERIALIZED (SELECT s, id AS node FROM (
  SELECT sm.s, n.id,
         ROW_NUMBER() OVER (PARTITION BY sm.s
                            ORDER BY {root_h} ASC, n.id ASC) AS rn
  FROM sm CROSS JOIN nodes n) WHERE rn = 1)""",
        f"""live AS MATERIALIZED (SELECT sm.s, ed.src, ed.dst
  FROM sm CROSS JOIN ed
  WHERE ({live_h}) % {p_den} < {p_num})""",
        "r0 AS MATERIALIZED (SELECT s, node FROM roots)",
    ]
    for t in range(1, max_hops + 1):
        parts.append(
            f"""r{t} AS MATERIALIZED (SELECT DISTINCT s, node FROM (
  SELECT s, node FROM r{t - 1}
  UNION ALL
  SELECT l.s, l.src AS node FROM r{t - 1} p
  JOIN live l ON l.s = p.s AND l.dst = p.node))"""
        )
    parts.append(f"rem1 AS MATERIALIZED (SELECT s, node FROM r{max_hops})")
    for r in range(1, k + 1):
        parts.append(
            f"""g{r} AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS c
  FROM rem{r} GROUP BY node ORDER BY c DESC, node ASC LIMIT 1)"""
        )
        if r < k:
            parts.append(
                f"""rem{r + 1} AS MATERIALIZED (SELECT * FROM rem{r}
  WHERE s NOT IN (SELECT rr.s FROM rem{r} rr JOIN g{r} ON rr.node = g{r}.node))"""
            )
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS seed_rank, node AS id, c AS marginal"
        f" FROM g{r}"
        for r in range(1, k + 1)
    )
    return ",\n".join(parts) + "\n" + sel
