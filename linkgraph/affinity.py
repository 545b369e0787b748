"""Affinity clustering — distributed hierarchical agglomerative
clustering by per-node nearest-neighbor Borůvka levels.

Engine extension beyond the reference procedure list (SURVEY.md §2 is
100% covered elsewhere): the MST-based hierarchical clustering of
Bateni et al. NeurIPS'17 ("Affinity Clustering: Hierarchical
Clustering at Scale" — public result), the standard MapReduce/Spark
answer to single-linkage HAC. Per level:

1. every current cluster-graph node picks its MINIMUM-weight incident
   edge (distance semantics — negate similarities first), ties broken
   on (w, a, b);
2. connected components of the picked edge set are the next level's
   clusters (the engine reuses ``connected_components`` — canonical
   min-member ids);
3. the cluster graph contracts: one edge per cluster pair, weight =
   MIN over crossing edges (single linkage).

Level assignments are recorded for the ORIGINAL nodes after every
level — the dendrogram cut sequence. Clusters with no remaining
outgoing edges (or levels past total merge) carry forward unchanged,
so extra levels are idempotent and the unrolled DuckDB twin
(``affinity_clustering_sql``, per-level transitive closure via one
shared WITH RECURSIVE) may unroll more levels than the engine ran.
Everything is min/argmin over exact values — deterministic and
value-exact cross-engine, no floats are ever combined.

Scale notes (100TB): per level ONE per-node min aggregate over the
contracted graph (map-side combinable struct min — the Borůvka
shuffle, shrinking geometrically: each level at least halves the
cluster count since every picked edge merges two clusters), plus one
connected-components run on the picked FOREST (≤ one edge per node;
the delta-iteration WCC converges in O(log n) supersteps on its
longest picked chain) and one contraction groupBy. The original→
cluster mapping is one narrow frame updated by one join per level.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import pin_table, release_state
from linkgraph.components import connected_components


@dataclass
class AffinityResult:
    assignments: DataFrame  # (id, level, cluster)
    levels: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def affinity_clustering(
    edges: DataFrame,
    levels: int = 3,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> AffinityResult:
    """Single-linkage hierarchical clustering levels (module
    docstring). Returns (id, level, cluster) for level 1..``levels``;
    replayed value-exact by ``affinity_clustering_sql``.

    Level-granular durable resume (the engine-wide SuperstepLoop
    contract, the MST kind-frame pattern): ONE durable frame carries
    the contracted edges (kind 'e'), the original→cluster mapping
    (kind 'm') and the already-emitted level assignments (kind 'o');
    ``resume=True`` re-enters at the last durable level, guarded by
    the deduped weighted-edge fingerprint — a killed-then-resumed run
    equals an uninterrupted one exactly."""
    import json as _json

    from linkgraph.checkpoint import SuperstepLoop
    from linkgraph.kcore import _check_resume_fp

    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    t0 = time.time()
    spark = edges.sparkSession
    w = F.coalesce(F.col("weight"), F.lit(1.0))
    und = pin_table(
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    fp = (
        int(und.agg(F.expr("bit_xor(xxhash64(a, b, w))").alias("fp"))
            .first()["fp"] or 0)
        if checkpoint_dir else None
    )
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="affinity",
        max_steps=levels, context={"graph_fp": fp},
    )

    def _kinds(st):
        ce = st.filter(F.col("kind") == "e").select(
            F.col("x").alias("a"), F.col("y").alias("b"), "w"
        )
        mp = st.filter(F.col("kind") == "m").select(
            F.col("x").alias("id"), F.col("y").alias("cluster")
        )
        return ce, mp

    start = 0
    state = None
    n_clusters: list[int] = []
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "affinity_clustering", loop.last_context.get("graph_fp"), fp
            )
            start, state = resumed
            n_clusters = _json.loads(
                loop.last_metrics.get("clusters_json", "[]")
            )
            # the manifest at level L records counts through L-1 —
            # recompute the resumed level's own count from the state
            if start >= 1 and len(n_clusters) < start:
                n_clusters.append(
                    state.filter(F.col("kind") == "m").select("y")
                    .distinct().count()
                )
    if state is None:
        mapping0 = (
            und.select(F.col("a").alias("id")).unionByName(
                und.select(F.col("b").alias("id"))
            ).distinct().select("id", F.col("id").alias("cluster"))
        )
        state = loop.advance(
            0,
            und.select(F.lit("e").alias("kind"), F.col("a").alias("x"),
                       F.col("b").alias("y"), "w",
                       F.lit(None).cast("long").alias("lvl"))
            .unionByName(
                mapping0.select(F.lit("m").alias("kind"),
                                F.col("id").alias("x"),
                                F.col("cluster").alias("y"),
                                F.lit(None).cast("double").alias("w"),
                                F.lit(None).cast("long").alias("lvl"))
            ),
            force_checkpoint=bool(checkpoint_dir),
            metrics={"clusters_json": _json.dumps(n_clusters)},
        )
    done = levels
    for lvl in range(start + 1, levels + 1):
        ce, mapping = _kinds(state)
        if ce.isEmpty():
            done = lvl - 1
            break
        sym = ce.select(F.col("a").alias("node"), "w", "a", "b").unionByName(
            ce.select(F.col("b").alias("node"), "w", "a", "b")
        )
        picked = (
            sym.groupBy("node")
            .agg(F.min(F.struct("w", "a", "b")).alias("e"))
            .select(F.col("e.a").alias("src"), F.col("e.b").alias("dst"))
            .distinct()
            .withColumn("weight", F.lit(1.0))
        )
        cc = connected_components(picked)
        comp = cc.components  # (id, comp) — canonical min member
        new_mapping = mapping.join(
            comp.select(F.col("id").alias("cluster"), F.col("comp").alias("nc")),
            "cluster", "left",
        ).select("id", F.coalesce("nc", "cluster").alias("cluster"))
        ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("pa"))
        cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("pb"))
        new_ce = (
            ce.join(ca, "a", "left").join(cb, "b", "left")
            .select(
                F.coalesce("pa", F.col("a")).alias("na"),
                F.coalesce("pb", F.col("b")).alias("nb"),
                "w",
            )
            .filter(F.col("na") != F.col("nb"))
            .groupBy(
                F.least("na", "nb").alias("a"),
                F.greatest("na", "nb").alias("b"),
            )
            .agg(F.min("w").alias("w"))
        )
        new_state = (
            new_ce.select(F.lit("e").alias("kind"), F.col("a").alias("x"),
                          F.col("b").alias("y"), "w",
                          F.lit(None).cast("long").alias("lvl"))
            .unionByName(
                new_mapping.select(F.lit("m").alias("kind"),
                                   F.col("id").alias("x"),
                                   F.col("cluster").alias("y"),
                                   F.lit(None).cast("double").alias("w"),
                                   F.lit(None).cast("long").alias("lvl"))
            )
            .unionByName(state.filter(F.col("kind") == "o"))
            .unionByName(
                new_mapping.select(F.lit("o").alias("kind"),
                                   F.col("id").alias("x"),
                                   F.col("cluster").alias("y"),
                                   F.lit(None).cast("double").alias("w"),
                                   F.lit(lvl).cast("long").alias("lvl"))
            )
        )
        state = loop.advance(
            lvl, new_state,
            metrics={"clusters_json": _json.dumps(n_clusters)},
        )
        n_clusters.append(
            state.filter(F.col("kind") == "m").select("y").distinct().count()
        )
    ce, mapping = _kinds(state)
    out = state.filter(F.col("kind") == "o").select(
        F.col("x").alias("id"), F.col("lvl").alias("level"),
        F.col("y").alias("cluster"),
    )
    # carry the last assignment forward for any levels not executed
    if done < levels and n_clusters:
        for lvl in range(done + 1, levels + 1):
            out = out.unionByName(
                mapping.select("id", F.lit(lvl).cast("long").alias("level"),
                               "cluster")
            )
    return AffinityResult(
        assignments=out,
        levels=levels,
        stats={"clusters_per_level": n_clusters,
               "merged_levels": done,
               "wall_s": round(time.time() - t0, 3)},
        _caches=[und, state],
    )


def affinity_clustering_sql(edges_sql: str, levels: int = 3) -> str:
    """Oracle: the affinity levels unrolled into DuckDB SQL; cluster
    components per level via transitive closure (WITH RECURSIVE),
    canonical min-member ids exactly as the engine."""
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    parts = [
        f"WITH RECURSIVE e AS ({edges_sql})",
        """ce0 AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
  MIN(COALESCE(weight, 1.0)) AS w FROM e WHERE src <> dst GROUP BY 1, 2)""",
        """map0 AS (SELECT id, id AS cluster FROM (
  SELECT a AS id FROM ce0 UNION SELECT b AS id FROM ce0))""",
    ]
    sel = []
    for l in range(1, levels + 1):
        p = l - 1
        parts.append(
            f"""pick{l} AS MATERIALIZED (SELECT DISTINCT a, b FROM (
  SELECT a, b, ROW_NUMBER() OVER (PARTITION BY node
    ORDER BY w ASC, a ASC, b ASC) AS rn FROM (
    SELECT a AS node, w, a, b FROM ce{p}
    UNION ALL SELECT b AS node, w, a, b FROM ce{p}))
  WHERE rn = 1)"""
        )
        parts.append(
            f"""symp{l} AS (SELECT a AS node, b AS other FROM pick{l}
  UNION ALL SELECT b AS node, a AS other FROM pick{l})"""
        )
        parts.append(
            f"""walk{l} AS (SELECT node AS id, node AS r FROM symp{l}
  UNION SELECT w.id, s.other FROM walk{l} w
  JOIN symp{l} s ON s.node = w.r)"""
        )
        parts.append(
            f"comp{l} AS MATERIALIZED (SELECT id, MIN(r) AS comp "
            f"FROM walk{l} GROUP BY id)"
        )
        parts.append(
            f"""map{l} AS MATERIALIZED (SELECT m.id,
  COALESCE(c.comp, m.cluster) AS cluster
  FROM map{p} m LEFT JOIN comp{l} c ON c.id = m.cluster)"""
        )
        parts.append(
            f"""ce{l} AS MATERIALIZED (SELECT LEAST(na, nb) AS a,
  GREATEST(na, nb) AS b, MIN(w) AS w FROM (
  SELECT COALESCE(ca.comp, x.a) AS na, COALESCE(cb.comp, x.b) AS nb, x.w
  FROM ce{p} x LEFT JOIN comp{l} ca ON ca.id = x.a
  LEFT JOIN comp{l} cb ON cb.id = x.b)
  WHERE na <> nb GROUP BY 1, 2)"""
        )
        sel.append(
            f"SELECT id, CAST({l} AS BIGINT) AS level, cluster FROM map{l}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sel)
