"""1-dimensional Weisfeiler-Lehman color refinement (WL node
fingerprints / structural role classes).

Engine extension beyond the reference procedure list (SURVEY.md §2 is
100% covered elsewhere): 1-WL refinement (Weisfeiler & Lehman 1968;
Shervashidze et al. JMLR 2011, "Weisfeiler-Lehman graph kernels" —
public results) is the canonical structural-role / graph-fingerprint
primitive: after k rounds two nodes share a color iff their depth-k
unfolded neighborhood trees are identical, which gives (a) structural
role classes for feature engineering over the import graph, (b) a
graph-level fingerprint (the color histogram) for near-isomorphism
screening of repo subgraphs, and (c) the exact node partition GNN
expressive-power results are stated against.

Determinism = oracle-ability: colors are 60-bit ``stable_hash64``
values (pipeline/hashing.py — bit-identical in Spark, DuckDB and
Python). Round t rewrites each node's color as

    H( own_color || '|' || multiset-encoding of neighbor colors, salt )

with two multiset encodings:

* ``combine="sort"`` (default, the textbook encoding): the
  sorted comma-joined neighbor color list — exact, but the signature
  string and the ``collect_list`` behind it are O(degree) per node,
  so a mega-hub concentrates O(deg) state in one aggregation buffer;
* ``combine="sum"`` (the 100TB path): neighbor colors are summed in
  DECIMAL(38,0) (order-free, map-side combinable, constant per-group
  state) and reduced mod 2^60, with the neighbor COUNT appended to
  the signature. A commutative multiset hash — collisions are
  possible in principle (two different color multisets with equal sum
  and count) but need ~2^-60-scale coincidences; the partition it
  produces is pytest-cross-checked against "sort" on fixtures.

Colors only split (nodes with equal signatures stay together; nodes
with different old colors hash apart), so ``n_classes`` per round is
non-decreasing; the per-round class counts are reported in
``stats["classes_per_round"]``. The run always executes exactly
``rounds`` rounds — WL color VALUES change every round even after the
partition stabilizes (the hash re-mixes), so a value-exact SQL twin
must unroll the same fixed round count (``wl_refinement_sql``).

Scale notes (100TB): per round ONE join of the symmetric adjacency
against the (id, color) frame plus one groupBy — exactly the LPA
shuffle shape, with the same hub caveat (degree-histogram probe /
hub split applies if ever needed; ``combine="sum"`` already removes
the per-group O(deg) buffer, which is the part that actually breaks
first). State between rounds is one narrow (id, color) frame, pinned
and released pairwise.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import pin_table, release_state
from linkgraph.coloring import _sym
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

_MOD = 1 << 60


@dataclass
class WLResult:
    colors: DataFrame  # (id, wl_color)
    rounds: int
    n_classes: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def wl_refinement(
    edges: DataFrame,
    rounds: int = 3,
    seed: int = 0,
    combine: str = "sort",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> WLResult:
    """Run exactly ``rounds`` rounds of 1-WL color refinement over the
    undirected simple graph of ``edges``; returns per-node 60-bit
    colors plus per-round class counts (see module docstring).
    Replayed value-exact by ``wl_refinement_sql``.

    Round-granular durable resume (the engine-wide SuperstepLoop
    contract): with ``checkpoint_dir`` every ``checkpoint_every``-th
    round writes the (id, wl_color) frame durably; ``resume=True``
    re-enters at the last durable round, guarded by the graph
    fingerprint and the (seed, combine) parameters — a
    killed-then-resumed run equals an uninterrupted one exactly."""
    import json as _json

    from linkgraph.checkpoint import SuperstepLoop
    from linkgraph.kcore import _check_resume_fp

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    if combine not in ("sort", "sum"):
        raise ValueError(f"combine must be 'sort' or 'sum', got {combine!r}")
    t0 = time.time()
    spark = edges.sparkSession
    sym = pin_table(_sym(edges).repartition("node"))
    fp = (
        int(sym.agg(F.expr("bit_xor(xxhash64(node, nbr))").alias("fp"))
            .first()["fp"] or 0)
        if checkpoint_dir else None
    )
    params = {"seed": seed, "combine": combine}
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="wl",
        max_steps=rounds, context={"graph_fp": fp, "params": params},
    )
    caches = [sym]
    start = 0
    state = None
    classes = [1]
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "wl_refinement", loop.last_context.get("graph_fp"), fp
            )
            rec = loop.last_context.get("params")
            if rec is not None and rec != params:
                raise ValueError(
                    "wl_refinement resume mismatch: parameters differ "
                    f"({rec!r} != {params!r})."
                )
            start, state = resumed
            classes = _json.loads(
                loop.last_metrics.get("classes_json", "[1]")
            )
            # the manifest at round t records counts through t-1 (the
            # advance happens before the round's count) — recompute the
            # resumed round's own class count from the durable state
            if len(classes) < start + 1:
                classes.append(
                    state.agg(F.countDistinct("wl_color").alias("n"))
                    .first()["n"]
                )
    if state is None:
        state = loop.advance(
            0,
            sym.select(F.col("node").alias("id")).distinct()
            .select("id", F.lit(0).cast("long").alias("wl_color")),
            force_checkpoint=bool(checkpoint_dir),
            metrics={"classes_json": _json.dumps(classes)},
        )
    for t in range(start + 1, rounds + 1):
        state = loop.advance(
            t, _wl_round(sym, state, combine, seed),
            metrics={"classes_json": _json.dumps(classes)},
        )
        classes.append(
            state.agg(F.countDistinct("wl_color").alias("n")).first()["n"]
        )
    caches.append(state)
    return WLResult(
        colors=state.select("id", "wl_color"),
        rounds=rounds,
        n_classes=classes[-1],
        stats={
            "classes_per_round": classes,
            "combine": combine,
            "wall_s": round(time.time() - t0, 3),
        },
        _caches=caches,
    )


def _wl_round(sym: DataFrame, state: DataFrame, combine: str, seed: int) -> DataFrame:
    """One refinement round (pre-pin) — the production kernel, exposed
    for plan assertions (tests/test_plans.py)."""
    nbr = sym.join(
        state.select(F.col("id").alias("nbr"), F.col("wl_color").alias("nc")),
        "nbr",
    )
    if combine == "sort":
        enc = nbr.groupBy("node").agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("nc"))), ","
            ).alias("ms")
        )
    else:
        enc = nbr.groupBy("node").agg(
            F.concat_ws(
                ";",
                F.pmod(
                    F.sum(F.col("nc").cast("decimal(38,0)")),
                    F.lit(_MOD).cast("decimal(38,0)"),
                ).cast("long").cast("string"),
                F.count("*").cast("string"),
            ).alias("ms")
        )
    return state.join(enc, state.id == enc.node).select(
        "id",
        stable_hash64(
            F.concat_ws("|", F.col("wl_color").cast("string"), F.col("ms")),
            salt=f"wl-{seed}",
        ).alias("wl_color"),
    )


def wl_refinement_sql(
    edges_sql: str, rounds: int, seed: int = 0, combine: str = "sort"
) -> str:
    """Oracle: the WL rounds unrolled into ANSI SQL (DuckDB) — the
    same signature strings and ``stable_hash64`` per round."""
    if combine not in ("sort", "sum"):
        raise ValueError(f"combine must be 'sort' or 'sum', got {combine!r}")
    parts = [
        f"WITH e AS ({edges_sql})",
        """und AS (SELECT DISTINCT LEAST(src, dst) AS a,
  GREATEST(src, dst) AS b FROM e WHERE src <> dst)""",
        """sym AS (SELECT a AS node, b AS nbr FROM und
  UNION ALL SELECT b AS node, a AS nbr FROM und)""",
        """c0 AS (SELECT DISTINCT node AS id, CAST(0 AS BIGINT) AS wl_color
  FROM sym)""",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        if combine == "sort":
            ms = "string_agg(CAST(m.wl_color AS VARCHAR), ',' ORDER BY m.wl_color)"
        else:
            ms = (
                "CAST(CAST(SUM(CAST(m.wl_color AS DECIMAL(38,0))) % "
                f"CAST({_MOD} AS DECIMAL(38,0)) AS BIGINT) AS VARCHAR) || ';' "
                "|| CAST(COUNT(*) AS VARCHAR)"
            )
        sig = f"CAST(n.wl_color AS VARCHAR) || '|' || {ms}"
        parts.append(
            f"""c{t} AS MATERIALIZED (SELECT n.id,
  {stable_hash64_sql(sig, salt=f'wl-{seed}')} AS wl_color
  FROM c{p} n JOIN sym s ON s.node = n.id
  JOIN c{p} m ON m.id = s.nbr
  GROUP BY n.id, n.wl_color)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, wl_color FROM c{rounds}"
