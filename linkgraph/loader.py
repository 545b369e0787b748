"""GraphLoader-builder facade — SURVEY.md §2.5 surface 3.

The reference's fluent loader
(`pub:core/.../core/GraphLoader.java#withLabel/withRelationshipType/
withDirection/withRelationshipWeightsFromProperty`) builds one
immutable projected graph. The Spark-native analog is a bundle of
three DataFrames (nodes, edges, degrees) built from the source-code
table by a named edge strategy:

  * ``imports``          — file -> file edges from vectorized import
                           extraction (linkgraph.ingest.derive_graph);
  * ``path_cooccurrence``— undirected file -- file edges between files
                           in the same (repo, directory), weight 1 —
                           the structural co-location signal of the
                           north star's "import/path co-occurrence".

Direction is applied edge-table-side exactly like GraphLoader
withDirection: as-is / swapped / symmetrized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.ingest import derive_graph, file_key
from linkgraph.ids import dense_ids


@dataclass
class LinkGraph:
    nodes: DataFrame    # (id, key)
    edges: DataFrame    # (src, dst, weight)
    degrees: DataFrame  # (id, outdeg)

    @staticmethod
    def from_source_table(
        source: DataFrame,
        edge_strategy: str = "imports",
        direction: str = "OUTGOING",
        weight_default: float = 1.0,
        max_group: int = 1000,
    ) -> "LinkGraph":
        if edge_strategy == "imports":
            nodes, edges, _repo_edges = derive_graph(source)
        elif edge_strategy == "path_cooccurrence":
            nodes, edges = _path_cooccurrence(source, max_group=max_group)
        else:
            raise ValueError(f"unknown edge_strategy {edge_strategy}")
        w = F.coalesce(F.col("weight"), F.lit(float(weight_default)))
        e = edges.select("src", "dst", w.alias("weight"))
        d = direction.upper()
        if d == "INCOMING":
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        elif d == "BOTH":
            e = e.union(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
            )
        elif d != "OUTGOING":
            raise ValueError(f"bad direction {direction}")
        degrees = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("outdeg"))
        return LinkGraph(nodes=nodes, edges=e, degrees=degrees)


def _path_cooccurrence(
    source: DataFrame, max_group: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Undirected file--file edges between files sharing
    (repo, dirname(path)) — delegates the pair generation to
    ``ingest.path_cooccurrence_edges`` with ``node_col="key"`` (the
    INJECTIVE repo/path key — module names can collide across
    ambiguous '^src/' strips) and the ``max_group`` directory-fan-out
    cap, then maps the keys onto the dense-id dictionary. NOTE the cap
    DROPS directories above ``max_group`` files entirely (the
    bounded-candidate contract, not a sample) — raise it via
    ``from_source_table(..., max_group=...)`` when mega-directories
    must be kept."""
    from linkgraph.ingest import path_cooccurrence_edges

    files = source.select(file_key(source).alias("key"))
    # adaptive bucket count — same scale rationale as ingest.derive_graph
    nodes = dense_ids(files.select("key")).persist()
    pairs = path_cooccurrence_edges(source, max_group=max_group,
                                    node_col="key")
    edges = (
        pairs.join(nodes.select(F.col("key").alias("src"),
                                F.col("id").alias("sid")), "src")
        .join(nodes.select(F.col("key").alias("dst"),
                           F.col("id").alias("did")), "dst")
        .select(
            F.least("sid", "did").alias("src"),
            F.greatest("sid", "did").alias("dst"),
            "weight",
        )
    )
    return nodes, edges


class GraphCatalog:
    """Named in-memory graph catalog — the reference's pre-loaded-graph
    surface (``algo.graph.load`` / ``algo.graph.list`` /
    ``algo.graph.remove`` / ``algo.graph.info``, pub:algo/.../
    LoadGraphProc.java lineage): load a projection once under a name,
    run many procedures against it, drop it when done.

    Spark mapping: loading = persist + materialize the edge frame (the
    'heavy' import), so every subsequent procedure reuses the cached
    columnar blocks instead of re-deriving the projection (exactly why
    the reference added the feature — amortizing the load phase across
    procedure calls). ``remove`` unpersists. Entries record the
    materialized node/edge counts (the reference's YIELD nodes,
    relationships contract).

    The catalog is deliberately a plain instance (not process-global):
    a driver program scopes its own catalogs; tests stay hermetic.
    """

    def __init__(self):
        self._graphs: dict[str, dict] = {}

    def load(self, name: str, edges: DataFrame, replace: bool = False) -> dict:
        """Persist + materialize ``edges`` under ``name``; returns the
        info row {name, nodes, relationships}."""
        if not name:
            raise ValueError("graph name must be non-empty")
        if name in self._graphs:
            if not replace:
                raise ValueError(
                    f"graph {name!r} already loaded (pass replace=True)"
                )
            self.remove(name)
        e = edges.persist()
        n_edges = e.count()
        n_nodes = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
            .count()
        )
        info = {"name": name, "nodes": n_nodes, "relationships": n_edges}
        self._graphs[name] = {"edges": e, **info}
        return dict(info)

    def get(self, name: str) -> DataFrame:
        """The persisted edge frame (algo calls pass this as `edges`)."""
        if name not in self._graphs:
            raise KeyError(f"no graph named {name!r} (loaded: {sorted(self._graphs)})")
        return self._graphs[name]["edges"]

    def info(self, name: str) -> dict:
        if name not in self._graphs:
            raise KeyError(f"no graph named {name!r} (loaded: {sorted(self._graphs)})")
        g = self._graphs[name]
        return {"name": g["name"], "nodes": g["nodes"], "relationships": g["relationships"]}

    def list(self) -> list[dict]:
        """algo.graph.list: one info row per loaded graph, name-sorted."""
        return [self.info(n) for n in sorted(self._graphs)]

    @staticmethod
    def _plan_key(df: DataFrame):
        try:
            return df._jdf.queryExecution().analyzed().semanticHash()
        except Exception:
            return id(df)

    def remove(self, name: str) -> bool:
        """algo.graph.remove: unpersist and forget; False if absent.

        Unpersisting is skipped while ANOTHER catalog entry shares the
        same plan — Spark's cache is keyed by plan, so unpersisting an
        aliased frame would silently evict the surviving entry's cache
        (the amortize-the-load purpose of the catalog)."""
        g = self._graphs.pop(name, None)
        if g is None:
            return False
        key = self._plan_key(g["edges"])
        shared = any(
            self._plan_key(o["edges"]) == key for o in self._graphs.values()
        )
        if not shared:
            g["edges"].unpersist()
        return True
