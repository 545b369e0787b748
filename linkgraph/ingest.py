"""Edge derivation from the source-code table — the engine's "LOAD".

Spark-native replacement for the reference's graph construction
(pub:core/.../core/GraphLoader.java + HeavyGraphFactory importRels,
SURVEY.md §2.3): instead of scanning a Neo4j store, the link graph is
DERIVED from the Iceberg-style source table
(repo, path, commit, lang, content):

  1. a vectorized pandas/Arrow UDF extracts import statements from
     ``content`` (pandas ``str.findall`` per language mask — Arrow
     batch transfer, zero per-row Python UDF calls);
  2. import tokens resolve to files by an exact equi-join on the
     globally-unique module name (derived from repo+path JVM-side);
  3. file-level edges (importing file -> imported file, weight 1) and
     repo-level co-occurrence edges (repo A -> repo B weighted by the
     count of A-files importing B-files) come out of groupBy
     aggregations;
  4. node ids come from the deterministic dense-id dictionary
     (linkgraph.ids — the IdMap analog).

Catalyst prunes ``content`` out of every scan downstream of step 1
(verify with .explain(): ReadSchema excludes content after the edge
table is materialized).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from linkgraph.ids import dense_ids

# ^import <dotted.module>  (python)  /  ^import <dotted.module>; (java)
_PATTERNS = {
    "python": re.compile(r"^import\s+([A-Za-z0-9_.]+)\s*$", re.M),
    "java": re.compile(r"^import\s+([A-Za-z0-9_.]+);\s*$", re.M),
}


@F.pandas_udf(ArrayType(StringType()))
def extract_imports(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Vectorized import extraction (SURVEY.md §2.3 'relationship scan')."""
    out = pd.Series([[]] * len(content), index=content.index, dtype=object)
    for lg, pat in _PATTERNS.items():
        mask = lang == lg
        if mask.any():
            out[mask] = content[mask].str.findall(pat)
    return out


def file_key(df: DataFrame) -> F.Column:
    return F.concat_ws("/", df["repo"], df["path"])


def module_of_path() -> F.Column:
    """Module name from (repo, path): src/pkg_2/mod_013.py -> r0007.pkg_2.mod_013."""
    stem = F.regexp_replace(
        F.regexp_replace(F.col("path"), r"^src/", ""), r"\.(py|java)$", ""
    )
    return F.concat_ws(".", F.col("repo"), F.regexp_replace(stem, "/", "."))


class DerivedGraph(tuple):
    """(nodes, file_edges, repo_edges) triple (unpacks like before)
    with ``release()``: unpersists the cached import-token, node-id
    and resolution tables the derivation keeps live. After release the
    returned frames still WORK but recompute from the source table on
    next use — call it once the derived frames are materialized
    (written, pinned, or the job is done)."""

    def __new__(cls, nodes, file_edges, repo_edges, caches):
        obj = super().__new__(cls, (nodes, file_edges, repo_edges))
        obj._caches = list(caches)
        return obj

    def release(self) -> None:
        for c in self._caches:
            try:
                c.unpersist()
            except Exception:
                pass
        self._caches = []


def derive_graph(source: DataFrame, num_buckets: int | None = None) -> DerivedGraph:
    """Return DerivedGraph(nodes, file_edges, repo_edges) — a plain
    3-tuple plus ``release()`` for the internal caches.

    nodes      DataFrame(id, key) with key = "repo/path"
    file_edges DataFrame(src, dst, weight=1.0) — importing -> imported file
    repo_edges DataFrame(src_repo, dst_repo, weight) — cross-repo only

    ``num_buckets`` pins the dense-id bucket count. Default (None)
    adapts to the session's shuffle width — a deterministic bijection
    per config, but the CONCRETE ids change across differently-sized
    sessions; any job that durably checkpoints state keyed by these
    ids (SuperstepLoop + checkpoint_dir) must pass an explicit value
    and record it in the loop's manifest ``context`` so a resume
    rebuilds the same id space.
    """
    # ONE scan of the fat source table: project (repo, path) and run
    # the Arrow extraction in the same pass, then persist the narrow
    # result (one row per file, content REPLACED by its import-token
    # array — O(n_files * avg_imports) short strings). Every downstream
    # consumer (file dimension, dense ids, the exploded refs, both
    # edge-resolution joins) reads this cache; at catalog scale the
    # 100TB content column is read exactly once, where a per-consumer
    # derivation would re-scan it per branch. Left persisted for the
    # life of the returned (lazy) frames — it is the graph's dimension
    # table.
    extracted = source.select(
        "repo",
        "path",
        extract_imports("content", "lang").alias("imports"),
    ).persist()
    files = extracted.select(
        "repo", "path", file_key(extracted).alias("key"), module_of_path().alias("module")
    )
    # adaptive bucket count (4x shuffle width): per-bucket rank tasks
    # stay O(n / cluster-width) at catalog scale; ids change with the
    # session's shuffle conf but stay a deterministic bijection for a
    # given config (the only contract downstream consumers rely on)
    nodes = dense_ids(files.select("key"), num_buckets=num_buckets).persist()

    refs = extracted.select(
        file_key(extracted).alias("src_key"),
        F.col("repo").alias("src_repo"),
        F.explode("imports").alias("module"),
    )
    resolved = refs.join(
        files.select("module", F.col("key").alias("dst_key"), F.col("repo").alias("dst_repo")),
        "module",
    ).persist()

    s = nodes.select(F.col("key").alias("src_key"), F.col("id").alias("src"))
    d = nodes.select(F.col("key").alias("dst_key"), F.col("id").alias("dst"))
    file_edges = (
        resolved.select("src_key", "dst_key")
        .distinct()
        .join(s, "src_key")
        .join(d, "dst_key")
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    repo_edges = (
        resolved.filter(F.col("src_repo") != F.col("dst_repo"))
        .groupBy(F.col("src_repo"), F.col("dst_repo"))
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return DerivedGraph(nodes, file_edges, repo_edges, [extracted, nodes, resolved])


def path_cooccurrence_edges(
    source: DataFrame, max_group: int = 1000, node_col: str = "module"
) -> DataFrame:
    """Path co-occurrence edges — the second edge family of the north
    star's "import/path co-occurrence" (BASELINE.json north_star;
    import edges come from ``derive_graph``).

    Two files co-occur when they live in the same directory of the
    same repo; the returned edge table is
    ``(src, dst, weight=1.0)`` with ``src < dst``, one row per
    unordered pair. ``node_col`` picks the node identifier:
    ``"module"`` (default) — ``module_of_path`` names, matching the
    import-graph node space and the SQL twin — or ``"key"`` — the
    ``repo/path`` file key, which is INJECTIVE over (repo, path)
    (module names can collide when the ``^src/`` strip is ambiguous,
    e.g. 'src/a/b.py' vs 'a/b.py'; callers joining ids by node, like
    the loader facade, must use "key"). Compose with
    ``linkgraph.ids.edges_from_pairs`` for dense integer ids, or feed
    to any procedure directly (they accept arbitrary orderable node
    types).

    ``max_group`` caps the directory fan-out: a directory with g files
    emits g(g-1)/2 pairs, so a degenerate 100k-file directory would
    explode quadratically at catalog scale. Groups with more than
    ``max_group`` files (and singleton groups) are dropped — the
    bounded-candidate discipline of the dedup operators
    (pipeline/dedup.py df_cap). The group census shuffles only
    (repo, dir) keys; the pair self-join is co-partitioned on the same
    key, so no row ever moves twice.

    Replayed exactly by ``path_cooccurrence_sql`` over a
    (repo, dir, module) file dimension (``file_dim_sql`` extracts one
    from a (repo, path) table; ``linkgraph.synth.synth_file_dim_sql``
    reconstructs the synthetic catalog's dimension arithmetically).
    """
    if max_group < 2:
        raise ValueError(f"max_group must be >= 2, got {max_group}")
    if node_col == "module":
        node = module_of_path()
    elif node_col == "key":
        node = file_key(source)
    else:
        raise ValueError(f"node_col must be 'module' or 'key', got {node_col!r}")
    dim = (
        source.select(
            "repo",
            F.regexp_replace("path", r"/[^/]+$", "").alias("dir"),
            node.alias("module"),
        )
        .distinct()
    )
    grp = (
        dim.groupBy("repo", "dir")
        .agg(F.count("*").alias("g"))
        .filter((F.col("g") >= 2) & (F.col("g") <= max_group))
        .select("repo", "dir")
    )
    dd = dim.join(grp, ["repo", "dir"], "left_semi")
    a = dd.select("repo", "dir", F.col("module").alias("src"))
    b = dd.select("repo", "dir", F.col("module").alias("dst"))
    return (
        a.join(b, ["repo", "dir"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )


def file_dim_sql(source_sql: str) -> str:
    """DuckDB file dimension (repo, dir, module) from a (repo, path)
    table — the same regex derivations ``path_cooccurrence_edges``
    runs in Spark."""
    return f"""
SELECT DISTINCT repo,
       regexp_replace(path, '/[^/]+$', '') AS dir,
       repo || '.' || replace(
         regexp_replace(regexp_replace(path, '^src/', ''),
                        '\\.(py|java)$', ''),
         '/', '.') AS module
FROM ({source_sql})
"""


def path_cooccurrence_sql(files_sql: str, max_group: int = 1000) -> str:
    """Oracle: same-directory pairs over a (repo, dir, module) file
    dimension, group-capped exactly as the engine."""
    if max_group < 2:
        raise ValueError(f"max_group must be >= 2, got {max_group}")
    return f"""
WITH dim AS ({files_sql}),
grp AS (SELECT repo, dir FROM dim GROUP BY repo, dir
        HAVING COUNT(*) BETWEEN 2 AND {max_group})
SELECT a.module AS src, b.module AS dst, CAST(1.0 AS DOUBLE) AS weight
FROM dim a JOIN grp USING (repo, dir)
JOIN dim b ON b.repo = a.repo AND b.dir = a.dir AND a.module < b.module
"""
