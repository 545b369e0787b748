"""Deterministic synthetic source-code table generator (FIXTURES.md §6).

Produces the BASELINE.json input_hint table
``(repo:string, path:string, commit:string, lang:string, content:string)``
— the sandbox stand-in for the north star's Iceberg catalog of source
repositories. Properties:

  * fully deterministic from (seed, repos, files_per_repo) — every
    field derives from the global file index via counter-based hashing
    (splitmix64), so the table is identical regardless of partitioning
    or cluster size;
  * ``content`` embeds derivable import lines whose targets follow a
    bounded-Pareto (Zipf-like, s=1.5) rank distribution over the global
    file list — low-index files become power-law in-degree hubs, the
    skew that salting/AQE must absorb (SURVEY.md §7 "hard parts");
  * generated distributively via ``mapInPandas`` over ``spark.range``
    (numpy-vectorized; scales to arbitrary file counts).

Module names are globally unique (``r0007.pkg_2.mod_013``) so import
resolution is an exact equi-join on module name.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ("python", "java")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    # uint64 wraparound is the algorithm; numpy only warns on the
    # scalar (0-d) path, which would spam every mapInPandas batch log
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash01(idx: np.ndarray, salt: int, seed: int) -> np.ndarray:
    h = _splitmix64(idx.astype(np.uint64) ^ _splitmix64(np.uint64(seed * 1_000_003 + salt)))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _bounded_pareto(u: np.ndarray, n: int, s: float) -> np.ndarray:
    """Inverse-CDF sample of rank in [1, n] with P(r) ~ r^-s (s>1)."""
    hi = float(n) ** (1.0 - s)
    x = (1.0 - u * (1.0 - hi)) ** (1.0 / (1.0 - s))
    return np.clip(x.astype(np.int64), 1, n)


def _module(repo_idx: np.ndarray, file_j: np.ndarray, packages: int) -> list[str]:
    pkg = file_j % packages
    return [
        f"r{r:04d}.pkg_{p}.mod_{j:03d}"
        for r, p, j in zip(repo_idx.tolist(), pkg.tolist(), file_j.tolist())
    ]


def generate_source_table(
    spark: SparkSession,
    repos: int = 10,
    files_per_repo: int = 20,
    packages: int = 4,
    seed: int = 42,
    zipf_s: float = 1.5,
    max_imports: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return DataFrame(repo, path, commit, lang, content)."""
    n_files = repos * files_per_repo

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            r = idx // files_per_repo
            j = idx % files_per_repo
            pkg = j % packages
            lang_u = _hash01(idx, 1, seed)
            langs = np.where(lang_u < 0.7, "python", "java")
            ext = np.where(langs == "python", "py", "java")
            repo = [f"r{x:04d}" for x in r.tolist()]
            path = [
                f"src/pkg_{p}/mod_{jj:03d}.{e}"
                for p, jj, e in zip(pkg.tolist(), j.tolist(), ext.tolist())
            ]
            commit = [
                hashlib.sha1(f"{rp}:{pt}".encode()).hexdigest()
                for rp, pt in zip(repo, path)
            ]
            # number of imports per file: bounded pareto in [1, max_imports]
            k = _bounded_pareto(_hash01(idx, 2, seed), max_imports, zipf_s)
            contents = []
            for row, (i0, rp, lg, nk) in enumerate(
                zip(idx.tolist(), repo, langs.tolist(), k.tolist())
            ):
                # per-import target ranks, counter-hashed on (file, slot)
                slots = np.arange(nk, dtype=np.int64)
                u = _hash01(np.int64(i0) * np.int64(max_imports + 1) + slots, 3, seed)
                ranks = _bounded_pareto(u, n_files, zipf_s)
                targets = ranks - 1  # low global index = hub
                targets = targets[targets != i0]
                t_r = targets // files_per_repo
                t_j = targets % files_per_repo
                mods = _module(t_r, t_j, packages)
                term = ";" if lg == "java" else ""
                lines = [f"import {m}{term}" for m in dict.fromkeys(mods)]
                body = [
                    f"// file {rp}/{path[row]}" if lg == "java" else f"# file {rp}/{path[row]}",
                    *lines,
                    f"def f_{i0}(): return {i0}" if lg == "python" else f"class C{i0} {{ int v = {i0}; }}",
                ]
                contents.append("\n".join(body))
            yield pd.DataFrame(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": langs,
                    "content": contents,
                }
            )

    parts = num_partitions or max(4, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_files, numPartitions=parts)
    return rng.mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )


def content_manifest(source: DataFrame) -> DataFrame:
    """Per-row sha256(content) manifest — JVM-side, no Python.

    The ingestion invariant (BASELINE.json input_hint): after any
    write/read round-trip the per-row sha must match this manifest.
    """
    return source.select("repo", "path", F.sha2("content", 256).alias("sha256"))


def verify_ingestion(ingested: DataFrame, manifest: DataFrame) -> int:
    """Return the number of rows whose content sha changed (must be 0)."""
    got = ingested.select("repo", "path", F.sha2("content", 256).alias("sha_got"))
    joined = got.join(manifest, ["repo", "path"], "full")
    return joined.filter(
        F.col("sha_got").isNull()
        | F.col("sha256").isNull()
        | (F.col("sha_got") != F.col("sha256"))
    ).count()


def synth_edge_table(
    spark: SparkSession,
    n_nodes: int = 1 << 21,
    n_edges: int = 1 << 24,
    zipf_s: float = 1.5,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic power-law edge table, generated entirely JVM-side.

    Scale-bench input (north rule: same input at N and 4N parallelism):
    src uniform over [0, n_nodes); dst bounded-Pareto (P(rank) ~ r^-s)
    so low ids are in-degree hubs. Pure Catalyst expressions — no
    Python in the data path, partitioning-independent (row index is the
    counter), so the table is identical at any parallelism level.

    Mixture dst distribution (half Pareto + half uniform): pure Pareto
    at s=1.5 leaves ~98% of nodes with in-degree 0, which is
    unrepresentative of real link graphs (where most files are
    imported at least once) and degenerates the static-node folding
    optimization into a no-op benchmark.
    """
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    hub_frac = 0.5
    big = float(1 << 40)
    rows = spark.range(0, n_edges, numPartitions=parts)
    u1 = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1 << 40)) / F.lit(big)
    u2 = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(1 << 40)) / F.lit(big)
    u3 = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(1 << 40)) / F.lit(big)
    u4 = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(1 << 40)) / F.lit(big)
    hi = float(n_nodes) ** (1.0 - zipf_s)
    rank = F.pow(
        F.lit(1.0) - u2 * F.lit(1.0 - hi), F.lit(1.0 / (1.0 - zipf_s))
    )
    zipf_dst = F.least(
        F.greatest(rank.cast("long") - F.lit(1), F.lit(0)), F.lit(n_nodes - 1)
    )
    dst = F.when(u3 < hub_frac, zipf_dst).otherwise((u4 * n_nodes).cast("long"))
    return (
        rows.select(
            (u1 * n_nodes).cast("long").alias("src"), dst.alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
    )


def synth_file_dim_sql(repos: int, files_per_repo: int, packages: int) -> str:
    """DuckDB reconstruction of the synthetic catalog's file dimension
    (repo, dir, module) — pure modular arithmetic over the global file
    index, independently re-deriving what ``generate_source_table``
    encodes in (repo, path). Cross-checking
    ``ingest.path_cooccurrence_edges`` (regex extraction over the real
    table) against this reconstruction validates the whole path
    round-trip, the q5-style synth parity."""
    n = repos * files_per_repo
    return f"""
SELECT printf('r%04d', i // {files_per_repo}) AS repo,
       'src/pkg_' || CAST((i % {files_per_repo}) % {packages} AS VARCHAR) AS dir,
       printf('r%04d.pkg_%d.mod_%03d', i // {files_per_repo},
              (i % {files_per_repo}) % {packages},
              i % {files_per_repo}) AS module
FROM range(0, {n}) t(i)
"""
