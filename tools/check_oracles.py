"""Local mimic of the driver's correctness harness.

Runs every __spark_entry__.queries() entry at the given sf dir on
Spark AND the matching oracle_sql() in DuckDB, compares row count,
column names, and order-insensitive values (sorted rows, columns
sorted by name). Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from linkgraph.checkpoint import release_caches
from linkgraph.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    # bound DuckDB so one oracle can't take the host down while the
    # Spark JVM + tmpfs shuffle dirs are holding their share of RAM
    con.execute("SET memory_limit='16GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        got = df.toPandas()
        t_spark = time.time() - t0
        # hygiene between queries: spark.local.dir sits on RAM-backed
        # tmpfs (/dev/shm), and shuffle files are only deleted when the
        # driver GC's the shuffle objects — over a 52-query drive the
        # accumulation squeezed host RAM until DuckDB failed a 16KB
        # allocation. Release attached caches, drop the cache registry,
        # and force a driver GC so ContextCleaner reclaims tmpfs.
        release_caches(df)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        if name not in oracles:
            print(f"{name}: rows-only check, {len(got)} rows, {t_spark:.1f}s")
            continue
        t0 = time.time()
        exp = con.execute(oracles[name]).df()
        t_duck = time.time() - t0
        g, e = normalize(got), normalize(exp)
        ok = list(g.columns) == list(e.columns) and len(g) == len(e)
        if ok:
            for c in g.columns:
                # driver hashes raw values: int64 12 != float64 12.0, so a
                # kind-class mismatch (e.g. DuckDB HUGEINT -> float64) is FAIL
                kinds = {("i" if k in "iub" else k) for k in (g[c].dtype.kind, e[c].dtype.kind)}
                if kinds == {"i", "f"}:
                    ok = False
                    print(f"  dtype-class mismatch on {c}: {g[c].dtype} vs {e[c].dtype}")
                    break
                if g[c].dtype.kind == "f" or e[c].dtype.kind == "f":
                    if len(g):
                        ok = ok and (g[c].astype(float) - e[c].astype(float)).abs().max() <= 1e-9
                elif g[c].dtype.kind in "iub" and e[c].dtype.kind in "iub":
                    ok = ok and (g[c].astype("int64") == e[c].astype("int64")).all()
                else:
                    ok = ok and (g[c].astype(str) == e[c].astype(str)).all()
        status = "OK " if ok else "FAIL"
        if not ok:
            failures += 1
            print(f"{status} {name}: spark {len(got)}r/{t_spark:.1f}s duck {len(exp)}r/{t_duck:.1f}s")
            print("  spark cols:", list(g.columns), " duck cols:", list(e.columns))
            print(g.head(3).to_string(), "\n", e.head(3).to_string())
        else:
            print(f"{status} {name}: {len(got)} rows, spark {t_spark:.1f}s, duck {t_duck:.1f}s")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
