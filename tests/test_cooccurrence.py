"""Path co-occurrence edges: literal-table twin, synthetic-catalog
arithmetic reconstruction parity, and the group cap."""

import duckdb
import pytest

from linkgraph.ingest import (
    file_dim_sql,
    path_cooccurrence_edges,
    path_cooccurrence_sql,
)
from linkgraph.synth import generate_source_table, synth_file_dim_sql

ROWS = [
    ("r0000", "src/pkg_0/mod_000.py"),
    ("r0000", "src/pkg_0/mod_003.java"),
    ("r0000", "src/pkg_1/mod_001.py"),
    ("r0001", "src/pkg_0/mod_000.py"),
    ("r0001", "src/pkg_0/mod_002.py"),
    ("r0001", "src/pkg_0/mod_004.py"),
]


def _source(spark, rows=ROWS):
    return spark.createDataFrame(
        [(r, p, "c", "python", "") for r, p in rows],
        "repo string, path string, commit string, lang string, content string",
    )


def _values_sql(rows=ROWS):
    vals = ", ".join(f"('{r}', '{p}')" for r, p in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t(repo, path)"


def test_literal_twin_and_pairs(spark):
    got = sorted(map(tuple, path_cooccurrence_edges(_source(spark)).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        path_cooccurrence_sql(file_dim_sql(_values_sql()))
    ).fetchall()))
    assert got == want
    # r0000/pkg_0 pair + 3 pairs in r0001/pkg_0; pkg_1 is a singleton
    assert len(got) == 1 + 3
    assert ("r0000.pkg_0.mod_000", "r0000.pkg_0.mod_003", 1.0) in got


def test_max_group_cap_drops_fat_directory(spark):
    got = sorted(map(tuple,
                     path_cooccurrence_edges(_source(spark), max_group=2)
                     .collect()))
    # only the 2-file directory survives; the 3-file one is capped out
    assert got == [("r0000.pkg_0.mod_000", "r0000.pkg_0.mod_003", 1.0)]


def test_synth_catalog_reconstruction_parity(spark):
    src = generate_source_table(spark, repos=3, files_per_repo=8, packages=3,
                                seed=42)
    got = sorted(map(tuple, path_cooccurrence_edges(src).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        path_cooccurrence_sql(synth_file_dim_sql(3, 8, 3))
    ).fetchall()))
    assert got == want
    assert len(got) > 0


def test_bad_params(spark):
    with pytest.raises(ValueError):
        path_cooccurrence_edges(_source(spark), max_group=1)
    with pytest.raises(ValueError):
        path_cooccurrence_sql("SELECT 1", max_group=0)
