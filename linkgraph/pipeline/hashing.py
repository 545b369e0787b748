"""Cross-engine stable 60-bit hash.

Spark's xxhash64/hash and DuckDB's hash() disagree, so every operator
that must be oracle-checkable derives hashes from the md5 hex digest —
identical in both engines (verified: md5('abc')[0:15] parses to
648541476951500027 in Spark conv(), DuckDB CAST, and Python int()).

60 bits (15 hex chars) keeps the value positive in an int64 everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash64(col: Column | str, salt: int | str | None = None) -> Column:
    """Deterministic 60-bit hash of a string column, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(c, F.lit(f"#{salt}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def stable_hash64_sql(expr: str, salt: int | str | None = None) -> str:
    """The same hash as a DuckDB SQL expression over ``expr``."""
    if salt is not None:
        expr = f"({expr}) || '#{salt}'"
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
