"""Corpus dedup report: hand-counted golden + DuckDB twin."""

import duckdb

from linkgraph.pipeline.dedup import dedup_report, dedup_report_sql

# two exact triples of dup docs + two singletons
DOCS = [
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta epsilon zeta"),
    (3, "one two three four five six seven"),
    (4, "one two three four five six seven"),
    (5, "completely different text body here"),
    (6, "another unrelated document entirely"),
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _pairs(spark):
    return spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0)],
        "d1 long, d2 long, similarity double",
    )


def test_report_golden_and_twin(spark):
    row = dedup_report(_pairs(spark), _docs(spark)).first()
    lens = {i: len(t) for i, t in DOCS}
    assert row["n_docs"] == 7
    assert row["n_clusters"] == 4          # {0,1,2}, {3,4}, {5}, {6}
    assert row["n_duplicates"] == 3        # 1,2,4
    assert row["dup_frac"] == round(3 / 7, 6)
    assert row["chars_total"] == sum(lens.values())
    assert row["chars_removed"] == lens[1] + lens[2] + lens[4]
    assert row["max_cluster"] == 3
    assert row["singleton_clusters"] == 2

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r})" for i, t in DOCS)
        + ") t(doc_id, text)"
    )
    pairs_sql = ("SELECT * FROM (VALUES (0, 1), (1, 2), (3, 4)) "
                 "AS p(d1, d2)")
    want = con.execute(dedup_report_sql(pairs_sql)).fetchall()[0]
    assert tuple(row) == want


def test_contamination_report_golden_and_twin(spark):
    from linkgraph.pipeline.curate import (
        contamination_report,
        contamination_report_sql,
    )

    docs = [
        (0, "the quick brown fox jumps over the lazy dog today", "a"),
        (1, "the quick brown fox jumps over the lazy dog today", "a"),
        (2, "entirely clean text with no benchmark overlap at all", "b"),
        (3, "the quick brown fox jumps over the lazy dog again now", "b"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rep = contamination_report(df, df.filter("doc_id = 0"), n=8)
    got = {r["source"]: (r["n_docs"], r["contaminated"], r["contam_frac"])
           for r in rep.collect()}
    # doc 0 is the benchmark itself (self-hit), doc 1 identical,
    # doc 3 shares the 8-gram prefix; doc 2 clean
    assert got["a"] == (2, 2, 1.0)
    assert got["b"] == (2, 1, 0.5)

    import duckdb
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r}, '{s}')" for i, t, s in docs)
        + ") t(doc_id, text, source)"
    )
    want = sorted(map(tuple, con.execute(
        contamination_report_sql("doc_id = 0", n=8)
    ).fetchall()))
    got_rows = sorted(map(tuple, rep.collect()))
    assert got_rows == want


def test_mixing_plan_golden_and_twin(spark):
    import pytest as _pytest

    from linkgraph.pipeline.curate import mixing_plan, mixing_plan_sql

    docs = [
        (0, "a b c d e f g h i j", "web"),      # 10 tokens
        (1, "a b c d e f g h i j", "web"),      # web: 20 tokens
        (2, "a b c d e", "books"),              # books: 5 tokens
        (3, "a b c", "code"),                   # code: 3 tokens (no target)
    ]
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    plan = {r["source"]: r for r in
            mixing_plan(df, {"web": 0.5, "books": 0.5}).collect()}
    # budget = min(20/0.5, 5/0.5) = 10 -> books binding (rate 1),
    # web keeps 5 of 20 tokens (rate 0.25); code untargeted -> 0
    assert plan["books"]["sample_rate"] == 1.0
    assert plan["web"]["sample_rate"] == 0.25
    assert plan["web"]["expected_tokens"] == 5.0
    assert plan["code"]["sample_rate"] == 0.0

    import duckdb
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t!r}, '{s}')" for i, t, s in docs)
        + ") t(doc_id, text, source)"
    )
    got = sorted(map(tuple,
                     mixing_plan(df, {"web": 0.5, "books": 0.5}).collect()))
    want = sorted(map(tuple, con.execute(
        mixing_plan_sql({"web": 0.5, "books": 0.5})
    ).fetchall()))
    assert got == want
    with _pytest.raises(ValueError):
        mixing_plan(df, {})
    with _pytest.raises(ValueError):
        mixing_plan_sql({"web": -1.0})
