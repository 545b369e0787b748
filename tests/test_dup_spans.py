"""ExactSubstr-style duplicate-span detection (linkgraph/pipeline/dedup.py).

Goldens are hand-derived; the DuckDB twin is checked on a randomized
corpus, and the driver value-checks `dup_spans_documents` at sf0.01.
"""

import random

from linkgraph.pipeline.dedup import duplicate_spans, duplicate_spans_sql


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tok(i):
    return f"t{i}"


def test_shared_run_found_with_exact_bounds(spark):
    # docs 0 and 1 share tokens 10..19 (a 10-token run); k=4 windows at
    # positions 0..6 of the run merge into one span covering it exactly
    shared = " ".join(_tok(i) for i in range(10, 20))
    d0 = "a b c " + shared + " x y z"
    d1 = "p q " + shared + " r"
    res = duplicate_spans(_docs(spark, [(0, d0), (1, d1)]), k=4).collect()
    spans = {(r.doc_id, r.span_start, r.span_end, r.n_windows) for r in res}
    # d0: shared run occupies token positions 3..12; d1: positions 2..11
    assert spans == {(0, 3, 12, 7), (1, 2, 11, 7)}


def test_within_doc_repetition_counts(spark):
    # one doc repeating the same 4-token phrase twice: both occurrences
    # are duplicated windows (occ >= 2 corpus-wide includes same-doc)
    phrase = "w1 w2 w3 w4"
    d = phrase + " mid1 mid2 mid3 " + phrase
    res = duplicate_spans(_docs(spark, [(0, d)]), k=4).collect()
    spans = {(r.span_start, r.span_end) for r in res}
    assert spans == {(0, 3), (7, 10)}


def test_short_docs_and_unique_text_yield_nothing(spark):
    docs = _docs(spark, [(0, "a b"), (1, "unique tokens only here now")])
    assert duplicate_spans(docs, k=4).count() == 0


def test_adjacent_islands_split_on_gap_greater_than_k(spark):
    # duplicated windows at p and p' merge iff p' - p <= k
    shared = " ".join(_tok(i) for i in range(100, 104))
    filler = " ".join(f"u{j}" for j in range(5))  # 5 > k=4 gap
    d0 = shared + " " + filler + " " + shared
    d1 = shared
    res = duplicate_spans(_docs(spark, [(0, d0), (1, d1)]), k=4)
    got = {(r.doc_id, r.span_start, r.span_end) for r in res.collect()}
    assert got == {(0, 0, 3), (0, 9, 12), (1, 0, 3)}


def test_duckdb_twin_randomized(spark):
    import duckdb

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(30)]
    boiler = "the quick brown fox jumps over lazy dogs tonight"
    rows = []
    for d in range(25):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(3, 25))]
        if d % 3 == 0:
            pos = rng.randrange(0, len(toks))
            toks[pos:pos] = boiler.split()
        rows.append((d, " ".join(toks)))
    docs = _docs(spark, rows)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(docs, k=5).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {tuple(r) for r in con.execute(duplicate_spans_sql(k=5)).fetchall()}
    assert got == want and len(got) > 0
