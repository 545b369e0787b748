"""Cross-corpus fuzzy contamination (linkgraph/pipeline/dedup.py)."""

import random

from linkgraph.pipeline.dedup import (
    cross_jaccard_sql,
    cross_minhash_pairs,
    fuzzy_decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_cross(rows, bench_ids, n=3, threshold=0.8):
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    txt = dict(rows)
    out = set()
    for d, t in rows:
        for b in bench_ids:
            if b == d:
                continue
            s1, s2 = sh(t), sh(txt[b])
            if not s1 or not s2:
                continue
            j = len(s1 & s2) / len(s1 | s2)
            if j >= threshold:
                out.add((d, b, round(j, 6)))
    return out


def test_paraphrase_caught_exact_ngram_would_miss(spark):
    base = " ".join(f"w{i}" for i in range(40))
    tweaked = base.replace("w20", "W20")  # one-token edit
    rows = [(0, base), (1, tweaked), (2, "completely different text here now")]
    docs = _docs(spark, rows)
    bench = docs.filter("doc_id = 0")
    got = {
        (r.doc_id, r.bench_id)
        for r in cross_minhash_pairs(docs, bench, threshold=0.8).collect()
    }
    assert got == {(1, 0)}
    kept = {r.doc_id for r in fuzzy_decontaminate(docs, bench).collect()}
    assert kept == {0, 2}


def test_randomized_matches_bruteforce(spark):
    rng = random.Random(5)
    vocab = [f"v{i}" for i in range(12)]
    rows = []
    for d in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(8, 20))]
        rows.append((d, " ".join(toks)))
    # plant near-dups of bench docs
    rows[10] = (10, rows[0][1] + " extra")
    rows[11] = (11, rows[7][1])
    docs = _docs(spark, rows)
    bench_ids = [d for d, _ in rows if d % 7 == 0]
    bench = docs.filter("doc_id % 7 = 0")
    got = {
        (r.doc_id, r.bench_id, r.jaccard)
        for r in cross_minhash_pairs(docs, bench, threshold=0.8).collect()
    }
    want = _brute_cross(rows, bench_ids, threshold=0.8)
    assert got == want and len(got) >= 2


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(6)
    vocab = [f"u{i}" for i in range(10)]
    rows = []
    for d in range(25):
        rows.append(
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(6, 15))))
        )
    rows[8] = (8, rows[0][1])
    docs = _docs(spark, rows)
    bench = docs.filter("doc_id % 4 = 0")
    got = {
        (r.doc_id, r.bench_id, r.jaccard)
        for r in cross_minhash_pairs(docs, bench, threshold=0.8).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        tuple(r)
        for r in con.execute(cross_jaccard_sql("doc_id % 4 = 0")).fetchall()
    }
    assert got == want


# --------------------------------------------------- n-gram novelty

def test_ngram_novelty_golden_and_twin(spark):
    import duckdb

    from linkgraph.pipeline.text import ngram_novelty, ngram_novelty_sql

    rows = [
        (0, "a b c d e"),          # 3-grams: abc bcd cde
        (1, "a b c x y"),          # shares "a b c" with doc 0
        (2, "p q r s"),            # all unique
    ]
    docs = _docs(spark, rows)
    got = {
        (r.doc_id, r.n_grams, r.novel_frac)
        for r in ngram_novelty(docs, n=3).collect()
    }
    want = {(0, 3, round(2 / 3, 6)), (1, 3, round(2 / 3, 6)), (2, 2, 1.0)}
    assert got == want
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    twin = {tuple(r) for r in con.execute(ngram_novelty_sql(n=3)).fetchall()}
    assert got == twin


# ---- source_overlap -------------------------------------------------

from linkgraph.pipeline.dedup import source_overlap, source_overlap_sql


def _docs_src(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_source_overlap_golden(spark):
    rows = [
        ("A", "the quick brown fox jumps"),     # grams: 3
        ("B", "the quick brown fox sleeps"),    # shares 2 of 3 with A
        ("C", "entirely different words here"), # disjoint
    ]
    got = {(r["source_a"], r["source_b"]): (r["inter"], r["jaccard"],
                                            r["containment"])
           for r in source_overlap(_docs_src(spark, rows)).collect()}
    # A: {the quick brown, quick brown fox, brown fox jumps}
    # B: {the quick brown, quick brown fox, brown fox sleeps}
    assert got == {("A", "B"): (2, round(2 / 4, 6), round(2 / 3, 6))}


def test_source_overlap_containment_subset(spark):
    rows = [
        ("big", "a b c d e f g h"),
        ("sub", "a b c d e"),  # every gram of sub is in big
    ]
    got = {(r["source_a"], r["source_b"]): r["containment"]
           for r in source_overlap(_docs_src(spark, rows)).collect()}
    assert got[("big", "sub")] == 1.0


def test_source_overlap_duckdb_twin(spark):
    import duckdb
    import pandas as pd
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (f"s{rng.randrange(4)}",
         " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 14))))
        for _ in range(30)
    ]
    docs = _docs_src(spark, rows)
    got = sorted(tuple(r) for r in source_overlap(docs).collect())
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(rows)),
             "text": [t for _, t in rows],
             "lang": "en",
             "source": [s for s, _ in rows],
             "n_chars": [len(t) for _, t in rows]}
        ),
    )
    duck = sorted(con.execute(source_overlap_sql()).fetchall())
    assert got == duck
