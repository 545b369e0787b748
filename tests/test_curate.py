"""Corpus-curation operator tests (decontaminate / stratified / quota /
shuffle / packing): hand-derivable goldens plus the determinism
invariants the operators exist for (partition- and run-independence)."""

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import (
    corpus_shuffle,
    decontaminate,
    pack_sequences,
    quota_sample,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sf_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_decontaminate_golden(spark):
    bench_text = "t1 t2 t3 t4 t5 t6 t7 t8 t9"  # 8-grams: t1..t8, t2..t9
    corpus = _docs(spark, [
        (1, bench_text),                          # the leaked doc itself: 2 hits
        (2, "x " + "t1 t2 t3 t4 t5 t6 t7 t8"),    # copies ONE benchmark 8-gram
        (3, "a b c d e f g h i j"),               # clean
        (4, "t1 t2 t3"),                          # < n tokens: no grams at all
    ])
    bench = _docs(spark, [(100, bench_text)])
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(corpus, bench, n=8).collect()}
    assert got == {1: (2, True), 2: (1, True), 3: (0, False), 4: (0, False)}


def test_stratified_sample_threshold_and_rates(spark):
    docs = _sf_docs(spark)
    rates = {"en": 0.5, "zh": 0.25}
    out = stratified_sample(docs, rates, default_rate=0.1, seed=7)
    rows = out.collect()
    # every surviving row respects ITS language's threshold
    for r in rows:
        thr = int(rates.get(r["lang"], 0.1) * 1_000_000)
        assert 0 <= r["bucket"] < thr
    # kept fraction tracks the configured rate (hash uniformity; the
    # corpus has ~200 en docs so +-0.15 absolute is a safe band)
    n_en = docs.filter("lang = 'en'").count()
    k_en = sum(1 for r in rows if r["lang"] == "en")
    assert abs(k_en / n_en - 0.5) < 0.15
    # deterministic: a second run is identical
    again = stratified_sample(docs, rates, default_rate=0.1, seed=7).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different seed samples a different subset
    other = stratified_sample(docs, rates, default_rate=0.1, seed=8)
    assert sorted(r["doc_id"] for r in other.collect()) != sorted(
        r["doc_id"] for r in rows)


def test_quota_sample_caps_every_group(spark):
    out = quota_sample(_sf_docs(spark), quota=5, by="lang", seed=7).collect()
    per = {}
    for r in out:
        per.setdefault(r["grp"], []).append(r["rk"])
    assert per  # non-empty
    for grp, rks in per.items():
        assert len(rks) <= 5
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_corpus_shuffle_partition_invariant(spark):
    """The whole point of hash-order shuffling: the layout must not
    depend on the input's physical partitioning (unlike rand())."""
    docs = _sf_docs(spark)
    a = sorted(map(tuple, corpus_shuffle(docs.repartition(7), n_shards=4, seed=7)
                   .collect()))
    b = sorted(map(tuple, corpus_shuffle(docs.coalesce(1), n_shards=4, seed=7)
                   .collect()))
    assert a == b
    # positions are 1..count(shard), gap-free
    per = {}
    for doc_id, shard, pos in a:
        per.setdefault(shard, []).append(pos)
    assert set(per) == set(range(4))
    for shard, poss in per.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_pack_sequences_gap_free_layout(spark):
    seq_len, n_shards, seed = 64, 4, 7
    docs = _sf_docs(spark)
    placed = pack_sequences(docs, seq_len=seq_len, n_shards=n_shards, seed=seed)
    order = corpus_shuffle(docs, n_shards=n_shards, seed=seed)
    got = {r["doc_id"]: r for r in placed.collect()}
    layout = sorted(
        ((r["shard"], r["pos"], r["doc_id"]) for r in order.collect()))
    # replay the concat-then-chunk layout per shard and check every
    # placement column against the independent corpus_shuffle order
    cursor = {}
    for shard, _pos, doc_id in layout:
        start = cursor.get(shard, 0)
        r = got[doc_id]
        assert r["shard"] == shard
        assert r["seq_id"] == start // seq_len
        assert r["offset"] == start % seq_len
        cursor[shard] = start + r["n_tokens"]
    # token conservation: the cursor equals the shard's token total
    totals = {
        r["shard"]: r["t"]
        for r in placed.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert cursor == totals


def test_line_dedup_golden(spark):
    from linkgraph.pipeline.curate import line_dedup

    boiler = "all rights reserved"
    docs = _docs(spark, [
        (1, f"alpha one\n{boiler}\nalpha two"),
        (2, f"{boiler}\nbeta only"),
        (3, boiler),                      # all-boilerplate doc vanishes
        (4, "gamma solo\ngamma duo"),
    ])
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped)
           for r in line_dedup(docs, max_df=1).collect()}
    assert got == {
        1: ("alpha one\nalpha two", 2, 1),
        2: ("beta only", 1, 1),
        4: ("gamma solo\ngamma duo", 2, 0),
    }


def test_line_dedup_keeps_runs_of_separators(spark):
    from linkgraph.pipeline.curate import line_dedup

    docs = _docs(spark, [(1, "a\n\nb"), (2, "c\nd")])
    got = {r.doc_id: r.text for r in line_dedup(docs, max_df=1).collect()}
    # the empty span between the two \n is unique enough to survive
    assert got[1] == "a\n\nb"
    assert got[2] == "c\nd"


def test_line_dedup_token_granularity(spark):
    from linkgraph.pipeline.curate import line_dedup

    docs = _docs(spark, [
        (1, "the cat sat"),
        (2, "the dog ran"),
        (3, "the end"),
    ])
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped)
           for r in line_dedup(docs, max_df=2, sep=" ").collect()}
    # "the" appears in 3 docs > max_df=2 -> stripped everywhere
    assert got == {
        1: ("cat sat", 2, 1),
        2: ("dog ran", 2, 1),
        3: ("end", 1, 1),
    }


def test_line_dedup_duckdb_twin(spark):
    import duckdb

    from linkgraph.pipeline.curate import line_dedup, line_dedup_sql

    rows = []
    lines = ["shared header", "footer line", "u1", "u2", "u3", "u4", "", "x y"]
    import random
    rng = random.Random(3)
    for d in range(20):
        rows.append((d, "\n".join(rng.choice(lines) for _ in range(rng.randrange(1, 6)))))
    docs = _docs(spark, rows)
    got = {(r.doc_id, r.text, r.n_kept, r.n_dropped)
           for r in line_dedup(docs, max_df=3).collect()}
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {tuple(r) for r in con.execute(line_dedup_sql(max_df=3)).fetchall()}
    assert got == want


# --------------------------------------------------- document chunking

def test_chunk_documents_golden(spark):
    from linkgraph.pipeline.curate import chunk_documents

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.start, r.n_tokens, r.chunk)
        for r in chunk_documents(d, chunk_len=3, stride=2).collect()
    }
    assert got == {
        (1, 0): (0, 3, "a b c"),
        (1, 1): (2, 3, "c d e"),
        (1, 2): (4, 1, "e"),
        (2, 0): (0, 1, "x"),
    }
    # min_tokens drops the short tail
    got2 = {
        (r.doc_id, r.chunk_id)
        for r in chunk_documents(d, chunk_len=3, stride=2, min_tokens=2).collect()
    }
    assert got2 == {(1, 0), (1, 1)}


def test_chunk_documents_non_overlapping_covers_exactly(spark):
    from linkgraph.pipeline.curate import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(d, chunk_len=4, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    rebuilt = " ".join(r.chunk for r in rows)
    assert rebuilt == text
    assert [r.n_tokens for r in rows] == [4, 4, 2]


def test_chunk_documents_duckdb_twin(spark):
    import random

    import duckdb

    from linkgraph.pipeline.curate import chunk_documents, chunk_documents_sql

    rng = random.Random(13)
    rows = [
        (i, " ".join(rng.choice("abcdefg") for _ in range(rng.randrange(1, 40))))
        for i in range(12)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)")
    for cl, st, mt in ((8, 8, 1), (8, 4, 1), (5, 3, 3)):
        got = {tuple(r) for r in chunk_documents(d, cl, st, mt).collect()}
        want = {tuple(r) for r in con.execute(chunk_documents_sql(cl, st, mt)).fetchall()}
        assert got == want, (cl, st, mt)


def test_chunk_documents_validation(spark):
    import pytest as _pt

    from linkgraph.pipeline.curate import chunk_documents

    d = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for kw in ({"chunk_len": 0}, {"stride": 0}, {"min_tokens": 0}):
        with _pt.raises(ValueError):
            chunk_documents(d, **kw)


# ---------------------------------------------------------------- DSIR


def _dsir_python_oracle(corpus, target, n=2, buckets=1009, k=1.0):
    """Pure-python DSIR fixed-point scores (doc_id -> e7 int)."""
    import hashlib
    import math
    from collections import Counter

    def bucket(gram):
        h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        return h % buckets

    def grams(text):
        toks = text.split(" ")
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    raw = Counter(bucket(g) for _, t in corpus for g in grams(t))
    tgt = Counter(bucket(g) for _, t in target for g in grams(t))
    r_tot, t_tot = sum(raw.values()), sum(tgt.values())
    w7 = {
        b: round(
            (round(math.log((tgt.get(b, 0) + k) / (t_tot + k * buckets)), 7)
             - round(math.log((cr + k) / (r_tot + k * buckets)), 7)) * 1e7
        )
        for b, cr in raw.items()
    }
    return {
        d: sum(w7[bucket(g)] for g in grams(t))
        for d, t in corpus
    }


def test_dsir_scores_python_oracle(spark):
    """Spark fixed-point scores == an independent python Counter
    implementation, integer-exact."""
    from linkgraph.pipeline import dsir_scores

    corpus = [
        (1, "spark join shuffle spark join agg"),
        (2, "spark join shuffle window sort"),
        (3, "cat dog bird cat dog fish"),
        (4, "dog fish cat bird bird cat"),
        (5, "x"),  # < n tokens: zero features
    ]
    target = [(1, corpus[0][1]), (2, corpus[1][1])]  # "spark-ish" docs
    want = _dsir_python_oracle(corpus, target)
    got = {
        r["doc_id"]: (r["logratio_e7"], r["n_feats"])
        for r in dsir_scores(
            _docs(spark, corpus), _docs(spark, target), n=2, buckets=1009
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    for d, (e7, nf) in got.items():
        assert e7 == want[d], (d, e7, want[d])
    assert got[5] == (0, 0)  # featureless doc scored 0, not dropped
    # in-distribution docs outscore off-distribution docs
    assert min(got[1][0], got[2][0]) > max(got[3][0], got[4][0])


def test_dsir_sample_contract(spark):
    """Gumbel-top-k selection: deterministic given the seed, seed-
    sensitive, n_keep-capped, and biased toward in-target docs."""
    from linkgraph.pipeline import dsir_sample

    corpus = [
        (i, "spark join shuffle agg window sort") for i in range(20)
    ] + [
        (i, "cat dog bird fish mouse horse") for i in range(20, 40)
    ]
    target = [(0, "spark join shuffle agg window sort")]
    docs, tgt = _docs(spark, corpus), _docs(spark, target)

    kept = dsir_sample(docs, tgt, n_keep=10, buckets=1009, seed=3)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert len(ids) == 10
    again = sorted(
        r["doc_id"]
        for r in dsir_sample(docs, tgt, n_keep=10, buckets=1009, seed=3).collect()
    )
    assert again == ids  # run-deterministic
    other = sorted(
        r["doc_id"]
        for r in dsir_sample(docs, tgt, n_keep=10, buckets=1009, seed=4).collect()
    )
    assert other != ids  # seed actually enters the draw
    # exp(score) gap between the two blocks is astronomical, so all
    # kept docs must come from the in-target block despite the noise
    assert all(i < 20 for i in ids)
    # n_keep >= corpus: everything returned
    assert dsir_sample(docs, tgt, n_keep=100, buckets=1009).count() == 40


def test_dsir_scores_plan_broadcasts_weights(spark):
    """The scoring probe must broadcast the B-row weight table — a
    SortMergeJoin on the exploded gram stream would shuffle the whole
    corpus by bucket id."""
    from linkgraph.pipeline import dsir_scores

    docs = _sf_docs(spark)
    plan = (
        dsir_scores(docs, docs.filter("source = 'src0'"), buckets=1009)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom flags are a SUPERSET of the exact operator's (zero false
    negatives), and per-doc n_hits >= the exact n_hits; a tiny filter
    (m_bits=64) is forced into false positives yet stays deterministic."""
    from linkgraph.pipeline import bloom_decontaminate, decontaminate

    rng = __import__("random").Random(43)
    vocab = [f"w{i}" for i in range(30)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(12))) for i in range(60)],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id % 7 = 0")
    exact = {r.doc_id: r.n_hits for r in decontaminate(docs, bench, n=3).collect()}
    for m_bits in (1 << 16, 64):
        bloom = {
            r.doc_id: r.n_hits
            for r in bloom_decontaminate(
                docs, bench, n=3, m_bits=m_bits, k_hashes=3
            ).collect()
        }
        assert set(bloom) == set(exact)
        assert all(bloom[d] >= exact[d] for d in exact), m_bits
    # at the roomy size the FP rate is ~0: bloom == exact on this corpus
    roomy = {
        r.doc_id: r.n_hits
        for r in bloom_decontaminate(docs, bench, n=3, m_bits=1 << 20, k_hashes=4).collect()
    }
    assert roomy == exact
    # tiny filter: rerun is bit-identical (deterministic FPs)
    t1 = sorted(map(tuple, bloom_decontaminate(docs, bench, n=3, m_bits=64, k_hashes=2).collect()))
    t2 = sorted(map(tuple, bloom_decontaminate(docs, bench, n=3, m_bits=64, k_hashes=2).collect()))
    assert t1 == t2


def test_bloom_decontaminate_duckdb_twin_tiny_filter(spark):
    """Twin check at a deliberately undersized filter — the false
    positives themselves must be engine-identical."""
    import duckdb

    from linkgraph.pipeline import bloom_decontaminate
    from linkgraph.pipeline.curate import bloom_decontaminate_sql

    rng = __import__("random").Random(47)
    vocab = [f"t{i}" for i in range(20)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(10))) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, bloom_decontaminate(docs, docs.filter("doc_id % 5 = 0"), n=2, m_bits=96, k_hashes=2).collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        map(tuple, con.execute(bloom_decontaminate_sql("doc_id % 5 = 0", n=2, m_bits=96, k_hashes=2)).fetchall())
    )
    assert got == want


def test_bloom_decontaminate_arg_guards(spark):
    import pytest

    from linkgraph.pipeline import bloom_decontaminate

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_decontaminate(docs, docs, m_bits=100)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_decontaminate(docs, docs, k_hashes=0)
    with pytest.raises(ValueError, match="n must be"):
        bloom_decontaminate(docs, docs, n=0)
