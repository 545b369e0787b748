"""ArticleRank tests: pure-python reference cross-check, DuckDB
oracle twin, direction/weighted modes, convergence, resume guard."""

import random

import pytest

from linkgraph.articlerank import article_rank, article_rank_sql


def _edges(spark, triples):
    return spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in triples], "src long, dst long, weight double"
    )


def _reference(triples, d=0.85, iters=5, weighted=False, direction="OUTGOING"):
    if direction == "INCOMING":
        triples = [(b, a, w) for a, b, w in triples]
    elif direction == "BOTH":
        triples = triples + [(b, a, w) for a, b, w in triples]
    nodes = sorted({a for a, _, _ in triples} | {b for _, b, _ in triples})
    out = {n: 0.0 for n in nodes}
    for a, b, w in triples:
        out[a] += w if weighted else 1.0
    avg = len(triples) / len(nodes)
    rank = {n: 1.0 - d for n in nodes}
    for _ in range(iters):
        s = {n: 0.0 for n in nodes}
        for a, b, w in triples:
            s[b] += rank[a] * ((w if weighted else 1.0) / (out[a] + avg))
        rank = {n: (1.0 - d) + d * s[n] for n in nodes}
    return rank


CHAIN = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (1, 3, 2.0), (4, 1, 1.0)]


def _close(got, want, tol=1e-9):
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < tol for k in want), (got, want)


def test_articlerank_matches_reference_unweighted(spark):
    res = article_rank(_edges(spark, CHAIN), damping=0.85, max_iter=5)
    got = {r["id"]: r["rank"] for r in res.scores.collect()}
    _close(got, _reference(CHAIN))
    assert res.iterations == 5 and not res.converged


@pytest.mark.parametrize("direction", ["INCOMING", "BOTH"])
def test_articlerank_directions(spark, direction):
    res = article_rank(_edges(spark, CHAIN), max_iter=4, direction=direction)
    got = {r["id"]: r["rank"] for r in res.scores.collect()}
    _close(got, _reference(CHAIN, iters=4, direction=direction))


def test_articlerank_weighted(spark):
    res = article_rank(_edges(spark, CHAIN), max_iter=4, weighted=True)
    got = {r["id"]: r["rank"] for r in res.scores.collect()}
    _close(got, _reference(CHAIN, iters=4, weighted=True))


def test_articlerank_dangler_scores_alpha_and_hub_damped_vs_pagerank(spark):
    # node 4 has no in-edges -> exactly 1-d; and with the +avg
    # denominator every share is strictly below the PageRank share
    from linkgraph.pagerank import pagerank
    e = _edges(spark, CHAIN)
    ar = article_rank(e, max_iter=6)
    pr = pagerank(e, max_iter=6)
    a = {r["id"]: r["rank"] for r in ar.scores.collect()}
    p = {r["id"]: r["rank"] for r in pr.scores.collect()}
    assert a[4] == pytest.approx(0.15)
    assert all(a[i] <= p[i] + 1e-12 for i in a)
    assert a[1] < p[1]  # strict on a node with real in-flow


def test_articlerank_converges_with_tol(spark):
    res = article_rank(_edges(spark, CHAIN), max_iter=200, tol=1e-10)
    assert res.converged and res.delta < 1e-10
    # fixed point check: one more hand iteration moves < tol
    got = {r["id"]: r["rank"] for r in res.scores.collect()}
    want = _reference(CHAIN, iters=300)
    _close(got, want, tol=1e-8)


def test_articlerank_duckdb_twin(spark):
    import duckdb

    rng = random.Random(71)
    triples = [(a, b, 1.0 + (a + b) % 3) for a, b in
               {(rng.randrange(20), rng.randrange(20)) for _ in range(80)} if a != b]
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in triples)
    esql = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    for weighted in (False, True):
        res = article_rank(_edges(spark, triples), max_iter=4, weighted=weighted)
        got = {r["id"]: round(r["rank"], 6) for r in res.scores.collect()}
        want = dict(duckdb.connect().execute(
            article_rank_sql(esql, 4, weighted=weighted)
        ).fetchall())
        assert got == want, f"weighted={weighted}"


def test_articlerank_resume_validates_params(spark, tmp_path):
    ckpt = str(tmp_path / "ar")
    e = _edges(spark, CHAIN)
    article_rank(e, max_iter=3, checkpoint_dir=ckpt, checkpoint_every=1)
    with pytest.raises(ValueError, match="mismatch"):
        article_rank(e, max_iter=5, damping=0.5, checkpoint_dir=ckpt, resume=True)
    # same params resume cleanly and agree with the uninterrupted run
    res = article_rank(e, max_iter=5, checkpoint_dir=ckpt, resume=True)
    fresh = article_rank(e, max_iter=5)
    got = {r["id"]: r["rank"] for r in res.scores.collect()}
    want = {r["id"]: r["rank"] for r in fresh.scores.collect()}
    _close(got, want, tol=1e-12)
