"""MMR diverse selection: python integer replay, pure-relevance
degeneration at lambda=100, query exclusion, DuckDB twin."""

import math
import random

import duckdb
import pytest

from linkgraph.pipeline.simsearch import mmr_select, mmr_select_sql


def _vectors(n=12, dim=4, seed=5):
    rng = random.Random(seed)
    return {i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
            for i in range(n)}


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )


def _qn(v):
    norm = math.sqrt(sum(0.0 + x * x for x in v))
    return [int(round(x / norm * 1_000_000)) for x in v]


def _py_mmr(vecs, k, lam, query_id=None):
    qn = {i: _qn(v) for i, v in vecs.items()
          if sum(x * x for x in v) > 0}
    q = query_id if query_id is not None else min(qn)
    qv = qn[q]
    cand = {i: v for i, v in qn.items() if i != q}
    rel = {i: sum(a * b for a, b in zip(v, qv)) for i, v in cand.items()}
    smax = {i: 0 for i in cand}
    picks, picked = [], set()
    for r in range(k):
        pool = [(lam * rel[i] - (100 - lam) * smax[i], i)
                for i in cand if i not in picked]
        if not pool:
            break
        score, i = max(pool, key=lambda t: (t[0], -t[1]))
        picks.append((r, i, score))
        picked.add(i)
        for j in cand:
            smax[j] = max(smax[j],
                          sum(a * b for a, b in zip(cand[j], cand[i])))
    return picks


def test_python_replay(spark):
    vecs = _vectors()
    got = [tuple(r) for r in
           mmr_select(_emb(spark, vecs), k=5, lambda_pct=60).collect()]
    assert got == _py_mmr(vecs, 5, 60)


def test_lambda_100_is_pure_relevance(spark):
    vecs = _vectors(seed=7)
    got = [r["vec_id"] for r in
           mmr_select(_emb(spark, vecs), k=4, lambda_pct=100).collect()]
    qn = {i: _qn(v) for i, v in vecs.items()}
    rel = {i: sum(a * b for a, b in zip(v, qn[0]))
           for i, v in qn.items() if i != 0}
    want = [i for _, i in
            sorted(((rel[i], i) for i in rel), key=lambda t: (-t[0], t[1]))][:4]
    assert got == want


def test_query_id_excluded_and_respected(spark):
    vecs = _vectors(seed=9)
    rows = mmr_select(_emb(spark, vecs), k=6, lambda_pct=70,
                      query_id=3).collect()
    ids = [r["vec_id"] for r in rows]
    assert 3 not in ids
    assert [tuple(r) for r in rows] == _py_mmr(vecs, 6, 70, query_id=3)


def test_duckdb_twin(spark):
    vecs = _vectors(n=15, dim=5, seed=11)
    got = sorted(map(tuple,
                     mmr_select(_emb(spark, vecs), k=6, lambda_pct=55)
                     .collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v!r}::DOUBLE[])" for i, v in vecs.items())
        + ") t(vec_id, embedding)"
    )
    want = sorted(map(tuple, con.execute(
        mmr_select_sql(5, k=6, lambda_pct=55)
    ).fetchall()))
    assert got == want


def test_zero_vector_dropped_and_bad_params(spark):
    vecs = _vectors(n=6, seed=13)
    vecs[2] = [0.0, 0.0, 0.0, 0.0]
    rows = mmr_select(_emb(spark, vecs), k=6, lambda_pct=70).collect()
    assert 2 not in [r["vec_id"] for r in rows]
    with pytest.raises(ValueError):
        mmr_select(_emb(spark, vecs), k=0)
    with pytest.raises(ValueError):
        mmr_select(_emb(spark, vecs), lambda_pct=101)
    with pytest.raises(ValueError):
        mmr_select_sql(4, k=1, lambda_pct=-1)
