"""Embedding covariance + PCA projection tests: hand golden, numpy
cross-check under the x6 quantization, DuckDB twin, and the PCA
contract (matches numpy on the engine's own covariance, ordered
variance, determinism, validation)."""

import random

import numpy as np
import pandas as pd
import pytest

from linkgraph.pipeline.simsearch import (
    embedding_covariance,
    embedding_covariance_sql,
    pca_project,
)


def _emb(spark, vecs, ids=None):
    ids = ids or list(range(len(vecs)))
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )


def _collect(df):
    return {(r["i"], r["j"]): r["cov"] for r in df.collect()}


def test_hand_golden_dim2(spark):
    # x = [(0,0), (2,2), (4,0)]: mean (2, 2/3)
    # cov_xx = ((−2)²+0+2²)/2 = 4; cov_yy = ((−2/3)²+(4/3)²+(−2/3)²)/2 = 4/3
    # cov_xy = ((−2)(−2/3)+0+2(−2/3))/2 = 0
    got = _collect(embedding_covariance(_emb(spark, [(0, 0), (2, 2), (4, 0)])))
    assert got[(1, 1)] == pytest.approx(4.0, abs=1e-9)
    assert got[(2, 2)] == pytest.approx(4 / 3, abs=1e-6)
    assert got[(1, 2)] == pytest.approx(0.0, abs=1e-9)
    assert set(got) == {(1, 1), (1, 2), (2, 2)}


def test_random_vs_numpy_quantized(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(40, 6)
    got = _collect(embedding_covariance(_emb(spark, X.tolist())))
    Xq = np.round(X * 1e6) / 1e6
    C = np.cov(Xq, rowvar=False, ddof=1)
    for (i, j), v in got.items():
        assert v == pytest.approx(C[i - 1, j - 1], abs=2e-9)


def test_duckdb_twin(spark):
    import duckdb

    rng = np.random.RandomState(23)
    X = rng.randn(30, 5) * 3
    got = sorted((r["i"], r["j"], r["cov"])
                 for r in embedding_covariance(_emb(spark, X.tolist())).collect())
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"vec_id": range(len(X)), "embedding": [list(map(float, v)) for v in X]}
    )
    con.register("embeddings", pdf)
    duck = sorted(con.execute(embedding_covariance_sql(5)).fetchall())
    assert got == duck


def test_covariance_needs_two_rows(spark):
    with pytest.raises(ValueError, match=">= 2 rows"):
        embedding_covariance(_emb(spark, [(1.0, 2.0)]))


def test_pca_matches_numpy_on_engine_covariance(spark):
    rng = np.random.RandomState(11)
    # anisotropic blob so components are well separated
    X = rng.randn(60, 4) * np.array([5.0, 2.0, 0.5, 0.1])
    e = _emb(spark, X.tolist())
    got = {(r["vec_id"], r["component"]): r["value"]
           for r in pca_project(e, k=3).collect()}
    cov_rows = embedding_covariance(e).collect()
    C = np.zeros((4, 4))
    for r in cov_rows:
        C[r["i"] - 1, r["j"] - 1] = C[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(-vals, kind="stable")[:3]
    W = []
    for c in order:
        v = vecs[:, c]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        W.append(v)
    P = (X - X.mean(axis=0)) @ np.array(W).T
    for i in range(len(X)):
        for c in range(3):
            assert got[(i, c + 1)] == pytest.approx(P[i, c], abs=5e-5)
    # explained variance is ordered
    var = [np.var([got[(i, c)] for i in range(len(X))]) for c in (1, 2, 3)]
    assert var[0] > var[1] > var[2]


def test_pca_deterministic_and_validates(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(20, 3)
    e = _emb(spark, X.tolist())
    a = sorted(tuple(r) for r in pca_project(e, k=2).collect())
    b = sorted(tuple(r) for r in pca_project(e, k=2).collect())
    assert a == b
    with pytest.raises(ValueError, match="k must be"):
        pca_project(e, k=9)
