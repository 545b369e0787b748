"""Windowed temporal PageRank tests: time-ordering golden (forward
chain carries, backward chain doesn't), python replay, DuckDB twin,
resume, validation."""

import random

import pytest

from linkgraph.temporal import temporal_pagerank, temporal_pagerank_sql


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, ts long")


def _values_sql(rows):
    vals = ", ".join(f"({a}, {b}, {t})" for a, b, t in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, ts)"


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_time_ordering_golden(spark):
    # forward chain: a->b before b->c, so c receives a's carried mass
    fwd = _collect(
        temporal_pagerank(
            _edges(spark, [(0, 1, 0), (1, 2, 1)]),
            n_windows=2, b_num=1, b_den=1,
        )
    )
    assert fwd == [(1, 1.0), (2, 2.0)]
    # backward chain: b->c happens BEFORE a->b — no carry reaches c
    bwd = _collect(
        temporal_pagerank(
            _edges(spark, [(0, 1, 1), (1, 2, 0)]),
            n_windows=2, b_num=1, b_den=1,
        )
    )
    assert bwd == [(1, 1.0), (2, 1.0)]


def test_carry_depletes_after_send(spark):
    # b receives in win0, forwards in win1 (carry spent), forwards
    # again in win2 with ONLY the fresh injection: rank(c) = 2 + 1.
    # Without depletion b would re-send the win0 carry -> rank(c) = 4.
    rows = [(0, 1, 0), (1, 2, 1), (1, 2, 2)]
    got = dict(
        (r["id"], r["rank"]) for r in temporal_pagerank(
            _edges(spark, rows), n_windows=3, b_num=1, b_den=1
        ).collect()
    )
    assert got[2] == 3.0 and got[1] == 1.0


def _brute_tpr(rows, n_windows, b_num=4, b_den=5):
    ed = sorted({(a, b, t) for a, b, t in rows if a != b})
    if not ed:
        return []
    lo = min(t for _, _, t in ed)
    hi = max(t for _, _, t in ed)
    span = hi - lo + 1
    carry, rank = {}, {}
    for w in range(n_windows):
        ew = [(a, b) for a, b, t in ed if (t - lo) * n_windows // span == w]
        deg = {}
        for a, _ in ew:
            deg[a] = deg.get(a, 0) + 1
        got = {}
        for a, b in ew:
            m = 1_000_000 + (2 * b_num * carry.get(a, 0) + b_den) // (2 * b_den)
            got[b] = got.get(b, 0) + (2 * m + deg[a]) // (2 * deg[a])
        for a in deg:  # transmitted carry leaves the sender
            carry[a] = 0
        for b, v in got.items():
            carry[b] = carry.get(b, 0) + v
            rank[b] = rank.get(b, 0) + v
    return sorted(
        (n, round(v / 1_000_000.0, 6)) for n, v in rank.items() if v > 0
    )


@pytest.mark.parametrize("w", [1, 4, 7])
def test_random_vs_brute(spark, w):
    rng = random.Random(31)
    rows = [r for r in {(rng.randrange(10), rng.randrange(10),
                         rng.randrange(60)) for _ in range(44)}
            if r[0] != r[1]]
    got = _collect(temporal_pagerank(_edges(spark, rows), n_windows=w))
    assert got == _brute_tpr(rows, w)


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(43)
    rows = [r for r in {(rng.randrange(9), rng.randrange(9),
                         rng.randrange(50)) for _ in range(36)}
            if r[0] != r[1]]
    got = _collect(temporal_pagerank(_edges(spark, rows), n_windows=6))
    duck = duckdb.connect().execute(
        temporal_pagerank_sql(_values_sql(rows), n_windows=6)
    ).fetchall()
    assert got == sorted(duck)


def test_resume_equals_uninterrupted(spark, tmp_path):
    rng = random.Random(3)
    rows = [r for r in {(rng.randrange(8), rng.randrange(8),
                         rng.randrange(40)) for _ in range(30)}
            if r[0] != r[1]]
    want = _collect(temporal_pagerank(_edges(spark, rows), n_windows=6))
    ckpt = str(tmp_path / "tpr")
    # run only the first 3 windows durably (simulate interruption by
    # running with fewer windows against the same 6-window bucketing
    # is NOT equivalent — so run full but resume from the manifest)
    temporal_pagerank(
        _edges(spark, rows), n_windows=6,
        checkpoint_dir=ckpt, checkpoint_every=1,
    ).count()
    got = _collect(
        temporal_pagerank(
            _edges(spark, rows), n_windows=6,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
    )
    assert got == want
    with pytest.raises(ValueError, match="resume mismatch"):
        temporal_pagerank(
            _edges(spark, rows), n_windows=6, b_num=1, b_den=2,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )


def test_empty_and_validation(spark):
    assert _collect(temporal_pagerank(_edges(spark, []))) == []
    e = _edges(spark, [(0, 1, 0)])
    with pytest.raises(ValueError, match="n_windows"):
        temporal_pagerank(e, n_windows=0)
    with pytest.raises(ValueError, match="beta"):
        temporal_pagerank(e, b_num=3, b_den=2)
