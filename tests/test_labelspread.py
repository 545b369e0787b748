"""Seeded label spreading tests: barbell symmetry golden, python
replay on random graphs, tie argmax contract, DuckDB twin, resume,
validation."""

import random

import pytest

from linkgraph.labelprop import seeded_label_spread, seeded_label_spread_sql

BARBELL = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "id long, label long")


def _values_sql(pairs):
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _seeds_sql(rows):
    vals = ", ".join(f"({i}, {l})" for i, l in rows)
    return f"SELECT * FROM (VALUES {vals}) AS s(id, label)"


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_barbell_symmetric_split(spark):
    got = _collect(
        seeded_label_spread(
            _edges(spark, BARBELL), _seeds(spark, [(0, 0), (5, 1)]),
            iterations=4,
        )
    )
    assert [(i, l) for i, l, _ in got] == [
        (0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)
    ]
    # mirror symmetry: scores at mirrored positions are equal
    s = {i: sc for i, _, sc in got}
    assert s[1] == s[4] and s[2] == s[3] and s[0] == s[5] == 1.0


def _brute_spread(pairs, seeds, iterations):
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    clamp = {(n, l): 1_000_000 for n, l in seeds}
    seed_nodes = {n for n, _ in seeds}
    state = dict(clamp)
    for _ in range(iterations):
        sums = {}
        for a, b in sym:
            for (n, l), p in state.items():
                if n == b:
                    sums[(a, l)] = sums.get((a, l), 0) + p
        nxt = {}
        for (n, l), sp in sums.items():
            if n in seed_nodes:
                continue
            d = deg[n]
            v = (2 * sp + d) // (2 * d)
            if v > 0:
                nxt[(n, l)] = v
        nxt.update(clamp)
        state = nxt
    best = {}
    for (n, l), p in state.items():
        cur = best.get(n)
        if cur is None or (p, -l) > (cur[1], -cur[0]):
            best[n] = (l, p)
    return sorted((n, l, round(p / 1_000_000.0, 6))
                  for n, (l, p) in best.items())


@pytest.mark.parametrize("seed", [3, 19])
def test_random_vs_brute(spark, seed):
    rng = random.Random(seed)
    pairs = [p for p in {(rng.randrange(12), rng.randrange(12))
                         for _ in range(36)} if p[0] != p[1]]
    nodes = sorted({n for p in pairs for n in p})
    seeds = [(nodes[0], 0), (nodes[-1], 1), (nodes[len(nodes) // 2], 2)]
    got = _collect(
        seeded_label_spread(
            _edges(spark, pairs), _seeds(spark, seeds), iterations=4
        )
    )
    assert got == _brute_spread(pairs, seeds, 4)


def test_tie_prefers_smaller_label(spark):
    # node 1 sits exactly between two seeds with labels 7 and 2
    pairs = [(0, 1), (1, 2)]
    got = _collect(
        seeded_label_spread(
            _edges(spark, pairs), _seeds(spark, [(0, 7), (2, 2)]),
            iterations=3,
        )
    )
    mid = [r for r in got if r[0] == 1]
    assert mid and mid[0][1] == 2


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(47)
    pairs = [p for p in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(32)} if p[0] != p[1]]
    nodes = sorted({n for p in pairs for n in p})
    seeds = [(nodes[0], 1), (nodes[-1], 0)]
    got = _collect(
        seeded_label_spread(
            _edges(spark, pairs), _seeds(spark, seeds), iterations=5
        )
    )
    duck = duckdb.connect().execute(
        seeded_label_spread_sql(
            _values_sql(pairs), _seeds_sql(seeds), iterations=5
        )
    ).fetchall()
    assert got == sorted(duck)


def test_resume_equals_uninterrupted(spark, tmp_path):
    pairs = BARBELL + [(5, 6), (6, 7)]
    seeds = [(0, 0), (7, 1)]
    want = _collect(
        seeded_label_spread(
            _edges(spark, pairs), _seeds(spark, seeds), iterations=6
        )
    )
    ckpt = str(tmp_path / "ls")
    seeded_label_spread(
        _edges(spark, pairs), _seeds(spark, seeds), iterations=3,
        checkpoint_dir=ckpt, checkpoint_every=1,
    ).count()
    got = _collect(
        seeded_label_spread(
            _edges(spark, pairs), _seeds(spark, seeds), iterations=6,
            checkpoint_dir=ckpt, checkpoint_every=1, resume=True,
        )
    )
    assert got == want
    with pytest.raises(ValueError, match="resume mismatch"):
        seeded_label_spread(
            _edges(spark, pairs), _seeds(spark, [(0, 0), (7, 2)]),
            iterations=6, checkpoint_dir=ckpt, checkpoint_every=1,
            resume=True,
        )


def test_validates(spark):
    e = _edges(spark, BARBELL)
    with pytest.raises(ValueError, match="non-empty"):
        seeded_label_spread(e, _seeds(spark, []))
    with pytest.raises(ValueError, match="duplicate seed"):
        seeded_label_spread(e, _seeds(spark, [(0, 0), (0, 1)]))
    with pytest.raises(ValueError, match="iterations"):
        seeded_label_spread(e, _seeds(spark, [(0, 0)]), iterations=0)
