"""Node-similarity tests: golden values, random-graph python oracle,
direction/cutoff/cap contracts, top-k determinism, plan shape."""

import math
import random

import pytest
from pyspark.sql import functions as F

from linkgraph.similarity import node_similarity, node_similarity_topk


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def test_jaccard_golden(spark):
    # 1 -> {10, 11, 12}; 2 -> {10, 11, 13}; 3 -> {13}
    e = _edges(spark, [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 13), (3, 13)])
    rows = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity(e, metric="jaccard").collect()
    }
    assert rows[(1, 2)] == pytest.approx(2 / 4)
    assert rows[(2, 3)] == pytest.approx(1 / 3)
    assert (1, 3) not in rows  # disjoint pairs never materialize


def test_overlap_and_cosine_golden(spark):
    e = _edges(spark, [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 13), (3, 13)])
    ov = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity(e, metric="overlap").collect()
    }
    assert ov[(1, 2)] == pytest.approx(2 / 3)
    assert ov[(2, 3)] == pytest.approx(1 / 1)
    cos = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity(e, metric="cosine").collect()
    }
    assert cos[(1, 2)] == pytest.approx(2 / 3, abs=1e-6)
    assert cos[(2, 3)] == pytest.approx(1 / math.sqrt(3), abs=1e-6)


def test_direction_both_unions_orientations(spark):
    # Undirected view: 1 -- {2, 3}; 4 -- {2, 3} (edges written in
    # mixed orientations). BOTH must see identical neighbor sets.
    e = _edges(spark, [(1, 2), (3, 1), (4, 2), (3, 4)])
    rows = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity(e, direction="BOTH").collect()
    }
    assert rows[(1, 4)] == pytest.approx(1.0)


def test_incoming_is_reverse_outgoing(spark):
    e = _edges(spark, [(10, 1), (11, 1), (10, 2), (11, 2), (12, 2)])
    out_rev = node_similarity(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).collect()
    inc = node_similarity(e, direction="INCOMING").collect()
    assert sorted(map(tuple, out_rev)) == sorted(map(tuple, inc))


def test_degree_cutoff_drops_small_nodes(spark):
    e = _edges(spark, [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)])
    rows = node_similarity(e, degree_cutoff=2).collect()
    assert {(r.node1, r.node2) for r in rows} == {(1, 2)}


def test_feature_cap_drops_hub_and_recomputes_degrees(spark):
    # 10 is a hub feature shared by all three nodes; 11 only by 1, 2.
    e = _edges(spark, [(1, 10), (2, 10), (3, 10), (1, 11), (2, 11)])
    rows = {
        (r.node1, r.node2): r.similarity
        for r in node_similarity(e, feature_cap=2).collect()
    }
    # capped universe: N(1)=N(2)={11}, N(3)={} -> only (1,2), jaccard 1
    assert rows == {(1, 2): pytest.approx(1.0)}


def test_random_graph_python_oracle(spark):
    rng = random.Random(7)
    pairs = {(rng.randrange(25), rng.randrange(60)) for _ in range(300)}
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
    for metric, fn in [
        ("jaccard", lambda i, x, y: i / (x + y - i)),
        ("overlap", lambda i, x, y: i / min(x, y)),
        ("cosine", lambda i, x, y: i / math.sqrt(x * y)),
    ]:
        got = {
            (r.node1, r.node2): r.similarity
            for r in node_similarity(e, metric=metric).collect()
        }
        want = {}
        for a in nbrs:
            for b in nbrs:
                if a < b and nbrs[a] & nbrs[b]:
                    want[(a, b)] = round(
                        fn(len(nbrs[a] & nbrs[b]), len(nbrs[a]), len(nbrs[b])), 6
                    )
        assert set(got) == set(want), metric
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6), (metric, k)


def test_topk_contract(spark):
    e = _edges(
        spark,
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12), (4, 10), (4, 11)],
    )
    rows = node_similarity_topk(e, k=1).collect()
    by_node = {r.node: (r.other, r.similarity, r.rank) for r in rows}
    # node 1 ties (2, 4) at jaccard 1.0 -> deterministic tie-break on id
    assert by_node[1] == (2, 1.0, 1)
    assert by_node[2] == (1, 1.0, 1)
    assert by_node[4] == (1, 1.0, 1)
    assert all(r.rank == 1 for r in rows)
    k2 = node_similarity_topk(e, k=2).collect()
    assert max(r.rank for r in k2) == 2
    with pytest.raises(ValueError):
        node_similarity_topk(e, k=0)


def test_no_cartesian_in_plan(spark):
    e = _edges(spark, [(1, 10), (2, 10), (3, 11)])
    plan = node_similarity(e)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bad_args(spark):
    e = _edges(spark, [(1, 10)])
    with pytest.raises(ValueError):
        node_similarity(e, metric="dice")
    with pytest.raises(ValueError):
        node_similarity(e, direction="SIDEWAYS")


def test_bipartite_projection_golden(spark):
    from linkgraph.similarity import bipartite_projection

    # suppliers 1..3 over orders 10..12
    e = _edges(spark, [(1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (3, 12)])
    got = {(r.node1, r.node2): r.weight
           for r in bipartite_projection(e).collect()}
    assert got == {(1, 2): 2, (2, 3): 1}
    # min_common prunes the weak pair
    got2 = {(r.node1, r.node2): r.weight
            for r in bipartite_projection(e, min_common=2).collect()}
    assert got2 == {(1, 2): 2}
    with pytest.raises(ValueError):
        bipartite_projection(e, min_common=0)


def test_bipartite_projection_feature_cap(spark):
    from linkgraph.similarity import bipartite_projection

    # order 10 is shared by all three -> dropped at cap 2; only the
    # order-11 co-occurrence survives
    e = _edges(spark, [(1, 10), (2, 10), (3, 10), (1, 11), (2, 11)])
    got = {(r.node1, r.node2): r.weight
           for r in bipartite_projection(e, feature_cap=2).collect()}
    assert got == {(1, 2): 1}


def test_bipartite_projection_matches_cosupplier_fixture(spark):
    """Projection of (supplier -> order) edges == the engine's own
    cosupplier graph builder (independent SQL formulation)."""
    from linkgraph.graphs import cosupplier_edges
    from linkgraph.similarity import bipartite_projection

    sf = "/root/testdata/sf0.001"
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select(F.col("l_suppkey").alias("src"), F.col("l_orderkey").alias("dst"))
    )
    proj = {(r.node1, r.node2): r.weight
            for r in bipartite_projection(li).collect()}
    want = {(r.src, r.dst): int(r.weight)
            for r in cosupplier_edges(spark, sf).collect()}
    assert proj == want


def test_link_prediction_golden(spark):
    from linkgraph.similarity import link_prediction

    # path 1-2-3 plus 3-4: (1,3) share {2}; (2,4) share {3}; (1,4) none
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    cn = {(r.node1, r.node2): r.score
          for r in link_prediction(e, method="common_neighbors").collect()}
    assert cn == {(1, 3): 1.0, (2, 4): 1.0}
    ra = {(r.node1, r.node2): r.score
          for r in link_prediction(e, method="resource_allocation").collect()}
    assert ra[(1, 3)] == pytest.approx(1 / 2)  # deg(2) = 2
    assert ra[(2, 4)] == pytest.approx(1 / 2)  # deg(3) = 2
    jc = {(r.node1, r.node2): r.score
          for r in link_prediction(e, method="jaccard").collect()}
    assert jc[(1, 3)] == pytest.approx(1 / 2)  # |{2}| / |{2} u {2,4}|
    with pytest.raises(ValueError):
        link_prediction(e, method="katz")


def test_link_prediction_excludes_existing_and_python_oracle(spark):
    import math as _m

    from linkgraph.similarity import link_prediction

    rng = random.Random(83)
    pairs = [(a, b) for a, b in {(rng.randrange(18), rng.randrange(18)) for _ in range(60)} if a != b]
    e = _edges(spark, pairs)
    und = set()
    for a, b in pairs:
        und.add((a, b)); und.add((b, a))
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    got = {(r.node1, r.node2): r.score
           for r in link_prediction(e, method="adamic_adar").collect()}
    want = {}
    ids = sorted(nbrs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if (a, b) in und or a == b:
                continue
            common = nbrs[a] & nbrs[b]
            if not common:
                continue
            s = sum(1.0 / _m.log(len(nbrs[w])) for w in common if len(nbrs[w]) > 1)
            want[(a, b)] = round(s, 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)
    # no predicted pair is an existing edge
    assert all((a, b) not in und for a, b in got)
    # top_n returns the global best, deterministically ordered
    top = link_prediction(e, method="adamic_adar", top_n=5).collect()
    assert len(top) == 5
    assert [r.score for r in top] == sorted((r.score for r in top), reverse=True)


def test_link_prediction_cap_prunes_terms_keeps_true_degrees(spark):
    from linkgraph.similarity import link_prediction

    # 10 is a hub shared by 1,2,3 (fan-in 3); 11 shared by 1,2 only.
    # deg(11) = 2 in the TRUE universe.
    e = _edges(spark, [(1, 10), (2, 10), (3, 10), (1, 11), (2, 11)])
    capped = {(r.node1, r.node2): r.score
              for r in link_prediction(e, method="resource_allocation",
                                       feature_cap=2).collect()}
    # hub 10's terms are gone: (1,3) and (2,3) vanish entirely; (1,2)
    # keeps only the 11-term, weighted by 11's TRUE degree (2). The
    # symmetrized view also predicts (10, 11) through their shared
    # degree-2 neighbors 1 and 2 (1/2 + 1/2).
    assert capped == {
        (1, 2): pytest.approx(1 / 2),
        (10, 11): pytest.approx(1.0),
    }


# --------------------------------------------------------------------------
# weighted similarity (algo.similarity.euclidean / .pearson)
# --------------------------------------------------------------------------

def _wedges(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _dense_replay(triples, direction="OUTGOING"):
    """{node: {feature: weight}} after direction expansion + self drop."""
    vec = {}
    for a, b, w in triples:
        rows = []
        if direction in ("OUTGOING", "BOTH"):
            rows.append((a, b, w))
        if direction in ("INCOMING", "BOTH"):
            rows.append((b, a, w))
        for s, f, ww in rows:
            if s == f:
                continue
            vec.setdefault(s, {})
            vec[s][f] = vec[s].get(f, 0.0) + ww
    return vec


def _expected_weighted(triples, metric, direction="OUTGOING"):
    vec = _dense_replay(triples, direction)
    feats = sorted({f for v in vec.values() for f in v})
    n = len(feats)
    out = {}
    for a in sorted(vec):
        for b in sorted(vec):
            if not a < b:
                continue
            if not set(vec[a]) & set(vec[b]):
                continue
            xa = [vec[a].get(f, 0.0) for f in feats]
            xb = [vec[b].get(f, 0.0) for f in feats]
            if metric == "euclidean":
                out[(a, b)] = round(
                    math.sqrt(sum((x - y) ** 2 for x, y in zip(xa, xb))), 6
                )
            else:
                sx, sy = sum(xa), sum(xb)
                dot = sum(x * y for x, y in zip(xa, xb))
                qx = sum(x * x for x in xa)
                qy = sum(y * y for y in xb)
                v1 = n * qx - sx * sx
                v2 = n * qy - sy * sy
                if v1 <= 0 or v2 <= 0:
                    continue
                out[(a, b)] = round(
                    (n * dot - sx * sy) / (math.sqrt(v1) * math.sqrt(v2)), 6
                )
    return out


def test_weighted_euclidean_golden(spark):
    from linkgraph.similarity import weighted_node_similarity

    # 1: {10: 3, 11: 4}; 2: {10: 1, 11: 1, 12: 2}; 3: {12: 5}
    t = [(1, 10, 3), (1, 11, 4), (2, 10, 1), (2, 11, 1), (2, 12, 2), (3, 12, 5)]
    got = {
        (r.node1, r.node2): r.distance
        for r in weighted_node_similarity(_wedges(spark, t), "euclidean").collect()
    }
    # ||v1-v2||: (3-1)^2 + (4-1)^2 + (0-2)^2 = 17
    assert got[(1, 2)] == pytest.approx(round(math.sqrt(17), 6), abs=0)
    # (2,3): (1)^2 + (1)^2 + (2-5)^2 = 11
    assert got[(2, 3)] == pytest.approx(round(math.sqrt(11), 6), abs=0)
    assert (1, 3) not in got  # no shared feature -> never materialized


def test_weighted_random_python_oracle(spark):
    from linkgraph.similarity import weighted_node_similarity

    rng = random.Random(71)
    t = [
        (rng.randrange(8), 100 + rng.randrange(6), rng.randrange(1, 9) / 2.0)
        for _ in range(40)
    ]
    for metric, col in (("euclidean", "distance"), ("pearson", "pearson")):
        res = weighted_node_similarity(_wedges(spark, t), metric).collect()
        got = {(r.node1, r.node2): getattr(r, col) for r in res}
        want = _expected_weighted(t, metric)
        assert set(got) == set(want), metric
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6), (metric, k)


def test_weighted_pearson_sign_golden(spark):
    from linkgraph.similarity import weighted_node_similarity

    # perfectly aligned vectors -> pearson 1; two-feature opposites -> -? 
    t = [(1, 10, 2), (1, 11, 4), (2, 10, 1), (2, 11, 2)]
    got = {
        (r.node1, r.node2): r.pearson
        for r in weighted_node_similarity(_wedges(spark, t), "pearson").collect()
    }
    assert got[(1, 2)] == pytest.approx(1.0, abs=1e-6)


def test_weighted_duckdb_twin(spark):
    import duckdb

    from linkgraph.similarity import (
        weighted_node_similarity,
        weighted_node_similarity_sql,
    )

    rng = random.Random(83)
    t = [
        (rng.randrange(10), 100 + rng.randrange(7), rng.randrange(1, 12) / 4.0)
        for _ in range(60)
    ]
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in t)
    edge_sql = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    con = duckdb.connect()
    for metric in ("euclidean", "pearson"):
        res = weighted_node_similarity(
            _wedges(spark, t), metric, direction="BOTH", feature_cap=8
        ).collect()
        got = {tuple(r) for r in res}
        sql = weighted_node_similarity_sql(
            edge_sql, metric, direction="BOTH", feature_cap=8
        )
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        assert got == want, metric


def test_weighted_validation(spark):
    from linkgraph.similarity import weighted_node_similarity

    e = _wedges(spark, [(1, 2, 1.0)])
    with pytest.raises(ValueError, match="metric"):
        weighted_node_similarity(e, metric="cosine")
    with pytest.raises(ValueError, match="direction"):
        weighted_node_similarity(e, direction="NOPE")


def test_weighted_big_weights_no_overflow(spark):
    # w6 = 3.1e9 after fixed-point scaling; q = w6^2 ~ 9.6e18 > 2^63 —
    # must stay exact through the decimal domain, not wrap in long
    from linkgraph.similarity import weighted_node_similarity

    t = [(1, 10, 3100.0), (2, 10, 3100.0), (1, 11, 1.0), (2, 11, 2.0)]
    got = {
        (r.node1, r.node2): r.distance
        for r in weighted_node_similarity(_wedges(spark, t), "euclidean").collect()
    }
    want = _expected_weighted(t, "euclidean")
    assert got == want
    assert got[(1, 2)] == pytest.approx(1.0, abs=1e-6)


def test_weighted_pearson_cutoff_twin(spark):
    # degree_cutoff > 1: the dense dimension n must stay the PRE-cutoff
    # capped universe on both engines
    import duckdb

    from linkgraph.similarity import (
        weighted_node_similarity,
        weighted_node_similarity_sql,
    )

    t = [(1, 10, 2.0), (1, 11, 4.0), (2, 10, 1.0), (2, 11, 2.0), (3, 12, 5.0)]
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in t)
    edge_sql = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    con = duckdb.connect()
    res = weighted_node_similarity(
        _wedges(spark, t), "pearson", degree_cutoff=2
    ).collect()
    got = {tuple(r) for r in res}
    want = {tuple(r) for r in con.execute(
        weighted_node_similarity_sql(edge_sql, "pearson", degree_cutoff=2)
    ).fetchall()}
    assert got == want
    # n = 3 features (12 is still a feature even though node 3 is cut):
    # perfectly proportional vectors over n=3 with missing-as-0 -> r=1
    assert {r.pearson for r in res} == {1.0}


# ---- link_prediction_auc --------------------------------------------

from linkgraph.similarity import link_prediction_auc, link_prediction_auc_sql


def _auc_edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def test_auc_structured_beats_random(spark):
    import itertools

    # two K8 cliques: held-out intra-clique edges share many training
    # common neighbors, random non-edges (mostly cross-clique) share
    # none -> AUC far above 0.5
    K = list(itertools.combinations(range(8), 2)) + \
        list(itertools.combinations(range(8, 16), 2))
    row = link_prediction_auc(
        _auc_edges(spark, K), method="common_neighbors",
        holdout_den=4, neg_draws=128,
    ).collect()[0]
    assert row["positives"] > 0 and row["negatives"] > 0
    assert row["auc"] > 0.9


def test_auc_duckdb_twin_both_methods(spark):
    import duckdb
    import random

    rng = random.Random(11)
    pairs = [p for p in {(rng.randrange(20), rng.randrange(20))
                         for _ in range(80)} if p[0] != p[1]]
    vals = ", ".join(f"({a}, {b}, 1.0)" for a, b in pairs)
    sql_edges = f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"
    for method in ("common_neighbors", "adamic_adar", "resource_allocation"):
        got = [tuple(r) for r in link_prediction_auc(
            _auc_edges(spark, pairs), method=method, neg_draws=64,
        ).collect()]
        duck = duckdb.connect().execute(
            link_prediction_auc_sql(sql_edges, method=method, neg_draws=64)
        ).fetchall()
        assert got == duck, method


def test_auc_validates(spark):
    e = _auc_edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="holdout_den"):
        link_prediction_auc(e, holdout_den=1)
    with pytest.raises(ValueError, match="neg_draws"):
        link_prediction_auc(e, neg_draws=0)
