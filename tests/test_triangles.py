"""Triangle-count parity with TriangleCountTest fixtures (FIXTURES.md §4)."""

import numpy as np

from linkgraph import edges_from_pairs, triangle_count
from tests.fixtures import TRI_K4_TAIL_EDGES, TRI_K4_TAIL_GOLDEN, TRI_SINGLE_EDGES


def test_single_triangle(spark):
    nodes, edges = edges_from_pairs(spark, TRI_SINGLE_EDGES)
    res = triangle_count(edges, nodes=nodes)
    assert res.triangle_count == 1
    rows = res.counts.join(nodes, "id").collect()
    for r in rows:
        assert r["triangles"] == 1
        assert np.isclose(r["coefficient"], 1.0)
    assert np.isclose(res.avg_coefficient, 1.0)
    triples = res.triangles.join(nodes, res.triangles.node_a == nodes.id).collect()
    assert len(triples) == 1


def test_k4_with_tail(spark):
    nodes, edges = edges_from_pairs(spark, TRI_K4_TAIL_EDGES)
    res = triangle_count(edges, nodes=nodes)
    assert res.triangle_count == 4
    assert np.isclose(res.avg_coefficient, 0.7)
    got = {
        r["key"]: (r["degree"], r["triangles"], r["coefficient"])
        for r in res.counts.join(nodes, "id").collect()
    }
    for k, (deg, tri, coef) in TRI_K4_TAIL_GOLDEN.items():
        assert got[k][0] == deg, k
        assert got[k][1] == tri, k
        assert np.isclose(got[k][2], coef), k


def test_direction_and_duplicates_ignored(spark):
    # same triangle given with duplicates and mixed orientation
    nodes, edges = edges_from_pairs(
        spark,
        [("x0", "x1"), ("x1", "x0"), ("x1", "x2"), ("x2", "x0"), ("x0", "x2")],
    )
    res = triangle_count(edges, nodes=nodes)
    assert res.triangle_count == 1


def test_triple_stream_sorted_by_id(spark):
    nodes, edges = edges_from_pairs(spark, TRI_K4_TAIL_EDGES)
    res = triangle_count(edges, nodes=nodes)
    rows = res.triangles.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["node_a"] < r["node_b"] < r["node_c"]


def test_hub_cap_cross_path_equality(spark):
    """hub_cap routes hub-pivot wedges through the reordered plan;
    result must equal the plain wedge join exactly (SURVEY.md §7)."""
    rng = np.random.default_rng(11)
    pairs = {(f"h", f"n{i}") for i in range(25)}          # hub of degree 25
    pairs |= {(f"n{i}", f"n{j}") for i, j in rng.integers(0, 25, (60, 2)) if i != j}
    nodes, edges = edges_from_pairs(spark, sorted(pairs))
    plain = triangle_count(edges, nodes=nodes)
    capped = triangle_count(edges, nodes=nodes, hub_cap=5)
    assert plain.triangle_count == capped.triangle_count
    a = {(r["id"], r["triangles"]) for r in plain.counts.collect()}
    b = {(r["id"], r["triangles"]) for r in capped.counts.collect()}
    assert a == b
    ta = {tuple(r) for r in plain.triangles.collect()}
    tb = {tuple(r) for r in capped.triangles.collect()}
    assert ta == tb


def test_hub_cap_auto(spark):
    """auto mode probes max degree: engages the hub path only when the
    graph actually has a hub past 4*sqrt(m), and stays exact."""
    rng = np.random.default_rng(13)
    # hub of degree 40 over ~36 nodes: sqrt(m) ~ 10, cap ~ 40 -> probe
    # decides; either way the counts must equal the plain path
    pairs = {("h", f"n{i}") for i in range(40)}
    pairs |= {(f"n{i}", f"n{j}") for i, j in rng.integers(0, 40, (80, 2)) if i != j}
    nodes, edges = edges_from_pairs(spark, sorted(pairs))
    plain = triangle_count(edges, nodes=nodes)
    auto = triangle_count(edges, nodes=nodes, hub_cap="auto")
    assert plain.triangle_count == auto.triangle_count
    a = {(r["id"], r["triangles"]) for r in plain.counts.collect()}
    b = {(r["id"], r["triangles"]) for r in auto.counts.collect()}
    assert a == b


def test_triangle_result_release(spark):
    """TriangleResult.release() frees the oriented-edge/per-node
    caches kept live for the lazy triple stream; the stream still
    recomputes after release."""
    from linkgraph import triangle_count
    from linkgraph.ids import edges_from_pairs

    def rdd_ids():
        # id SETS, not counts: the ContextCleaner may unregister
        # earlier tests' dropped caches at any moment, which made a
        # count-based delta flaky in full-suite runs
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs()
            .keySet()
            .toArray()
        }

    spark.catalog.clearCache()
    before = rdd_ids()
    _nodes, edges = edges_from_pairs(
        spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    )
    res = triangle_count(edges)
    assert res.triangle_count == 1
    created = rdd_ids() - before
    assert created
    res.release()
    # the fixture's own persisted nodes frame may remain; engine caches gone
    assert len(rdd_ids() & created) <= 1
    assert res.triangles.count() == 1


def test_closing_strategy_cross_equality_and_plan(spark):
    """broadcast and shuffle_hash closing probes return identical
    triangles; auto picks broadcast under the cap (and the plan shows
    a BroadcastHashJoin for the closing semi-join) and shuffle_hash
    above it."""
    nodes, edges = edges_from_pairs(spark, TRI_K4_TAIL_EDGES)
    bc = triangle_count(edges, nodes=nodes, closing_strategy="broadcast")
    sh = triangle_count(edges, nodes=nodes, closing_strategy="shuffle_hash")
    assert bc.triangle_count == sh.triangle_count
    assert {tuple(r) for r in bc.triangles.collect()} == {
        tuple(r) for r in sh.triangles.collect()
    }
    # wedge kernel + auto == broadcast for a tiny graph (m << 500k cap)
    auto = triangle_count(edges, nodes=nodes, kernel="wedge")
    plan = auto.triangles._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # above the cap auto degrades to shuffle_hash
    forced = triangle_count(
        edges, nodes=nodes, kernel="wedge", closing_broadcast_max=1
    )
    plan2 = forced.triangles._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan2
    for r in (bc, sh, auto, forced):
        r.release()


def test_intersect_wedge_cross_path_equality(spark):
    """The default adjacency-intersection kernel and the wedge-join
    kernel are the same exact algorithm on two physical plans — counts,
    coefficients, and the triple stream must agree on a random graph
    with hubs, duplicates and mixed orientation."""
    rng = np.random.default_rng(29)
    pairs = {("hub", f"n{i}") for i in range(30)}
    pairs |= {(f"n{i}", f"n{j}") for i, j in rng.integers(0, 30, (120, 2)) if i != j}
    nodes, edges = edges_from_pairs(spark, sorted(pairs))
    inter = triangle_count(edges, nodes=nodes, kernel="intersect")
    wedge = triangle_count(edges, nodes=nodes)  # auto -> wedge
    assert inter.stats["kernel"] == "intersect"
    assert wedge.stats["kernel"] == "wedge"
    assert inter.triangle_count == wedge.triangle_count > 0
    assert np.isclose(inter.avg_coefficient, wedge.avg_coefficient)
    a = {(r["id"], r["triangles"], r["coefficient"]) for r in inter.counts.collect()}
    b = {(r["id"], r["triangles"], r["coefficient"]) for r in wedge.counts.collect()}
    assert a == b
    ta = {tuple(r) for r in inter.triangles.collect()}
    tb = {tuple(r) for r in wedge.triangles.collect()}
    assert ta == tb
    inter.release()
    wedge.release()


def test_intersect_kernel_single_shuffle_plan(spark):
    """The intersect kernel's triangle stream moves data AT MOST once:
    one Exchange (the edge+array rows re-keyed on b) — the adjacency
    build side reuses the oriented cache's lo-partitioning, and there
    is no sort anywhere (shuffle-hash probe, not sort-merge). At
    fixture scale AQE may collapse the cache to a single partition, in
    which case even the one exchange is elided — both are the intended
    shape; >1 exchange (a re-shuffled build side) is the regression."""
    nodes, edges = edges_from_pairs(spark, TRI_K4_TAIL_EDGES)
    res = triangle_count(edges, nodes=nodes, kernel="intersect")
    ops = _live_ops(res.triangles)
    assert "ShuffledHashJoinExec" in ops
    assert ops.count("ShuffleExchangeExec") <= 1, ops
    assert "SortExec" not in ops, ops
    res.release()


def _live_ops(df) -> list:
    """Physical-operator class names for the work this query actually
    runs: walks the executed plan but stops at cache boundaries
    (InMemoryTableScan / TableCacheQueryStage), so the cached subtree's
    own lineage doesn't pollute shuffle/sort assertions."""
    ops: list = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        ops.append(cls)
        if cls in ("InMemoryTableScanExec", "TableCacheQueryStageExec"):
            return
        if cls == "AdaptiveSparkPlanExec":
            walk(node.inputPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return ops


# --------------------------------------------------- balanced triads

def _signed_edges(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def _brute_balanced(triples, threshold=0.0):
    import itertools

    w = {}
    for a, b, ww in triples:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        w[k] = w.get(k, 0.0) + ww
    sign = {k: (1 if v >= threshold else -1) for k, v in w.items()}
    nodes = sorted({x for k in sign for x in k})
    bal = {n: [0, 0] for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in sign and (x, z) in sign and (y, z) in sign:
            p = sign[(x, y)] * sign[(x, z)] * sign[(y, z)]
            for n in (x, y, z):
                bal[n][0 if p > 0 else 1] += 1
    return bal


def test_balanced_triads_golden(spark):
    from linkgraph.checkpoint import release_caches
    from linkgraph.triangles import balanced_triads

    # triangle 1-2-3 all friends (balanced +++); triangle 2-3-4 with
    # one enemy edge (unbalanced ++-)
    t = [(1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0), (2, 4, 1.0), (3, 4, -1.0)]
    res = balanced_triads(_signed_edges(spark, t))
    got = {r.id: (r.balanced, r.unbalanced) for r in res.collect()}
    release_caches(res)
    assert got[1] == (1, 0)
    assert got[2] == (1, 1)
    assert got[3] == (1, 1)
    assert got[4] == (0, 1)


def test_balanced_triads_random_oracle(spark):
    import random

    from linkgraph.checkpoint import release_caches
    from linkgraph.triangles import balanced_triads

    rng = random.Random(59)
    t = [
        (a, b, rng.choice([-2.0, -1.0, 1.0, 3.0]))
        for a, b in {(rng.randrange(12), rng.randrange(12)) for _ in range(60)}
        if a != b
    ]
    res = balanced_triads(_signed_edges(spark, t))
    got = {r.id: (r.balanced, r.unbalanced) for r in res.collect()}
    release_caches(res)
    want = _brute_balanced(t)
    assert got == {n: tuple(v) for n, v in want.items()}


def test_balanced_triads_threshold_and_default_weight(spark):
    from linkgraph.checkpoint import release_caches
    from linkgraph.triangles import balanced_triads

    # no weight column: all edges positive -> every triangle balanced
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    res = balanced_triads(e)
    got = {r.id: (r.balanced, r.unbalanced) for r in res.collect()}
    release_caches(res)
    assert got == {1: (1, 0), 2: (1, 0), 3: (1, 0)}
    # threshold above every weight -> all edges negative -> product -1
    e2 = _signed_edges(spark, [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0)])
    res2 = balanced_triads(e2, threshold=5.0)
    got2 = {r.id: (r.balanced, r.unbalanced) for r in res2.collect()}
    release_caches(res2)
    assert got2 == {1: (0, 1), 2: (0, 1), 3: (0, 1)}
