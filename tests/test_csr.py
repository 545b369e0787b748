"""Cross-execution-path equality: CSR Arrow kernels vs pure-DataFrame.

The Spark analog of the reference's @Parameterized heavy/light/view
layout tests (SURVEY.md §5.2): same fixtures, two physical paths, same
results.
"""

import numpy as np

from linkgraph import edges_from_pairs, pagerank, triangle_count
from linkgraph.csr import pagerank_csr, triangle_count_csr
from tests.fixtures import (
    PAGERANK_WIKI_40ITER,
    PAGERANK_WIKI_EDGES,
    PAGERANK_WIKI_ISOLATED,
    TRI_K4_TAIL_EDGES,
    TRI_K4_TAIL_GOLDEN,
)


def test_pagerank_csr_matches_fixture(spark):
    nodes, edges = edges_from_pairs(
        spark, PAGERANK_WIKI_EDGES, extra_keys=PAGERANK_WIKI_ISOLATED
    )
    res = pagerank_csr(edges, nodes=nodes, damping=0.85, max_iter=40, num_blocks=4)
    got = {
        r["key"]: r["rank"]
        for r in res.scores.join(nodes, "id").select("key", "rank").collect()
    }
    for k, v in PAGERANK_WIKI_40ITER.items():
        assert np.isclose(got[k], v, atol=1e-6), (k, got[k], v)


def test_pagerank_cross_path_equality(spark):
    nodes, edges = edges_from_pairs(spark, PAGERANK_WIKI_EDGES)
    df_path = pagerank(edges, nodes=nodes, damping=0.85, max_iter=15)
    csr_path = pagerank_csr(edges, nodes=nodes, damping=0.85, max_iter=15, num_blocks=3)
    a = {r["id"]: r["rank"] for r in df_path.scores.collect()}
    b = {r["id"]: r["rank"] for r in csr_path.scores.collect()}
    assert a.keys() == b.keys()
    for i in a:
        assert np.isclose(a[i], b[i], atol=1e-12), (i, a[i], b[i])


def test_triangles_csr_matches_golden(spark):
    nodes, edges = edges_from_pairs(spark, TRI_K4_TAIL_EDGES)
    res = triangle_count_csr(edges, nodes=nodes)
    assert res.triangle_count == 4  # K4 contains C(4,3)=4 triangles
    got = {
        r["key"]: (r["degree"], r["triangles"], r["coefficient"])
        for r in res.counts.join(nodes, "id").collect()
    }
    for k, (deg, tri, coef) in TRI_K4_TAIL_GOLDEN.items():
        assert got[k][0] == deg and got[k][1] == tri, (k, got[k])
        assert np.isclose(got[k][2], coef), (k, got[k])


def test_triangles_cross_path_equality(spark):
    nodes, edges = edges_from_pairs(spark, TRI_K4_TAIL_EDGES)
    df_path = triangle_count(edges, nodes=nodes)
    csr_path = triangle_count_csr(edges, nodes=nodes)
    assert df_path.triangle_count == csr_path.triangle_count
    assert np.isclose(df_path.avg_coefficient, csr_path.avg_coefficient)
    t1 = sorted(map(tuple, df_path.triangles.collect()))
    t2 = sorted(map(tuple, csr_path.triangles.collect()))
    assert t1 == t2
