"""DAG operators: topological levels, cycle detection, SCC condensation.

Goldens are hand-derived on fixture graphs; the driver additionally
value-checks `topo_levels_orderchain` / `condensation_returns` /
`condensation_levels_returns` against DuckDB recursive-CTE oracles at
sf0.01 (see __spark_entry__.oracle_sql).
"""

import pytest

from linkgraph.dag import (
    CycleError,
    condensation,
    is_dag,
    topological_levels,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_levels_chain(spark):
    res = topological_levels(_edges(spark, [(0, 1), (1, 2), (2, 3)]))
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert res.depth == 3


def test_levels_diamond_takes_longest_path(spark):
    # 0->1->3 and 0->2, 2->3 with an extra hop 2->4->3: level(3)=3 not 2
    e = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 4), (4, 3)])
    res = topological_levels(e)
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 4: 2, 3: 3}


def test_levels_incoming_direction(spark):
    res = topological_levels(_edges(spark, [(0, 1), (1, 2)]), direction="INCOMING")
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got == {2: 0, 1: 1, 0: 2}


def test_cycle_raises_and_is_dag(spark):
    cyc = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    with pytest.raises(CycleError):
        topological_levels(cyc)
    assert is_dag(cyc) is False
    assert is_dag(_edges(spark, [(0, 1), (1, 2)])) is True


def test_levels_resume_after_exhausted_budget(spark, tmp_path):
    """A run killed by a too-small round budget resumes from the last
    durable round and converges to the uninterrupted answer."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    want = {r["id"]: r["level"] for r in topological_levels(e).levels.collect()}

    ckpt = str(tmp_path / "topo")
    with pytest.raises(CycleError):
        topological_levels(e, max_rounds=2, checkpoint_dir=ckpt, checkpoint_every=1)
    res = topological_levels(
        e, checkpoint_dir=ckpt, checkpoint_every=1, resume=True
    )
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got == want


def test_condensation_two_cycles(spark):
    # two 2-cycles bridged by one edge: comps {0,1} and {2,3}
    e = _edges(spark, [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)])
    res = condensation(e)
    comp = {r["id"]: r["scc"] for r in res.mapping.collect()}
    assert comp[0] == comp[1] and comp[2] == comp[3] and comp[0] != comp[2]
    ce = {(r["src"], r["dst"]) for r in res.comp_edges.collect()}
    assert ce == {(comp[0], comp[2])}
    # condensation is always a DAG
    assert is_dag(res.comp_edges) is True


def test_condensation_levels_compose(spark):
    # 3 SCCs in a chain with a skip edge; levels 0,1,2 on the DAG
    e = _edges(
        spark,
        [(0, 1), (1, 0), (2, 3), (3, 2), (4, 5), (5, 4),
         (0, 2), (2, 4), (0, 4)],
    )
    res = condensation(e)
    lv = topological_levels(res.comp_edges)
    comp = {r["id"]: r["scc"] for r in res.mapping.collect()}
    got = {r["id"]: r["level"] for r in lv.levels.collect()}
    assert got == {comp[0]: 0, comp[2]: 1, comp[4]: 2}
