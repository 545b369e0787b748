"""Edge-list fixtures mirroring the reference test suite (FIXTURES.md).

The reference builds these with Cypher CREATE inside JUnit tests
(pub:tests/src/test/java/org/neo4j/graphalgo/ — PageRankTest,
UnionFindTest, LabelPropagationTest, TriangleCountTest); goldens are
formula-derived and verified per FIXTURES.md.
"""

# FIXTURES.md §1 — classic wiki PageRank example graph (PageRankTest)
PAGERANK_WIKI_EDGES = [
    ("b", "c"), ("c", "b"),
    ("d", "a"), ("d", "b"),
    ("e", "b"), ("e", "d"), ("e", "f"),
    ("f", "b"), ("f", "e"),
]
PAGERANK_WIKI_ISOLATED = ["g", "h", "i", "j"]
PAGERANK_WIKI_40ITER = {
    "a": 0.2430128, "b": 1.9157502, "c": 1.7780812, "d": 0.2188536,
    "e": 0.2430128, "f": 0.2188536, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15,
}
PAGERANK_WIKI_CONVERGED = {
    "a": 0.2430128, "b": 1.9184836, "c": 1.7807111, "d": 0.2188536,
    "e": 0.2430128, "f": 0.2188536, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15,
}

# FIXTURES.md §2 — four 5-node chains + two isolated (UnionFindTest)
def _chain(prefix, lo, hi):
    return [(f"{prefix}{i:02d}", f"{prefix}{i+1:02d}") for i in range(lo, hi)]

UNIONFIND_EDGES = (
    [("n%02d" % i, "n%02d" % (i + 1)) for i in range(0, 4)]
    + [("n%02d" % i, "n%02d" % (i + 1)) for i in range(5, 9)]
    + [("n%02d" % i, "n%02d" % (i + 1)) for i in range(10, 14)]
    + [("n%02d" % i, "n%02d" % (i + 1)) for i in range(15, 19)]
)
UNIONFIND_ISOLATED = ["n20", "n21"]
UNIONFIND_SETS = {
    **{f"n{i:02d}": "n00" for i in range(0, 5)},
    **{f"n{i:02d}": "n05" for i in range(5, 10)},
    **{f"n{i:02d}": "n10" for i in range(10, 15)},
    **{f"n{i:02d}": "n15" for i in range(15, 20)},
    "n20": "n20", "n21": "n21",
}

# FIXTURES.md §2b — threshold variant
UNIONFIND_THRESHOLD_EDGES = [
    ("t0", "t1", 1.0), ("t1", "t2", 1.0), ("t2", "t3", 0.1), ("t3", "t4", 1.0),
]
UNIONFIND_THRESHOLD_SETS = {"t0": "t0", "t1": "t0", "t2": "t0", "t3": "t3", "t4": "t3"}

# FIXTURES.md §3 — seeded weighted LPA (LabelPropagationTest shape)
LABELPROP_EDGES = [("A", "C", 1.0), ("B", "C", 2.0)]
LABELPROP_SEEDS = {"A": 52, "B": 42}  # C unseeded

# FIXTURES.md §3b — two bridged triangles
LABELPROP_CLIQUES_EDGES = [
    ("p0", "p1"), ("p1", "p2"), ("p2", "p0"),
    ("q0", "q1"), ("q1", "q2"), ("q2", "q0"),
    ("p2", "q2"),
]
LABELPROP_CLIQUES_SEEDS = {"p0": 7, "q0": 9}

# FIXTURES.md §4
TRI_SINGLE_EDGES = [("x0", "x1"), ("x1", "x2"), ("x2", "x0")]
TRI_K4_TAIL_EDGES = [
    ("k0", "k1"), ("k0", "k2"), ("k0", "k3"),
    ("k1", "k2"), ("k1", "k3"), ("k2", "k3"), ("k3", "k4"),
]
TRI_K4_TAIL_GOLDEN = {  # key -> (degree, triangles, coefficient)
    "k0": (3, 3, 1.0), "k1": (3, 3, 1.0), "k2": (3, 3, 1.0),
    "k3": (4, 3, 0.5), "k4": (1, 0, 0.0),
}
