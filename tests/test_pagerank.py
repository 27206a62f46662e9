"""PageRank gate: matches a pure-Python synchronous power iteration with
identical damping/iterations/dangling handling."""

import pytest

from kgforge.graph.pagerank import pagerank


def _oracle_pagerank(pairs, d=0.85, iters=10):
    edges = sorted(set(pairs))
    nodes = sorted({x for p in edges for x in p})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if v not in out)
        new = {}
        for v in nodes:
            new[v] = (1 - d) / n + d * dangling / n
        for s, targets in out.items():
            share = rank[s] / len(targets)
            for t in targets:
                new[t] += d * share
        rank = new
    return rank


@pytest.mark.parametrize(
    "pairs",
    [
        [("a", "b"), ("b", "c"), ("c", "a")],  # cycle
        [("a", "b"), ("a", "c"), ("b", "c")],  # c is a dangling sink
        [("hub", f"n{i}") for i in range(6)] + [("n0", "hub")],
    ],
)
def test_pagerank_matches_oracle(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    want = _oracle_pagerank(pairs)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # probability mass conserved


def test_pagerank_empty(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank(e).collect() == []
