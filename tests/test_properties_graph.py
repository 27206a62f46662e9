"""Property-based gates for the graph-analytics suite: on RANDOM small
graphs (hypothesis-generated edge lists, not the fixture distribution),
every Spark operator must agree with an independent brute-force
implementation written here — triangles by triple enumeration, k-core by
naive peel, 2-hop by BFS, LPA by direct synchronous simulation.

Spark round-trips are slow, so examples are capped and deadlines
disabled; the graphs stay small (≤ 10 nodes) but cover multi-edges,
self-loops, reversed duplicates, hubs, and disconnected pieces."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgforge.graph.analytics import (
    kcore,
    label_propagation,
    triangle_counts,
    two_hop_reach,
)

NODES = [f"n{i}" for i in range(10)]

edge_lists = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=1,
    max_size=25,
)

GRAPH_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, pairs):
    rows = [(s, "p", o, "u", None, "d") for s, o in pairs]
    return spark.createDataFrame(
        rows,
        "subj_id string, pred string, obj_id string, url string,"
        " warc_ts timestamp, day string",
    )


def _und(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


@given(edge_lists)
@GRAPH_SETTINGS
def test_triangles_match_bruteforce(spark, pairs):
    und = _und(pairs)
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_df(spark, pairs), k=1000).collect()
    }
    assert got == want


@given(edge_lists)
@GRAPH_SETTINGS
def test_kcore_matches_naive_peel(spark, pairs):
    und = _und(pairs)
    while True:
        deg = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= 2}
        nxt = {(u, v) for u, v in und if u in keep and v in keep}
        if nxt == und:
            break
        und = nxt
    want = {}
    for u, v in und:
        want[u] = want.get(u, 0) + 1
        want[v] = want.get(v, 0) + 1
    got = {
        r["node"]: r["degree"]
        for r in kcore(_df(spark, pairs), k=2, top=1000).collect()
    }
    assert got == want


@given(edge_lists)
@GRAPH_SETTINGS
def test_two_hop_matches_bfs(spark, pairs):
    adj = {}
    for s, o in pairs:
        if s != o:
            adj.setdefault(s, set()).add(o)
    want = {}
    for seed, nbrs in adj.items():
        reach = set(nbrs)
        for m in nbrs:
            reach |= adj.get(m, set())
        reach.discard(seed)
        want[seed] = len(reach)
    got = {
        r["node"]: r["reach"]
        for r in two_hop_reach(_df(spark, pairs), k=1000).collect()
    }
    assert got == want


@given(edge_lists)
@GRAPH_SETTINGS
def test_lpa_matches_direct_simulation(spark, pairs):
    adj = {}
    for u, v in _und(pairs):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(5):
        labels = {
            n: min(
                ((-sum(1 for m in nbrs if labels[m] == l), l)
                 for l in {labels[m] for m in nbrs})
            )[1]
            for n, nbrs in adj.items()
        }
    want = {}
    for l in labels.values():
        want[l] = want.get(l, 0) + 1
    got = {
        r["community"]: r["size"]
        for r in label_propagation(_df(spark, pairs), k=1000).collect()
    }
    assert got == want
