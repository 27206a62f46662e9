"""BGP matching (kgforge/graph/bgp.py) vs a brute-force pure-Python
oracle, plus the planner's connectivity/anchor guards and the no-
cartesian plan gate. Uses the shared session fixture (conftest.py)."""

import itertools

import pytest

from kgforge.graph.bgp import match_bgp

EDGES = [
    ("maria", "works at", "acme"),
    ("wei", "works at", "acme"),
    ("omar", "works at", "nova"),
    ("acme", "located in", "oslo"),
    ("nova", "located in", "lyon"),
    ("acme", "acquired", "nova"),
    ("maria", "knows", "wei"),
    ("wei", "knows", "maria"),
    ("omar", "knows", "omar"),
]


def oracle_bgp(edges, patterns):
    """Brute force: try every assignment of edges to patterns, collect
    consistent variable bindings (the SPARQL BGP semantics, exponential
    and fine at 9 edges)."""
    out = set()
    for combo in itertools.product(edges, repeat=len(patterns)):
        bind = {}
        ok = True
        for (s, p, o), pat in zip(combo, patterns):
            for val, term in zip((s, p, o), pat):
                if term.startswith("?"):
                    if bind.setdefault(term[1:], val) != val:
                        ok = False
                        break
                elif val != term:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            out.add(tuple(sorted(bind.items())))
    return out


def spark_bgp(spark, patterns, **kw):
    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    res = match_bgp(df, patterns, **kw)
    return set(
        tuple(sorted(zip(res.columns, row))) for row in res.collect()
    ), res


CASES = [
    # chain with a constant anchor
    [("?x", "works at", "?y"), ("?y", "located in", "oslo")],
    # star on ?y
    [("?x", "works at", "?y"), ("?y", "located in", "?c"), ("?y", "acquired", "?z")],
    # variable predicate
    [("acme", "?p", "?o")],
    # repeated variable within one pattern (self-loop)
    [("?x", "knows", "?x")],
    # symmetric pair
    [("?a", "knows", "?b"), ("?b", "knows", "?a")],
    # ground existence gate alongside a var pattern
    [("?x", "works at", "acme"), ("acme", "located in", "oslo")],
    # ground gate that FAILS (empties the result)
    [("?x", "works at", "acme"), ("acme", "located in", "lyon")],
]


@pytest.mark.parametrize("patterns", CASES, ids=[str(i) for i in range(len(CASES))])
def test_matches_oracle(spark, patterns):
    got, _ = spark_bgp(spark, patterns)
    assert got == oracle_bgp(EDGES, patterns)


def test_oracle_nonempty_sanity():
    # the oracle itself finds the expected chain solution
    assert oracle_bgp(EDGES, CASES[0]) == {
        (("x", "maria"), ("y", "acme")),
        (("x", "wei"), ("y", "acme")),
    }


def test_guards(spark):
    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    with pytest.raises(ValueError, match="unanchored"):
        match_bgp(df, [("?a", "?b", "?c")])
    with pytest.raises(ValueError, match="disconnected"):
        match_bgp(df, [("?x", "works at", "?y"), ("?a", "knows", "?b")])
    with pytest.raises(ValueError, match="empty"):
        match_bgp(df, [])
    with pytest.raises(ValueError, match="reserved"):
        match_bgp(df, [("?__exists_0", "works at", "?y")])
    # explicit opt-ins run
    got, _ = spark_bgp(
        spark,
        [("?x", "works at", "?y"), ("?a", "located in", "oslo")],
        allow_product=True,
    )
    assert got == oracle_bgp(
        EDGES, [("?x", "works at", "?y"), ("?a", "located in", "oslo")]
    )
    got, _ = spark_bgp(spark, [("?a", "?b", "?c")], require_anchor=False)
    assert got == oracle_bgp(EDGES, [("?a", "?b", "?c")])


def test_plan_no_cartesian_and_pushdown(spark):
    _, res = spark_bgp(
        spark, [("?x", "works at", "?y"), ("?y", "located in", "oslo")]
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_narrative_order_is_replanned(spark):
    # written disconnected-in-order but connected overall: the greedy
    # planner must find the keyed ordering instead of raising
    patterns = [
        ("?x", "works at", "?y"),
        ("?z", "located in", "lyon"),
        ("?y", "acquired", "?z"),
    ]
    got, _ = spark_bgp(spark, patterns)
    assert got == oracle_bgp(EDGES, patterns)
    assert got  # nonempty: maria/wei → acme → nova → lyon


def test_windowed_bgp_prunes_partitions(spark, tmp_path):
    """match_bgp_window reads only the window's day partitions (the day
    predicate is a PartitionFilter) and matches the oracle on exactly
    the windowed edge subset."""
    from kgforge.graph.bgp import match_bgp_window

    dated = [(s, p, o, d) for (s, p, o), d in zip(
        EDGES, ["2024-01-0%d" % (1 + i % 3) for i in range(len(EDGES))]
    )]
    df = spark.createDataFrame(
        dated, "subj_id string, pred string, obj_id string, day string"
    )
    path = str(tmp_path / "edges_by_day")
    df.write.partitionBy("day").parquet(path)

    lo, hi = "2024-01-01", "2024-01-02"
    patterns = [("?x", "works at", "?y"), ("?y", "located in", "?c")]
    res = match_bgp_window(spark, path, patterns, lo, hi)
    windowed_edges = [(s, p, o) for (s, p, o, d) in dated if lo <= d <= hi]
    got = set(tuple(sorted(zip(res.columns, row))) for row in res.collect())
    assert got == oracle_bgp(windowed_edges, patterns)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "(day >= 2024-01-01)" in plan or "day#" in plan.split(
        "PartitionFilters"
    )[1][:200]
