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
    and fine at 9 edges). A tuple term is an alternation (membership)."""
    out = set()
    for combo in itertools.product(edges, repeat=len(patterns)):
        bind = {}
        ok = True
        for (s, p, o), pat in zip(combo, patterns):
            for val, term in zip((s, p, o), pat):
                if isinstance(term, (list, tuple, set)):
                    if val not in term:
                        ok = False
                        break
                elif term.startswith("?"):
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


def oracle_bgp_optional(edges, patterns, optional):
    """Brute-force OPTIONAL for the restricted well-designed shape the
    implementation enforces (each optional shares only required vars and
    introduces disjoint new vars): every required solution is extended
    per-optional by each compatible binding, or by NULLs when none."""
    out = set()
    for sol in oracle_bgp(edges, patterns):
        base = dict(sol)
        per_opt = []
        for pat in optional:
            exts = []
            for triple in edges:
                bind = dict(base)
                ok = True
                for val, term in zip(triple, pat):
                    if term.startswith("?"):
                        if bind.setdefault(term[1:], val) != val:
                            ok = False
                            break
                    elif val != term:
                        ok = False
                        break
                if ok:
                    exts.append({k: v for k, v in bind.items() if k not in base})
            per_opt.append(exts or [
                {t[1:]: None for t in pat if t.startswith("?") and t[1:] not in base}
            ])
        import itertools as it
        for combo in it.product(*per_opt):
            merged = dict(base)
            for ext in combo:
                merged.update(ext)
            out.add(tuple(sorted(merged.items())))
    return out


def test_optional_matches_oracle(spark):
    from kgforge.graph.bgp import match_bgp_optional

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    patterns = [("?x", "works at", "?y")]
    optional = [("?y", "located in", "?c"), ("?y", "acquired", "?z")]
    res = match_bgp_optional(df, patterns, optional)
    got = set(tuple(sorted(zip(res.columns, row))) for row in res.collect())
    want = oracle_bgp_optional(EDGES, patterns, optional)
    assert got == want
    # sanity: omar's employer nova has no 'acquired' edge → z is NULL there
    assert (("c", "lyon"), ("x", "omar"), ("y", "nova"), ("z", None)) in got
    # acme has both → fully bound
    assert (("c", "oslo"), ("x", "maria"), ("y", "acme"), ("z", "nova")) in got


def test_optional_guards(spark):
    from kgforge.graph.bgp import match_bgp_optional

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp_optional(df, [("?x", "works at", "?y")],
                           [("?a", "knows", "?b")])
    with pytest.raises(ValueError, match="binds no new variable"):
        match_bgp_optional(df, [("?x", "works at", "?y")],
                           [("?x", "knows", "?y")])
    # keyed on another optional's output = shares nothing with REQUIRED
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp_optional(df, [("?x", "works at", "?y")],
                           [("?y", "located in", "?c"),
                            ("?c", "acquired", "?d")])
    # two optionals binding the same new variable
    with pytest.raises(ValueError, match="rebinds"):
        match_bgp_optional(df, [("?x", "works at", "?y")],
                           [("?y", "located in", "?c"),
                            ("?y", "acquired", "?c")])


def test_union_matches_oracle(spark):
    from kgforge.graph.bgp import match_bgp_union

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    groups = [
        [("?x", "works at", "?y")],           # binds x, y
        [("?x", "knows", "?w")],              # binds x, w → y NULL here
        [("?x", "works at", "?y")],           # duplicate group: must collapse
    ]
    res = match_bgp_union(df, groups)
    got = set(tuple(sorted(zip(res.columns, row))) for row in res.collect())
    want = set()
    for g in groups:
        for sol in oracle_bgp(EDGES, g):
            merged = {"x": None, "y": None, "w": None}
            merged.update(dict(sol))
            want.add(tuple(sorted(merged.items())))
    assert got == want
    # the duplicate group contributed nothing extra
    assert len(got) == len(
        oracle_bgp(EDGES, groups[0]) | {
            tuple(sorted((dict(s) | {"y": None}).items()))
            for s in oracle_bgp(EDGES, groups[1])
        }
    )


def test_union_guards(spark):
    from kgforge.graph.bgp import match_bgp_union

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    with pytest.raises(ValueError, match="empty UNION"):
        match_bgp_union(df, [])
    with pytest.raises(ValueError, match="unanchored"):
        match_bgp_union(df, [[("?a", "?b", "?c")]])


def test_optional_inherits_required_guards(spark):
    from kgforge.graph.bgp import match_bgp_optional, match_bgp_union

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    with pytest.raises(ValueError, match="unanchored optional"):
        match_bgp_optional(df, [("?x", "works at", "?y")],
                           [("?y", "?p", "?v")])
    with pytest.raises(ValueError, match="reserved"):
        match_bgp_optional(df, [("?x", "works at", "?y")],
                           [("?y", "located in", "?__c")])
    # single-group UNION returns the group's solutions without the
    # cross-group distinct (result equality is what matters here)
    res = match_bgp_union(df, [[("?x", "works at", "?y")]])
    got = set(tuple(sorted(zip(res.columns, row))) for row in res.collect())
    assert got == oracle_bgp(EDGES, [("?x", "works at", "?y")])


def test_filters(spark):
    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    # FILTER(?a != ?b) over the symmetric-pair case drops nothing here
    # (no self-loop matches the pair), but over "knows" alone it drops
    # omar's self-loop — oracle: post-filter the brute-force bindings
    got = set(
        tuple(sorted(zip(r.__fields__, r)))
        for r in match_bgp(
            df, [("?a", "knows", "?b")], filters=["a != b"]
        ).collect()
    )
    want = {
        s for s in oracle_bgp(EDGES, [("?a", "knows", "?b")])
        if dict(s)["a"] != dict(s)["b"]
    }
    assert got == want and got  # nonempty: maria/wei both ways
    # LIKE-style filter
    got2 = [
        tuple(r) for r in match_bgp(
            df, [("?x", "works at", "?y")], filters=["y like 'ac%'"]
        ).collect()
    ]
    assert sorted(got2) == [("maria", "acme"), ("wei", "acme")]


def oracle_not_exists(edges, patterns, negative):
    """Brute force NOT EXISTS: keep a solution iff no negative-group
    evaluation agrees with it on every shared variable."""
    neg_sols = oracle_bgp(edges, negative)
    out = set()
    for sol in oracle_bgp(edges, patterns):
        s = dict(sol)
        killed = False
        for n in neg_sols:
            nd = dict(n)
            if all(s[k] == v for k, v in nd.items() if k in s):
                killed = True
                break
        if not killed:
            out.add(sol)
    return out


NOT_EXISTS_CASES = [
    # employers with no known location (nothing here — both have one)
    ([("?x", "works at", "?y")], [("?y", "located in", "?z")]),
    # people whose employer was NOT acquired by anyone
    ([("?x", "works at", "?y")], [("?z", "acquired", "?y")]),
    # knows-pairs where the knower does NOT work at acme (constant anchor
    # in the negative group)
    ([("?a", "knows", "?b")], [("?a", "works at", "acme")]),
    # two shared variables: knows-pairs that are not ALSO works-at pairs
    ([("?a", "knows", "?b")], [("?a", "works at", "?b")]),
    # negative group that matches nothing: everything survives
    ([("?x", "works at", "?y")], [("?y", "acquired", "oslo")]),
]


@pytest.mark.parametrize("patterns,negative", NOT_EXISTS_CASES)
def test_not_exists_matches_oracle(spark, patterns, negative):
    from kgforge.graph.bgp import match_bgp_not_exists

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    res = match_bgp_not_exists(df, patterns, negative)
    got = set(tuple(sorted(zip(res.columns, row))) for row in res.collect())
    assert got == oracle_not_exists(EDGES, patterns, negative)


def test_not_exists_sanity_and_guards(spark):
    from kgforge.graph.bgp import match_bgp_not_exists

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    # the un-acquired employer is acme (nova was acquired): maria and wei
    res = match_bgp_not_exists(
        df, [("?x", "works at", "?y")], [("?z", "acquired", "?y")]
    )
    assert sorted(
        (r["x"], r["y"]) for r in res.collect()
    ) == [("maria", "acme"), ("wei", "acme")]
    # filters apply to the REQUIRED group only
    res2 = match_bgp_not_exists(
        df,
        [("?a", "knows", "?b")],
        [("?a", "works at", "acme")],
        filters=["a != b"],
    )
    assert sorted(tuple(r) for r in res2.collect()) == []  # omar self-loop cut
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp_not_exists(
            df, [("?x", "works at", "?y")], [("?a", "knows", "?b")]
        )
    # negative group inherits the anchor guard
    with pytest.raises(ValueError, match="anchor"):
        match_bgp_not_exists(
            df, [("?x", "works at", "?y")], [("?x", "?p", "?v")]
        )


def test_predicate_alternation(spark):
    """A tuple term is SPARQL alternation (p1|p2): matches any of its
    constants, still anchors the pattern, pushes as an In filter."""
    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    pats = [("?x", ("works at", "acquired"), "?y")]
    got, res = spark_bgp(spark, pats)
    assert got == oracle_bgp(EDGES, pats) and got
    # alternation in the OBJECT position (entity sets work too)
    pats2 = [("?x", "located in", ("oslo", "lyon"))]
    got2, _ = spark_bgp(spark, pats2)
    assert got2 == oracle_bgp(EDGES, pats2)
    assert {dict(s)["x"] for s in got2} == {"acme", "nova"}
    # alternation composes with a join
    pats3 = [("?x", ("works at", "knows"), "?y"),
             ("?y", "located in", "oslo")]
    got3, _ = spark_bgp(spark, pats3)
    assert got3 == oracle_bgp(EDGES, pats3) and got3
    # an alternation term ANCHORS: this would raise unanchored with a
    # variable predicate, but the constant set bounds the scan
    pats4 = [("?x", ("knows",), "?y")]
    got4, _ = spark_bgp(spark, pats4)
    assert got4 == oracle_bgp(EDGES, pats4)
    with pytest.raises(ValueError, match="empty alternation"):
        spark_bgp(spark, [("?x", (), "?y")])
    with pytest.raises(ValueError, match="mixes variables"):
        spark_bgp(spark, [("?x", ("knows", "?p"), "?y")])


def test_alternation_in_wcoj_cycle(spark):
    from kgforge.graph.wcoj import match_bgp_cycle

    df = spark.createDataFrame(EDGES, "subj_id string, pred string, obj_id string")
    # knows-loop via alternation: the cycle matcher compiles the same
    # pattern terms, so alternation works there too
    pats = [("?a", ("knows", "works at"), "?b"),
            ("?b", ("knows", "works at"), "?c"),
            ("?c", ("knows", "works at"), "?a")]
    got = match_bgp_cycle(df, pats, shares=2)
    rows = set(tuple(sorted(zip(got.columns, r))) for r in got.collect())
    assert rows == oracle_bgp(EDGES, pats) and rows
