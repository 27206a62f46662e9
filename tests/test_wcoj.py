"""Worst-case-optimal cyclic BGP (kgforge/graph/wcoj.py) vs the binary
plan (match_bgp) and the brute-force oracle, plus the shape guards and
the cell-disjointness property (no duplicate bindings without any
distinct in the plan)."""

import itertools

import pytest

from kgforge.graph.bgp import match_bgp
from kgforge.graph.wcoj import match_bgp_cycle

# a graph with directed supply triangles, one hub, and decoy edges that
# form wedges which do NOT close (the case the semi-join reduction and
# the chunked closer must discard)
EDGES = (
    [("a", "supplies", "b"), ("b", "supplies", "c"), ("c", "supplies", "a")]
    + [("b", "supplies", "d"), ("d", "supplies", "a")]  # second triangle a-b-d
    + [("hub", "supplies", f"w{i}") for i in range(12)]  # open wedges
    + [(f"w{i}", "supplies", "hub") for i in range(0, 12, 3)]  # self-closing? no 3rd
    + [("hub", "ships to", "a"), ("a", "ships to", "hub")]
    + [("x", "knows", "y"), ("y", "knows", "z"), ("z", "knows", "x")]
    + [("x", "knows", "x")]
)


def oracle_cycle(edges, patterns):
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


def _df(spark):
    return spark.createDataFrame(
        EDGES, "subj_id string, pred string, obj_id string"
    )


CYCLES = [
    # directed supply triangle
    [("?a", "supplies", "?b"), ("?b", "supplies", "?c"), ("?c", "supplies", "?a")],
    # same cycle written in a different narrative order
    [("?c", "supplies", "?a"), ("?a", "supplies", "?b"), ("?b", "supplies", "?c")],
    # mixed predicates around the cycle
    [("?a", "supplies", "?b"), ("?b", "supplies", "?c"), ("?c", "knows", "?a")],
    # knows-triangle (includes the x self-loop edge as a decoy)
    [("?x", "knows", "?y"), ("?y", "knows", "?z"), ("?z", "knows", "?x")],
    # flipped middle leg: the cycle shape is on the VARIABLE pairs, not
    # the edge directions
    [("?a", "supplies", "?b"), ("?c", "supplies", "?b"), ("?c", "knows", "?a")],
]


@pytest.mark.parametrize("shares", [1, 2, 3])
@pytest.mark.parametrize("patterns", CYCLES)
def test_cycle_matches_oracle_and_binary(spark, patterns, shares):
    df = _df(spark)
    got = match_bgp_cycle(df, patterns, shares=shares)
    rows = set(tuple(sorted(zip(got.columns, r))) for r in got.collect())
    assert rows == oracle_cycle(EDGES, patterns)
    binary = match_bgp(df, patterns)
    assert rows == set(
        tuple(sorted(zip(binary.columns, r))) for r in binary.collect()
    )


def test_oracle_nonempty_sanity():
    # the fixture genuinely contains triangles for the suite's cases
    assert len(oracle_cycle(EDGES, CYCLES[0])) == 6  # 2 triangles x 3 rotations
    assert len(oracle_cycle(EDGES, CYCLES[3])) >= 3


def test_no_duplicates_without_distinct(spark):
    """HyperCube cells are disjoint on output triples: collect WITHOUT
    any dedup and the multiset must already be a set, at a shares value
    high enough that every relation is replicated several times."""
    got = match_bgp_cycle(_df(spark), CYCLES[0], shares=4).collect()
    as_tuples = [tuple(r) for r in got]
    assert len(as_tuples) == len(set(as_tuples)) == 6


def test_chunked_closer_is_exact(spark):
    # chunk_rows=1 forces the maximum number of chunks through the
    # closing loop — output must not change
    got = match_bgp_cycle(_df(spark), CYCLES[0], shares=2, chunk_rows=1)
    rows = set(tuple(sorted(zip(got.columns, r))) for r in got.collect())
    assert rows == oracle_cycle(EDGES, CYCLES[0])


def test_empty_result_schema(spark):
    got = match_bgp_cycle(
        _df(spark),
        [("?a", "ships to", "?b"), ("?b", "ships to", "?c"),
         ("?c", "ships to", "?a")],
        shares=2,
    )
    assert got.columns == ["a", "b", "c"]
    assert got.count() == 0  # ships-to has only a 2-cycle, no triangle


def test_shape_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="exactly 3 patterns"):
        match_bgp_cycle(df, CYCLES[0][:2])
    with pytest.raises(ValueError, match="binds 3 distinct"):
        match_bgp_cycle(
            df,
            [("?a", "?p", "?b"), ("?b", "supplies", "?c"),
             ("?c", "supplies", "?a")],
        )
    with pytest.raises(ValueError, match="binds 1 distinct"):
        match_bgp_cycle(
            df,
            [("?a", "supplies", "?a"), ("?a", "supplies", "?c"),
             ("?c", "supplies", "?a")],
        )
    # 3 patterns, 3 vars, but a path (one var in all three) — not a cycle
    with pytest.raises(ValueError, match="cycle"):
        match_bgp_cycle(
            df,
            [("?a", "supplies", "?b"), ("?a", "supplies", "?c"),
             ("?a", "knows", "?b")],
        )
    with pytest.raises(ValueError, match="shares"):
        match_bgp_cycle(df, CYCLES[0], shares=0)
    # reserved internal names (same contract as match_bgp's guard)
    with pytest.raises(ValueError, match="reserved"):
        match_bgp_cycle(
            df,
            [("?__c0", "supplies", "?b"), ("?b", "supplies", "?c"),
             ("?c", "supplies", "?__c0")],
        )
    with pytest.raises(ValueError, match="chunk_rows"):
        match_bgp_cycle(df, CYCLES[0], chunk_rows=0)
    with pytest.raises(ValueError, match="chunk_rows"):
        match_bgp_cycle(df, CYCLES[0], chunk_rows=-1)
    # all-variable cycle (repeated var per pattern keeps the 2-var shape)
    # is a full-table scan: refused like match_bgp, same escape hatch
    unanchored = [("?a", "?a", "?b"), ("?b", "?b", "?c"), ("?c", "?c", "?a")]
    with pytest.raises(ValueError, match="unanchored"):
        match_bgp_cycle(df, unanchored)


def test_unanchored_escape_and_odd_var_names(spark):
    # the require_anchor=False escape runs the all-variable cycle; a
    # fixture where pred values double as node names gives it matches
    edges = [
        ("p", "p", "q"), ("q", "q", "r"), ("r", "r", "p"),
        ("p", "p", "z"),  # open wedge
    ]
    df = spark.createDataFrame(
        edges, "subj_id string, pred string, obj_id string"
    )
    pats = [("?a", "?a", "?b"), ("?b", "?b", "?c"), ("?c", "?c", "?a")]
    got = match_bgp_cycle(df, pats, shares=2, require_anchor=False)
    rows = set(tuple(sorted(zip(got.columns, r))) for r in got.collect())
    assert rows == oracle_cycle(edges, pats)
    assert len(rows) == 3  # the p-q-r rotations
    # variable names that are not bare SQL identifiers (match_bgp accepts
    # them; the cycle path must too — StructType schema, not DDL)
    df2 = _df(spark)
    pats2 = [("?a-1", "supplies", "?b"), ("?b", "supplies", "?c"),
             ("?c", "supplies", "?a-1")]
    got2 = match_bgp_cycle(df2, pats2, shares=2)
    rows2 = set(tuple(sorted(zip(got2.columns, r))) for r in got2.collect())
    assert rows2 == oracle_cycle(EDGES, pats2)
    assert len(rows2) == 6


def test_null_bindings_match_sql_semantics(spark):
    """SQL equi-joins never match NULL keys; the pandas cell closer must
    agree (it drops null bindings up front), so both plans produce the
    same result on an edge table carrying NULL subj/obj values."""
    edges = EDGES + [(None, "supplies", "b"), ("b", "supplies", None)]
    df = spark.createDataFrame(
        edges, "subj_id string, pred string, obj_id string"
    )
    got = match_bgp_cycle(df, CYCLES[0], shares=2)
    rows = set(tuple(sorted(zip(got.columns, r))) for r in got.collect())
    binary = match_bgp(df, CYCLES[0])
    assert rows == set(
        tuple(sorted(zip(binary.columns, r))) for r in binary.collect()
    )
    # and the nulls changed nothing vs the null-free fixture
    assert rows == oracle_cycle(EDGES, CYCLES[0])


def test_default_shares_from_parallelism(spark):
    # no shares argument: derived from defaultParallelism, must still be
    # exact on the fixture
    got = match_bgp_cycle(_df(spark), CYCLES[0])
    rows = set(tuple(sorted(zip(got.columns, r))) for r in got.collect())
    assert rows == oracle_cycle(EDGES, CYCLES[0])
