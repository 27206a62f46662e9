"""HAND-DERIVED end-to-end gate for the KG core (extract → link → CC →
canonical edges), independent of the shared pure modules.

The advisor's round-2 note (ADVICE.md #4): the kg_* expected-parquet
oracles import the same pure functions the Spark stages execute, so a
semantic bug in those shared modules cannot trip the rows+schema+hash
check. The hand-annotated gold sets cover the extractor in isolation;
this test covers the COMPOSED pipeline: every expected row below is a
literal constant derived by hand from the documented stage semantics
(kgforge/stages/{extract,link,canonicalize}.py docstrings), never
computed by kgforge code. The normalize stage is excluded on purpose —
it is gated independently by the reference-vendored byte-identity tests
(tests/test_textnorm_oracle.py, tests/test_spark_normalize.py).

Hand derivation notes (the "why" of each expected row):
- doc a sent 0: tier-1 lexicon      → (acme corp, acquired, iron foods)
- doc a sent 1: tier-1 lexicon      → (maria lopez, works at, acme corporation)
- doc b sent 0: passive normalize   → (acme corp, acquired, iron foods)
- doc b sent 1: copula "is a"       → (silver motors, is a, carmaker)
- doc c sent 0: zh 在…担任 double emit → (李娜, works at, 天河科技)
                                      + (李娜, serves as, 总经理)
- alias dict registers "acme corp" twice (E1 and E2, identical
  (alias, canon)) → sameAs edge (E1, E2) → component id = min = E1, so
  both "acme corp" (score tie broken by ascending entity_id → E1) and
  "acme corporation" (E2) canonicalize to E1.
- "carmaker" / "总经理" are not in the dictionary → deterministic
  self-entities "M#" + md5(mention)[:12]; the hex literals below were
  computed by hand (hashlib.md5 of the UTF-8 bytes), not by kgforge.
"""

from datetime import datetime

import pytest

from kgforge.stages.canonicalize import edges_with_day, rewrite_triples
from kgforge.stages.extract import sentences, triples
from kgforge.stages.link import alias_resolution, link_with_map, mentions

TS_A = datetime(2021, 3, 1, 10, 0, 0)
TS_B = datetime(2021, 3, 2, 9, 30, 0)
TS_C = datetime(2021, 3, 2, 23, 59, 0)

DOCS = [
    ("https://w/a", TS_A, "en",
     "Acme corp acquired iron foods. Maria lopez works at acme corporation."),
    ("https://w/b", TS_B, "en",
     "Iron foods was acquired by acme corp. Silver motors is a carmaker."),
    ("https://w/c", TS_C, "zh", "李娜在天河科技担任总经理。"),
]

ALIASES = [
    # (alias, entity_id, canon, prior)
    ("acme corp", "E1", "acme corp", 1.0),
    ("acme corp", "E2", "acme corp", 1.0),  # duplicate registration → sameAs
    ("acme corporation", "E2", "acme corp", 0.9),
    ("iron foods", "E3", "iron foods", 1.0),
    ("maria lopez", "E4", "maria lopez", 1.0),
    ("李娜", "E5", "李娜", 1.0),
    ("天河科技", "E6", "天河科技", 1.0),
    ("silver motors", "E7", "silver motors", 1.0),
]

M_CARMAKER = "M#191fe27c0fa9"  # md5("carmaker")[:12], computed by hand
M_ZONGJINGLI = "M#06fca431f4ad"  # md5("总经理".encode())[:12], by hand

EXPECTED_TRIPLES = {
    ("https://w/a", 0, "acme corp", "acquired", "iron foods"),
    ("https://w/a", 1, "maria lopez", "works at", "acme corporation"),
    ("https://w/b", 0, "acme corp", "acquired", "iron foods"),
    ("https://w/b", 1, "silver motors", "is a", "carmaker"),
    ("https://w/c", 0, "李娜", "works at", "天河科技"),
    ("https://w/c", 0, "李娜", "serves as", "总经理"),
}

EXPECTED_ENTITIES = {
    "acme corp": "E1",
    "acme corporation": "E1",  # via sameAs component
    "iron foods": "E3",
    "maria lopez": "E4",
    "李娜": "E5",
    "天河科技": "E6",
    "silver motors": "E7",
    "carmaker": M_CARMAKER,
    "总经理": M_ZONGJINGLI,
}

EXPECTED_EDGES = [  # (subj_id, pred, obj_id, url, day) — a multiset
    ("E1", "acquired", "E3", "https://w/a", "2021-03-01"),
    ("E4", "works at", "E1", "https://w/a", "2021-03-01"),
    ("E1", "acquired", "E3", "https://w/b", "2021-03-02"),
    ("E7", "is a", M_CARMAKER, "https://w/b", "2021-03-02"),
    ("E5", "works at", "E6", "https://w/c", "2021-03-02"),
    ("E5", "serves as", M_ZONGJINGLI, "https://w/c", "2021-03-02"),
]


@pytest.fixture(scope="module")
def pipeline_outputs(spark):
    norm = spark.createDataFrame(
        DOCS, "url string, warc_ts timestamp, lang string, text_norm string"
    )
    alias_df = spark.createDataFrame(
        ALIASES, "alias string, entity_id string, canon string, prior double"
    )
    trip = triples(sentences(norm))
    alias_map = alias_resolution(alias_df)
    ents = link_with_map(mentions(trip), alias_map)
    mention_map = alias_map.selectExpr("alias as mention", "canon_id")
    edges = edges_with_day(rewrite_triples(trip, mention_map))
    return trip.collect(), ents.collect(), edges.collect()


def test_triples_match_hand_annotation(pipeline_outputs):
    trip_rows, _, _ = pipeline_outputs
    got = {(r.url, r.sent_id, r.subj, r.pred, r.obj) for r in trip_rows}
    assert got == EXPECTED_TRIPLES
    assert len(trip_rows) == len(EXPECTED_TRIPLES)  # no duplicate emits


def test_linking_matches_hand_annotation(pipeline_outputs):
    _, ent_rows, _ = pipeline_outputs
    got = {r.mention: r.canon_id for r in ent_rows}
    assert got == EXPECTED_ENTITIES
    # dictionary misses carry score 0.0; hits carry a positive score
    for r in ent_rows:
        if r.canon_id.startswith("M#"):
            assert r.score == 0.0
        else:
            assert r.score > 0.0


def test_edges_match_hand_annotation(pipeline_outputs):
    _, _, edge_rows = pipeline_outputs
    got = sorted((r.subj_id, r.pred, r.obj_id, r.url, r.day) for r in edge_rows)
    assert got == sorted(EXPECTED_EDGES)


# ---------------------------------------------------------------------------
# round-4 extension (round-3 verdict next-step #4): hand-derived gate for
# the mention-scan → link → co-occurrence path (the composed semantics
# behind the kg_mentions / kg_cooccur contract queries). Every expected
# count below was tallied BY HAND from the documented matcher semantics
# (kgforge/linking/mentions.py docstring: en leftmost-longest non-
# overlapping token scan; zh non-overlapping per-alias substring scan) —
# never computed by kgforge code.
#
# Hand tally (url/sent → dictionary surfaces → canon via the sameAs
# component E1={E1,E2}):
#   a0 "Acme corp acquired iron foods."        → acme corp, iron foods
#   a1 "Maria lopez works at acme corporation."→ maria lopez, acme corporation
#   b0 "Iron foods was acquired by acme corp." → iron foods, acme corp
#   b1 "Silver motors is a carmaker."          → silver motors
#   c0 "李娜在天河科技担任总经理。"              → 李娜, 天河科技
#   d0 "Maria lopez visited silver motors and iron foods."
#                                              → maria lopez, silver motors,
#                                                iron foods
#   e0 "Acme corp praised acme corp employees."→ acme corp ×2 (non-overlap)
# mention counts: E1=5 (a0, a1, b0, e0×2), E3=3 (a0, b0, d0),
#                 E4=2 (a1, d0), E7=2 (b1, d0), E5=1, E6=1 (c0)
# co-occurrence (DISTINCT canon ids per sentence, unordered pairs e1<e2):
#   a0 {E1,E3}, a1 {E1,E4}, b0 {E1,E3}, b1 {E7}, c0 {E5,E6},
#   d0 {E3,E4,E7}, e0 {E1} (repeat collapses, no self-pair)
# pair counts: (E1,E3)=2, (E1,E4)=1, (E3,E4)=1, (E3,E7)=1, (E4,E7)=1,
#              (E5,E6)=1
# ---------------------------------------------------------------------------

MENTION_DOCS = DOCS + [
    ("https://w/d", TS_C, "en",
     "Maria lopez visited silver motors and iron foods."),
    ("https://w/e", TS_C, "en",
     "Acme corp praised acme corp employees."),
]

EXPECTED_MENTION_COUNTS = [  # (canon_id, n) in (n desc, canon asc) order
    ("E1", 5),
    ("E3", 3),
    ("E4", 2),
    ("E7", 2),
    ("E5", 1),
    ("E6", 1),
]

EXPECTED_COOCCUR = [  # (e1, e2, n) in (n desc, e1 asc, e2 asc) order
    ("E1", "E3", 2),
    ("E1", "E4", 1),
    ("E3", "E4", 1),
    ("E3", "E7", 1),
    ("E4", "E7", 1),
    ("E5", "E6", 1),
]


@pytest.fixture(scope="module")
def mention_outputs(spark):
    from pyspark.sql import functions as F

    from kgforge.stages.link import scan_mentions

    norm = spark.createDataFrame(
        MENTION_DOCS, "url string, warc_ts timestamp, lang string, text_norm string"
    )
    alias_df = spark.createDataFrame(
        ALIASES, "alias string, entity_id string, canon string, prior double"
    )
    aliases = [r.alias for r in alias_df.select("alias").distinct().collect()]
    hits = scan_mentions(sentences(norm), aliases)
    amap = alias_resolution(alias_df)
    linked = hits.join(
        F.broadcast(amap), hits["mention"] == amap["alias"]
    ).select("url", "sent_id", "canon_id")
    counts = (
        linked.groupBy("canon_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("canon_id"))
        .collect()
    )
    ents = linked.distinct()
    a, b = ents.alias("a"), ents.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.url") == F.col("b.url"))
            & (F.col("a.sent_id") == F.col("b.sent_id"))
            & (F.col("a.canon_id") < F.col("b.canon_id")),
        )
        .groupBy(
            F.col("a.canon_id").alias("e1"), F.col("b.canon_id").alias("e2")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"))
        .collect()
    )
    return counts, pairs


def test_mention_counts_match_hand_tally(mention_outputs):
    counts, _ = mention_outputs
    assert [(r.canon_id, r.n) for r in counts] == EXPECTED_MENTION_COUNTS


def test_cooccurrence_matches_hand_tally(mention_outputs):
    _, pairs = mention_outputs
    assert [(r.e1, r.e2, r.n) for r in pairs] == EXPECTED_COOCCUR


# ---------------------------------------------------------------------------
# round-4 extension #2: hand-derived gate for the graph-analytics layer
# over the SAME e2e edge set. Every expected row below is tallied by hand
# from the 6 canonical edges above (see EXPECTED_EDGES) and the documented
# operator semantics in kgforge/graph/analytics.py — never computed by
# kgforge code. Notable hand derivations:
# - LPA on bipartite stars OSCILLATES under synchronous updates; 5 rounds
#   land deterministically on the assignment tallied below (E3–E1–E4
#   chain: E1→label E3, E3/E4→label E1; star E5-{E6,M06}: E5→E6,
#   E6/M06→E5; pair E7-M19 swaps on odd rounds).
# - pred canon: acquired→acquire, works at→work at, is a stays (copular
#   aux is not stripped to the article), serves as→serve as.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def edges_df(spark):
    ts_by_url = {"https://w/a": TS_A, "https://w/b": TS_B, "https://w/c": TS_C}
    rows = [
        (s, p, o, url, ts_by_url[url], day)
        for s, p, o, url, day in EXPECTED_EDGES
    ]
    return spark.createDataFrame(
        rows,
        "subj_id string, pred string, obj_id string, url string,"
        " warc_ts timestamp, day string",
    )


def test_entity_profile_hand_e2e(edges_df):
    from kgforge.graph.analytics import entity_profile

    got = [tuple(r) for r in entity_profile(edges_df).collect()]
    assert got == [
        ("E1", 2, 1, 2, "2021-03-01", "2021-03-02"),
        ("E3", 0, 2, 1, "2021-03-01", "2021-03-02"),
        ("E5", 2, 0, 2, "2021-03-02", "2021-03-02"),
        ("E4", 1, 0, 1, "2021-03-01", "2021-03-01"),
        ("E6", 0, 1, 1, "2021-03-02", "2021-03-02"),
        ("E7", 1, 0, 1, "2021-03-02", "2021-03-02"),
        (M_ZONGJINGLI, 0, 1, 1, "2021-03-02", "2021-03-02"),
        (M_CARMAKER, 0, 1, 1, "2021-03-02", "2021-03-02"),
    ]


def test_two_hop_hand_e2e(edges_df):
    from kgforge.graph.analytics import two_hop_reach

    got = [tuple(r) for r in two_hop_reach(edges_df).collect()]
    # E4 -> E1 -> E3 (reach 2); E5 -> {E6, M06} (reach 2); E1 -> {E3};
    # E7 -> {M19}
    assert got == [("E4", 2), ("E5", 2), ("E1", 1), ("E7", 1)]


def test_triangles_and_kcore_empty_hand_e2e(edges_df):
    from kgforge.graph.analytics import kcore, triangle_counts

    assert triangle_counts(edges_df).collect() == []  # forest: no triangle
    assert kcore(edges_df).collect() == []  # max degree 2 < k=3


def test_communities_hand_e2e(edges_df):
    from kgforge.graph.analytics import label_propagation

    got = [tuple(r) for r in label_propagation(edges_df).collect()]
    assert got == [
        ("E1", 2), ("E5", 2),
        ("E3", 1), ("E6", 1), ("E7", 1), (M_CARMAKER, 1),
    ]


def test_components_hand_e2e(edges_df):
    from kgforge.graph.cc import connected_components
    from pyspark.sql import functions as F

    labels = connected_components(
        edges_df.select(
            F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
        )
    )
    sizes = sorted(
        ((r["component"], r["n"]) for r in labels.groupBy("component")
         .agg(F.count(F.lit(1)).alias("n")).collect()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert sizes == [("E1", 3), ("E5", 3), ("E7", 2)]


def test_edge_latest_hand_e2e(edges_df):
    import calendar

    from kgforge.graph.analytics import edge_latest

    ep = lambda dt: calendar.timegm(dt.timetuple())  # noqa: E731
    got = [tuple(r) for r in edge_latest(edges_df).collect()]
    assert got == [
        ("E5", "serves as", M_ZONGJINGLI, 1, ep(TS_C), "https://w/c"),
        ("E5", "works at", "E6", 1, ep(TS_C), "https://w/c"),
        ("E1", "acquired", "E3", 2, ep(TS_B), "https://w/b"),
        ("E7", "is a", M_CARMAKER, 1, ep(TS_B), "https://w/b"),
        ("E4", "works at", "E1", 1, ep(TS_A), "https://w/a"),
    ]


def test_pred_canon_hand_e2e(spark, edges_df):
    from pyspark.sql import functions as F

    from kgforge.extract.predicates import canonicalize_predicates

    got = [
        tuple(r)
        for r in canonicalize_predicates(edges_df)
        .groupBy("canon_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("canon_pred"))
        .collect()
    ]
    assert got == [
        ("acquire", 2), ("work at", 2), ("is a", 1), ("serve as", 1),
    ]


def test_sameas_candidates_hand_e2e(edges_df):
    from kgforge.graph.analytics import sameas_candidates

    got = [tuple(r) for r in sameas_candidates(edges_df).collect()]
    # E3/E4 share their only neighbor E1; E6/M06 share E5 — both J=1.0
    assert got == [
        ("E3", "E4", 1.0),
        ("E6", M_ZONGJINGLI, 1.0),
    ]
