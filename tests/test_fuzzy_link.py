"""Fuzzy embedding-linking gates (kgforge.linking.fuzzy +
kgforge.stages.link.link_fuzzy)."""

from kgforge.linking.fuzzy import build_alias_matrix, fuzzy_link_batch

ALIASES = ["maria lopez 12", "global dynamics 7", "apex holdings 3"]


def test_noisy_span_links_to_nearest_alias():
    surfaces, mat = build_alias_matrix(ALIASES)
    res = fuzzy_link_batch(["14 maria lopez 12", "global dynamics 7 yesterday"],
                           surfaces, mat)
    assert res[0][0] == "maria lopez 12" and res[0][1] >= 0.5
    assert res[1][0] == "global dynamics 7" and res[1][1] >= 0.5


def test_unrelated_mention_stays_unlinked():
    surfaces, mat = build_alias_matrix(ALIASES)
    (alias, score), = fuzzy_link_batch(["quarterly weather report"], surfaces, mat)
    assert alias is None and score < 0.5


def test_batch_split_invariance():
    """Executor batch boundaries must not change any score (bitwise)."""
    surfaces, mat = build_alias_matrix(ALIASES)
    ms = ["14 maria lopez 12", "apex holdings", "unrelated words here",
          "global dynamics"]
    whole = fuzzy_link_batch(ms, surfaces, mat)
    split = fuzzy_link_batch(ms[:2], surfaces, mat) + fuzzy_link_batch(
        ms[2:], surfaces, mat
    )
    assert whole == split


def test_spark_stage_matches_pure_scorer(spark):
    from kgforge.stages.link import link_fuzzy

    alias_df = spark.createDataFrame(
        [(a, f"E{i}", a, 1.0) for i, a in enumerate(ALIASES)],
        "alias string, entity_id string, canon string, prior double",
    )
    mentions_df = spark.createDataFrame(
        [("14 maria lopez 12",), ("maria lopez 12",), ("nothing relevant",)],
        "mention string",
    )
    rows = {r["mention"]: (r["alias"], r["score"])
            for r in link_fuzzy(mentions_df, alias_df).collect()}
    # exact hit filtered by the anti-join; noisy span linked; junk unlinked
    assert "maria lopez 12" not in rows
    assert rows["14 maria lopez 12"][0] == "maria lopez 12"
    assert rows["nothing relevant"][0] is None
