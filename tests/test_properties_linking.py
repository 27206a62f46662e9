"""Property-based gates (hypothesis) for the linking-layer pure modules
added in round 2: the gazetteer matcher and the fuzzy embedding scorer."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.linking.embed import embed
from kgforge.linking.fuzzy import build_alias_matrix, fuzzy_link_batch
from kgforge.linking.mentions import build_mention_index, find_mentions

_WORD = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_ALIAS = st.lists(_WORD, min_size=1, max_size=3).map(" ".join)


@given(st.lists(_ALIAS, min_size=1, max_size=15), st.lists(_WORD, max_size=30))
@settings(max_examples=60, deadline=None)
def test_matcher_only_emits_known_aliases(aliases, words):
    en, zh = build_mention_index(sorted(aliases))
    found = find_mentions(" ".join(words), "en", en, zh)
    assert set(found) <= set(aliases)


@given(st.lists(_ALIAS, min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_every_alias_found_in_its_own_surface(aliases):
    """A sentence that IS an alias always matches (possibly as part of a
    longer alias — leftmost-longest — but never misses entirely)."""
    en, zh = build_mention_index(sorted(aliases))
    for alias in aliases:
        found = find_mentions(alias, "en", en, zh)
        assert found, alias
        # the match covers the alias's first token position
        assert found[0].split()[0] == alias.split()[0]


@given(st.lists(_ALIAS, min_size=1, max_size=10, unique=True), st.data())
@settings(max_examples=40, deadline=None)
def test_nonoverlap_token_budget(aliases, data):
    """Matched surfaces consume disjoint token spans: total matched tokens
    never exceed the sentence length."""
    sentence_words = data.draw(st.lists(_WORD, min_size=1, max_size=40))
    sentence = " ".join(sentence_words)
    en, zh = build_mention_index(sorted(aliases))
    found = find_mentions(sentence, "en", en, zh)
    assert sum(len(f.split()) for f in found) <= len(sentence_words)


@given(st.lists(_ALIAS, min_size=1, max_size=8, unique=True))
@settings(max_examples=30, deadline=None)
def test_exact_alias_scores_one(aliases):
    """Scoring an alias string against the dictionary returns itself with
    cosine 1.0 (embeddings are L2-normalized; identical string → identical
    vector)."""
    surfaces, mat = build_alias_matrix(aliases)
    res = fuzzy_link_batch(list(surfaces), surfaces, mat, threshold=0.99)
    for surface, (best, score) in zip(surfaces, res):
        if embed(surface).any():  # degenerate all-zero vectors can't self-match
            assert score >= 0.99
            # ties possible only between identical embeddings
            assert best is not None


@given(st.lists(_ALIAS, min_size=1, max_size=8, unique=True), st.lists(_WORD, min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_scores_are_valid_cosines(aliases, mention_words):
    surfaces, mat = build_alias_matrix(aliases)
    (_best, score), = fuzzy_link_batch([" ".join(mention_words)], surfaces, mat)
    assert -1.0 - 1e-9 <= score <= 1.0 + 1e-9
