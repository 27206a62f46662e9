"""Property-based gates (hypothesis) for the oracle's core invariants —
these run on arbitrary generated inputs, not just the fixture corpus."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.textnorm.cleaning import (
    clean_text,
    kept_removed_puncs,
    process_line,
    produce_sample_text,
)
from kgforge.textnorm.constants import (
    DEFAULT_ENGLISH_NER_MAPPING,
    DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP,
    NORMAL_TOKEN_TAG,
)
from kgforge.textnorm.corpus import PAD_TOKEN, rechunk_doc
from kgforge.textnorm.pipeline import punctuate_one
from kgforge.textnorm.tagger import MockTagger

_WORD = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10)
_KEPT, _REMOVED = kept_removed_puncs(DEFAULT_ENGLISH_NER_MAPPING)
_TAGGER = MockTagger("en")


@given(st.lists(_WORD, min_size=1, max_size=400))
@settings(max_examples=40, deadline=None)
def test_punctuate_roundtrip_tokens(words):
    """Lowercasing the punctuated output and stripping punctuation must
    recover exactly the input tokens — for any doc, including chunked."""
    text = " ".join(words)
    out, labels = punctuate_one(text, _TAGGER, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP)
    assert len(labels) == len(words)
    recovered = produce_sample_text(out).split()
    assert recovered == words


@given(st.lists(_WORD, min_size=1, max_size=50))
@settings(max_examples=30, deadline=None)
def test_punctuate_labels_in_tag_vocab(words):
    _, labels = punctuate_one(
        " ".join(words), _TAGGER, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
    )
    assert set(labels) <= set(DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP)


@given(
    st.lists(
        st.one_of(_WORD, st.sampled_from(list(DEFAULT_ENGLISH_NER_MAPPING))),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_process_line_invariants(tokens):
    """The reference's own test properties, generalized: tags align 1:1
    with output tokens; any kept-punc output token carries tag O only via
    the all-puncs quirk; tag vocab is closed."""
    out_tokens, out_tags = process_line(" ".join(tokens), DEFAULT_ENGLISH_NER_MAPPING)
    assert len(out_tokens) == len(out_tags)
    assert set(out_tags) <= set(DEFAULT_ENGLISH_NER_MAPPING.values()) | {
        NORMAL_TOKEN_TAG
    }
    words_only = [t for t in tokens if t not in DEFAULT_ENGLISH_NER_MAPPING]
    if words_only:
        # every word token survives, in order
        assert [t for t in out_tokens if t not in DEFAULT_ENGLISH_NER_MAPPING] == (
            words_only
        )


@given(st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_clean_text_no_removed_punc_survives(text):
    cleaned = clean_text(text, _KEPT, _REMOVED)
    removed_set = {chr(p) for p in _REMOVED}
    survivors = [ch for ch in cleaned if ch in removed_set]
    assert survivors == []


@given(
    st.lists(_WORD, min_size=0, max_size=200),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=60, deadline=None)
def test_rechunk_doc_lossless_and_padded(words, min_len, extra):
    max_len = min_len + extra
    tags = [NORMAL_TOKEN_TAG] * len(words)
    chunks = rechunk_doc(words, tags, "k", min_len, max_len)
    flat = [t for toks, _ in chunks for t in toks if t != PAD_TOKEN]
    assert flat == words
    for toks, tgs in chunks:
        assert min_len <= len(toks) <= max_len
        assert len(toks) == len(tgs)


def test_punctuate_handles_weird_inputs():
    for text in ["", "   ", " ", "🎉 🎊", "a" * 5000, "<NUM> <URL>"]:
        out, labels = punctuate_one(
            text, _TAGGER, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
        )
        assert isinstance(out, str) and isinstance(labels, list)
