"""Stage-1 gates: the reference's own unit-test assertions
(/root/reference/tests/test_dataprocess.py:11-29) re-targeted at kgforge's
reimplementation, plus golden tests pinning verified reference quirks
(SURVEY.md §2.4 R2/R5, §2.2 P15, §2.8 M3)."""

import re

import pytest

from kgforge.textnorm.cleaning import (
    chinese_split,
    clean_lines,
    clean_text,
    cleaning_validator,
    kept_removed_puncs,
    lower,
    process_line,
    produce_sample_text,
    remove_brackets_text,
)
from kgforge.textnorm.constants import (
    DEFAULT_ENGLISH_NER_MAPPING,
    DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP,
    NORMAL_TOKEN_TAG,
)
from kgforge.textnorm.pipeline import punctuate_batch, punctuate_one
from kgforge.textnorm.tagger import MockTagger
from tests.reference_corpus import REFERENCE_TEST_CORPUS

punctuations = list(DEFAULT_ENGLISH_NER_MAPPING.keys())


@pytest.fixture(scope="module")
def cleaned_data():
    # mirrors tests/common.py:53-64 (special funcs: remove_brackets_text, lower)
    return clean_lines(
        REFERENCE_TEST_CORPUS,
        DEFAULT_ENGLISH_NER_MAPPING,
        special_cleaning_funcs=[remove_brackets_text, lower],
    )


@pytest.fixture(scope="module")
def processed_data(cleaned_data):
    all_tokens, all_tags = [], []
    for line in cleaned_data:
        tokens, tags = process_line(line, DEFAULT_ENGLISH_NER_MAPPING)
        all_tokens.append(tokens)
        all_tags.append(tags)
    return all_tokens, all_tags


def test_corpus_survives_cleaning(cleaned_data):
    # all 4 reference docs must pass the validator (none contains '|')
    assert len(cleaned_data) == len(REFERENCE_TEST_CORPUS)


def test_data_cleaning(cleaned_data):
    # reference test_dataprocess.py:11-16
    checking_regex = r"\([^()]*\)"
    for line in cleaned_data:
        assert len(re.findall(checking_regex, line)) == 0


def test_training_data_generation(processed_data):
    # reference test_dataprocess.py:19-29
    for tokens, tags in zip(*processed_data):
        last_token_is_punct = False
        for token, tag in zip(tokens, tags):
            assert not token.isdigit()
            if last_token_is_punct:
                assert token not in punctuations
            if token in punctuations:
                assert tag != NORMAL_TOKEN_TAG
                last_token_is_punct = True


# --- golden quirk pins -------------------------------------------------------


def test_process_line_punct_collapse():
    # SURVEY §2.4 R2, verified by executing the reference
    tokens, tags = process_line("a , b . c ! d ? e", DEFAULT_ENGLISH_NER_MAPPING)
    assert tokens == ["a", "b", "c", "d", "e"]
    assert tags == ["COMMA", "PERIOD", "EXLAMATIONMARK", "QUESTIONMARK", "O"]


def test_process_line_all_puncs():
    tokens, tags = process_line(". . .", DEFAULT_ENGLISH_NER_MAPPING)
    assert tokens == ["."]
    assert tags == ["O"]


def test_process_line_leading_puncs_dropped():
    tokens, tags = process_line(", . foo bar", DEFAULT_ENGLISH_NER_MAPPING)
    assert tokens == ["foo", "bar"]
    assert tags == ["O", "O"]


def test_cleaning_masks_in_order():
    kept, removed = kept_removed_puncs(DEFAULT_ENGLISH_NER_MAPPING)
    out = clean_text(
        "reach me at bob@example.com or https://x.io for $5 or 42%", kept, removed
    )
    assert "<EMAIL>" in out and "<URL>" in out
    assert "<CURRENCY>" in out
    assert "<NUM>" in out
    assert "@" not in out.replace("<EMAIL>", "")


def test_validator_rejects_pipe():
    # data_cleanning.py:108-118 quirk: '|' joins the char class, so a
    # literal pipe always fails validation (and kept-rescue never fires)
    kept, removed = kept_removed_puncs(DEFAULT_ENGLISH_NER_MAPPING)
    with pytest.raises(AssertionError):
        cleaning_validator("a | b", kept, removed)
    assert cleaning_validator("a . b", kept, removed)
    assert clean_lines(["good line here", "bad | line"], DEFAULT_ENGLISH_NER_MAPPING) == [
        "good line here"
    ]


def test_chinese_split():
    # additional_data_process.py:30-56: space around each CJK char,
    # English spans untouched
    assert chinese_split("abc中文def") == "abc 中 文 def"
    # space-separated CJK chars are two regex matches → double inner space
    # (verified reference behavior: inter-match segment strips to "")
    assert chinese_split("你 好") == " 你  好 "
    # spaces INSIDE one CJK run are filtered by the char!=" " list comp
    assert chinese_split("中文abc中文") == " 中 文 abc 中 文 "


def test_keep_only_latin_characters():
    from kgforge.textnorm.cleaning import keep_only_latin_characters

    # keeps U+0020..U+024F (latin incl. extensions), drops the rest
    # non-latin chars deleted, surrounding spaces kept
    assert keep_only_latin_characters("abc ɏ 中文 ёж é") == "abc ɏ   é"


def test_long_chinese_doc_chunks_and_merges():
    # chinese_split turns each CJK char into a token → >256 chars chunk;
    # merge must keep zh no-space joining across the chunk boundary
    from kgforge.textnorm.constants import DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP
    from kgforge.textnorm.tagger import MockTagger

    text = "天地玄黄宇宙洪荒" * 40  # 320 CJK chars → 2 chunks
    out, labels = punctuate_one(
        text, MockTagger("zh"), DEFAULT_CHINESE_TAG_PUNCTUATOR_MAP
    )
    assert len(labels) == 320
    # non-ASCII: no spaces anywhere except those introduced by "? "/"! "
    stripped = out.replace("? ", "？").replace("! ", "！")
    assert " " not in stripped
    # all original characters survive, in order
    kept = [c for c in out if c in set("天地玄黄宇宙洪荒")]
    assert "".join(kept) == text


def test_produce_sample_text():
    assert produce_sample_text("Hello, World! It's 5.") == "hello world its 5"


# --- inference pipeline goldens ---------------------------------------------


class FixedTagger:
    """Injectable tagger returning canned tags (tests M3/R5 in isolation)."""

    def __init__(self, script):
        self.script = script  # dict: tuple(tokens) -> tags; fallback all-O

    def tag(self, chunks):
        out = []
        for tokens in chunks:
            canned = self.script.get(tuple(tokens))
            out.append(canned if canned is not None else ["O"] * len(tokens))
        return out


def test_post_process_capitalize_and_spacing():
    tagger = FixedTagger(
        {("hello", "world", "how", "are", "you"): ["COMMA", "PERIOD", "O", "O", "QUESTIONMARK"]}
    )
    outputs, labels = punctuate_batch(
        ["hello world how are you"], tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
    )
    # first token capitalized (next_upper=True init), PERIOD sets next upper
    assert outputs == ["Hello, world. How are you?"]
    assert labels == [["COMMA", "PERIOD", "O", "O", "QUESTIONMARK"]]


def test_masked_token_restored_before_capitalize():
    tagger = FixedTagger({})
    outputs, _ = punctuate_batch(
        ["bob@example.com sent 42"], tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
    )
    # email restored from special_token_index then capitalized (M3 order)
    assert outputs == ["Bob@example.com sent 42"]


def test_chunk_merge_no_space_at_boundary():
    # R5a: chunk-boundary words joined with no separator after strip()
    words = [f"w{i}" for i in range(300)]
    text = " ".join(words)
    tagger = FixedTagger({})  # all O tags
    outputs, labels = punctuate_batch(
        [text], tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
    )
    assert len(outputs) == 1
    # chunk 0 ends at w255, chunk 1 starts at w256 — no space between, and
    # chunk 1's first token is capitalized (next_upper resets per chunk)
    assert "w255W256" in outputs[0]
    assert len(labels[0]) == 300


def test_adjacent_long_inputs_coalesce():
    # R5b quirk: two back-to-back >256-token docs merge into ONE output
    words_a = " ".join(f"a{i}" for i in range(300))
    words_b = " ".join(f"b{i}" for i in range(300))
    tagger = FixedTagger({})
    outputs, _ = punctuate_batch(
        [words_a, words_b], tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP
    )
    assert len(outputs) == 1  # quirk preserved in the batch API
    # per-url path never coalesces across docs:
    out_a, _ = punctuate_one(words_a, tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP)
    out_b, _ = punctuate_one(words_b, tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP)
    assert out_a.startswith("A0 ") and out_b.startswith("B0 ")


def test_mock_tagger_deterministic_and_sane():
    tokens = ["the", "acme", "corp", "acquired", "initech", "in", "march",
              "and", "maria", "works", "at", "globex", "now", "today"]
    t1 = MockTagger("en").tag([tokens])
    t2 = MockTagger("en").tag([list(tokens)])
    assert t1 == t2
    assert len(t1[0]) == len(tokens)
    enders = {"PERIOD", "QUESTIONMARK", "EXLAMATIONMARK"}
    assert t1[0][-1] in enders  # chunk always closes a sentence


def test_punctuate_one_roundtrip_tags_match_process_line():
    # normalize → process_line inverts to the tagger's own tags (tag-accuracy
    # 1.0 analogue of reference tests/test_inference.py:21-35 with the mock)
    text = "the acme corp acquired initech in march and maria works at globex now today yes"
    tagger = MockTagger("en")
    out, labels = punctuate_one(text, tagger, DEFAULT_ENGLISH_TAG_PUNCTUATOR_MAP)
    assert out[0].isupper()
    # reference data-process flow: clean (pads kept puncs) then pair tokens/tags
    kept, removed = kept_removed_puncs(DEFAULT_ENGLISH_NER_MAPPING)
    cleaned = clean_text(out, kept, removed, lower)
    tokens, tags = process_line(cleaned, DEFAULT_ENGLISH_NER_MAPPING)
    assert tokens == text.split()
    # trailing-word tag: process_line gives final word O; tagger gave an ender
    assert tags[:-1] == labels[:-1]
