"""Single-node oracle for the reference's corpus-cleaning semantics.

Every function mirrors a reference call path (cited per function). These
are the *specification*: the Spark stages call exactly these functions
inside Arrow-batched UDFs, so byte-identity between the distributed path
and the oracle holds by construction (SURVEY.md §3.2, §5.2).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Callable, Iterable

from .constants import (
    CURRENCY_TOKEN,
    EMAIL_TOKEN,
    NORMAL_TOKEN_TAG,
    NUMBER,
    NUMBER_TOKEN,
    TELEPHONE_TOKEN,
    URL,
    URL_TOKEN,
    all_puncs,
    currency_regex,
)
from .plane_patterns import CJK, EMAIL, TELEPHONE, replace

# ---------------------------------------------------------------------------
# "special cleaning funcs" (utils/additional_data_process.py)
# ---------------------------------------------------------------------------


def remove_brackets_text(input: str) -> str:
    """Drop non-nested parenthesized spans
    (additional_data_process.py:9-16)."""
    return re.sub(r"\([^()]*\)", " ", input)


def keep_only_latin_characters(input: str) -> str:
    """Delete chars outside U+0020..U+024F
    (additional_data_process.py:19-27)."""
    return re.sub("[^ -ɏ]", "", input)


_cjk_regex = re.compile("(?P<%s>%s)" % (CJK.name, CJK.pattern), CJK.flag)


def chinese_split(input: str) -> str:
    """Insert spaces around every CJK char; non-CJK spans kept verbatim but
    stripped at segment edges (additional_data_process.py:30-56)."""
    result = ""
    start = 0
    try:
        for t in _cjk_regex.finditer(input):
            result += input[start : t.start()].strip()
            result += (
                " "
                + " ".join(
                    [char for char in list(input[t.start() : t.end()]) if char != " "]
                )
                + " "
            )
            start = t.end()
        result += input[start:].strip()
    except TypeError:
        # mal row (reference logs and returns the partial result)
        pass
    return result


def lower(input: str) -> str:
    """tests/common.py:15-16 / examples/english_data_sample.py:10-11."""
    return input.lower()


# ---------------------------------------------------------------------------
# punctuation sets + translators (data_process.py:42-45, data_cleanning.py:57-60)
# ---------------------------------------------------------------------------


def kept_removed_puncs(
    ner_mapping: dict[str, str], additional_to_remove: Iterable[str] = ()
) -> tuple[list[int], list[int]]:
    """data_process.py:42-45 / :86-89 — kept = ords of ner_mapping keys,
    removed = ALL_PUNCS minus kept, plus explicit extras."""
    kept = [ord(p) for p in set(ner_mapping.keys())]
    removed = [p for p in all_puncs() if p not in set(kept)] + [
        ord(p) for p in additional_to_remove
    ]
    return kept, removed


@lru_cache(maxsize=8)
def _translators(kept: tuple[int, ...], removed: tuple[int, ...]):
    """The reference rebuilds both dicts per row (data_cleanning.py:57-60);
    semantics identical, built once per process here."""
    delete_tr = {key: None for key in removed}
    space_tr = {key: " {0} ".format(chr(key)) for key in kept}
    return delete_tr, space_tr


def clean_text(
    line: str,
    kept_punctuations: list[int],
    removed_punctuations: list[int],
    *special_cleaning_funcs: Callable[[str], str],
) -> str:
    """One row of ``dataframe_data_cleaning`` / ``text_lines_cleaning``
    (data_cleanning.py:23-67,70-105). Exact application order:
    special funcs → EMAIL → URL → CURRENCY → TELEPHONE → NUMBER →
    delete-translator → pad-translator → strip."""
    for func in special_cleaning_funcs:
        line = func(line)
    line = replace(line, EMAIL, EMAIL_TOKEN)
    line = replace(line, URL, URL_TOKEN)
    line = replace(line, currency_regex(), CURRENCY_TOKEN)
    line = replace(line, TELEPHONE, TELEPHONE_TOKEN)
    line = replace(line, NUMBER, NUMBER_TOKEN)
    delete_tr, space_tr = _translators(
        tuple(kept_punctuations), tuple(removed_punctuations)
    )
    return line.translate(delete_tr).translate(space_tr).strip()


@lru_cache(maxsize=8)
def _removed_charset(removed: tuple[int, ...]) -> frozenset[str]:
    return frozenset(chr(p) for p in removed)


def cleaning_validator(
    text: str,
    kept_punctuations: list[int],
    removed_punctuations: list[int],
) -> bool:
    """data_cleanning.py:108-118. The reference builds the check regex as
    ``[x|y|z...]`` — the ``|`` join separator lands INSIDE the character
    class, so a literal ``|`` (category Sm, never removed by translation)
    also triggers the check; and the kept-membership rescue compares a str
    char against a list of ints, so it never rescues. Net semantics
    (replicated exactly, without materializing a ~1M-char regex): raise
    AssertionError iff the text contains any removed-punctuation char or a
    literal ``|``."""
    charset = _removed_charset(tuple(removed_punctuations))
    for ch in text:
        if ch in charset or ch == "|":
            assert False, (
                f"data cleaning for `{text}`` doesn't pass the validation "
                f"with char {ch!r}"
            )
    return True


def clean_lines(
    lines: Iterable[str],
    ner_mapping: dict[str, str],
    additional_to_remove: Iterable[str] = (),
    special_cleaning_funcs: Iterable[Callable[[str], str]] = (),
) -> list[str]:
    """``clean_up_data_from_txt`` minus the file sink
    (data_process.py:70-121): clean every line, keep only non-empty lines
    that pass the validator (failures skipped, as the reference logs+skips)."""
    kept, removed = kept_removed_puncs(ner_mapping, additional_to_remove)
    out = []
    for line in lines:
        cleaned = clean_text(line, kept, removed, *special_cleaning_funcs)
        try:
            if cleaned and cleaning_validator(cleaned, kept, removed):
                out.append(cleaned)
        except AssertionError:
            continue
    return out


# ---------------------------------------------------------------------------
# token/tag pairing (data_process.py:124-157)
# ---------------------------------------------------------------------------


def process_line(
    line: str, ner_mapping: dict[str, str]
) -> tuple[list[str], list[str]]:
    """Walk whitespace tokens pairing each word with the tag of the
    punctuation that FOLLOWS it; consecutive puncs collapse to the first;
    leading puncs are dropped; the final word gets ``O``
    (data_process.py:124-157). Quirks pinned by tests:
    ``"a , b . c ! d ? e"`` → ``([a,b,c,d,e],[COMMA,PERIOD,EXLAMATIONMARK,
    QUESTIONMARK,O])``; ``". . ."`` → ``([.],[O])``."""
    text_list = line.split()
    token_list: list[str] = []
    tag_list: list[str] = []
    if len(text_list) == 0:
        return token_list, tag_list
    latest_word = text_list.pop(0)
    while latest_word in ner_mapping:
        if not text_list:
            break
        latest_word = text_list.pop(0)
    latest_token = NORMAL_TOKEN_TAG
    latest_is_punc = False
    for word in text_list:
        if word in ner_mapping:
            if not latest_is_punc:
                latest_token = ner_mapping[word]
                latest_is_punc = True
                token_list.append(latest_word)
                tag_list.append(latest_token)
        else:
            if not latest_is_punc:
                token_list.append(latest_word)
                tag_list.append(latest_token)
            latest_is_punc = False
            latest_word = word
            latest_token = NORMAL_TOKEN_TAG
    if not latest_is_punc:
        token_list.append(latest_word)
        tag_list.append(latest_token)
    return token_list, tag_list


# ---------------------------------------------------------------------------
# fixture helper (examples/english_inference_sample.py:11-13)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _all_puncs_delete_tr() -> dict[int, None]:
    return {key: None for key in all_puncs()}


def produce_sample_text(text: str) -> str:
    """lower + delete every ALL_PUNCS char — synthesizes un-punctuated
    inference input (english_inference_sample.py:11-13)."""
    return text.lower().translate(_all_puncs_delete_tr())
