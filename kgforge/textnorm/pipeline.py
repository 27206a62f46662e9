"""Single-node oracle of the reference inference pipeline
(pre_process → [tagger backend] → post_process).

Faithful port of /root/reference/dbpunctuator/inference/inference_pipeline.py
with the model behind an injected ``TaggerBackend``:

- ``pre_process`` (:120-174): chinese_split + whitespace tokenize, per-token
  first-match-wins sentinel masking with anchored ``.match`` semantics
  (EMAIL→URL→CURRENCY→TEL→NUM, :122-146), 256-word chunking with
  ``split_inputs_indexes`` bookkeeping (:148-173).
- ``post_process`` (:204-258): restore masked originals, ``str.capitalize``
  after sentence-enders (``next_upper`` initialized True per chunk, :224),
  ASCII tokens joined with a trailing space / non-ASCII without (:237-240),
  split-chunk re-merge with ``.strip()`` and NO separator (:241-256) —
  including the adjacent-long-inputs coalescing quirk (SURVEY.md §2.4 R5).

The Spark normalize stage calls ``punctuate_one`` per url with the same
tagger backend, so distributed output is byte-identical to this oracle by
construction.
"""

from __future__ import annotations

import re

from .cleaning import chinese_split
from .constants import (
    CURRENCY_TOKEN,
    EMAIL_TOKEN,
    NUMBER,
    NUMBER_TOKEN,
    TELEPHONE_TOKEN,
    URL,
    URL_TOKEN,
    currency_regex,
)
from .plane_patterns import EMAIL, TELEPHONE
from .tagger import TaggerBackend

DEFAULT_MAX_SEQUENCE_LENGTH = 256  # max_position_embeddings // 2 (:113-115)

_num_regex = re.compile(f"{NUMBER.pattern}")
_tel_regex = re.compile(f"{TELEPHONE.pattern}")
_email_regex = re.compile(f"{EMAIL.pattern}")
_url_regex = re.compile(f"{URL.pattern}")


from functools import lru_cache


@lru_cache(maxsize=1)
def _currency_re():
    # lazy: building the Sc char class scans all of Unicode once per process
    return re.compile(f"{currency_regex().pattern}")


def _input_process(input_tokens: list[str]) -> tuple[list[str], dict[int, str]]:
    """Anchored first-match-wins sentinel masking (:122-146). Mutates and
    returns the list, recording originals by position."""
    currency_regex_c = _currency_re()
    special_token_index: dict[int, str] = {}
    for index, token in enumerate(input_tokens):
        # fast path: a token of pure ASCII letters cannot match any of the
        # five sentinel patterns (EMAIL needs '@', URL needs '.' or '://',
        # CURRENCY opens with an Sc symbol, TELEPHONE/NUMBER need digits) —
        # the overwhelmingly common case on web prose, so it skips all five
        # anchored regex probes (round-5: 5 .match calls/token → 0 for
        # ~90% of tokens, measured ~25% of the normalize stage)
        if token.isascii() and token.isalpha():
            continue
        if _email_regex.match(token):
            input_tokens[index] = EMAIL_TOKEN
            special_token_index[index] = token
            continue
        if _url_regex.match(token):
            input_tokens[index] = URL_TOKEN
            special_token_index[index] = token
            continue
        if currency_regex_c.match(token):
            input_tokens[index] = CURRENCY_TOKEN
            special_token_index[index] = token
            continue
        if _tel_regex.match(token):
            input_tokens[index] = TELEPHONE_TOKEN
            special_token_index[index] = token
            continue
        if _num_regex.match(token):
            input_tokens[index] = NUMBER_TOKEN
            special_token_index[index] = token
            continue
    return input_tokens, special_token_index


def pre_process(
    inputs: list[str], max_sequence_length: int = DEFAULT_MAX_SEQUENCE_LENGTH
) -> tuple[list[list[str]], list[dict[int, str]], list[int]]:
    """:148-173. Returns (all_tokens, special_token_indexes,
    split_inputs_indexes)."""
    all_tokens: list[list[str]] = []
    special_token_indexes: list[dict[int, str]] = []
    split_inputs_indexes: list[int] = []
    index = 0
    last_is_split = False
    for input in inputs:
        input_tokens = chinese_split(input).split()
        while len(input_tokens) > max_sequence_length:
            processed_input_tokens, special_token_index = _input_process(
                input_tokens[:max_sequence_length]
            )
            special_token_indexes.append(special_token_index)
            all_tokens.append(processed_input_tokens)
            split_inputs_indexes.append(index)
            input_tokens = input_tokens[max_sequence_length:]
            index += 1
            last_is_split = True
        else:
            if last_is_split:
                split_inputs_indexes.append(index)
                last_is_split = False
            index += 1
            processed_input_tokens, special_token_index = _input_process(input_tokens)
            special_token_indexes.append(special_token_index)
            all_tokens.append(processed_input_tokens)
    return all_tokens, special_token_indexes, split_inputs_indexes


def post_process(
    all_tags: list[list[str]],
    all_tokens: list[list[str]],
    special_token_indexes: list[dict[int, str]],
    split_inputs_indexes: list[int],
    tag2punctuator: dict[str, tuple],
) -> tuple[list[str], list[list[str]]]:
    """:204-258 with tag names in place of argmax ids."""
    split_set = set(split_inputs_indexes)
    outputs: list[str] = []
    outputs_labels: list[list[str]] = []
    temp_ouputs = ""
    temp_outputs_labels: list[str] = []
    for input_index, (chunk_tags, tokens, special_token_index) in enumerate(
        zip(all_tags, all_tokens, special_token_indexes)
    ):
        next_upper = True
        # list-append + one join instead of quadratic-risk str += (round-6
        # micro-opt; byte-identical — the same fragments in the same order)
        parts: list[str] = []
        output_labels: list[str] = []
        for index, (tag, token) in enumerate(zip(chunk_tags, tokens)):
            output_labels.append(tag)
            if index in special_token_index:
                token = special_token_index[index]
            if next_upper:
                token = token.capitalize()
            punctuator, next_upper = tag2punctuator[tag]
            if token.isascii():
                parts.append(token)
                parts.append(punctuator)
                parts.append(" ")
            else:
                parts.append(token)
                parts.append(punctuator)
        result_text = "".join(parts)
        if input_index in split_set:
            temp_ouputs += result_text.strip()
            temp_outputs_labels.extend(output_labels)
        else:
            if temp_ouputs and temp_outputs_labels:
                outputs.append(temp_ouputs.strip())
                outputs_labels.append(temp_outputs_labels)
                temp_ouputs = ""
                temp_outputs_labels = []
            outputs.append(result_text.strip())
            outputs_labels.append(output_labels)
    if temp_ouputs and temp_outputs_labels:
        outputs.append(temp_ouputs.strip())
        outputs_labels.append(temp_outputs_labels)
    return outputs, outputs_labels


def punctuate_batch(
    inputs: list[str],
    tagger: TaggerBackend,
    tag2punctuator: dict[str, tuple],
    max_sequence_length: int = DEFAULT_MAX_SEQUENCE_LENGTH,
) -> tuple[list[str], list[list[str]]]:
    """Full ``InferencePipeline.punctuation`` equivalent (:260-264).
    NOTE the reference quirk: adjacent >max-length inputs inside one batch
    coalesce into a single output (R5b) — pinned by a golden test. The
    engine's per-url path (``punctuate_one``) can never trigger it."""
    all_tokens, special_token_indexes, split_inputs_indexes = pre_process(
        inputs, max_sequence_length
    )
    all_tags = tagger.tag(all_tokens)
    return post_process(
        all_tags, all_tokens, special_token_indexes, split_inputs_indexes, tag2punctuator
    )


def punctuate_one(
    text: str,
    tagger: TaggerBackend,
    tag2punctuator: dict[str, tuple],
    max_sequence_length: int = DEFAULT_MAX_SEQUENCE_LENGTH,
) -> tuple[str, list[str]]:
    """Per-document entry used by both the oracle tables and the Spark
    ``mapInPandas`` stage — one url per call keys the chunk re-merge by url
    (SURVEY.md §2.4 R5 resolution)."""
    outputs, labels = punctuate_batch(
        [text], tagger, tag2punctuator, max_sequence_length
    )
    if not outputs:
        return "", []
    return outputs[0], labels[0]
