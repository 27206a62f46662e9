"""Sentence splitting + OpenIE-style (ReVerb-class) triple extraction.

Target-only operators (SURVEY.md §2.11): the reference has no triple
extractor; sentence boundaries come from the punctuator's sentence-ender
tags — exactly the tags whose ``tag2punctuator`` tuple sets
``next_upper=True`` (/root/reference/dbpunctuator/utils/constant.py:18-33),
which surface in ``text_norm`` as ``. ? ! 。`` characters.

These are PURE functions shared verbatim by the single-node oracle and the
Spark ``mapInPandas`` stage, so the distributed triple set matches the
oracle's by construction (P/R harness gate ≥ 0.95, BASELINE.md).
"""

from __future__ import annotations

import re

# relation lexicon (ReVerb's V | V P pattern class, closed-world here);
# longest-first matching. kgforge.fixtures.gen imports this list so the
# fixture generator and extractor stay in lockstep.
REL_LEXICON: list[tuple[str, ...]] = [
    ("works", "at"),
    ("located", "in"),
    ("merged", "with"),
    ("partnered", "with"),
    ("invested", "in"),
    ("acquired",),
    ("supplies",),
    ("founded",),
    ("is", "a"),
]

_STOPWORDS = {
    "the", "a", "an", "and", "or", "but", "while", "with", "for", "to",
    "of", "in", "on", "at", "by", "from", "about", "as", "into", "after",
    "before", "despite", "across", "continue", "continued",
}

# auxiliaries/copulas abutting a relation are skipped, not kept as entity
# tokens ("X is located in Y", "X has acquired Y" — the dominant web-text
# surface forms); determiners opening an object span are likewise skipped
# ("works at the united nations"). Neither occurs in the synthetic fixture,
# so fixture-tier outputs are unchanged; the hand-annotated gold set
# (tests/test_gold_triples.py) measures the effect on real-shaped prose.
_AUX = {"is", "was", "are", "were", "be", "been", "being", "has", "had", "have"}
_DETS = {"the", "a", "an"}

_EN_SENT_SPLIT = re.compile(r"(?<=[.?!])\s+")
_ZH_SENT_SPLIT = re.compile(r"(?<=[。？！?!])\s*")
_EDGE_PUNCT = ".,?!。，？！、"

# Chinese relation patterns (pattern-based counterpart of the English
# lexicon): leftmost match wins; groups are (subj, obj). Entity spans are
# bounded CJK runs so a mid-sentence match can't swallow the whole text.
_ZH_ENT = r"([一-鿿]{2,8})"
ZH_REL_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(_ZH_ENT + "在" + _ZH_ENT + "工作"), "works at"),
    (re.compile(_ZH_ENT + "收购了?" + _ZH_ENT), "acquired"),
    (re.compile(_ZH_ENT + "位于" + _ZH_ENT), "located in"),
    (re.compile(_ZH_ENT + "投资了?" + _ZH_ENT), "invested in"),
    (re.compile(_ZH_ENT + "成立于" + _ZH_ENT), "founded"),
]

MAX_ARG_TOKENS = 4  # entity window either side of the relation


def split_sentences(text_norm: str, lang: str = "en") -> list[str]:
    """Split normalized text on sentence-ender punctuation. English enders
    are always followed by a space (ASCII tokens get a trailing space —
    inference_pipeline.py:237-238), so URL-internal dots never split; zh
    enders may have no following space (non-ASCII join, :239-240)."""
    if not text_norm:
        return []
    splitter = _ZH_SENT_SPLIT if lang == "zh" else _EN_SENT_SPLIT
    return [s.strip() for s in splitter.split(text_norm) if s.strip()]


def _clean_token(tok: str) -> str:
    return tok.strip(_EDGE_PUNCT).lower()


def _trim_subj(pairs: list[tuple[str, bool]]) -> list[str]:
    """Scan right-to-left from the relation: skip relation-adjacent
    auxiliaries, then stop at stopwords, empties, or a clause boundary
    (a token carrying trailing punctuation belongs to the previous clause
    and is excluded)."""
    out: list[str] = []
    started = False
    for tok, trailing_punct in reversed(pairs):
        if not started and tok in _AUX and not trailing_punct:
            continue  # "X is located in", "X has acquired"
        started = True
        if tok in _STOPWORDS or not tok or trailing_punct:
            break
        out.append(tok)
        if len(out) >= MAX_ARG_TOKENS:
            break
    return list(reversed(out))


def _trim_obj(pairs: list[tuple[str, bool]]) -> list[str]:
    """Scan left-to-right from the relation: skip leading determiners,
    then stop at stopwords/empties; a token with trailing punctuation
    closes the span (inclusive)."""
    out: list[str] = []
    started = False
    for tok, trailing_punct in pairs:
        if not started and tok in _DETS and not trailing_punct:
            continue  # "works at the united nations"
        started = True
        if tok in _STOPWORDS or not tok:
            break
        out.append(tok)
        if trailing_punct or len(out) >= MAX_ARG_TOKENS:
            break
    return out


# zh function-word prefixes a greedy CJK subject span can absorb (temporal
# adverbs / reporting markers); stripped after the match — without a word
# segmenter this is the bounded fix for "昨天王伟在…" → subj "王伟"
_ZH_SUBJ_PREFIXES = (
    "昨天", "今天", "明天", "后天", "前天", "近日", "日前", "据悉",
    "据报道", "此外", "另外", "目前", "现在", "随后", "同时",
)


def _strip_zh_prefixes(span: str) -> str:
    # possessive: "南山资本的张强" → "张强" (的 is a particle, not part of
    # an entity name; keep the head only)
    if "的" in span:
        tail = span.rsplit("的", 1)[1]
        if len(tail) >= 2:
            span = tail
    changed = True
    while changed and len(span) > 2:
        changed = False
        for p in _ZH_SUBJ_PREFIXES:
            if span.startswith(p) and len(span) - len(p) >= 2:
                span = span[len(p):]
                changed = True
                break
    return span


def extract_triples_zh(sentence: str) -> list[tuple[str, str, str, float]]:
    """Chinese pattern extraction over a (space-free) normalized sentence.
    Each pattern may fire once per sentence position; predicates reuse the
    English relation labels so the canonical graph is language-uniform.
    Matched subject spans are stripped of leading temporal/reporting
    function words (the greedy-CJK-span refinement from BACKLOG #4)."""
    body = sentence.strip(_EDGE_PUNCT + " ")
    triples: list[tuple[str, str, str, float]] = []
    for rx, pred in ZH_REL_PATTERNS:
        for m in rx.finditer(body):
            subj, obj = _strip_zh_prefixes(m.group(1)), m.group(2)
            if subj and obj and subj != obj:
                triples.append((subj, pred, obj, 0.8))
    return triples


def extract_triples(
    sentence: str, lang: str = "en"
) -> list[tuple[str, str, str, float]]:
    """(subj, pred, obj, conf) tuples from one sentence. English: relation
    = leftmost longest lexicon match; subj = nearest non-stopword span left
    of it; obj = nearest non-stopword span right; conf scales with argument
    tightness (1.0 when both args abut the relation at full length).
    Chinese: bounded regex patterns (``ZH_REL_PATTERNS``)."""
    if lang == "zh":
        return extract_triples_zh(sentence)
    raw = sentence.split()
    tokens = [_clean_token(t) for t in raw]
    boundary = [t != t.rstrip(_EDGE_PUNCT) for t in raw]  # trailing punct
    pairs = list(zip(tokens, boundary))
    triples: list[tuple[str, str, str, float]] = []
    i = 0
    n = len(tokens)
    while i < n:
        match: tuple[str, ...] | None = None
        for rel in REL_LEXICON:
            k = len(rel)
            if i + k <= n and tuple(tokens[i : i + k]) == rel:
                if match is None or k > len(match):
                    match = rel
        if match is None:
            i += 1
            continue
        k = len(match)
        subj_tokens = _trim_subj(pairs[:i])
        obj_tokens = _trim_obj(pairs[i + k :])
        if subj_tokens and obj_tokens:
            conf = round(
                0.5
                + 0.25 * min(1.0, len(subj_tokens) / 2)
                + 0.25 * min(1.0, len(obj_tokens) / 2),
                4,
            )
            triples.append(
                (" ".join(subj_tokens), " ".join(match), " ".join(obj_tokens), conf)
            )
        i += k
    return triples


def doc_triples(
    text_norm: str, lang: str = "en"
) -> list[tuple[int, str, str, str, float]]:
    """All (sent_id, subj, pred, obj, conf) for one normalized document."""
    out = []
    for sent_id, sentence in enumerate(split_sentences(text_norm, lang)):
        for subj, pred, obj, conf in extract_triples(sentence, lang):
            out.append((sent_id, subj, pred, obj, conf))
    return out
