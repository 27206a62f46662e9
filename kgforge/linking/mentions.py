"""Dictionary-based in-text mention detection (BACKLOG #5 → implemented).

The triple extractor only surfaces entities that sit in argument position
of a lexicon relation; real KG construction also needs every OTHER alias
occurrence in the text (for entity salience, co-occurrence edges, and
linking candidates). This module is the PURE matcher shared verbatim by
the Spark ``mapInPandas`` stage (kgforge.stages.link.scan_mentions) and
the expected-parquet oracle twin — the same single-source-of-truth pattern
as kgforge.extract.triples.

English: token-level scan, longest-alias-first at each position
(greedy leftmost-longest, non-overlapping — the classic gazetteer/trie
semantics); tokens are edge-punct-stripped and lowercased exactly like the
extractor's. Chinese: non-overlapping substring scan per alias.
"""

from __future__ import annotations

from collections import defaultdict

from kgforge.extract.triples import _clean_token

MentionIndex = dict[str, list[tuple[tuple[str, ...], str]]]


def build_mention_index(aliases: list[str]) -> tuple[MentionIndex, list[str]]:
    """aliases → (en_index, zh_aliases). en_index maps first-token →
    candidate token tuples sorted longest-first (so the position scan is
    leftmost-longest); zh aliases (any non-ASCII alias) are matched as
    substrings."""
    en: MentionIndex = defaultdict(list)
    zh: list[str] = []
    for alias in aliases:
        if not alias:
            continue
        if alias.isascii():
            toks = tuple(alias.lower().split())
            if toks:
                en[toks[0]].append((toks, alias))
        else:
            zh.append(alias)
    for first in en:
        # longest-first, then lexicographic: fully input-order-independent
        en[first].sort(key=lambda t: (-len(t[0]), t[0]))
    return dict(en), sorted(zh)


def find_mentions(
    sentence: str, lang: str, en_index: MentionIndex, zh_aliases: list[str]
) -> list[str]:
    """All alias surfaces found in one sentence (leftmost-longest,
    non-overlapping for en; non-overlapping per-alias substring for zh).
    Returns the DICTIONARY surface form (so downstream joins hit the alias
    map exactly)."""
    if lang == "zh":
        found: list[str] = []
        for alias in zh_aliases:
            start = 0
            while True:
                ix = sentence.find(alias, start)
                if ix < 0:
                    break
                found.append(alias)
                start = ix + len(alias)
        return found
    tokens = [_clean_token(t) for t in sentence.split()]
    out: list[str] = []
    i = 0
    n = len(tokens)
    while i < n:
        hit = None
        for toks, surface in en_index.get(tokens[i], ()):
            k = len(toks)
            if i + k <= n and tuple(tokens[i : i + k]) == toks:
                hit = (k, surface)
                break  # candidates are longest-first
        if hit is None:
            i += 1
        else:
            out.append(hit[1])
            i += hit[0]
    return out
