"""Embedding-based fuzzy linking for mentions with no exact alias match
(the north star's "ANN candidate scoring in mapInPandas": dictionary
linking first, embedding scoring for the misses).

An unmatched mention (e.g. an extractor span with trailing context —
"global dynamics 7 yesterday") is embedded with the same char-3-gram
hashing embedding as the dictionary (kgforge.linking.embed) and scored
against every alias embedding; the best alias wins if cosine ≥ threshold,
else the mention stays a self-entity. The dictionary is bounded (same
broadcast assumption as all linking joins), so per-batch scoring is a
dense (n_alias × dim) product — at dictionary sizes where that stops
holding, swap the scorer for the IVF/LSH bucket routing already built in
kgforge.queries (q_ivf_ann_topk / q_lsh_bucketed_ann patterns).

DETERMINISM: scoring uses ``np.einsum(..., optimize=False)`` — numpy's
sequential C loops, never threaded BLAS — so executor batches and the
off-Spark oracle twin produce bitwise-identical scores.
"""

from __future__ import annotations

import numpy as np

from kgforge.linking.embed import embed_many

DEFAULT_THRESHOLD = 0.5


def build_alias_matrix(
    alias_surfaces: list[str],
) -> tuple[list[str], np.ndarray]:
    """Deduped, sorted alias surfaces + their (n, dim) embedding matrix.
    Sorting makes argmax tie-breaks input-order independent."""
    surfaces = sorted(set(alias_surfaces))
    return surfaces, embed_many(surfaces)


def fuzzy_link_batch(
    mentions: list[str],
    surfaces: list[str],
    alias_mat: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
) -> list[tuple[str | None, float]]:
    """For each mention: (best alias surface or None, rounded cosine).
    Embeddings are L2-normalized so the dot IS the cosine. Ties broken by
    first (lexicographically smallest) alias via argmax over the sorted
    matrix."""
    if not mentions:
        return []
    m = embed_many(list(mentions))
    out: list[tuple[str | None, float]] = []
    for i in range(len(mentions)):
        scores = np.einsum("ij,j->i", alias_mat, m[i], optimize=False)
        best = int(np.argmax(scores))
        score = float(scores[best])
        if score >= threshold:
            out.append((surfaces[best], round(score, 6)))
        else:
            out.append((None, round(score, 6)))
    return out
