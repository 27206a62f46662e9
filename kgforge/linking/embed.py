"""Seed-stable character-n-gram hashing embeddings + cosine similarity.

Pure numpy, no model artifacts: each padded char 3-gram hashes (md5, fixed
seed string) to a signed slot in a D-dim vector — the classic feature-
hashing trick, deterministic across processes/partitions/runs (no
PYTHONHASHSEED exposure). Used by entity linking to disambiguate alias
collisions (SURVEY.md §2.11 "Entity linking").
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 256
_SEED = "kgforge-embed-v1"


def _gram_slot(gram: str) -> tuple[int, float]:
    h = int.from_bytes(
        hashlib.md5((_SEED + gram).encode("utf-8")).digest()[:8], "big"
    )
    return h % DIM, 1.0 if (h >> 62) & 1 else -1.0


def embed(text: str, dim: int = DIM) -> np.ndarray:
    """L2-normalized char-3gram hashing embedding of ``text``."""
    v = np.zeros(dim, dtype=np.float64)
    padded = f" {text.lower()} "
    for i in range(len(padded) - 2):
        slot, sign = _gram_slot(padded[i : i + 3])
        v[slot] += sign
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b))


def embed_many(texts: list[str], dim: int = DIM) -> np.ndarray:
    """(n, dim) matrix of embeddings — batch form for Arrow-batched UDFs."""
    return np.stack([embed(t, dim) for t in texts]) if texts else np.zeros((0, dim))
