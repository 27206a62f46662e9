"""Positive-detection gate for the LSH-bucketed embedding near-dup plan
(kgforge.queries.embedding_near_dup_pairs).

The shared embeddings fixture has no true near-dup pairs (max pairwise
cosine ≈ 0.51), so the contract query's verified set is honestly empty
there. This test builds synthetic vectors WITH planted near-dups and
asserts the bucketed plan (4 bands × 8 hyperplanes → within-bucket verify)
actually finds them: precision 1.0 by construction (exact cosine verify)
and recall near the theoretical 1-(1-(1-θ/π)^8)^4.
"""

import hashlib
import math

import pytest

from kgforge.queries import embedding_near_dup_pairs

DIM = 64
N_BASE = 40


def _unit(seed: str) -> list[float]:
    v = []
    for d in range(DIM):
        h = int.from_bytes(
            hashlib.md5(f"{seed}:{d}".encode()).digest()[:8], "big"
        )
        v.append((h / 2**63) - 1.0)
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v: list[float], seed: str, eps: float) -> list[float]:
    noise = _unit(seed)
    w = [a + eps * b for a, b in zip(v, noise)]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = []
    for i in range(N_BASE):
        base = _unit(f"base:{i}")
        rows.append((2 * i, base))
        # eps=0.1 → cosine ≈ 1/sqrt(1+eps²) ≈ 0.995 (true near-dup)
        rows.append((2 * i + 1, _perturb(base, f"p:{i}", 0.1)))
    for i in range(60):  # unrelated vectors (hash-random → cosine ~ 0)
        rows.append((1000 + i, _unit(f"other:{i}")))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_finds_planted_near_dups(emb_df):
    pairs = {
        (r["id1"], r["id2"])
        for r in embedding_near_dup_pairs(emb_df, threshold=0.95).collect()
    }
    truth = {(2 * i, 2 * i + 1) for i in range(N_BASE)}
    assert pairs <= truth, f"false positives: {pairs - truth}"
    recall = len(pairs & truth) / len(truth)
    # theory ≈ 0.99 at cos 0.995; allow LSH variance
    assert recall >= 0.85, f"recall {recall}"


def test_verified_pairs_meet_threshold(emb_df):
    rows = embedding_near_dup_pairs(emb_df, threshold=0.95).collect()
    assert rows and all(r["cos"] >= 0.95 for r in rows)


def test_plan_has_no_cartesian_on_vectors(emb_df):
    """The pair generation must be an equi-join on (band, bucket) — never a
    cartesian over the vector table. The only nested-loop join allowed is
    the constant 32×64 planes build (two spark.range cross join)."""
    df = embedding_near_dup_pairs(emb_df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "vec_id" not in line and "embedding" not in line, line
    assert "SortMergeJoin [band" in plan or "ShuffledHashJoin [band" in plan
