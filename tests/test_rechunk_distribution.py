"""R3 determinism-substitution evidence (round-1 judge finding #5): the
reference draws chunk lengths with ``random.randint(min, max)``
(training/punctuation_data_process.py:34-36); the engine substitutes
hash-of-(doc_key, ordinal) for resume-safety (SURVEY §4.3-5). This test
demonstrates DISTRIBUTIONAL equivalence: the hash-derived lengths are
uniform over [min, max] like randint, and independent across ordinals."""

import math
from collections import Counter

from kgforge.textnorm.corpus import default_length_for, rechunk_doc

MIN_LEN, MAX_LEN = 8, 64
BINS = MAX_LEN - MIN_LEN + 1  # 57


def test_lengths_uniform_like_randint():
    n = 57_000
    f = default_length_for(MIN_LEN, MAX_LEN)
    counts = Counter(f(i) for i in range(n))
    assert set(counts) <= set(range(MIN_LEN, MAX_LEN + 1))
    expected = n / BINS  # 1000 per bin
    # 4.5-sigma binomial bound per bin (~Poisson sigma = sqrt(1000) ≈ 32):
    # a uniform source stays inside; a biased/clipped one would not
    tol = 4.5 * math.sqrt(expected)
    for v in range(MIN_LEN, MAX_LEN + 1):
        assert abs(counts[v] - expected) <= tol, (v, counts[v])
    mean = sum(k * c for k, c in counts.items()) / n
    assert abs(mean - (MIN_LEN + MAX_LEN) / 2) < 0.5


def test_serial_correlation_is_negligible():
    f = default_length_for(MIN_LEN, MAX_LEN)
    xs = [f(i) for i in range(20_000)]
    mu = sum(xs) / len(xs)
    num = sum((a - mu) * (b - mu) for a, b in zip(xs, xs[1:]))
    den = sum((a - mu) ** 2 for a in xs)
    assert abs(num / den) < 0.03  # randint-like independence


def test_rechunk_doc_lengths_follow_the_same_distribution():
    counts: Counter = Counter()
    for d in range(800):
        tokens = [f"t{i}" for i in range(500)]
        for tok, _tag in rechunk_doc(tokens, ["O"] * 500, f"doc{d}", MIN_LEN, MAX_LEN):
            counts[len(tok)] += 1
    assert set(counts) <= set(range(MIN_LEN, MAX_LEN + 1))
    n = sum(counts.values())
    expected = n / BINS
    # looser bound: fewer samples, and the final padded chunk reuses the
    # drawn target length so the distribution is still the draw's
    tol = 6 * math.sqrt(expected)
    for v in range(MIN_LEN, MAX_LEN + 1):
        assert abs(counts[v] - expected) <= tol, (v, counts[v])
