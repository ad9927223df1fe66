"""MinHash kernel property tests (no Spark needed).

Regression for a real bug: a (a·h+b) mod p family with p >> max(h) is
near-monotonic in h, so per-function minima collapse onto the globally
smallest base hash and sig agreement no longer estimates Jaccard. The
splitmix64-mix family must satisfy E[agreement] ≈ J within tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

from sequential_query_expansion_spark.operators.dedup import (
    _base_hash,
    _hash_seeds,
    _mix64,
)

SEEDS = _hash_seeds(256, 42)


def _sig(items):
    base = np.fromiter(
        (_base_hash(x) for x in items), dtype=np.uint64, count=len(items)
    )
    return _mix64(base[None, :] ^ SEEDS[:, None]).min(axis=1)


@pytest.mark.parametrize("overlap,expected", [(0, 0.0), (50, 1 / 3), (90, 9 / 11), (100, 1.0)])
def test_agreement_estimates_jaccard(overlap, expected):
    a = [f"a{i}" for i in range(100)]
    b = [f"a{i}" for i in range(overlap)] + [f"b{i}" for i in range(100 - overlap)]
    agree = float((_sig(a) == _sig(b)).mean())
    assert agree == pytest.approx(expected, abs=0.12)


def test_near_dup_band_recall():
    """j≈0.99 pair must collide in ≥1 of 32 4-row bands (the LSH recall
    the minhash_dedup oracle equivalence depends on)."""
    a = [f"s{i}" for i in range(89)]
    b = a[:88] + ["unique"]
    agree = _sig(a)[:128] == _sig(b)[:128]
    bands_hit = sum(agree[i * 4:(i + 1) * 4].all() for i in range(32))
    assert bands_hit >= 1


def test_min_not_dominated_by_smallest_base():
    """Adversarial shape from the bug: one set owns the globally smallest
    base hash; agreement must still track Jaccard, not collapse."""
    shared = [f"sh{i}" for i in range(99)]
    # find a string with a very small base hash to plant in only one set
    cands = [(f"probe{i}", _base_hash(f"probe{i}")) for i in range(5000)]
    small = min(cands, key=lambda x: x[1])[0]
    a = shared
    b = shared + [small]
    agree = float((_sig(a) == _sig(b)).mean())
    assert agree == pytest.approx(99 / 100, abs=0.05)
