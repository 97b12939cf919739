"""Property tests for the mergeable centroid digest (operators/tdigest.py).

The band-check oracle (queries/sketches.py) only proves the digest works
on the driver testdata; these pin the algorithmic guarantees the band
math relies on: bounded rank error, exact mass conservation, merge ≈
whole, and determinism of the pure core.
"""

from __future__ import annotations

import numpy as np
import pytest

from weightlifting_wod_etl_spark.operators.tdigest import (
    DEFAULT_K,
    build_digest,
    digest_quantile,
    merge_digests,
)


def _rank_of(values: np.ndarray, x: float) -> float:
    """Empirical CDF position of x in values (midpoint convention)."""
    lo = np.searchsorted(np.sort(values), x, side="left")
    hi = np.searchsorted(np.sort(values), x, side="right")
    return ((lo + hi) / 2.0) / len(values)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_rank_error_within_bound(dist):
    rng = np.random.default_rng(42)
    if dist == "uniform":
        v = rng.uniform(0, 1000, 20000)
    elif dist == "lognormal":
        v = rng.lognormal(3.0, 1.5, 20000)
    else:
        v = np.concatenate(
            [rng.normal(10, 1, 10000), rng.normal(1000, 50, 10000)]
        )
    m, w = build_digest(v)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        est = digest_quantile(m, w, q)
        # one compression level => rank error well under 2/K
        assert abs(_rank_of(v, est) - q) <= 2.0 / DEFAULT_K, (dist, q)


def test_mass_conserved_exactly():
    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, 54321)
    m, w = build_digest(v)
    assert len(m) <= DEFAULT_K
    # unit weights sum exactly in float64 below 2^53
    assert float(w.sum()) == 54321.0


def test_merge_matches_whole_within_bound():
    """Digesting 8 chunks and merging must answer like one digest of the
    whole stream — two compression levels, so error <= ~2/K + 1/K."""
    rng = np.random.default_rng(99)
    v = rng.lognormal(2.0, 1.0, 40000)
    chunks = np.array_split(v, 8)
    merged_m, merged_w = merge_digests([build_digest(c) for c in chunks])
    assert len(merged_m) <= DEFAULT_K
    assert float(merged_w.sum()) == 40000.0
    for q in (0.1, 0.5, 0.9):
        est = digest_quantile(merged_m, merged_w, q)
        assert abs(_rank_of(v, est) - q) <= 3.0 / DEFAULT_K, q


def test_deterministic_under_value_permutation():
    """Same multiset, any input order -> bit-identical digest (values are
    sorted before chunking)."""
    rng = np.random.default_rng(5)
    v = rng.uniform(0, 100, 9999)
    m1, w1 = build_digest(v)
    m2, w2 = build_digest(v[rng.permutation(len(v))])
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(w1, w2)


def test_single_and_empty_inputs():
    m, w = build_digest(np.array([3.5]))
    assert digest_quantile(m, w, 0.5) == 3.5
    m0, w0 = build_digest(np.array([]))
    assert m0.size == 0 and np.isnan(digest_quantile(m0, w0, 0.5))


def test_merge_digests_empty_list_returns_empty_digest(spark):
    """Review r10: np.concatenate([]) raises ValueError; merging zero
    digests must return the empty digest (quantile of it is NaN), matching
    digest_quantile's documented empty handling."""
    import math

    from weightlifting_wod_etl_spark.operators.tdigest import (
        digest_quantile,
        merge_digests,
    )

    means, weights = merge_digests([])
    assert len(means) == 0 and len(weights) == 0
    assert math.isnan(digest_quantile(means, weights, 0.5))


def test_build_digest_drops_nan_mass():
    """Review r11: NaN values were digested as real mass — NaN-mean tail
    centroids, inflated weight, NaN upper quantiles. build_digest drops
    them itself now, not by caller convention."""
    import math

    import numpy as np

    from weightlifting_wod_etl_spark.operators.tdigest import make_digest_fns

    build_digest, merge_digests, digest_quantile = make_digest_fns(32)
    m, w = build_digest(np.array([1.0, 2.0, float("nan"), 3.0]))
    assert float(w.sum()) == 3.0  # NaN carried no mass
    assert not any(math.isnan(x) for x in m)
    assert digest_quantile(m, w, 0.5) == 2.0  # true median of valid values
    assert not math.isnan(digest_quantile(m, w, 1.0))
