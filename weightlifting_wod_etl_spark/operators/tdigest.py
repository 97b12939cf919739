"""Mergeable equi-weight centroid digest (t-digest-style) for quantiles.

Exact percentiles (operators/percentile.py) shuffle one row per DISTINCT
value — the right default when the value domain is bounded (integer
cents), but at 100 TB of raw doubles the at-scale default is a mergeable
sketch: each task compresses its slice into ≤K (mean, weight) centroids,
only centroids cross the wire, and a final per-group merge re-compresses
≤K·tasks centroids into one digest. Shuffle volume is O(groups · tasks ·
K) — independent of row count.

This is the t-digest architecture with a UNIFORM scale function: centroid
capacity is total_weight/K everywhere rather than tighter at the tails,
which bounds the rank error of any quantile estimate by ~1/K per
compression level (build + merge ≈ 2/K total; K=128 ⇒ ≲1.6%). A tail-
weighted scale function would sharpen extreme quantiles; the uniform one
keeps the error bound uniform across q, which is what the band-check
oracle verifies.

``make_digest_fns`` returns NESTED functions on purpose: worker-side
closures (mapInPandas / applyInPandas) must be self-contained because the
repo is not importable on Spark's Python workers (the driver adds it to
sys.path dynamically). cloudpickle ships nested functions by value, so
queries capture the factory's products and the single implementation
serves driver-side tests and worker-side execution alike.
"""

from __future__ import annotations

DEFAULT_K = 128


def make_digest_fns(k: int = DEFAULT_K):
    """Build (build_digest, merge_digests, digest_quantile) closures.

    All three operate on (means, weights) numpy-array pairs and are
    deterministic given input sorted by mean (values are sorted before
    chunking; equal values are interchangeable, so tie order never
    changes the result).
    """
    import numpy as np

    def _compress(means, weights):
        # Pack sorted-by-mean centroids into <=k equi-weight centroids by
        # cumulative-weight boundary: an input starting at cumulative
        # weight c belongs to chunk floor(c/cap). Since every input
        # starts strictly below total, chunk indices stay in [0, k-1] —
        # a hard <=k guarantee (a greedy close-on-overflow pack can emit
        # k+1 chunks on unit weights). Fully vectorized: build_digest
        # runs per Arrow batch in the executor hot path, where a
        # per-element Python loop would dominate digest build time.
        weights = np.asarray(weights, dtype=np.float64)
        means = np.asarray(means, dtype=np.float64)
        total = float(weights.sum())
        if total == 0.0:
            return np.empty(0), np.empty(0)
        cap = total / k
        cum_before = np.cumsum(weights) - weights
        idx = np.minimum((cum_before / cap).astype(np.int64), k - 1)
        starts = np.flatnonzero(np.diff(idx, prepend=idx[0] - 1))
        out_w = np.add.reduceat(weights, starts)
        out_m = np.add.reduceat(means * weights, starts) / out_w
        return out_m, out_w

    def build_digest(values):
        """Digest a raw value array: sort, compress unit-weight points.

        NaN is dropped HERE, not by caller convention (review r11): kept,
        it sorts last, counts as real mass, and smears NaN through every
        merged tail-centroid mean — silent garbage quantiles."""
        v = np.asarray(values, dtype=np.float64)
        v = np.sort(v[~np.isnan(v)])
        return _compress(v, np.ones_like(v))

    def merge_digests(parts):
        """Merge [(means, weights), ...]: concat, stable-sort by mean,
        re-compress. Input order only matters for exact-mean ties."""
        if not parts:  # np.concatenate([]) raises; empty merge = empty digest
            return np.array([]), np.array([])
        means = np.concatenate([p[0] for p in parts])
        weights = np.concatenate([p[1] for p in parts])
        order = np.argsort(means, kind="stable")
        return _compress(means[order], weights[order])

    def digest_quantile(means, weights, q):
        """Estimate the q-quantile: centroid i anchors at the midpoint of
        its cumulative-weight span; linear interpolation between anchors."""
        if means.size == 0 or np.isnan(q):
            # NaN q fails both band guards below and searchsorted returns
            # len(anchors) — an IndexError in an executor task; answer
            # NaN like the empty-digest path instead
            return float("nan")
        if means.size == 1:
            return float(means[0])
        cum = np.cumsum(weights)
        total = cum[-1]
        anchors = (cum - weights / 2.0) / total
        target = min(max(q, 0.0), 1.0)
        if target <= anchors[0]:
            return float(means[0])
        if target >= anchors[-1]:
            return float(means[-1])
        hi = int(np.searchsorted(anchors, target))
        lo = hi - 1
        frac = (target - anchors[lo]) / (anchors[hi] - anchors[lo])
        return float(means[lo] + frac * (means[hi] - means[lo]))

    return build_digest, merge_digests, digest_quantile


# Driver-side convenience API (tests, interactive use).
def build_digest(values, k: int = DEFAULT_K):
    return make_digest_fns(k)[0](values)


def merge_digests(parts, k: int = DEFAULT_K):
    return make_digest_fns(k)[1](parts)


def digest_quantile(means, weights, q: float, k: int = DEFAULT_K) -> float:
    return make_digest_fns(k)[2](means, weights, q)
