"""ThetaSketch (KMV) accuracy, exactness-below-capacity, set-operation
estimators, and exact partitioning invariance (the UDAF contract)."""

import numpy as np
import pytest

from pprl_ray.sketches import ThetaSketch


def _distinct_stream(n_distinct, reps=3, seed=11):
    rng = np.random.default_rng(seed)
    vals = rng.choice(2**50, size=n_distinct, replace=False)
    return rng.permutation(np.repeat(vals, reps)), vals


def test_exact_below_capacity():
    stream, vals = _distinct_stream(1000)
    sk = ThetaSketch(k=4096)
    sk.update(stream)
    assert sk.is_exact()
    assert sk.estimate() == len(vals)


def test_estimate_within_published_bound():
    """RSE ~ 1/sqrt(k-2); check within 4 sigma at several cardinalities."""
    for n, seed in ((50_000, 1), (200_000, 2), (1_000_000, 3)):
        rng = np.random.default_rng(seed)
        vals = rng.choice(2**62, size=n, replace=False)
        sk = ThetaSketch(k=4096, seed=seed)
        # feed in chunks to exercise the threshold path
        for chunk in np.array_split(vals, 7):
            sk.update(chunk)
        assert not sk.is_exact()
        rel = abs(sk.estimate() - n) / n
        assert rel < 4 * sk.relative_error_bound(), (n, rel)


def test_exact_partitioning_invariance_matches_single_pass():
    """With the "cut only when len > k" rule the merged state must be
    bit-identical to the single-pass sketch for ANY partitioning/order."""
    stream, _ = _distinct_stream(30_000, reps=2)
    single = ThetaSketch(k=512)
    single.update(stream)
    rng = np.random.default_rng(0)
    for n_parts in (2, 8, 31):
        assign = rng.integers(0, n_parts, len(stream))
        parts = [stream[assign == p] for p in range(n_parts)]
        order = rng.permutation(n_parts)
        acc = None
        for p in order:
            sk = ThetaSketch(k=512)
            sk.update(parts[p])
            acc = sk if acc is None else acc.merge(sk)
        assert acc.to_bytes() == single.to_bytes(), n_parts


def test_boundary_exactly_k_distinct():
    _, vals = _distinct_stream(256, reps=1)
    single = ThetaSketch(k=256)
    single.update(vals)
    assert single.is_exact() and single.estimate() == 256
    a, b = ThetaSketch(k=256), ThetaSketch(k=256)
    a.update(vals[:100])
    b.update(vals[100:])
    assert a.merge(b).to_bytes() == single.to_bytes()


def test_set_operations_exact_mode():
    """Below capacity the union/intersection/Jaccard estimators are exact."""
    a_vals = np.arange(0, 600, dtype=np.int64)
    b_vals = np.arange(400, 900, dtype=np.int64)  # overlap 200
    a, b = ThetaSketch(k=4096), ThetaSketch(k=4096)
    a.update(a_vals)
    b.update(b_vals)
    assert a.union_estimate(b) == 900
    assert a.intersection_estimate(b) == 200
    assert a.jaccard_estimate(b) == pytest.approx(200 / 900)


def test_set_operations_estimation_mode():
    n, overlap = 300_000, 120_000
    rng = np.random.default_rng(42)
    universe = rng.choice(2**62, size=2 * n - overlap, replace=False)
    a_vals, b_vals = universe[:n], universe[n - overlap :]
    a, b = ThetaSketch(k=8192), ThetaSketch(k=8192)
    a.update(a_vals)
    b.update(b_vals)
    union_true = 2 * n - overlap
    jac_true = overlap / union_true
    # intersection RSE degrades by ~1/sqrt(jaccard) vs the base bound
    assert abs(a.union_estimate(b) - union_true) / union_true < 0.05
    assert abs(a.intersection_estimate(b) - overlap) / overlap < 0.10
    assert abs(a.jaccard_estimate(b) - jac_true) / jac_true < 0.10


def test_disjoint_intersection_zero():
    a, b = ThetaSketch(k=64), ThetaSketch(k=64)
    a.update(np.arange(0, 10_000, dtype=np.int64))
    b.update(np.arange(1_000_000, 1_010_000, dtype=np.int64))
    assert a.intersection_estimate(b) == 0.0
    assert a.jaccard_estimate(b) == 0.0


def test_empty_sketch():
    sk = ThetaSketch(k=64)
    assert sk.estimate() == 0.0 and sk.is_exact()
    other = ThetaSketch(k=64)
    other.update(np.arange(5, dtype=np.int64))
    assert sk.merge(other).estimate() == 5.0


def test_difference_estimate_exact_and_sampled():
    import numpy as np

    from pprl_ray.sketches import ThetaSketch

    # exact regime: below capacity the A-NOT-B count is exact
    a, b = ThetaSketch(4096), ThetaSketch(4096)
    a.update(np.arange(0, 1000))
    b.update(np.arange(400, 1400))
    assert a.difference_estimate(b) == 400.0
    assert b.difference_estimate(a) == 400.0
    # degenerate: self-difference is zero
    assert a.difference_estimate(a) == 0.0

    # sampled regime: within ~3/sqrt(k-2) relative error of the truth
    big_a, big_b = ThetaSketch(1024), ThetaSketch(1024)
    big_a.update(np.arange(0, 200_000))
    big_b.update(np.arange(120_000, 320_000))
    est = big_a.difference_estimate(big_b)
    assert abs(est - 120_000) / 120_000 < 3 / (1022) ** 0.5
