"""Native sweep-and-prune broadphase vs the NumPy all-pairs oracle."""
import numpy as np

from lcp_physics_tpu import native


def random_aabbs(n, rng, extent=100.0, size=3.0):
    lo = rng.uniform(0, extent, (n, 2)).astype(np.float32)
    hi = lo + rng.uniform(0.1, size, (n, 2)).astype(np.float32)
    return np.concatenate([lo, hi], axis=-1)


def test_native_builds_and_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (2, 17, 200, 1000):
        aabbs = random_aabbs(n, rng)
        got = native.sap_pairs(aabbs)
        want = native._sap_pairs_numpy(aabbs)
        np.testing.assert_array_equal(got, want)
    assert native.NATIVE_AVAILABLE, "g++ toolchain present; native must load"


def test_native_mask():
    rng = np.random.default_rng(1)
    aabbs = random_aabbs(100, rng)
    mask = rng.uniform(size=100) < 0.5
    got = native.sap_pairs(aabbs, mask=mask)
    want = native._sap_pairs_numpy(aabbs, mask=mask)
    np.testing.assert_array_equal(got, want)


def test_capacity_overflow_retry():
    # every box overlaps every other: K = n(n-1)/2 >> default cap
    n = 64
    aabbs = np.tile(np.array([[0, 0, 1, 1]], np.float32), (n, 1))
    got = native.sap_pairs(aabbs, cap=8)
    assert got.shape == (n * (n - 1) // 2, 2)


def test_no_overlaps():
    aabbs = np.array([[0, 0, 1, 1], [5, 5, 6, 6]], np.float32)
    assert native.sap_pairs(aabbs).shape == (0, 2)
