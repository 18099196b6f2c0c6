"""Statistical quality of the kernel's counter-based hash RNG (the helpers are
plain jnp, testable outside the kernel): uniform moments, bit balance, lag and
cross-stream decorrelation, determinism."""

import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.ops.kmc_sweep import _mix_key, _u01


def draws(seed, tile, frame, ev, salt, shape=(64, 256)):
    key = _mix_key(seed, jnp.int32(tile), jnp.int32(frame), ev, salt)
    return np.asarray(_u01(key, shape))


def test_uniform_moments():
    u = np.concatenate([draws(1, t, f, 0, 1).ravel()
                        for t in range(3) for f in range(3)])
    n = u.size
    assert abs(u.mean() - 0.5) < 4 / np.sqrt(12 * n)
    assert abs(u.var() - 1 / 12) < 0.002
    assert u.min() > 0 and u.max() < 1
    # uniformity across deciles
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    chi2 = ((hist - n / 10) ** 2 / (n / 10)).sum()
    assert chi2 < 35  # dof 9, p ~ 5e-5 bound


def test_lag_and_cross_correlations():
    a = draws(1, 0, 100, 0, 1).ravel()
    # lag-1 within a draw
    r = np.corrcoef(a[:-1], a[1:])[0, 1]
    assert abs(r) < 0.03
    # across frames (successive keys)
    b = draws(1, 0, 101, 0, 1).ravel()
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.03
    # across salts (time draw vs selection draw of same event)
    c = draws(1, 0, 100, 0, 3).ravel()
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.03
    # across tiles
    d = draws(1, 1, 100, 0, 1).ravel()
    assert abs(np.corrcoef(a, d)[0, 1]) < 0.03


def test_determinism_and_seed_sensitivity():
    a1 = draws(7, 2, 5, 1, 2)
    a2 = draws(7, 2, 5, 1, 2)
    np.testing.assert_array_equal(a1, a2)
    b = draws(8, 2, 5, 1, 2)
    assert np.mean(np.abs(a1 - b) < 1e-7) < 0.01
