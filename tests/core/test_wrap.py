"""wrap_positions — the legacy ``periodic_wrap`` output option
(IO/config_parser.py:294-299) for cubic and triclinic cells."""

import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell, wrap_positions


def test_wrap_cubic():
    cell = Cell.cubic([10.0, 8.0, 6.0])
    pos = jnp.asarray([
        [11.0, -1.0, 5.0],
        [0.0, 8.0, -12.5],
        [25.0, 4.0, 6.0],
    ])
    w = np.asarray(wrap_positions(cell, pos))
    np.testing.assert_allclose(w[0], [1.0, 7.0, 5.0], atol=1e-5)
    np.testing.assert_allclose(w[1], [0.0, 0.0, 5.5], atol=1e-5)
    np.testing.assert_allclose(w[2], [5.0, 4.0, 0.0], atol=1e-5)
    lengths = np.array([10.0, 8.0, 6.0])
    assert np.all(w >= -1e-5) and np.all(w < lengths + 1e-5)


def test_wrap_is_idempotent_and_preserves_images():
    cell = Cell.cubic([10.0, 10.0, 10.0])
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(-30, 30, size=(50, 3)), jnp.float32)
    w1 = wrap_positions(cell, pos)
    w2 = wrap_positions(cell, w1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-4)
    # wrapped positions differ from the originals by integer box multiples
    shift = (np.asarray(pos) - np.asarray(w1)) / 10.0
    np.testing.assert_allclose(shift, np.round(shift), atol=1e-4)


def test_wrap_triclinic_fractional():
    vectors = [[10.0, 0.0, 0.0], [3.0, 9.0, 0.0], [0.0, 1.0, 8.0]]
    cell = Cell.triclinic(vectors)
    rng = np.random.RandomState(1)
    frac = rng.uniform(-2, 3, size=(40, 3))
    h = np.asarray(vectors).T
    pos = jnp.asarray(frac @ np.asarray(vectors), jnp.float32)
    w = np.asarray(wrap_positions(cell, pos))
    # back to fractional: all coordinates in [0, 1)
    frac_w = w @ np.linalg.inv(h).T
    assert np.all(frac_w > -1e-4) and np.all(frac_w < 1 + 1e-4)
    # and only integer image shifts were applied
    dfrac = frac - frac_w
    np.testing.assert_allclose(dfrac, np.round(dfrac), atol=1e-3)
