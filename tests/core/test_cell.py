"""Oracle tests for the periodic-cell geometry, ported from the reference's analytic
AtomBox cases (tests/cython_exts/LMC/test_AtomBox.py:12-226)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core import (
    Cell,
    angle,
    displacement,
    distance,
    extended_positions,
    minimum_image,
    next_neighbor,
    pairwise_distances,
)

np.random.seed(0)


@pytest.fixture(scope="module")
def cubic():
    return Cell.cubic([10.0, 10.0, 10.0])


@pytest.fixture(scope="module")
def triclinic_as_cubic():
    # Same box expressed as general cell vectors: results must agree with cubic
    # (reference cross-check, test_AtomBox.py:143-159).
    return Cell.triclinic([10, 0, 0, 0, 10, 0, 0, 0, 10])


def test_cubic_length_across_images(cubic):
    a1 = np.zeros(3)
    a2 = np.array([6.0, 6.0, 6.0])
    want = np.sqrt(np.sum(np.array([4.0, 4.0, 4.0]) ** 2))
    for i in range(-5, 5):
        got = distance(cubic, a1, a2 + i * 10.0)
        assert float(got) == pytest.approx(want, rel=1e-5)


def test_cubic_length_vectorized(cubic):
    a1 = np.zeros((20, 3))
    a2 = np.arange(-10, 10)[:, None] * np.array([10.0, 10.0, 10.0]) + 3
    got = distance(cubic, a1, a2)
    np.testing.assert_allclose(got, np.full(20, np.sqrt(27.0)), rtol=1e-5)


def test_cubic_distance_sign_convention(cubic):
    # distance(a1, a2) = minimum image of a2 - a1 (test_AtomBox.py:38-57)
    got = displacement(cubic, np.zeros(3), np.array([6.0, 6.0, 6.0]))
    np.testing.assert_allclose(got, [-4.0, -4.0, -4.0], rtol=1e-6)

    a2 = np.array([[1.0, 1, 1], [2, 2, 2], [3, 3, 3]])
    got = displacement(cubic, np.zeros((3, 3)), a2)
    np.testing.assert_allclose(got, a2, rtol=1e-6)


def test_cubic_right_angle(cubic):
    a1 = np.array([1.0, 0, 0])
    vertex = np.zeros(3)
    a3 = np.array([0.0, 1, 0])
    assert float(angle(cubic, a1, vertex, a3)) == pytest.approx(np.pi / 2, rel=1e-6)
    # Across the periodic boundary
    a3_shifted = a3 + np.array([0.0, 10.0, 0.0])
    assert float(angle(cubic, a1, vertex, a3_shifted)) == pytest.approx(
        np.pi / 2, rel=1e-6
    )


def test_angle_collinear_is_safe(cubic):
    # arccos argument must be clipped: collinear vectors give exactly 0 / pi.
    a1 = np.array([1.0, 0, 0])
    vertex = np.zeros(3)
    assert float(angle(cubic, a1, vertex, a1)) == pytest.approx(0.0, abs=1e-4)
    assert float(angle(cubic, a1, vertex, -a1)) == pytest.approx(np.pi, rel=1e-5)


def test_next_neighbor_vs_numpy_oracle(cubic):
    # (test_AtomBox.py:66-75)
    for _ in range(5):
        pos = np.random.uniform(0, 10, size=3).astype(np.float32)
        others = np.random.uniform(0, 10, size=(50, 3)).astype(np.float32)
        idx, dist_ = next_neighbor(cubic, jnp.asarray(pos), jnp.asarray(others))
        diffs = others - pos
        diffs -= 10.0 * np.round(diffs / 10.0)
        want = np.argmin(np.sqrt((diffs**2).sum(axis=1)))
        assert int(idx) == want


def test_cubic_equals_triclinic(cubic, triclinic_as_cubic):
    # Identical box vectors => identical results (test_AtomBox.py:143-159)
    a = np.random.uniform(-20, 20, size=(30, 3)).astype(np.float32)
    b = np.random.uniform(-20, 20, size=(30, 3)).astype(np.float32)
    np.testing.assert_allclose(
        distance(cubic, a, b), distance(triclinic_as_cubic, a, b), rtol=2e-4, atol=1e-4
    )


def test_all_to_all_matrix(cubic):
    # Hand table (test_AtomBox.py:161-174 style)
    a = np.array([[0.0, 0, 0], [9.0, 0, 0]])
    b = np.array([[1.0, 0, 0], [5.0, 0, 0], [9.5, 0, 0]])
    want = np.array([[1.0, 5.0, 0.5], [2.0, 4.0, 0.5]])
    np.testing.assert_allclose(pairwise_distances(cubic, a, b), want, atol=1e-5)


def test_triclinic_sheared_minimum_image():
    # A genuinely non-orthogonal cell: the naive round-based wrap is not optimal
    # for strongly sheared cells; the 27-image search must find the shorter vector.
    cell = Cell.triclinic([[10, 0, 0], [9, 5, 0], [0, 0, 10]])
    d = minimum_image(cell, jnp.asarray([9.0, 4.0, 0.0]))
    # candidates: (9,4,0), (-1,4,0)-... brute force over many images:
    base = np.array([9.0, 4.0, 0.0])
    h = np.array([[10, 9, 0], [0, 5, 0], [0, 0, 10]], dtype=float)  # columns
    best = min(
        np.linalg.norm(base + h @ np.array([i, j, k], dtype=float))
        for i in range(-3, 4)
        for j in range(-3, 4)
        for k in range(-3, 4)
    )
    assert float(jnp.linalg.norm(d)) == pytest.approx(best, rel=1e-5)


def test_extended_positions_match_reference_indexing():
    # Extended-box positions for multipliers (test_AtomBox.py:77-120): index order is
    # box-major with row-major (i, j, k) decomposition, atoms contiguous per box.
    v = np.diag([10.0, 10.0, 10.0]).astype(np.float32)
    pos = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
    ext = np.asarray(extended_positions(v, jnp.asarray(pos), (2, 1, 3)))
    assert ext.shape == (12, 3)
    n_atoms = 2
    my, mz = 1, 3
    for index in range(12):
        box_index, atom_index = divmod(index, n_atoms)
        i = box_index // (my * mz)
        j = (box_index // mz) % my
        k = box_index % mz
        want = pos[atom_index] + i * v[0] + j * v[1] + k * v[2]
        np.testing.assert_allclose(ext[index], want, rtol=1e-6)


def test_minimum_image_gradient_safe(cubic):
    import jax

    g = jax.grad(lambda x: distance(cubic, x, jnp.ones(3) * 6.0))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
