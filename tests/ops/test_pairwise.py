"""Pallas pairwise-distance kernel vs the XLA implementation (interpret mode on
CPU — the same kernel code compiles for TPU)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell, pairwise_distances
from cmdlmc_tpu.ops.pairwise import _pairwise_cubic_pallas, pairwise_distance_matrix


@pytest.mark.parametrize("n", [64, 128, 200, 300])
def test_pallas_matches_xla(n):
    rng = np.random.RandomState(n)
    pos = rng.uniform(-15, 25, size=(n, 3)).astype(np.float32)
    cell = Cell.cubic([17.0, 11.0, 23.0])
    want = np.asarray(pairwise_distances(cell, jnp.asarray(pos), jnp.asarray(pos)))
    got = np.asarray(
        _pairwise_cubic_pallas(jnp.asarray(pos), jnp.diagonal(cell.h), interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dispatch_forced(monkeypatch):
    monkeypatch.setenv("CMDLMC_FORCE_PALLAS", "1")
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 10, size=(50, 3)).astype(np.float32)
    cell = Cell.cubic([10.0, 10.0, 10.0])
    got = np.asarray(pairwise_distance_matrix(cell, jnp.asarray(pos)))
    want = np.asarray(pairwise_distances(cell, jnp.asarray(pos), jnp.asarray(pos)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dispatch_triclinic_falls_back():
    cell = Cell.triclinic([[10, 0, 0], [3, 9, 0], [0, 0, 8]])
    rng = np.random.RandomState(1)
    pos = rng.uniform(0, 8, size=(20, 3)).astype(np.float32)
    os.environ["CMDLMC_FORCE_PALLAS"] = "1"
    try:
        got = np.asarray(pairwise_distance_matrix(cell, jnp.asarray(pos)))
    finally:
        del os.environ["CMDLMC_FORCE_PALLAS"]
    want = np.asarray(pairwise_distances(cell, jnp.asarray(pos), jnp.asarray(pos)))
    np.testing.assert_allclose(got, want, atol=2e-4)
