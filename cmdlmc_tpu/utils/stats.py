"""Streaming statistics utilities.

Welford online mean/variance (the reference's ``online_variance_generator``,
misc/tools.py:18-54, recast as an explicit-state accumulator usable both on
host and inside jitted code) plus simple chunk helpers (misc/tools.py:57-94).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["count", "mean", "m2"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Welford:
    """Online mean/variance accumulator; works elementwise on any shape."""

    count: Array
    mean: Array
    m2: Array

    @classmethod
    def init(cls, shape=(), dtype=jnp.float32) -> "Welford":
        z = jnp.zeros(shape, dtype)
        return cls(count=jnp.zeros(shape, jnp.int32), mean=z, m2=z)

    def update(self, x: Array, mask: Array | bool = True) -> "Welford":
        m = jnp.asarray(mask)
        count = self.count + m.astype(jnp.int32)
        safe = jnp.maximum(count, 1)
        delta = x - self.mean
        mean = jnp.where(m, self.mean + delta / safe, self.mean)
        m2 = jnp.where(m, self.m2 + delta * (x - mean), self.m2)
        return Welford(count=count, mean=mean, m2=m2)

    @property
    def variance(self) -> Array:
        return jnp.where(self.count < 2, jnp.nan, self.m2 / (self.count - 1))


def chunk(iterable, chunk_size, length=None):
    """(start, stop, slice) triples over a sliceable (misc/tools.py:57-66)."""
    assert chunk_size > 0
    if length is None:
        length = len(iterable)
    for start in range(0, length, chunk_size):
        stop = min(start + chunk_size, length)
        yield start, stop, iterable[start:stop]


def excess_proton_msd(
    positions: np.ndarray,
    interval_length: int,
    interval_delta: int,
    pbc,
    periodic: bool = True,
) -> np.ndarray:
    """Sliding-window MSD of a single tracked position with PBC unwrapping —
    the reference's numba kernel (LMC/average_MC_out.py:251-273), vectorized.

    positions: [T, 3]; returns msds [n_intervals, interval_length, 3].
    """
    positions = np.asarray(positions, dtype=np.float64)
    pbc = np.asarray(pbc, dtype=np.float64)
    diffs = np.diff(positions, axis=0)  # [T-1, 3]
    if periodic:
        diffs -= pbc * np.round(diffs / pbc)
    T = positions.shape[0]
    if T == interval_length:
        n_intervals = 1
    else:
        n_intervals = (T - interval_length) // interval_delta
    msds = np.zeros((n_intervals, interval_length, 3))
    for i in range(n_intervals):
        start = i * interval_delta
        seg = diffs[start : start + interval_length - 1]
        disp = np.concatenate([np.zeros((1, 3)), np.cumsum(seg, axis=0)])
        msds[i] = disp**2
    return msds
