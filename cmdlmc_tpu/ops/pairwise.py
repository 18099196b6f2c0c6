"""Tiled Pallas TPU kernel for periodic pairwise distance matrices.

The all-to-all minimum-image distance matrix is the geometry hot loop of the
whole scheme (the reference's O(N^2) Cython pair scan, PBCHelper.pyx:88-95 /
topo/topology.py:55-72). For the small cells of the integration tests XLA's
fused broadcast is fine; for supercells (box_multiplier, N in the thousands)
this kernel computes the [N, N] matrix tile by tile in VMEM with no [N, N, 3]
intermediate: per 128x128 tile it streams three outer differences, applies the
closed-form cubic minimum image and accumulates squared distance in registers.

Only orthorhombic cells take this path (triclinic needs the 27-image search and
falls back to the XLA implementation in core.cell).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.core.cell import Cell, pairwise_distances as xla_pairwise

Array = jax.Array

TILE = 128


def _dist_kernel(row_ref, colt_ref, box_ref, out_ref):
    """One [TILE, TILE] tile of squared minimum-image distances.

    row_ref:  [TILE, 3] positions of the row atoms
    colt_ref: [3, TILE] transposed positions of the column atoms
    box_ref:  [1, 3] box lengths (SMEM)
    """
    acc = jnp.zeros(out_ref.shape, dtype=jnp.float32)
    for d in range(3):
        delta = row_ref[:, d : d + 1] - colt_ref[d : d + 1, :]  # [T, T]
        box = box_ref[0, d]
        delta = delta - box * jnp.round(delta / box)
        acc += delta * delta
    out_ref[:, :] = jnp.sqrt(acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pairwise_cubic_pallas(positions: Array, box_lengths: Array, *, interpret: bool):
    n = positions.shape[0]
    grid = (pl.cdiv(n, TILE), pl.cdiv(n, TILE))
    positions = positions.astype(jnp.float32)
    post = positions.T  # [3, N]
    box = box_lengths.reshape(1, 3).astype(jnp.float32)

    return pl.pallas_call(
        _dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(positions, post, box)


def pairwise_distance_matrix(
    cell: Cell, positions: Array, *, min_pallas_n: int = 512
) -> Array:
    """Minimum-image all-to-all distances; dispatches to the Pallas kernel for
    large orthorhombic systems on TPU (interpret mode elsewhere for testing via
    CMDLMC_FORCE_PALLAS=1)."""
    import os

    n = positions.shape[0]
    force = os.environ.get("CMDLMC_FORCE_PALLAS") == "1"
    disable = os.environ.get("CMDLMC_NO_PALLAS") == "1"
    backend = jax.default_backend()
    use = (
        cell.orthorhombic
        and not disable
        and (force or (backend == "tpu" and n >= min_pallas_n))
    )
    if not use:
        return xla_pairwise(cell, positions, positions)
    interpret = backend != "tpu"
    return _pairwise_cubic_pallas(
        positions, jnp.diagonal(cell.h), interpret=interpret
    )
