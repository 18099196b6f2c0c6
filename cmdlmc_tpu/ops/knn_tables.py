"""Fused Pallas stage-1 table builder: minimum-image distances + exact
k-nearest extraction in one VMEM-resident pass.

The XLA stage-1 (:func:`cmdlmc_tpu.ops.topk_sweep.topk_tables` via
``TopKPairRates.shared``, topo/models.py) materializes the [N, N] distance
matrix in HBM and re-reads it k times for the argmin+mask extraction passes
(``topo.models.k_smallest``); at supercell N=4608 that is ~770 MB of HBM
traffic per frame (~4 ms/frame, tools/profile_stage1.py). This kernel instead
computes one [N, TC] column tile of distances in VMEM (closed-form cubic
minimum image — the reference's AtomBoxCubic all-to-all semantics,
cython_exts/LMC/PBCHelper.pyx:88-95) and runs the k min/argmin passes in
place, emitting the [KL, N] tables the stage-2 sweep kernel consumes directly
(sites on the lane axis) — nothing [N, N]-sized ever touches HBM.

Selection semantics match ``k_smallest`` exactly: first-lowest-index
tie-break, and exhausted columns (fewer than k in-cutoff neighbors) repeat
index 0 with an invalid-slot distance, just like ``argmin`` over an all-inf
row. Distance VALUES may differ from the XLA build in the last ulp (compiler
fma/rounding choices — the same contract as ops/pairwise.py, whose parity
test uses atol=2e-4), so this path is enabled on TPU only; golden and oracle
tests on CPU keep the XLA build bit-stable. ``CMDLMC_FORCE_PALLAS=1`` forces
the kernel (interpret mode off-TPU) for tests; ``CMDLMC_NO_PALLAS=1``
disables it.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.ops.vmem_budget import limit_bytes, padded_bytes

Array = jax.Array

_BIG = 1.0e6  # invalid-slot fill, matches ops/topk_sweep._BIG
_TC = 512  # column tile (lanes); [N, TC] distance tile stays in VMEM


def _auto_tc(n: int, tc: int) -> int:
    """Shrink the column tile until the [N, TC] working set (plus Mosaic
    headroom) fits the VMEM cap; wider tiles amortize the per-tile reduction
    setup (tc=512 measures ~12% faster than 256 at N=4608)."""
    tc = min(tc, n)
    while tc > 128 and limit_bytes(6 * padded_bytes(n, tc)) >= (100 << 20):
        tc //= 2
    return tc


def _knn_kernel(geom_ref, posr_ref, posc_ref, topd_ref, topi_ref,
                *, n, tc, k, kl):
    """One [N, TC] distance tile -> [KL, TC] table columns.

    geom_ref: SMEM f32 [8]: Lx, Ly, Lz, cutoff+buffer (rest pad)
    posr_ref: VMEM f32 [1, N, 3]  (site coordinates on sublanes)
    posc_ref: VMEM f32 [1, 3, TC] (this tile's columns, coords on sublanes)
    """
    acc = None
    for a in range(3):
        rows = posr_ref[0, :, a : a + 1]  # [N, 1]
        cols = posc_ref[0, a : a + 1, :]  # [1, TC]
        box = geom_ref[a]
        delta = rows - cols
        delta = delta - box * jnp.round(delta / box)
        sq = delta * delta
        acc = sq if acc is None else acc + sq
    d = jnp.sqrt(acc)  # [N, TC]

    inf = jnp.float32(jnp.inf)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, tc), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, tc), 1)
    j0 = pl.program_id(1) * tc
    d = jnp.where(rowi == coli + j0, inf, d)  # self-distance
    d = jnp.where(d <= geom_ref[3], d, inf)  # cutoff+buffer mask

    rowf = rowi.astype(jnp.float32)
    nf = jnp.float32(n)
    out_d, out_i = [], []
    for _ in range(k):
        m = jnp.min(d, axis=0, keepdims=True)  # [1, TC]
        hit = d == m  # all-True on exhausted columns (inf == inf)
        idx = jnp.min(jnp.where(hit, rowf, nf), axis=0, keepdims=True)
        out_d.append(jnp.where(m == inf, jnp.float32(_BIG), m))
        out_i.append(idx)
        d = jnp.where(rowf == idx, inf, d)
    for _ in range(k, kl):
        out_d.append(jnp.full((1, tc), _BIG, jnp.float32))
        out_i.append(jnp.zeros((1, tc), jnp.float32))
    topd_ref[0] = jnp.concatenate(out_d, axis=0)
    topi_ref[0] = jnp.concatenate(out_i, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "kl", "tc", "interpret"))
def knn_block_tables(positions_block: Array, lengths: Array, rcut,
                     *, k: int, kl: int, tc: int = _TC,
                     interpret: bool = False):
    """K-nearest tables for a block of frames, in stage-2 layout.

    positions_block: [B, N, 3] donor coordinates.
    lengths: [3] orthorhombic box lengths.  rcut: cutoff + buffer.
    Returns (topd, topi): each [B, KL, N] f32 — ascending neighbor distances
    (``_BIG`` at invalid/padded slots) and neighbor site ids as f32.
    """
    pos = jnp.asarray(positions_block, jnp.float32)
    b, n, _ = pos.shape
    tc = _auto_tc(n, tc)
    posc = jnp.transpose(pos, (0, 2, 1))  # [B, 3, N]
    geom = jnp.concatenate([
        jnp.reshape(lengths, (3,)).astype(jnp.float32),
        jnp.reshape(jnp.asarray(rcut, jnp.float32), (1,)),
        jnp.zeros((4,), jnp.float32),
    ])
    # d + ~4 live elementwise temporaries, the iota, and the double-buffered
    # coordinate blocks.
    vmem = 6 * padded_bytes(n, tc) + 2 * padded_bytes(n, 3) \
        + 2 * padded_bytes(3, tc) + 4 * padded_bytes(kl, tc)
    kernel = functools.partial(_knn_kernel, n=n, tc=tc, k=k, kl=kl)
    topd, topi = pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(n, tc)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tc), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, kl, tc), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kl, tc), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, kl, n), jnp.float32),
            jax.ShapeDtypeStruct((b, kl, n), jnp.float32),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_bytes(vmem)
        ),
    )(geom, pos, posc)
    return topd, topi


def use_knn_pallas(model, n_sites: int, min_n: int = 512) -> bool:
    """Dispatch gate for the fused stage-1 build: top-K rate models over
    orthorhombic cells, on TPU at table sizes where the [N, N] HBM
    round-trips dominate. (HydroniumRates' rescale transform/interpolation
    applies AFTER the k-select, on the small [B, KL, N] tables — the in-VMEM
    distance+select stage is identical for both models, topo/models.py.)
    Mirrors ops/pairwise.pairwise_distance_matrix's policy (incl. the env
    toggles)."""
    from cmdlmc_tpu.topo.models import HydroniumRates, TopKPairRates

    if type(model) not in (TopKPairRates, HydroniumRates):
        return False
    if not model.cell.orthorhombic:
        return False
    if os.environ.get("CMDLMC_NO_PALLAS") == "1":
        return False
    if os.environ.get("CMDLMC_FORCE_PALLAS") == "1":
        return True
    return jax.default_backend() == "tpu" and n_sites >= min_n
