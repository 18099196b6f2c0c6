"""Spatially-sparse fused stage-1 KNN table builder.

The dense Pallas builder (:mod:`cmdlmc_tpu.ops.knn_tables`) computes every
[N, TC] minimum-image distance tile — O(N^2) work per frame even though, at
supercell scale, a site's k nearest neighbors all lie within ``cutoff +
buffer`` (a few Angstrom out of a box tens of Angstrom wide). This module
prunes at the tile level, the reference's cell-list idea (the extended box of
``cython_exts/LMC/PBCHelper.pyx:30-53`` exists precisely so large supercells
never pay all-to-all work) recast for the TPU grid pipeline:

* host plan (numpy, per block): sites are sorted by spatial bin (bin edge
  >= cutoff+buffer), split into row chunks of ``RC`` sorted sites, and each
  (column tile, row chunk) pair is tested with a periodic bounding-box
  distance bound that covers every frame in the block (per-site drift is
  folded into the boxes). Only chunks that can hold an in-cutoff neighbor of
  the tile's columns make the per-tile active list.
* kernel (Pallas): grid (frame, column tile, active slot); the scalar-
  prefetched active list drives the row-chunk DMA (``PrefetchScalarGridSpec``
  index map), so pruned chunks are never fetched, never touched. Each step
  extracts the chunk's k-nearest per column and merges them into the running
  [KL, TC] tables, which stay resident in VMEM across the slot axis.

Exactness: pruning only discards pairs farther than cutoff+buffer, which the
dense builder masks to the invalid fill anyway, and the merge keeps the
k_smallest tie-break (lowest site id among equal distances) using original
site ids — the output is bitwise identical to :func:`knn_tables.
knn_block_tables` followed by the same cutoff mask (tests assert exact d and
idx equality, including tie-heavy lattices and exhausted columns). Padded
list slots point at a phantom NaN chunk whose distances all mask to the
invalid fill, so they are self-neutralizing — no in-kernel validity logic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.ops.vmem_budget import limit_bytes, padded_bytes

Array = jax.Array

_BIG = 1.0e6  # invalid-slot fill, matches ops/topk_sweep._BIG
_NF = float(2**24)  # id sentinel: sorts after every real site id
_RC = 512  # row chunk (sorted sites)
_TC = 512  # column tile (lanes)

# dispatch gate (measured, tools notes): at N=4608/L=46A/rcut=5 the plan
# keeps 89% of chunks (neutral); at N>=9000 it keeps <=52% (>=2x fewer
# MACs), and the ratio falls as L grows while rcut stays fixed.
SPARSE_MIN_N = 6144
SPARSE_MAX_RATIO = 0.75


class SparsePlan:
    """Host-side spatial plan, ready to feed :func:`knn_sparse_tables`."""

    __slots__ = ("perm", "inv", "lists", "n_ch", "rc", "tc")

    def __init__(self, perm, inv, lists, n_ch, rc, tc):
        self.perm, self.inv, self.lists = perm, inv, lists
        self.n_ch, self.rc, self.tc = n_ch, rc, tc

    @property
    def ratio(self) -> float:
        return self.lists.shape[1] / self.n_ch


def sparse_plan_for(positions_block, lengths, rcut, *,
                    min_n: int = SPARSE_MIN_N,
                    max_ratio: float = SPARSE_MAX_RATIO,
                    rc: int = _RC, tc: int = _TC):
    """Build a :class:`SparsePlan` when chunk pruning will actually pay,
    else ``None`` (caller falls back to the dense builder).

    Fetches ``positions_block`` to host if needed (one block-sized transfer,
    negligible next to the dense builder's per-frame O(N^2) it replaces)."""
    n = positions_block.shape[1]
    if n < min_n:
        return None
    pos = np.asarray(positions_block, np.float32)
    perm, inv, lists, n_ch = plan_sparse(
        pos, np.asarray(lengths, np.float32), float(rcut), rc=rc, tc=tc
    )
    plan = SparsePlan(perm, inv, lists, n_ch, rc, tc)
    return plan if plan.ratio <= max_ratio else None


def plan_sparse(positions_block, lengths, rcut, rc: int = _RC,
                tc: int = _TC):
    """Host-side spatial plan for a block of frames.

    Returns ``(perm, inv, lists, n_chunks)``: the bin-sort permutation, its
    inverse, and the per-column-tile active row-chunk lists (i32
    [n_col_tiles, maxa], padded with ``n_chunks`` = the phantom chunk).
    The bound covers every frame: chunk/tile bounding boxes are widened by
    each site's maximum drift from frame 0, so one plan serves the block.
    """
    pos = np.asarray(positions_block, np.float32)
    L = np.asarray(lengths, np.float32).reshape(3)
    rcut = float(rcut)
    B, N, _ = pos.shape
    p0 = pos[0]
    w0 = p0 - np.floor(p0 / L) * L  # wrapped frame-0 coordinates
    nbin = np.maximum((L / max(rcut, 1e-6)).astype(np.int64), 1)
    width = L / nbin
    bc = np.clip((w0 / width).astype(np.int64), 0, nbin - 1)
    bid = (bc[:, 0] * nbin[1] + bc[:, 1]) * nbin[2] + bc[:, 2]
    perm = np.argsort(bid, kind="stable").astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)

    drift = np.abs(pos - p0[None]).max(axis=0) if B > 1 else np.zeros_like(p0)
    wp, dp = w0[perm], drift[perm]
    n_ch = -(-N // rc)
    n_ct = -(-N // tc)

    def boxes(step, count):
        lo = np.empty((count, 3), np.float32)
        hi = np.empty((count, 3), np.float32)
        for i in range(count):
            s = slice(i * step, min((i + 1) * step, N))
            lo[i] = (wp[s] - dp[s]).min(axis=0)
            hi[i] = (wp[s] + dp[s]).max(axis=0)
        return (lo + hi) / 2, (hi - lo) / 2

    rc_c, rc_h = boxes(rc, n_ch)
    ct_c, ct_h = boxes(tc, n_ct)
    d = np.abs(ct_c[:, None, :] - rc_c[None, :, :])  # [n_ct, n_ch, 3]
    d = np.minimum(d, L - d)  # periodic center distance (conservative)
    gap = np.maximum(d - rc_h[None] - ct_h[:, None], 0.0)
    active = (gap * gap).sum(-1) <= rcut * rcut
    maxa = int(active.sum(1).max())
    # bucket the list width (multiples of 4) so jit specializations stay few
    # as blocks drift, without pow2's jump past the useful pruning range
    maxa = min(n_ch, -(-maxa // 4) * 4)
    lists = np.full((n_ct, maxa), n_ch, np.int32)
    for j in range(n_ct):
        idx = np.nonzero(active[j])[0][:maxa]
        lists[j, : len(idx)] = idx
    return perm, inv, lists, n_ch


def _extract_k(d, ids, k, nf, inf):
    """k min/argmin passes over rows; returns k ([1, TC] dist, [1, TC] id)
    pairs with the k_smallest tie-break (lowest id among equal distances)."""
    out = []
    for _ in range(k):
        m = jnp.min(d, axis=0, keepdims=True)
        hit = d == m
        idx = jnp.min(jnp.where(hit, ids, nf), axis=0, keepdims=True)
        out.append((m, idx))
        d = jnp.where(ids == idx, inf, d)
    return out


def _sparse_kernel(lists_ref, geom_ref, posr_ref, posc_ref,
                   topd_ref, topi_ref, *, rc, tc, k, kl, maxa):
    del lists_ref  # consumed by the index maps
    f32 = jnp.float32
    inf = f32(jnp.inf)
    nf = f32(_NF)
    a = pl.program_id(2)

    @pl.when(a == 0)
    def _():
        topd_ref[0] = jnp.full((kl, tc), inf, f32)
        topi_ref[0] = jnp.full((kl, tc), nf, f32)

    acc = None
    for ax in range(3):
        rows = posr_ref[0, :, ax : ax + 1]  # [RC, 1]
        cols = posc_ref[0, ax : ax + 1, :]  # [1, TC]
        box = geom_ref[ax]
        delta = rows - cols
        delta = delta - box * jnp.round(delta / box)
        sq = delta * delta
        acc = sq if acc is None else acc + sq
    d = jnp.sqrt(acc)  # [RC, TC]
    idr = posr_ref[0, :, 3:4]  # [RC, 1] original site ids (f32)
    idc = posc_ref[0, 3:4, :]  # [1, TC]
    d = jnp.where(idr == idc, inf, d)  # self-distance
    d = jnp.where(d <= geom_ref[3], d, inf)  # cutoff+buffer mask

    # chunk-local k-nearest, then merge with the running tables: the union's
    # k smallest under (distance, id) lexicographic order is mergeable, so
    # per-chunk extraction loses nothing (dropped entries are dominated by k
    # extracted ones in every later merge too).
    chunk = _extract_k(d, idr, k, nf, inf)
    uni_d = jnp.concatenate([m for m, _ in chunk] + [topd_ref[0]], axis=0)
    uni_i = jnp.concatenate([i for _, i in chunk] + [topi_ref[0]], axis=0)
    merged = _extract_k(uni_d, uni_i, k, nf, inf)
    # Mosaic rejects zero-sized vectors: pad rows only when kl > k
    pads_d = [jnp.full((kl - k, tc), inf, f32)] if kl > k else []
    pads_i = [jnp.full((kl - k, tc), nf, f32)] if kl > k else []
    new_d = jnp.concatenate([m for m, _ in merged] + pads_d, axis=0)
    new_i = jnp.concatenate([i for _, i in merged] + pads_i, axis=0)

    last = a == maxa - 1

    @pl.when(jnp.logical_not(last))
    def _():
        topd_ref[0] = new_d
        topi_ref[0] = new_i

    @pl.when(last)
    def _():
        # dense-builder output contract: invalid slots carry (_BIG, 0)
        invalid = new_d == inf
        topd_ref[0] = jnp.where(invalid, f32(_BIG), new_d)
        topi_ref[0] = jnp.where(invalid, f32(0.0), new_i)


@functools.partial(
    jax.jit,
    static_argnames=("k", "kl", "rc", "tc", "n_ch", "maxa", "interpret"),
)
def knn_sparse_tables(positions_block: Array, lengths: Array, rcut,
                      perm: Array, inv: Array, lists: Array,
                      *, k: int, kl: int, rc: int, tc: int, n_ch: int,
                      maxa: int, interpret: bool = False):
    """K-nearest tables for a block, in stage-2 layout, via the sparse plan.

    Same contract as :func:`knn_tables.knn_block_tables`: returns
    (topd, topi), each [B, KL, N] f32 in ORIGINAL site order.
    """
    pos = jnp.asarray(positions_block, jnp.float32)
    b, n, _ = pos.shape
    permj = jnp.asarray(perm, jnp.int32)
    pos_p = jnp.take(pos, permj, axis=1)  # [B, N, 3] bin-sorted
    ids = jnp.broadcast_to(
        permj.astype(jnp.float32)[None, :, None], (b, n, 1)
    )
    pr = jnp.concatenate([pos_p, ids], axis=2)  # [B, N, 4]
    # pad to a whole number of chunks, plus the phantom chunk padded list
    # slots point at: NaN coordinates mask to inf, sentinel ids never win
    pad_rows = n_ch * rc - n + rc
    pad = jnp.concatenate(
        [
            jnp.full((b, pad_rows, 3), jnp.nan, jnp.float32),
            jnp.full((b, pad_rows, 1), _NF, jnp.float32),
        ],
        axis=2,
    )
    pr = jnp.concatenate([pr, pad], axis=1)  # [B, n_ch*RC + RC, 4]
    nc = -(-n // tc) * tc
    pc = jnp.swapaxes(pr[:, :n, :], 1, 2)  # [B, 4, N]
    if nc > n:
        cpad = jnp.concatenate(
            [
                jnp.full((b, 3, nc - n), jnp.nan, jnp.float32),
                jnp.full((b, 1, nc - n), _NF, jnp.float32),
            ],
            axis=1,
        )
        pc = jnp.concatenate([pc, cpad], axis=2)
    n_ct = nc // tc

    geom = jnp.concatenate([
        jnp.reshape(lengths, (3,)).astype(jnp.float32),
        jnp.reshape(jnp.asarray(rcut, jnp.float32), (1,)),
        jnp.zeros((4,), jnp.float32),
    ])

    kernel = functools.partial(
        _sparse_kernel, rc=rc, tc=tc, k=k, kl=kl, maxa=maxa
    )
    # d + ~5 live temporaries, double-buffered row chunks (lane-padded 4 ->
    # 128 on the trailing axis), the merge unions, resident outputs
    vmem = 6 * padded_bytes(rc, tc) + 2 * padded_bytes(rc, 128) \
        + 2 * padded_bytes(8, tc) + 4 * padded_bytes(2 * kl, tc) \
        + 4 * padded_bytes(kl, tc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_ct, maxa),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rc, 4), lambda i, j, a, lst: (i, lst[j, a], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tc), lambda i, j, a, lst: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, kl, tc), lambda i, j, a, lst: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kl, tc), lambda i, j, a, lst: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
    )
    topd, topi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, kl, nc), jnp.float32),
            jax.ShapeDtypeStruct((b, kl, nc), jnp.float32),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_bytes(vmem)
        ),
    )(jnp.asarray(lists, jnp.int32), geom, pr, pc)
    invj = jnp.asarray(inv, jnp.int32)
    return jnp.take(topd, invj, axis=2), jnp.take(topi, invj, axis=2)
