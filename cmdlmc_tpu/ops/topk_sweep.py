"""Fused Pallas sweep kernel over K-nearest neighbor lists.

Companion to ops/kmc_sweep.py covering the top-K rate models:

* ``TopKPairRates`` — the reference's Verlet-list option (topology.py:80-114)
  as a fixed-K neighbor list; the supercell scaling path (no [N, N] rate
  matrix in VMEM).
* ``HydroniumRates`` — per-site K closest neighbors with residence-time
  distance relaxation (topology.py:170-257): the blend factor depends on how
  long the occupying proton has sat on each donor, so the effective distances
  are per-replica state and must be re-evaluated inside the event loop.

Two-stage design (TPU-first): the replica-independent geometry — pairwise
distances, top-K extraction, distance transformation (incl. interpolated
tables, which XLA evaluates natively via jnp.interp) — runs ONCE per block in
XLA (:func:`topk_tables`, reusing ``model.shared`` so kernel and scan backends
share one source of truth), producing [B, KL, N] tables with sites on the lane
axis. The Pallas kernel then advances a tile of replicas across the block with
only per-replica work on-chip:

  per frame: K one-hot MXU matmuls refresh occ[nbr_k] (incrementally updated
  per event afterwards), per event: residence blend -> rate law (precomputed
  in stage 1 unless it depends on per-replica residence times) -> two-stage
  exponential-race selection (slot ~ per-slot totals over [TR, K], then one
  [TR, N] race within the slot) — all [TR, N] vector ops, no [N, N] buffer
  anywhere.

State kept in the kernel beyond the pair kernel's: ``tlast_site`` [TR, N], the
last-jump time of the proton occupying each site (-1 = never; stale where
unoccupied — always consumed under the occupancy mask). RNG/determinism rules
match kmc_sweep.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.ops.kmc_sweep import (
    _apply_law, _mix_key, _u01, _u01_t, law_kind, law_params_array,
)
from cmdlmc_tpu.topo.models import Frame, HydroniumRates, TopKPairRates

Array = jax.Array

_BIG = 1.0e6
MAX_K = 16  # candidate-width ceiling (two f32 tile rows)


def _pad_k(k: int) -> int:
    """Sublane-pad the table height to whole f32 tile rows."""
    return 8 * -(-k // 8)


def topk_unsupported_reason(model) -> str | None:
    """None if the top-K fused kernel can run this model."""
    if not isinstance(model, (TopKPairRates, HydroniumRates)):
        return f"{type(model).__name__} is not a top-K rate model"
    if law_kind(model.law) is None or law_kind(model.law) == 4:
        return f"rate law {type(model.law).__name__} has no top-K fused kernel"
    if model.k > MAX_K:
        return f"k={model.k} exceeds the kernel's candidate width ({MAX_K})"
    return None


def topk_tables(model, positions_block, kl: int, precompute_law: bool = False):
    """Replica-independent per-frame tables from ``model.shared``:
    (topd, topi, resc), each [B, kl, N] f32 with invalid slots at 1e6.

    With ``precompute_law`` the third table carries the rate law already
    applied to the rescaled distance (0 at invalid slots) — replica-independent
    when there is no residence-time interpolation, so the kernel's event loop
    never evaluates a transcendental law at all.

    On TPU, plain TopKPairRates tables route to the fused Pallas builder
    (ops/knn_tables.py): distances + k-select in VMEM, no [N, N] HBM
    round-trips. At supercell scale (N >= knn_sparse.SPARSE_MIN_N) a
    host-side spatial plan first checks whether chunk-level pruning pays
    (ops/knn_sparse.py, bit-identical output); if it does, the sparse
    kernel skips the pruned row-chunk DMAs entirely. The dispatch happens
    OUTSIDE jit so the env toggles (CMDLMC_FORCE_PALLAS / CMDLMC_NO_PALLAS)
    are honored per call, not baked into a cached trace."""
    from cmdlmc_tpu.ops.knn_tables import use_knn_pallas

    positions_block = jnp.asarray(positions_block, jnp.float32)
    if use_knn_pallas(model, positions_block.shape[1]):
        from cmdlmc_tpu.ops.knn_sparse import sparse_plan_for

        plan = sparse_plan_for(
            positions_block,
            np.diagonal(np.asarray(model.cell.h)),
            float(model.cutoff) + float(model.buffer),
        )
        if plan is not None:
            return _topk_tables_sparse(
                model, positions_block, kl, precompute_law, plan
            )
        return _topk_tables_pallas(model, positions_block, kl, precompute_law)
    return _topk_tables_xla(model, positions_block, kl, precompute_law)


def _tables_epilogue(model, topd, topi, kl: int, precompute_law: bool):
    """Shared transform/law stage over builder output (any stage-1 path)."""
    n = topd.shape[2]
    transform = getattr(model, "transform", None)
    if transform is not None:
        # parity with the XLA build: the transform sees the 1e6 invalid fill
        # of the k real slots, while the kl-k pad rows stay at raw 1e6
        resc = transform(topd)
        k = min(int(model.k), n - 1)
        if kl > k:
            resc = resc.at[:, k:, :].set(_BIG)
    else:
        resc = topd
    if precompute_law:
        omega = model.law(jnp.minimum(resc, 50.0))
        resc = jnp.where(topd < 1.0e5, omega, 0.0)
    return topd, topi, resc


@functools.partial(jax.jit, static_argnums=(2, 3))
def _topk_tables_pallas(model, positions_block, kl: int, precompute_law: bool):
    from cmdlmc_tpu.ops.knn_tables import knn_block_tables

    n = positions_block.shape[1]
    topd, topi = knn_block_tables(
        positions_block,
        jnp.diagonal(model.cell.h),
        model.cutoff + model.buffer,
        k=min(int(model.k), n - 1),
        kl=kl,
        interpret=jax.default_backend() != "tpu",
    )
    return _tables_epilogue(model, topd, topi, kl, precompute_law)


def _topk_tables_sparse(model, positions_block, kl: int,
                        precompute_law: bool, plan):
    return _topk_tables_sparse_jit(
        model, positions_block,
        jnp.asarray(plan.perm), jnp.asarray(plan.inv),
        jnp.asarray(plan.lists),
        kl, precompute_law, plan.n_ch, int(plan.lists.shape[1]),
        plan.rc, plan.tc,
    )


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10))
def _topk_tables_sparse_jit(model, positions_block, perm, inv, lists,
                            kl: int, precompute_law: bool, n_ch: int,
                            maxa: int, rc: int, tc: int):
    from cmdlmc_tpu.ops.knn_sparse import knn_sparse_tables

    n = positions_block.shape[1]
    topd, topi = knn_sparse_tables(
        positions_block,
        jnp.diagonal(model.cell.h),
        model.cutoff + model.buffer,
        perm, inv, lists,
        k=min(int(model.k), n - 1),
        kl=kl, rc=rc, tc=tc, n_ch=n_ch, maxa=maxa,
        interpret=jax.default_backend() != "tpu",
    )
    return _tables_epilogue(model, topd, topi, kl, precompute_law)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _topk_tables_xla(model, positions_block, kl: int, precompute_law: bool = False):
    """The XLA build: ``model.shared`` per frame under lax.map (chunked so the
    transient [N, N] distance matrices never exceed a few frames' worth of
    HBM; jitted because lax.map outside jit would dispatch each chunk as a
    separate device call — tunnel round trips)."""

    def one(pos):
        frame = Frame(donors=pos, extras=None, time=jnp.float32(0.0),
                      index=jnp.int32(0))
        sh = model.shared(frame)  # dist/resc already 1e6 where invalid
        k = sh.dist.shape[1]
        pad = [(0, 0), (0, kl - k)]
        topd = jnp.pad(sh.dist, pad, constant_values=_BIG)
        resc = jnp.pad(sh.dist_rescaled, pad, constant_values=_BIG)
        if precompute_law:
            omega = model.law(jnp.minimum(resc, 50.0))
            resc = jnp.where(topd < 1.0e5, omega, 0.0)
        topi = jnp.pad(sh.nbr.astype(jnp.float32), pad, constant_values=0.0)
        # [N, KL] -> [KL, N]: sites on the lane axis
        return topd.T, topi.T, resc.T

    return jax.lax.map(one, jnp.asarray(positions_block, jnp.float32),
                       batch_size=8)


def topk_tables_delta(model, positions_block, kl: int,
                      precompute_law: bool = False, cmax: int = 256):
    """:func:`topk_tables` plus frame-to-frame candidate-identity change
    metadata, the input of the kernel's incremental occ[nbr] maintenance
    (VERDICT r2 #2: occupancy changes only at events, so the O(K*N^2)
    one-hot gather must not be paid per frame when the neighbor identities
    did not change).

    Returns (topd, topi, resc, ci, cnbr, chg, mode):

    * ``ci``   [B, 1, CMAX] i32 — indices of columns whose candidate list
      changed vs the previous frame, padded with N (out of range).
    * ``cnbr`` [B, KL, CMAX] i32 — the new candidate ids at those columns,
      padded with N.
    * ``chg``  [B, 1, N] f32 — 1.0 at changed columns.
    * ``mode`` [B] i32 — 0: no identity change (skip refresh; per-event
      increments keep occ[nbr] exact), 1: delta refresh over <= CMAX columns,
      2: full refresh (first frame of the block, or > CMAX changes;
      ``cmax < 0`` forces 2 everywhere — the pre-delta behavior, kept as the
      oracle for exactness tests).

    All three refresh modes produce bit-identical occ[nbr] states, so results
    are independent of CMAX and chunking (the engine's chunk-invariance
    property is preserved by construction).

    Un-jitted wrapper: the stage-1 build dispatch (Pallas vs XLA) happens in
    :func:`topk_tables` outside jit; the epilogue below is jitted."""
    positions_block = jnp.asarray(positions_block, jnp.float32)
    tables = topk_tables(model, positions_block, kl, precompute_law)
    return _delta_epilogue(tables, cmax)


@functools.partial(jax.jit, static_argnums=(1,))
def _delta_epilogue(tables, cmax: int):
    topd, topi, resc = tables
    ti = topi.astype(jnp.int32)  # [B, KL, N]
    B, KL, N = ti.shape
    c = max(min(abs(cmax), N), 1)
    prev = jnp.concatenate([ti[:1], ti[:-1]], axis=0)
    changed = jnp.any(ti != prev, axis=1)  # [B, N]
    count = changed.sum(axis=1)  # [B]
    order = jnp.argsort(
        jnp.logical_not(changed), axis=1, stable=True
    )  # changed columns first, ascending index
    ci = order[:, :c].astype(jnp.int32)
    in_count = jnp.arange(c, dtype=jnp.int32)[None, :] < count[:, None]
    ci = jnp.where(in_count, ci, N)
    safe = jnp.minimum(ci, N - 1)
    cnbr = jnp.take_along_axis(
        ti, jnp.broadcast_to(safe[:, None, :], (B, KL, c)), axis=2
    )
    cnbr = jnp.where(ci[:, None, :] == N, N, cnbr).astype(jnp.int32)
    mode = jnp.where(
        count == 0, 0, jnp.where(count <= c, 1, 2)
    ).astype(jnp.int32)
    if cmax < 0:
        mode = jnp.full((B,), 2, jnp.int32)
    mode = mode.at[0].set(2)  # block entry: occ[nbr] scratch is cold
    return (topd, topi, resc, ci[:, None, :], cnbr,
            changed[:, None, :].astype(jnp.float32), mode)


# ---------------------------------------------------------------------------
# Verlet-style table reuse (stage 1)
# ---------------------------------------------------------------------------

_VERLET_CMAX = 8  # dummy change-metadata width: verlet modes are only 0 / 2
# Thrash guard: a drift-triggered rebuild within _THRASH_GAP frames of the
# previous one signals the threshold floor can't keep up (fast drift / tiny
# buffer); the builder then rebuilds EVERY frame until the absolute frame
# index reaches last-trigger + _THRASH_SPAN, then probes the drift guard
# again. Both bounds are keyed on ABSOLUTE frame indices and the trigger
# state (last_rebuild, thrash_until) rides in NeighborCarry, so the rebuild
# schedule stays a pure function of (carry, frame0, frames) — chunking- and
# checkpoint-invariant even in the thrashing regime.
_THRASH_GAP = 4
_THRASH_SPAN = 128


@jax.jit
def _drift_per_frame(model, pos_block, ref):
    """[B] max atom drift of every frame against a FIXED reference (the
    positions at the segment's rebuild). No scan: between rebuilds the
    reference does not move, so this is one vectorized reduction and the
    rebuild search is a host argmax over a [B] fetch."""
    from cmdlmc_tpu.core.cell import displacement

    d = displacement(model.cell, ref[None], pos_block)
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1), axis=1))


def _rebuild_thresh(model, topd_row, k: int) -> float:
    """Drift threshold for which the frozen list still covers every pair
    within CUTOFF. Per column the list's covering radius is the k-th
    neighbor distance at rebuild (or cutoff+buffer where fewer than k
    neighbors were in range — then everything in range is listed); a pair
    within cutoff now was within cutoff + 2*drift at rebuild, so the frozen
    set covers it while 2*drift <= cover - cutoff. The classic Verlet bound
    (buffer/2, reference topology.py:80-114) is the cap — it applies when k
    covers the whole cutoff+buffer shell. The floor (buffer/16) handles the
    k-TRUNCATED regime (covering radius below cutoff): there per-frame
    rebuild is itself an approximation of the dense model, and a small
    drift window bounds the extra staleness without thrashing."""
    buf = float(model.buffer)
    kth = np.asarray(topd_row[:, min(k, topd_row.shape[1]) - 1, :])  # [nb, N]
    cover = np.where(kth < 1.0e5, kth, float(model.cutoff) + buf)
    margin = float(cover.min()) - float(model.cutoff)
    return float(np.clip(margin / 2.0, buf / 16.0, buf / 2.0))


def _plane_min_image(d, length, h_inv_row=None):
    """Single-coordinate minimum image (orthorhombic): the plane-form twin
    of core.cell.minimum_image's per-component formula — identical ops per
    element, so results are bit-equal to the trailing-3 version."""
    return d - length * jnp.round(d / length)


def _drift_over(model, post, refp, thresh):
    """[B] (max-atom-drift > thresh) flags in PLANE form (post [3, B, N],
    refp [3, N]): the site axis rides the 128 lanes instead of a trailing
    dim of 3 (3/128 lanes live = 42x dead VPU work). The per-element op
    sequence matches the trailing-3 displacement exactly — sum over the 3
    components in fixed (x+y)+z order, max/min reductions are exact — so
    every caller computes the same f32 drifts and the rebuild schedule is
    implementation-independent. Orthorhombic cells only (the top-K Verlet
    path's gate); triclinic falls back to the trailing-3 displacement."""
    if model.cell.orthorhombic:
        L = jnp.diagonal(model.cell.h)
        dx = _plane_min_image(post[0] - refp[0][None], L[0])
        dy = _plane_min_image(post[1] - refp[1][None], L[1])
        dz = _plane_min_image(post[2] - refp[2][None], L[2])
        d2 = (dx * dx + dy * dy) + dz * dz
    else:
        from cmdlmc_tpu.core.cell import displacement

        pos = jnp.transpose(post, (1, 2, 0))
        ref = jnp.transpose(refp, (1, 0))
        d = displacement(model.cell, ref[None], pos)
        d2 = jnp.sum(d * d, axis=-1)
    return jnp.sqrt(jnp.max(d2, axis=1)) > thresh


def _thresh_of(model, td, k: int):
    """Device-side :func:`_rebuild_thresh` (f32): the SAME arithmetic in
    every stage-1 implementation (host loop, device scheduler), so mixed
    paths cannot diverge on the rebuild schedule. td: [KL, N]."""
    buf = model.buffer
    kth = td[min(k, td.shape[0]) - 1, :]  # [N]
    cover = jnp.where(kth < 1.0e5, kth, model.cutoff + buf)
    margin = jnp.min(cover) - model.cutoff
    return jnp.clip(margin / 2.0, buf / 16.0, buf / 2.0)


@functools.partial(jax.jit, static_argnums=(3,))
def _thresh_and_flags(model, post, rb_topd, k: int, refp):
    """Device-side threshold + drift guard, packed into ONE [B+1] array
    ((drift > thresh) flags then thresh) so a rebuild segment costs a
    single small host fetch instead of one [B]-drift fetch plus a [KL, N]
    table-row fetch — on a tunneled backend the round trips were a third
    of the stage-1 budget at supercell N."""
    thresh = _thresh_of(model, rb_topd[0], k)
    flags = _drift_over(model, post, refp, thresh)
    return jnp.concatenate([flags.astype(jnp.float32), thresh[None]])


@jax.jit
def _drift_flags(model, post, refp, thresh):
    """[B] (drift > thresh) flags for a carried segment (thresh already
    known on the host) — one small fetch."""
    return _drift_over(model, post, refp, jnp.float32(thresh)).astype(
        jnp.float32
    )


# Above this many rebuild segments per call the one-hot-matmul distance
# path would dispatch per segment for little reuse (the thrashing regime);
# fall back to the fused per-frame gather epilogue there.
_MM_SEG_MAX = 6

# Row capacity of the device-resident rebuild scheduler (one jit program
# computes the whole block's schedule AND builds the rebuild rows — ONE
# host round trip per block instead of one per segment). More rebuilds
# than this (or an active thrash window) bails out to the host loop.
_SCHED_ROWS = 8


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _device_schedule(model, pos, kl: int, k: int, use_pallas: bool,
                     has_carry: bool, carry_ri, carry_rv, carry_refp,
                     carry_meta, frame0):
    """Whole-block Verlet rebuild schedule + row builds in ONE device
    program. The host loop in :func:`topk_tables_verlet` pays one
    synchronous round trip PER SEGMENT (the schedule is sequential: the
    next rebuild frame depends on the previous rebuild's threshold) — on a
    tunneled backend at ~25 ms per sync that was the dominant stage-1 cost.
    Here the sequential walk runs as a bounded fori_loop on device, using
    the SAME builder (`knn_block_tables` dense Pallas / XLA fallback — the
    same dispatch `topk_tables` would make) and the SAME f32 threshold and
    drift arithmetic as the host loop (:func:`_thresh_of`,
    :func:`_drift_over`), so the schedule is bit-identical whichever path
    computes it and chunk invariance survives mixed (device/bail) regimes.

    Returns (rows_i [S, KL, N], rows_v [S, KL, N], ref [N, 3],
    packed [2B+4]) where packed = (seg [B], rebuild-flags [B], n_rows,
    thresh, last_rb, bail) — everything the host needs in one small fetch.
    bail=1 when the schedule cannot be represented (thrash trigger, row
    overflow, or an active thrash window): the host loop recomputes from
    scratch then (no device state escapes)."""
    B, N, _ = pos.shape
    S = _SCHED_ROWS
    post = jnp.transpose(pos, (2, 0, 1))  # [3, B, N] plane form
    lengths = jnp.diagonal(model.cell.h)
    arange_b = jnp.arange(B, dtype=jnp.int32)

    def build(f):
        pos1 = jax.lax.dynamic_slice_in_dim(pos, f, 1, axis=0)
        if use_pallas:
            from cmdlmc_tpu.ops.knn_tables import knn_block_tables

            td, ti = knn_block_tables(
                pos1, lengths, model.cutoff + model.buffer,
                k=min(k, N - 1), kl=kl,
            )
        else:
            td, ti, _ = _topk_tables_xla(model, pos1, kl, False)
        return td[0], ti[0]

    if has_carry:
        rows_i = jnp.zeros((S, kl, N), jnp.float32).at[0].set(carry_ri)
        rows_v = jnp.zeros((S, kl, N), jnp.float32).at[0].set(carry_rv)
        refp = carry_refp
        thresh = carry_meta[0]
        last_rb = carry_meta[1]
        # an in-progress thrash window cannot be represented here
        bail0 = (jnp.float32(frame0) < carry_meta[2])
        cursor = jnp.int32(0)
        n_rows = jnp.int32(1)
        rbf = jnp.zeros(B, jnp.bool_)
    else:
        td0, ti0 = build(0)
        rows_i = jnp.zeros((S, kl, N), jnp.float32).at[0].set(ti0)
        rows_v = (
            jnp.zeros((S, kl, N), jnp.float32)
            .at[0].set((td0 < 1.0e5).astype(jnp.float32))
        )
        refp = post[:, 0, :]
        thresh = _thresh_of(model, td0, k)
        last_rb = jnp.float32(frame0)
        bail0 = jnp.bool_(False)
        cursor = jnp.int32(1)
        n_rows = jnp.int32(1)
        rbf = jnp.zeros(B, jnp.bool_).at[0].set(True)
    seg = jnp.zeros(B, jnp.int32)

    def body(_, st):
        (rows_i, rows_v, n_rows, seg, rbf, refp, thresh, last_rb,
         cursor, bail, done) = st

        def active(st):
            (rows_i, rows_v, n_rows, seg, rbf, refp, thresh, last_rb,
             cursor, bail, done) = st
            flags = _drift_over(model, post, refp, thresh)
            cand = jnp.logical_and(flags, arange_b >= cursor)
            has = jnp.any(cand)
            f = jnp.argmax(cand).astype(jnp.int32)
            af = jnp.float32(frame0) + f.astype(jnp.float32)
            gap = af - last_rb
            thrash = jnp.logical_and(
                has, jnp.logical_and(gap >= 0.0, gap <= _THRASH_GAP)
            )
            overflow = jnp.logical_and(has, n_rows >= S)
            new_bail = jnp.logical_or(thrash, overflow)

            def do_build(st):
                (rows_i, rows_v, n_rows, seg, rbf, refp, thresh,
                 last_rb, cursor, bail, done) = st
                td, ti = build(f)
                rows_i = jax.lax.dynamic_update_slice_in_dim(
                    rows_i, ti[None], n_rows, axis=0
                )
                rows_v = jax.lax.dynamic_update_slice_in_dim(
                    rows_v, (td < 1.0e5).astype(jnp.float32)[None],
                    n_rows, axis=0,
                )
                seg = jnp.where(arange_b >= f, n_rows, seg)
                rbf = rbf.at[f].set(True)
                return (rows_i, rows_v, n_rows + 1, seg, rbf,
                        jax.lax.dynamic_slice_in_dim(
                            post, f, 1, axis=1
                        )[:, 0, :],
                        _thresh_of(model, td, k), af, f + 1, bail, done)

            st = (rows_i, rows_v, n_rows, seg, rbf, refp, thresh,
                  last_rb, cursor, bail, done)
            st = jax.lax.cond(
                jnp.logical_and(has, jnp.logical_not(new_bail)),
                do_build, lambda s: s, st,
            )
            (rows_i, rows_v, n_rows, seg, rbf, refp, thresh, last_rb,
             cursor, bail, done) = st
            return (rows_i, rows_v, n_rows, seg, rbf, refp, thresh,
                    last_rb, cursor, jnp.logical_or(bail, new_bail),
                    jnp.logical_or(jnp.logical_not(has), new_bail))

        return jax.lax.cond(done, lambda s: s, active, st)

    st = (rows_i, rows_v, n_rows, seg, rbf, refp, thresh, last_rb,
          cursor, bail0, bail0)
    st = jax.lax.fori_loop(0, S, body, st)
    (rows_i, rows_v, n_rows, seg, rbf, refp, thresh, last_rb,
     _cursor, bail, _done) = st
    packed = jnp.concatenate([
        seg.astype(jnp.float32),
        rbf.astype(jnp.float32),
        jnp.stack([
            n_rows.astype(jnp.float32), thresh, last_rb,
            bail.astype(jnp.float32),
        ]),
    ])
    return rows_i, rows_v, jnp.transpose(refp, (1, 0)), packed


@functools.partial(jax.jit, static_argnums=(3,))
def _segment_topd(model, pos, row_topi, kl: int, row_valid):
    """[B, KL, N] frozen-id pair distances for ONE rebuild segment via a
    one-hot MXU gather. Every frame of a segment shares the same candidate
    ids, so the [KL*N, N] selection matrix is built once and the gather is
    a single matmul with the whole block's coordinates as RHS columns —
    XLA's native take_along_axis gather issues ~2.4 G gathered-elem/s on
    v5e (≈1 ms/frame at N=4608) while this runs at MXU/HBM speed
    (~25 us/frame). bf16 one-hot x f32 coordinates with f32 accumulation:
    selection reproduces each coordinate to <= 1 ulp (tolerances in the
    physics are orders of magnitude above)."""
    from cmdlmc_tpu.core.cell import displacement

    B, N, _ = pos.shape
    ids = jnp.clip(jnp.round(row_topi), 0, N - 1).astype(jnp.int32)  # [KL, N]
    onehot = (
        ids.reshape(kl * N, 1) == jnp.arange(N, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    rhs = jnp.transpose(pos, (1, 0, 2)).reshape(N, B * 3)
    nbr = jnp.dot(onehot, rhs, preferred_element_type=jnp.float32)
    nbr = nbr.reshape(kl, N, B, 3).transpose(2, 0, 1, 3)  # [B, KL, N, 3]
    d = displacement(model.cell, pos[:, None, :, :], nbr)
    topd = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ok = jnp.logical_and(
        row_valid[None] > 0, topd <= model.cutoff + model.buffer
    )
    return jnp.where(ok, topd, _BIG)


@jax.jit
def _select_segment(seg, s, part, acc):
    """acc[b] = part[b] where seg[b] == s (host-loop combine of the
    per-segment distance grids)."""
    return jnp.where((seg == s)[:, None, None], part, acc)


@functools.partial(jax.jit, static_argnums=(8, 9))
def _chunk_slices(positions, topd, topi, resc, ci, cnbr, chg, mode,
                  lo: int, hi: int):
    """All 8 per-chunk table slices (+ the forced full-refresh entry mode)
    in ONE dispatch — per-op dispatch latency on a tunneled backend made 8
    separate slice calls per chunk a measurable tax."""
    m = mode[lo:hi]
    if lo > 0:
        # kernel entry: the occ[nbr] scratch is cold — force the full
        # refresh exactly as topk_tables_delta does for a block's frame 0
        m = m.at[0].set(2)
    return (positions[lo:hi], topd[lo:hi], topi[lo:hi], resc[lo:hi],
            ci[lo:hi], cnbr[lo:hi], chg[lo:hi], m)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _mm_epilogue(model, pos, rows_i, rows_v, kl: int, n_real: int,
                 precompute_law: bool, seg, flags):
    """The whole mm stage-1 tail — per-segment one-hot gathers, segment
    combine, transform/law epilogue, delta metadata — as ONE jit program.
    Dispatch count matters on a tunneled backend (~5 ms per call): the
    unfused version paid 2*n_real+1 round trips per block. n_real is
    static (1..`_MM_SEG_MAX`): a handful of cached variants."""
    acc = None
    for s in range(n_real):
        part = _segment_topd(model, pos, rows_i[s], kl, rows_v[s])
        acc = part if acc is None else _select_segment(seg, s, part, acc)
    return _verlet_finish(model, acc, seg, rows_i, kl, precompute_law, flags)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _verlet_finish(model, topd_raw, seg, all_topi, kl: int,
                   precompute_law: bool, flags):
    """Shared tail of the Verlet stage-1: broadcast the per-frame identity
    rows, run the transform/law epilogue on an already-computed masked
    distance grid, and emit the delta-tuple metadata (modes only 0/2)."""
    B = topd_raw.shape[0]
    N = topd_raw.shape[2]
    topi = jnp.take(all_topi, seg, axis=0)  # [B, KL, N] f32
    topd, topi, resc = _tables_epilogue(
        model, topd_raw, topi, kl, precompute_law
    )
    mode = jnp.where(flags, 2, 0).astype(jnp.int32).at[0].set(2)
    ci = jnp.full((B, 1, _VERLET_CMAX), N, jnp.int32)
    cnbr = jnp.full((B, kl, _VERLET_CMAX), N, jnp.int32)
    chg = jnp.zeros((B, 1, N), jnp.float32)
    return topd, topi, resc, ci, cnbr, chg, mode


@functools.partial(jax.jit, static_argnums=(5, 6))
def _verlet_epilogue(model, pos, seg, all_topi, all_valid, kl: int,
                     precompute_law: bool, flags):
    """Per-frame tables from frozen identities: broadcast each frame's
    rebuild-segment identity/validity row, recompute the K pair distances at
    those ids (O(B*K*N) gather + arithmetic instead of the O(B*N^2) distance
    matrix + k-select), re-mask at cutoff+buffer, and run the shared
    transform/law epilogue."""
    from cmdlmc_tpu.core.cell import displacement

    B, N, _ = pos.shape
    topi = jnp.take(all_topi, seg, axis=0)  # [B, KL, N] f32
    valid = jnp.take(all_valid, seg, axis=0)
    ids = jnp.clip(jnp.round(topi).astype(jnp.int32), 0, N - 1)
    flat = ids.reshape(B, kl * N)
    nbr = jnp.take_along_axis(
        pos, flat[..., None], axis=1
    ).reshape(B, kl, N, 3)
    d = displacement(model.cell, pos[:, None, :, :], nbr)
    topd = jnp.sqrt(jnp.sum(d * d, axis=-1))  # [B, KL, N]
    ok = jnp.logical_and(valid > 0, topd <= model.cutoff + model.buffer)
    topd = jnp.where(ok, topd, _BIG)
    topd, topi, resc = _tables_epilogue(model, topd, topi, kl, precompute_law)
    mode = jnp.where(flags, 2, 0).astype(jnp.int32).at[0].set(2)
    ci = jnp.full((B, 1, _VERLET_CMAX), N, jnp.int32)
    cnbr = jnp.full((B, kl, _VERLET_CMAX), N, jnp.int32)
    chg = jnp.zeros((B, 1, N), jnp.float32)
    return topd, topi, resc, ci, cnbr, chg, mode


def topk_tables_verlet(model, positions_block, kl: int, precompute_law: bool,
                       carry, frame0: int = 0):
    """:func:`topk_tables_delta` with Verlet-style candidate reuse: the
    K-nearest identity lists are FROZEN between displacement-triggered
    rebuilds (see :func:`_rebuild_thresh` for the coverage bound — the
    reference's own neighbor-list reuse guarantee, topology.py:80-114),
    while the pair distances ARE recomputed every frame at the frozen ids.

    This removes the two supercell walls of the churn-based delta path in one
    move: candidate identities stop changing every frame (the kernel's
    occ[nbr] refresh becomes mode 0 on all but rebuild frames — at N >= 4608
    the per-frame delta/full refresh matmuls were over half the frame budget)
    and the O(N^2) distance build + k-select runs only on rebuild frames.

    ``carry`` is the :class:`engine.lattice.NeighborCarry` from the previous
    block (None = rebuild at the block's first frame); ``frame0`` is the
    block's absolute frame index (the thrash guard's window bounds are keyed
    on absolute frames). The rebuild schedule is a pure function of
    (carry, frame0, frames), so results are independent of block chunking —
    including the thrashing regime, whose trigger state rides in the carry;
    the carry lives inside EnsembleState and is checkpointed, so resumed
    runs continue bit-exactly.

    Returns (topd, topi, resc, ci, cnbr, chg, mode, new_carry) — the delta
    tuple with modes only 0/2 plus the updated carry."""
    from cmdlmc_tpu.engine.lattice import NeighborCarry

    pos = jnp.asarray(positions_block, jnp.float32)
    B, N, _ = pos.shape
    k = min(int(model.k), N - 1)

    from cmdlmc_tpu.topo.models import TopKPairRates as _TKP

    post = jnp.transpose(pos, (2, 0, 1))  # [3, B, N] plane form

    # Fast path: the device-resident scheduler — one dispatch + one small
    # fetch per block (the host loop below costs one ~25 ms synchronous
    # round trip PER SEGMENT through a tunneled backend). Gated to plain
    # orthorhombic TopKPairRates (the supercell family); it bails (and the
    # host loop recomputes from scratch) on thrash or row overflow.
    if type(model) is _TKP and model.cell.orthorhombic:
        from cmdlmc_tpu.engine.lattice import NeighborCarry as _NC
        from cmdlmc_tpu.ops.knn_tables import use_knn_pallas

        if carry is not None:
            carry_ri = jnp.asarray(carry.ref_topi)
            carry_rv = jnp.asarray(carry.ref_valid)
            carry_refp = jnp.transpose(jnp.asarray(carry.ref_pos), (1, 0))
            carry_meta = jnp.asarray(
                [carry.thresh, carry.last_rebuild, carry.thrash_until],
                jnp.float32,
            )
        else:
            carry_ri = carry_rv = jnp.zeros((kl, N), jnp.float32)
            carry_refp = jnp.zeros((3, N), jnp.float32)
            carry_meta = jnp.zeros(3, jnp.float32)
        d_ri, d_rv, d_ref, d_packed = _device_schedule(
            model, pos, kl, k, use_knn_pallas(model, N),
            carry is not None, carry_ri, carry_rv, carry_refp,
            carry_meta, jnp.int32(frame0),
        )
        packed = np.asarray(d_packed)
        if packed[-1] < 0.5:  # no bail
            n_real = int(packed[2 * B])
            seg_arr = jnp.asarray(packed[:B].astype(np.int32))
            flags_arr = jnp.asarray(packed[B:2 * B] > 0.5)
            tables = _mm_epilogue(
                model, pos, d_ri, d_rv, kl, n_real, precompute_law,
                seg_arr, flags_arr,
            )
            new_carry = _NC(
                ref_pos=d_ref,
                ref_topi=d_ri[n_real - 1],
                ref_valid=d_rv[n_real - 1],
                thresh=float(packed[2 * B + 1]),
                last_rebuild=float(packed[2 * B + 2]),
                thrash_until=(
                    float(carry.thrash_until) if carry is not None else 0.0
                ),
            )
            return (*tables, new_carry)
        # bail: thrash or overflow — recompute the whole block on the host
        # loop below (the canonical slow path; no device state escapes)

    rows_i, rows_v = [], []
    rb_flags = np.zeros(B, bool)
    seg = np.zeros(B, np.int64)

    def rebuild(f):
        """Build frozen tables at frame f; returns (thresh, over-flags) from
        ONE packed [B+1] fetch (thresh computed on device)."""
        rb_topd, rb_topi, _ = topk_tables(model, pos[f : f + 1], kl, False)
        rows_i.append(rb_topi[0])
        rows_v.append((rb_topd[0] < 1.0e5).astype(jnp.float32))
        rb_flags[f] = True
        seg[f:] = len(rows_i) - 1
        packed = np.asarray(
            _thresh_and_flags(model, post, rb_topd, k, post[:, f, :])
        )
        return float(packed[-1]), packed[:-1] > 0.5

    def rebuild_span(f, hi):
        """Per-frame rebuilds for frames [f, hi) in one batched builder call
        (the thrash window); returns the threshold from the last frame."""
        rb_topd, rb_topi, _ = topk_tables(model, pos[f:hi], kl, False)
        for j in range(hi - f):
            rows_i.append(rb_topi[j])
            rows_v.append((rb_topd[j] < 1.0e5).astype(jnp.float32))
        rb_flags[f:hi] = True
        seg[f:hi] = np.arange(len(rows_i) - (hi - f), len(rows_i))
        seg[hi:] = len(rows_i) - 1
        return _rebuild_thresh(model, rb_topd[-1:], k)

    if carry is not None:
        rows_i.append(jnp.asarray(carry.ref_topi))
        rows_v.append(jnp.asarray(carry.ref_valid))
        ref = jnp.asarray(carry.ref_pos)
        thresh = float(carry.thresh)
        last_rb = float(carry.last_rebuild)
        thrash_until = float(carry.thrash_until)
        start = 0
        over = np.asarray(
            _drift_flags(model, post, jnp.transpose(ref, (1, 0)), thresh)
        ) > 0.5
    else:
        thrash_until = 0.0
        thresh, over = rebuild(0)
        ref = pos[0]
        last_rb = float(frame0)
        start = 1
    if frame0 + start < thrash_until:
        # resume an in-progress thrash window from a previous chunk
        hi = min(B, int(thrash_until) - frame0)
        thresh = rebuild_span(start, hi)
        ref = pos[hi - 1]
        last_rb = float(frame0 + hi - 1)
        start = hi
        over = np.asarray(
            _drift_flags(model, post, jnp.transpose(ref, (1, 0)), thresh)
        ) > 0.5
    while start < B:
        # one small packed fetch per segment: the rebuild schedule is a
        # host-side dispatch decision (same pattern as the sparse plan)
        beyond = np.nonzero(over[start:])[0]
        if beyond.size == 0:
            break
        f = start + int(beyond[0])
        af = frame0 + f
        # 0 <= gap: a NEGATIVE gap means frames are being replayed out of
        # order against a newer carry (warmup passes, ad-hoc tool use) —
        # that's not drift thrash, so keep the plain drift-guard mode there
        if 0 <= af - last_rb <= _THRASH_GAP:
            # thrash guard: the drift window emptied within a few frames of
            # the previous rebuild — rebuild every frame to the end of the
            # absolute-frame window, then probe the drift guard again
            thrash_until = float(af + _THRASH_SPAN)
            hi = min(B, int(thrash_until) - frame0)
            thresh = rebuild_span(f, hi)
            ref = pos[hi - 1]
            last_rb = float(frame0 + hi - 1)
            start = hi
            over = np.asarray(
            _drift_flags(model, post, jnp.transpose(ref, (1, 0)), thresh)
        ) > 0.5
            continue
        thresh, over = rebuild(f)
        ref = pos[f]
        last_rb = float(af)
        start = f + 1

    # pad the rebuild-row stack to a power-of-two bucket: the epilogue
    # programs are jitted on the stack shape, and the rebuild count varies
    # block to block — without bucketing every new count would trigger a
    # fresh TPU compile (30-100 s each through the tunnel). Dummy rows
    # repeat the last rebuild and are never indexed by seg.
    n_real = len(rows_i)
    bucket = max(8, 1 << max(n_real - 1, 0).bit_length())
    rows_i.extend([rows_i[-1]] * (bucket - len(rows_i)))
    rows_v.extend([rows_v[-1]] * (bucket - len(rows_v)))
    all_topi = jnp.stack(rows_i)
    all_valid = jnp.stack(rows_v)
    seg_arr = jnp.asarray(seg, jnp.int32)
    flags_arr = jnp.asarray(rb_flags)
    if n_real <= _MM_SEG_MAX:
        # few segments (the steady-state regime): one-hot MXU gather per
        # segment over the whole block, combined by segment id — one fused
        # dispatch
        tables = _mm_epilogue(
            model, pos, all_topi, all_valid, kl, n_real, precompute_law,
            seg_arr, flags_arr,
        )
    else:
        # thrashing regime: per-frame fused-gather epilogue
        tables = _verlet_epilogue(
            model, pos, seg_arr, all_topi, all_valid,
            kl, precompute_law, flags_arr,
        )
    new_carry = NeighborCarry(
        ref_pos=ref,
        ref_topi=all_topi[-1],
        ref_valid=all_valid[-1],
        thresh=float(thresh),
        last_rebuild=float(last_rb),
        thrash_until=float(thrash_until),
    )
    return (*tables, new_carry)


def _make_kernel(*, n_sites, n_protons, tile, block, max_events, kind, k_cand,
                 dt, seed, has_interp, nbins, hist_range, track_matrix,
                 orthorhombic=True, cmax=256, cols=False):
    """``cols=True`` lays replica state out sites-major ([N, TR] / [P, TR] /
    [1, TR] instead of [TR, N] / [TR, P] / [TR, 1]) — the relayout that took
    the dense streamed kernel 2.80 -> 5.45 G and the water kernel 2.81 ->
    9.65 G su/s: replicas ride the 128 lanes exactly, so the event loop's
    [TR, 1]/[TR, K] scalars shrink from 16 vregs to one and the [TR, N]
    tensors lose the N -> next-multiple-of-128 lane padding (144 -> 256 = 44%
    dead VPU work at the flagship N). RNG draws stay element-identical per
    (replica, site/slot) via _u01_t; reduction/matmul ORDER differs, so cols
    is distribution-equal to rows, not bitwise (rows remains the interpret
    default and the exactness-oracle layout)."""
    N, P, TR, B, K = n_sites, n_protons, tile, block, k_cand
    C = cmax
    f32 = jnp.float32
    hist_lo, hist_hi = float(hist_range[0]), float(hist_range[1])
    hist_scale = float(nbins) / max(hist_hi - hist_lo, 1e-12)

    # orientation shims: every replica-state tensor is [N|P|K|nbins|1, TR] in
    # cols layout and [TR, N|P|K|nbins|1] in rows layout
    if cols:
        sumR = lambda x: jnp.sum(x, axis=0, keepdims=True)
        argR = lambda x: jnp.argmax(x, axis=0)[None, :]
        drawK = lambda key: _u01_t(key, (K, TR))
        drawN = lambda key: _u01_t(key, (N, TR))
        draw1 = lambda key: _u01_t(key, (1, TR))
        shape1 = (1, TR)
        tslice = lambda t, k: t[:, k : k + 1]  # layout-native table column
    else:
        sumR = lambda x: jnp.sum(x, axis=1, keepdims=True)
        argR = lambda x: jnp.argmax(x, axis=1)[:, None]
        drawK = lambda key: _u01(key, (TR, K))
        drawN = lambda key: _u01(key, (TR, N))
        draw1 = lambda key: _u01(key, (TR, 1))
        shape1 = (TR, 1)
        tslice = lambda t, k: t[k : k + 1, :]
    catR = (lambda xs: jnp.concatenate(xs, axis=0)) if cols else (
        lambda xs: jnp.concatenate(xs, axis=1))

    def kernel(*refs):
        it = iter(range(len(refs)))
        geom_ref = refs[next(it)]  # SMEM f32 [18]: h row-major, then h_inv
        ints_ref = refs[next(it)]  # SMEM i32 [2]: frame0, tile offset
        mode_ref = refs[next(it)]  # SMEM i32 [B]: occ[nbr] refresh mode
        params_ref = refs[next(it)]  # SMEM f32 [8]: law[6] + relax + pad
        post_ref = refs[next(it)]  # [B, 3, N]
        topd_ref = refs[next(it)]  # [B, KL, N]
        topi_ref = refs[next(it)]  # [B, KL, N] (f32 site indices)
        if cols:
            # transposed tables [B, N, KL] feed everything the event loop
            # slices per candidate; the untransposed topd/topi above still
            # build tab_scr (the per-event stacked one-hot gather table)
            topdt_ref = refs[next(it)]
            topit_ref = refs[next(it)]
            resct_ref = refs[next(it)]
        else:
            resc_ref = refs[next(it)]  # [B, KL, N]
        ci_ref = refs[next(it)]  # [B, 1, C] i32 changed columns (pad N)
        # rows: [B, KL, C] new ids at changed columns; cols: [B, C, KL]
        cnbr_ref = refs[next(it)]
        if not cols:
            chg_ref = refs[next(it)]  # [B, 1, N] f32 changed-column mask
        prev_ref = refs[next(it)]  # [3, N]
        s0_ref = refs[next(it)]  # [3, N]
        occ_ref = refs[next(it)]
        lab_ref = refs[next(it)]
        site_ref = refs[next(it)]
        tlast_ref = refs[next(it)]
        tls_ref = refs[next(it)]  # [TR, N] tlast_site
        dbx_ref = refs[next(it)]
        dby_ref = refs[next(it)]
        dbz_ref = refs[next(it)]
        u_ref = refs[next(it)]
        evc_ref = refs[next(it)]
        hist_ref = refs[next(it)] if nbins else None
        expo_ref = refs[next(it)] if nbins else None
        # outputs
        occ_out = refs[next(it)]
        lab_out = refs[next(it)]
        site_out = refs[next(it)]
        tlast_out = refs[next(it)]
        tls_out = refs[next(it)]
        dbx_out = refs[next(it)]
        dby_out = refs[next(it)]
        dbz_out = refs[next(it)]
        u_out = refs[next(it)]
        evc_out = refs[next(it)]
        s_out = refs[next(it)]
        prev_out = refs[next(it)]
        trunc_out = refs[next(it)]
        hist_out = refs[next(it)] if nbins else None
        expo_out = refs[next(it)] if nbins else None
        jm_out = refs[next(it)] if track_matrix else None
        # scratch: shared prefix buffers + K per-candidate occupancy gathers
        s_scr = refs[next(it)]
        prev_scr = refs[next(it)]
        phase_scr = refs[next(it)]
        done_scr = refs[next(it)]
        coord_scr = refs[next(it)]  # [8, N]: rows s_xyz | post_xyz | pad
        tab_scr = refs[next(it)]  # [2*KL, N]: rows topi | topd (per frame)
        occn = [refs[next(it)] for _ in range(K)]  # each [TR, N]

        h = [[geom_ref[3 * i + j] for j in range(3)] for i in range(3)]
        hinv = [[geom_ref[9 + 3 * i + j] for j in range(3)] for i in range(3)]
        frame0 = ints_ref[0]
        tile_id = pl.program_id(0) + ints_ref[1]
        params = [params_ref[i] for i in range(6)]
        relax = params_ref[6]

        occ_out[:] = occ_ref[:]
        lab_out[:] = lab_ref[:]
        site_out[:] = site_ref[:]
        tlast_out[:] = tlast_ref[:]
        tls_out[:] = tls_ref[:]
        dbx_out[:] = dbx_ref[:]
        dby_out[:] = dby_ref[:]
        dbz_out[:] = dbz_ref[:]
        u_out[:] = u_ref[:]
        evc_out[:] = evc_ref[:]
        trunc_out[:] = jnp.zeros(shape1, jnp.int32)
        if nbins:
            hist_out[:] = hist_ref[:]
            expo_out[:] = expo_ref[:]
        if track_matrix:
            jm_out[:] = jnp.zeros((1, N, N), f32)
        s_scr[:] = s0_ref[:]
        prev_scr[:] = prev_ref[:]

        iota_n = jax.lax.broadcasted_iota(
            jnp.int32, (N, TR) if cols else (TR, N), 0 if cols else 1
        )
        if nbins:
            iota_b = jax.lax.broadcasted_iota(
                jnp.int32, (nbins, TR) if cols else (TR, nbins),
                0 if cols else 1,
            )

        def minimg3(d):
            """Round-based minimum image of a 3-vector (list of three
            same-shaped arrays) — exact for vectors shorter than half the
            smallest cell height (jump vectors, per-frame drift)."""
            if orthorhombic:
                return [d[i] - h[i][i] * jnp.round(d[i] / h[i][i])
                        for i in range(3)]
            fr = [hinv[i][0] * d[0] + hinv[i][1] * d[1] + hinv[i][2] * d[2]
                  for i in range(3)]
            fr = [x - jnp.round(x) for x in fr]
            return [h[i][0] * fr[0] + h[i][1] * fr[1] + h[i][2] * fr[2]
                    for i in range(3)]

        def candidate_rates(tables, frame_time):
            """K lists of allowed rates [TR, N] (rows) / [N, TR] (cols) under
            the current state. Without residence-time interpolation the resc
            table already holds the law-applied rate (0 at invalid slots, see
            topk_tables), so this is pure multiplies; with it the law runs
            in-kernel on the blended per-replica distance."""
            topd_l, topi_l, resc_l = tables
            if has_interp:
                tls = tls_out[:]
                res = frame_time - tls
                ratio = jnp.where(
                    tls < 0, 1.0, jnp.minimum(res / relax, 1.0)
                )  # state-shaped
            occ = occ_out[:]
            rates = []
            for k in range(K):
                r_k = tslice(resc_l, k)
                if has_interp:
                    d_k = tslice(topd_l, k)  # [1, N] rows / [N, 1] cols
                    valid = d_k < f32(1e5)
                    d_eff = d_k + ratio * (r_k - d_k)
                    d_safe = jnp.minimum(d_eff, 50.0)
                    omega = jnp.where(valid, _apply_law(kind, d_safe, params), 0.0)
                else:
                    omega = r_k  # precomputed law, already masked
                a_k = omega * occ * (1.0 - occn[k][:])
                rates.append(a_k)
            return rates

        def ev_iter(tables, post, frame_idx, frame_time, ev):
            topd_l, topi_l, resc_l = tables
            rates = candidate_rates(tables, frame_time)
            sums = [sumR(r) for r in rates]  # K x shape1
            total = sums[0]
            for k in range(1, K):
                total = total + sums[k]

            phase = phase_scr[:]
            done = done_scr[:]
            u = u_out[:]
            budget = total * (f32(dt) - phase)
            fire = jnp.logical_and(jnp.logical_not(done), u <= budget)
            fire = jnp.logical_and(fire, budget > 0)
            safe_total = jnp.where(total > 0, total, 1.0)
            eph = phase + u / safe_total

            # Two-stage categorical over the K x N candidates, each stage an
            # exponential race (argmax r/E, E ~ Exp(1): P(i) = r_i / sum r):
            # first the neighbor slot ~ per-slot totals ([TR, K], cheap),
            # then the source column within the slot — ONE [TR, N] draw
            # instead of K Gumbel draws.
            keyA = _mix_key(seed, tile_id, frame_idx, ev, 11)
            eA = -jnp.log(drawK(keyA))
            slot_scores = catR(sums) / eA  # [TR, K] rows / [K, TR] cols
            kbest = argR(slot_scores)  # shape1 i32

            row_sel = jnp.zeros((N, TR) if cols else (TR, N), f32)
            for k in range(K):
                row_sel = row_sel + (kbest == k).astype(f32) * rates[k]
            keyB = _mix_key(seed, tile_id, frame_idx, ev, 12)
            eB = -jnp.log(drawN(keyB))
            src = argR(row_sel / eB)  # shape1

            oh_src = (iota_n == src).astype(f32)
            # per-slot table values at the source column, as ONE MXU one-hot
            # gather against the stacked id|distance tables (tab_scr, built
            # per frame) instead of 2*K masked reductions; the slot pick then
            # runs on the tiny [TR, KL] / [2*KL, TR] result. Ids are exact
            # through the MXU (one nonzero product, recovered by the round
            # below); d_evt only feeds the histogram binning.
            kl2 = tab_scr.shape[0] // 2
            if cols:
                gtab = jax.lax.dot_general(
                    tab_scr[:], oh_src, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [2*KL, TR]: topi values | topd values at src
                gsl = lambda q: gtab[q : q + 1, :]
            else:
                gtab = jax.lax.dot_general(
                    oh_src, tab_scr[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )  # [TR, 2*KL]
                gsl = lambda q: gtab[:, q : q + 1]
            dst_f = jnp.zeros(shape1, f32)
            d_evt = jnp.zeros(shape1, f32)
            for k in range(K):
                sel = (kbest == k).astype(f32)
                dst_f = dst_f + sel * gsl(k)
                d_evt = d_evt + sel * gsl(kl2 + k)
            dst = jnp.round(dst_f).astype(jnp.int32)
            oh_dst = (iota_n == dst).astype(f32)

            firef = fire.astype(f32)
            label = sumR(lab_out[:] * oh_src)

            occ_out[:] = occ_out[:] + firef * (oh_dst - oh_src)
            lab_out[:] = (
                lab_out[:] * (1.0 - firef * (oh_src + oh_dst))
                + firef * oh_dst * label
            )

            moving = jnp.logical_and(site_out[:] == src, fire)  # [TR, P]
            site_out[:] = jnp.where(moving, dst.astype(jnp.int32), site_out[:])
            t_event = frame_time + eph
            tlast_out[:] = jnp.where(moving, t_event, tlast_out[:])
            # destination site now carries a just-jumped proton; the source
            # slot goes stale behind the occupancy mask
            tls_out[:] = jnp.where(
                jnp.logical_and(oh_dst > 0, fire), t_event, tls_out[:]
            )

            movingf = moving.astype(f32)
            db_refs = (dbx_out, dby_out, dbz_out)
            # coordinate gathers against the per-frame coordinate matrix
            # (rows: s_xyz, post_xyz) as two f32 MXU matmuls: [TR, N] x
            # [N, 8] rows-major, [8, N] x [N, TR] cols-major
            if cols:
                cdims = (((1,), (0,)), ((), ()))
                g_src = jax.lax.dot_general(
                    coord_scr[:], oh_src, cdims, preferred_element_type=f32
                )  # [8, TR]
                g_dst = jax.lax.dot_general(
                    coord_scr[:], oh_dst, cdims, preferred_element_type=f32
                )
                csl = lambda g, j: g[j : j + 1, :]
            else:
                cdims = (((1,), (1,)), ((), ()))
                g_src = jax.lax.dot_general(
                    oh_src, coord_scr[:], cdims, preferred_element_type=f32
                )  # [TR, 8]
                g_dst = jax.lax.dot_general(
                    oh_dst, coord_scr[:], cdims, preferred_element_type=f32
                )
                csl = lambda g, j: g[:, j : j + 1]
            jumps = minimg3([
                csl(g_dst, 3 + dim) - csl(g_src, 3 + dim) for dim in range(3)
            ])
            for dim in range(3):
                db_refs[dim][:] = db_refs[dim][:] + movingf * (
                    csl(g_src, dim) - csl(g_dst, dim) + jumps[dim]
                )

            # incremental occ[nbr_k] refresh: only src/dst changed occupancy
            for k in range(K):
                t_k = tslice(topi_l, k)
                occn[k][:] = occn[k][:] + firef * (
                    (t_k == dst_f).astype(f32) - (t_k == src.astype(f32)).astype(f32)
                )

            if nbins:
                inr = jnp.logical_and(d_evt >= hist_lo, d_evt < hist_hi)
                braw = jnp.clip(
                    ((d_evt - hist_lo) * f32(hist_scale)).astype(jnp.int32),
                    0, nbins - 1,
                )
                hist_out[:] = hist_out[:] + jnp.logical_and(
                    jnp.logical_and(iota_b == braw, inr), fire
                ).astype(jnp.int32)
            if track_matrix:
                jm_out[0] = jm_out[0] + jax.lax.dot_general(
                    firef * oh_src, oh_dst,
                    (((1,), (1,)) if cols else ((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            key3 = _mix_key(seed, tile_id, frame_idx, ev, 3)
            fresh_u = -jnp.log(draw1(key3))
            u_out[:] = jnp.where(fire, fresh_u, u)
            evc_out[:] = evc_out[:] + fire.astype(jnp.int32)
            phase_scr[:] = jnp.where(fire, eph, phase)
            done_scr[:] = jnp.logical_or(done, jnp.logical_not(fire))

        def frame_body(f, _):
            post = post_ref[f]  # [3, N]
            topd, topi = topd_ref[f], topi_ref[f]  # [KL, N] (tab_scr source)
            if cols:
                tables = (topdt_ref[f], topit_ref[f], resct_ref[f])  # [N, KL]
            else:
                tables = (topd, topi, resc_ref[f])
            topd_l, topi_l, resc_l = tables

            d3 = minimg3([
                post[dim : dim + 1, :] - prev_scr[dim : dim + 1, :]
                for dim in range(3)
            ])
            for dim in range(3):
                s_scr[dim : dim + 1, :] = s_scr[dim : dim + 1, :] + d3[dim]
            prev_scr[:] = post
            # per-frame coordinate matrix for the event loop's MXU gathers
            coord_scr[:] = jnp.concatenate(
                [s_scr[:], post, jnp.zeros((2, N), f32)], axis=0
            )
            # stacked id|distance table matrix for the per-event one-hot
            # MXU gather of (dst id, jump distance) at the source column
            tab_scr[:] = jnp.concatenate([topi, topd], axis=0)

            # occ[nbr_k] maintenance. Occupancy changes only at events (the
            # event loop applies per-event increments), so the O(K*N^2)
            # one-hot MXU gather is only paid when candidate IDENTITIES
            # changed: mode 0 = no change (skip entirely), mode 1 = delta
            # refresh restricted to the <= C changed columns (O(K*N*C)),
            # mode 2 = full refresh (block entry / > C changes). All three
            # produce bit-identical occ[nbr] states (VERDICT r2 #2).
            mode = mode_ref[f]

            if cols:
                @pl.when(jnp.logical_or(mode == 2, f == 0))
                def _full_refresh():
                    # Row-chunked so the one-hot temporaries stay [CB, N]
                    # (cols is gated to small N, but keep the same bound)
                    occ = occ_out[:]  # [N, TR]
                    CB = min(N, 512)
                    for k in range(K):
                        t_k = topi_l[:, k : k + 1].astype(jnp.int32)  # [N, 1]
                        for c0 in range(0, N, CB):
                            cb = min(CB, N - c0)
                            g_c = (
                                jax.lax.broadcasted_iota(jnp.int32, (cb, N), 1)
                                == t_k[c0 : c0 + cb, :]
                            ).astype(f32)  # [cb, N]: row i one-hot at t_k[i]
                            occn[k][c0 : c0 + cb, :] = jax.lax.dot_general(
                                g_c, occ, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )

                @pl.when(jnp.logical_and(mode == 1, f > 0))
                def _delta_refresh():
                    ci_row = ci_ref[f]  # [1, C] i32, padded with N
                    cn_t = cnbr_ref[f]  # [C, KL] i32, padded with N
                    iota_cn = jax.lax.broadcasted_iota(jnp.int32, (C, N), 1)
                    iota_nc = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
                    s_m = (iota_nc == ci_row).astype(f32)  # [N, C] scatter map
                    # row mask of changed columns, derived from the scatter
                    # map (ci entries are unique) — replaces the rows path's
                    # chg input, whose [B, N, 1] transpose would lane-pad 128x
                    keep = 1.0 - jnp.sum(s_m, axis=1, keepdims=True)  # [N, 1]
                    occ = occ_out[:]
                    for k in range(K):
                        g_k = (iota_cn == cn_t[:, k : k + 1]).astype(f32)
                        delta_c = jax.lax.dot_general(
                            g_k, occ, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [C, TR] = occ at the new ids of changed columns
                        back = jax.lax.dot_general(
                            s_m, delta_c, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [N, TR], zero at unchanged columns
                        occn[k][:] = occn[k][:] * keep + back
            else:
                @pl.when(jnp.logical_or(mode == 2, f == 0))
                def _full_refresh():
                    # Column-chunked so the one-hot temporaries stay [N, CB]
                    # — at supercell N a full [N, N] intermediate (85 MB at
                    # N=4608) would spill past VMEM.
                    occ = occ_out[:]
                    CB = min(N, 512)
                    for k in range(K):
                        t_k = topi[k : k + 1, :].astype(jnp.int32)  # [1, N]
                        for c0 in range(0, N, CB):
                            cb = min(CB, N - c0)
                            g_c = (
                                jax.lax.broadcasted_iota(jnp.int32, (N, cb), 0)
                                == t_k[:, c0 : c0 + cb]
                            ).astype(f32)  # [N, cb]
                            occn[k][:, c0 : c0 + cb] = jax.lax.dot_general(
                                occ, g_c, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )

                @pl.when(jnp.logical_and(mode == 1, f > 0))
                def _delta_refresh():
                    ci_row = ci_ref[f]  # [1, C] i32, padded with N
                    cn = cnbr_ref[f]  # [KL, C] i32, padded with N
                    keep = 1.0 - chg_ref[f]  # [1, N]
                    iota_nc = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
                    s_t = (iota_nc == ci_row).astype(f32)  # [N, C] scatter map
                    occ = occ_out[:]
                    for k in range(K):
                        g_k = (iota_nc == cn[k : k + 1, :]).astype(f32)  # [N, C]
                        delta_c = jax.lax.dot_general(
                            occ, g_k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [TR, C] = occ at the new ids of changed columns
                        back = jax.lax.dot_general(
                            delta_c, s_t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [TR, N], zero at unchanged columns
                        occn[k][:] = occn[k][:] * keep + back

            frame_idx = frame0 + f
            frame_time = frame_idx.astype(f32) * f32(dt)

            phase_scr[:] = jnp.zeros(shape1, f32)
            done_scr[:] = jnp.zeros(shape1, jnp.bool_)

            ev_iter(tables, post, frame_idx, frame_time, 0)
            for ev in range(1, max_events):
                any_live = jnp.sum(
                    jnp.logical_not(done_scr[:]).astype(jnp.int32)
                ) > 0

                @pl.when(any_live)
                def _(ev=ev):
                    ev_iter(tables, post, frame_idx, frame_time, ev)

            trunc_out[:] = trunc_out[:] + jnp.logical_not(
                done_scr[:]
            ).astype(jnp.int32)

            if nbins:
                # distance-binned exposure of allowed transitions under the
                # post-event state (engine/lattice.py:339-356)
                rates = candidate_rates(tables, frame_time)
                for k in range(K):
                    d_k = tslice(topd_l, k)  # [1, N] rows / [N, 1] cols
                    inr = jnp.logical_and(d_k >= hist_lo, d_k < hist_hi)
                    braw = jnp.clip(
                        ((d_k - hist_lo) * f32(hist_scale)).astype(jnp.int32),
                        0, nbins - 1,
                    )
                    w = jnp.where(
                        jnp.logical_and(rates[k] > 0, inr), 1.0, 0.0
                    )  # state-shaped
                    for b in range(nbins):
                        val = sumR(jnp.where(braw == b, w, 0.0))
                        expo_out[:] = expo_out[:] + jnp.where(
                            iota_b == b, val, 0.0
                        )

            rates = candidate_rates(tables, frame_time)
            total = sumR(rates[0])
            for k in range(1, K):
                total = total + sumR(rates[k])
            u_out[:] = u_out[:] - total * (f32(dt) - phase_scr[:])
            return 0

        jax.lax.fori_loop(0, B, frame_body, 0)

        # first LOCAL tile writes the shared buffers: tile_id
        # includes the shard's tile offset, so guarding on it would
        # leave every shard but the first with stale/garbage
        # site_disp/prev_pos copies that GSPMD reads locally
        @pl.when(pl.program_id(0) == 0)
        def _():
            s_out[:] = s_scr[:]
            prev_out[:] = prev_scr[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "k_cand", "tile", "max_events", "dt", "seed", "has_interp",
        "interpret", "nbins", "hist_range", "track_matrix", "orthorhombic",
        "layout",
    ),
)
def topk_sweep(
    positions,  # [B, N, 3]
    topd, topi, resc,  # [B, KL, N]
    ci, cnbr, chg, mode,  # change metadata (topk_tables_delta)
    prev_pos, site_disp,  # [N, 3]
    occ, labels,  # [R, N]
    sites, tlast,  # [R, P]
    tlast_site,  # [R, N]
    disp_base,  # [R, P, 3]
    u_rem, ev_count,  # [R]
    law_params,  # [8]: law[6] + relaxation_time + pad
    frame0, cell_h, cell_hinv, tile_offset=0,
    jump_hist=None, exposure=None,
    *,
    kind: int, k_cand: int, tile: int, max_events: int, dt: float, seed: int,
    has_interp: bool, interpret: bool = False, nbins: int = 0,
    hist_range: tuple = (2.0, 3.0), track_matrix: bool = False,
    orthorhombic: bool = True, layout: str = "rows",
):
    """Run the fused top-K sweep over a block; returns the same dict as
    ops.kmc_sweep.kmc_sweep plus ``tlast_site``. All inputs/outputs are
    rows-oriented ([R, ...]) regardless of ``layout`` — the cols relayout
    (and its inverse) happens here, in XLA, where a [R, N]-sized transpose
    costs microseconds per block."""
    B, N, _ = positions.shape
    R = occ.shape[0]
    P = sites.shape[1]
    TR = tile
    C = ci.shape[-1]
    cols = layout == "cols"
    assert R % TR == 0, (R, TR)
    grid = (R // TR,)
    n_tiles = R // TR

    kernel = _make_kernel(
        n_sites=N, n_protons=P, tile=TR, block=B, max_events=max_events,
        kind=kind, k_cand=k_cand, dt=dt, seed=seed, has_interp=has_interp,
        nbins=nbins, hist_range=hist_range, track_matrix=track_matrix,
        orthorhombic=orthorhombic, cmax=C, cols=cols,
    )

    box = jnp.concatenate([
        jnp.asarray(cell_h, jnp.float32).reshape(9),
        jnp.asarray(cell_hinv, jnp.float32).reshape(9),
    ])
    ints = jnp.stack([
        jnp.asarray(frame0, jnp.int32), jnp.asarray(tile_offset, jnp.int32)
    ])
    post = jnp.swapaxes(jnp.asarray(positions, jnp.float32), 1, 2)

    def rep_spec(*shape):
        if cols:
            return pl.BlockSpec(
                (*shape, TR), lambda r: (0,) * len(shape) + (r,),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (TR, *shape), lambda r: (r,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    # state orientation: [R, ...] rows / [..., R] cols
    st = (lambda x: x.T) if cols else (lambda x: x)
    s1 = (lambda x: x.reshape(1, R)) if cols else (lambda x: x.reshape(R, 1))

    dbx = st(disp_base[..., 0])
    dby = st(disp_base[..., 1])
    dbz = st(disp_base[..., 2])

    inputs = [
        box, ints, mode.astype(jnp.int32),
        jnp.asarray(law_params, jnp.float32),
        post, topd, topi,
    ]
    in_specs = [smem(), smem(), smem(), smem(), full(), full(), full()]
    if cols:
        inputs += [
            jnp.swapaxes(topd, 1, 2), jnp.swapaxes(topi, 1, 2),
            jnp.swapaxes(resc, 1, 2),
            ci.astype(jnp.int32),
            jnp.swapaxes(cnbr.astype(jnp.int32), 1, 2),
        ]
        in_specs += [full()] * 5
    else:
        inputs += [
            resc, ci.astype(jnp.int32), cnbr.astype(jnp.int32),
            jnp.asarray(chg, jnp.float32),
        ]
        in_specs += [full()] * 4
    inputs += [
        jnp.asarray(prev_pos, jnp.float32).T,
        jnp.asarray(site_disp, jnp.float32).T,
        st(occ), st(labels), st(sites.astype(jnp.int32)), st(tlast),
        st(jnp.asarray(tlast_site, jnp.float32)),
        dbx, dby, dbz,
        s1(u_rem), s1(ev_count.astype(jnp.int32)),
    ]
    in_specs += [
        full(), full(),
        rep_spec(N), rep_spec(N), rep_spec(P), rep_spec(P),
        rep_spec(N),
        rep_spec(P), rep_spec(P), rep_spec(P), rep_spec(1), rep_spec(1),
    ]
    if nbins:
        inputs += [st(jump_hist.astype(jnp.int32)),
                   st(exposure.astype(jnp.float32))]
        in_specs += [rep_spec(nbins), rep_spec(nbins)]

    def shp(*s):
        return (*s, R) if cols else (R, *s)

    out_shapes = [
        jax.ShapeDtypeStruct(shp(N), jnp.float32),   # occ
        jax.ShapeDtypeStruct(shp(N), jnp.float32),   # labels
        jax.ShapeDtypeStruct(shp(P), jnp.int32),     # sites
        jax.ShapeDtypeStruct(shp(P), jnp.float32),   # tlast
        jax.ShapeDtypeStruct(shp(N), jnp.float32),   # tlast_site
        jax.ShapeDtypeStruct(shp(P), jnp.float32),   # dbx
        jax.ShapeDtypeStruct(shp(P), jnp.float32),   # dby
        jax.ShapeDtypeStruct(shp(P), jnp.float32),   # dbz
        jax.ShapeDtypeStruct(shp(1), jnp.float32),   # u
        jax.ShapeDtypeStruct(shp(1), jnp.int32),     # evc
        jax.ShapeDtypeStruct((3, N), jnp.float32),   # site_disp
        jax.ShapeDtypeStruct((3, N), jnp.float32),   # prev
        jax.ShapeDtypeStruct(shp(1), jnp.int32),     # trunc
    ]
    out_specs = [
        rep_spec(N), rep_spec(N), rep_spec(P), rep_spec(P), rep_spec(N),
        rep_spec(P), rep_spec(P), rep_spec(P), rep_spec(1), rep_spec(1),
        full(), full(), rep_spec(1),
    ]
    if nbins:
        out_shapes += [
            jax.ShapeDtypeStruct(shp(nbins), jnp.int32),
            jax.ShapeDtypeStruct(shp(nbins), jnp.float32),
        ]
        out_specs += [rep_spec(nbins), rep_spec(nbins)]
    if track_matrix:
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles, N, N), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, N, N), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
        )

    # aliases: prev/s0 and every replica-state input onto its output (the
    # input list shifts by one between layouts: cols swaps {resc, chg} for
    # the three transposed tables)
    base = 12 if cols else 11
    aliases = {base: 11, base + 1: 10}
    for i in range(10):
        aliases[base + 2 + i] = i
    if nbins:
        aliases[base + 12] = 13
        aliases[base + 13] = 14

    scratch = [
        pltpu.VMEM((3, N), jnp.float32),  # s_scr
        pltpu.VMEM((3, N), jnp.float32),  # prev_scr
        pltpu.VMEM((1, TR) if cols else (TR, 1), jnp.float32),  # phase
        pltpu.VMEM((1, TR) if cols else (TR, 1), jnp.bool_),  # done
        pltpu.VMEM((8, N), jnp.float32),  # coord_scr
        pltpu.VMEM((2 * topd.shape[1], N), jnp.float32),  # tab_scr
    ] + [
        pltpu.VMEM((N, TR) if cols else (TR, N), jnp.float32)
        for _ in range(k_cand)
    ]  # occn

    # the resident [B, KL, N] candidate tables blow Mosaic's default 16 MB
    # scoped-VMEM cap at supercell N / long blocks — raise it to the estimate
    from cmdlmc_tpu.ops.vmem_budget import limit_bytes

    kl = topd.shape[1]
    vmem = vmem_estimate(
        n_sites=N, n_protons=P, tile=TR, block=B, kl=kl, cmax=C,
        k_cand=k_cand, nbins=nbins, track_matrix=track_matrix, cols=cols,
    )
    if not interpret and vmem > HW_VMEM_BYTES:
        raise ValueError(
            f"top-K kernel VMEM estimate {vmem >> 20} MB exceeds the chip's "
            f"{HW_VMEM_BYTES >> 20} MB at tile={TR}, block={B}, N={N}: "
            "reduce [Engine] tile and/or block_size (the resident candidate "
            "tables scale with block*N, the event-loop state with tile*N)"
        )

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=limit_bytes(vmem)
        ),
        input_output_aliases=aliases,
    )(*inputs)

    (occ2, lab2, sites2, tlast2, tls2, dbx2, dby2, dbz2, u2, evc2, s2, prev2,
     trunc2) = res[:13]
    if cols:
        occ2, lab2, sites2, tlast2, tls2 = (
            occ2.T, lab2.T, sites2.T, tlast2.T, tls2.T
        )
        dbx2, dby2, dbz2 = dbx2.T, dby2.T, dbz2.T
    out = {
        "occ": occ2,
        "labels": lab2,
        "sites": sites2,
        "tlast": tlast2,
        "tlast_site": tls2,
        "disp_base": jnp.stack([dbx2, dby2, dbz2], axis=-1),
        "u_rem": u2.reshape(R),
        "ev_count": evc2.reshape(R),
        "site_disp": s2.T,
        "prev_pos": prev2.T,
        "trunc": trunc2.reshape(R),
    }
    idx = 13
    if nbins:
        out["jump_hist"] = res[idx].T if cols else res[idx]
        out["exposure"] = res[idx + 1].T if cols else res[idx + 1]
        idx += 2
    if track_matrix:
        out["jump_matrix"] = res[idx].sum(axis=0)
    return out


def entry_tlast_site(occ, proton_of_site, t_last_jump):
    """[R, N] last-jump time of the occupying proton (-1 where unoccupied or
    never jumped) — recomputed at every block entry, so it never needs to be
    checkpointed. ``proton_of_site`` may be the kernel's float labels."""
    p_idx = jnp.maximum(
        jnp.round(proton_of_site).astype(jnp.int32) - 1, 0
    )  # [R, N]
    tls = jnp.take_along_axis(t_last_jump, p_idx, axis=1)
    return jnp.where((occ > 0) & (tls >= 0), tls, -1.0)


def _entry_tlast_site(rep):
    return entry_tlast_site(rep.occ, rep.proton_of_site, rep.t_last_jump)


# v5e VMEM capacity. The total estimate below tracks the measured
# compile-time footprint within ~10% (N=4608/P=3072/TR=128/B=128: estimate
# 181 MB vs XLA-reported 168 MB used). Mosaic's SCOPED stack size is
# scheduling-dependent (measured 104-117 MB across tile/block combinations
# at N=4608 with no monotone pattern), so the dispatch policy below uses
# split per-term budgets calibrated on hardware compiles instead of one
# total: at N=4608/P=3072/cmax=576 (v5e), (tile=64, block=64) compiles and
# runs at 2.77 G su/s while (64,128), (128,32) and (128,128) are all
# rejected by the compiler.
HW_VMEM_BYTES = 128 << 20
_TR_STATE_BUDGET = 26 << 20  # tile-linear event-loop state (TR=64 @N=4608: 24.3 MB ok; TR=128: 49 MB OOM)
_RESIDENT_BUDGET = 52 << 20  # block-resident tables (B=64 @N=4608: 49.4 MB ok; B=128: 98.8 MB OOM)
_NC_BUDGET = 36 << 20  # delta-refresh [N, cmax] one-hot temporaries (N=4608 default cmax=576 -> 35.4 MB padded: ok)


def _tr_state_bytes(n_sites: int, n_protons: int, tile: int,
                    k_cand: int, cols: bool = False) -> int:
    from cmdlmc_tpu.ops.vmem_budget import padded_bytes as padded

    if cols:
        return (
            (6 + k_cand) * padded(n_sites, tile)
            + 10 * padded(n_protons, tile)
            + 7 * padded(1, tile)
        )
    return (
        (6 + k_cand) * padded(tile, n_sites)  # occ/labels/tls in+out, occn
        + 10 * padded(tile, n_protons)
        + 7 * padded(tile, 1)
    )


def _resident_bytes(n_sites: int, block: int, kl: int,
                    cols: bool = False) -> int:
    from cmdlmc_tpu.ops.vmem_budget import padded_bytes as padded

    # post + topd/topi/resc [+ chg], all [B, ., N] and resident across the
    # grid; cols adds the three [B, N, KL] transposed tables (KL lane-pads
    # to 128, so these dominate the cols residency) and drops chg
    base = padded(block, 3, n_sites) + 2 * padded(block, kl, n_sites)
    if cols:
        return base + 3 * padded(block, n_sites, kl)
    return base + padded(block, kl, n_sites) + padded(block, 1, n_sites)


def vmem_estimate(*, n_sites: int, n_protons: int, tile: int, block: int,
                  kl: int, cmax: int, k_cand: int, nbins: int,
                  track_matrix: bool, cols: bool = False) -> int:
    """Total VMEM footprint of one :func:`topk_sweep` grid step in bytes:
    the block-resident candidate tables plus the per-tile event-loop state
    and scratch (same accounting the compiler budget is derived from)."""
    from cmdlmc_tpu.ops.vmem_budget import padded_bytes as padded

    N, C = n_sites, cmax
    vmem = _resident_bytes(N, block, kl, cols)
    # change-metadata tables + the delta path's one-hot temporaries
    vmem += padded(block, 1, C)
    if cols:
        vmem += padded(block, C, kl)
        vmem += padded(C, N) + padded(N, C) + padded(C, tile)
    else:
        vmem += padded(block, kl, C)
        vmem += 3 * padded(N, C)
    vmem += _tr_state_bytes(N, n_protons, tile, k_cand, cols)
    vmem += 6 * padded(3, N) + padded(8, N)
    vmem += padded(2 * kl, N)  # tab_scr
    if nbins:
        vmem += 4 * (padded(nbins, tile) if cols else padded(tile, nbins))
    if track_matrix:
        vmem += padded(N, N)
    return vmem


def pick_tile_topk(n_replicas: int, *, n_sites: int, n_protons: int,
                   block: int, k_cand: int, nbins: int, track_matrix: bool,
                   target: int | None = None, cols: bool = False) -> int:
    """Largest replica tile (divisor of R, <= target) whose tile-linear
    event-loop state fits the empirical scoped-stack budget — replaces the
    site-count thresholds of :func:`engine.fused.pick_tile` for the top-K
    path. Block length is handled separately (:func:`pick_frame_chunk`).
    Cols targets TR=256: replicas are the lane axis there, and two lane-cols
    per op amortize fixed per-op overhead (measured N=144/k=8 v5e: 2.63 G at
    TR=256 vs 2.33 at 128; rows regresses past 128)."""
    del block, nbins, track_matrix  # bounded by the frame-chunk policy
    if target is None:
        target = 256 if cols else 128
    kc = min(k_cand, n_sites - 1)
    t = min(target, n_replicas)
    while n_replicas % t:
        t -= 1
    while t > 8 and _tr_state_bytes(n_sites, n_protons, t, kc,
                                    cols) > _TR_STATE_BUDGET:
        nt = t // 2
        while n_replicas % nt:
            nt -= 1
        t = nt
    return t


def pick_frame_chunk(n_frames: int, n_sites: int, k_cand: int,
                     cols: bool = False) -> int:
    """Largest frame sub-block whose resident candidate tables fit the
    empirical budget. Chunking a block is bit-exact: RNG draws are keyed by
    global frame and event ordinal, and every chunk entry does a full
    occ[nbr] refresh, which is identical to the delta-maintained state."""
    kl = _pad_k(min(k_cand, n_sites - 1))
    b = n_frames
    while b > 1 and _resident_bytes(n_sites, b, kl, cols) > _RESIDENT_BUDGET:
        b = (b + 1) // 2
    return b


def pick_layout_topk(n_sites: int, interpret: bool) -> str:
    """Top-K kernel state layout: ONE rule shared with the dense streamed
    kernel (engine.fused.pick_layout — sites-major "cols" whenever N is not
    a multiple of 128, rows in interpret). At the supercell sizes where the
    top-K kernel is the only fit (N = 4608, 9216) N divides 128 and rows has
    no lane padding, while the small-N top-K / hydronium configs
    (N = 144, 216) pay 44%+ dead lanes rows-major."""
    from cmdlmc_tpu.engine.fused import pick_layout

    return pick_layout(n_sites, interpret)


def default_cmax(n_sites: int) -> int:
    """Delta-refresh width: enough columns for typical per-frame identity
    churn (which scales with N) while keeping the delta matmuls
    O(K*N*C) << O(K*N^2). N/8 columns changing per frame still gives an
    8x-smaller refresh; more than that falls back to the full gather.
    Capped so the delta pass's [N, cmax] one-hot temporaries stay within
    the scoped-VMEM budget at large N (results are cmax-independent — a
    narrower width only trades delta refreshes for column-chunked full
    ones)."""
    from cmdlmc_tpu.ops.vmem_budget import padded_bytes as padded

    c = max(min(max(256, n_sites // 8), n_sites, 1024), 1)
    while c > 128 and 3 * padded(n_sites, c) > _NC_BUDGET:
        c -= 128
    return c


def run_block_topk(
    model,
    ens,
    frames_positions,
    frame0: int,
    *,
    dt: float,
    max_events: int = 4,
    seed: int = 0,
    tile: int,
    interpret: bool = False,
    tile_offset=0,
    hist_range: tuple = (2.0, 3.0),
    cmax: int | None = None,
    layout: str | None = None,
    reuse: bool = False,
    chunk: int | None = None,
):
    """EnsembleState adapter: stage-1 XLA tables + stage-2 Pallas sweep.
    Returns the kmc_sweep-style output dict. ``cmax < 0`` disables the
    incremental occ[nbr] maintenance (full per-frame refresh — the exactness
    oracle; results are bit-identical either way). ``layout=None`` auto-picks
    via :func:`pick_layout_topk`. ``reuse=True`` freezes candidate identities
    between displacement-triggered rebuilds (:func:`topk_tables_verlet`) —
    the carry threads through ``ens.nbr_carry`` and the returned dict.

    ``chunk`` caps the per-kernel-launch frame count (the resident candidate
    tables must fit VMEM — engine.fused passes :func:`pick_frame_chunk`).
    Stage 1 still runs ONCE over the whole block and the kernel consumes
    table slices: one host round trip (the Verlet rebuild-schedule fetch /
    the sparse-plan build) per block instead of per chunk, and every chunk
    entry forces a full occ[nbr] refresh (mode 2), which is bit-identical to
    the delta-maintained state — the engine's chunk-invariance property."""
    rep = ens.replicas
    nbins = rep.jump_hist.shape[-1]
    track_matrix = rep.jump_matrix.shape[-1] != 0
    positions = jnp.asarray(frames_positions, jnp.float32)
    B = positions.shape[0]
    k_cand = min(int(model.k), positions.shape[1] - 1)
    relax = jnp.float32(0.0)
    has_interp = isinstance(model, HydroniumRates) and model.interpolator is not None
    if has_interp:
        relax = jnp.float32(model.interpolator.relaxation_time)
    if cmax is None:
        cmax = default_cmax(positions.shape[1])
    if layout is None:
        layout = pick_layout_topk(positions.shape[1], bool(interpret))
    new_carry = None
    if reuse:
        (topd, topi, resc, ci, cnbr, chg, mode, new_carry) = topk_tables_verlet(
            model, positions, _pad_k(k_cand), not has_interp, ens.nbr_carry,
            int(frame0),
        )
    else:
        topd, topi, resc, ci, cnbr, chg, mode = topk_tables_delta(
            model, positions, _pad_k(k_cand), not has_interp, cmax
        )
    params = jnp.concatenate([
        law_params_array(model.law),
        jnp.stack([relax, jnp.float32(0.0)]),
    ])

    sweep_kwargs = dict(
        jump_hist=rep.jump_hist if nbins else None,
        exposure=rep.opportunity_hist if nbins else None,
        kind=law_kind(model.law),
        k_cand=k_cand,
        tile=tile,
        max_events=max_events,
        dt=float(dt),
        seed=int(seed),
        has_interp=bool(has_interp),
        interpret=bool(interpret),
        nbins=nbins,
        hist_range=tuple(hist_range),
        track_matrix=track_matrix,
        orthorhombic=bool(model.cell.orthorhombic),
        layout=layout,
    )
    state = (
        ens.prev_pos, ens.site_disp,
        rep.occ,
        rep.proton_of_site.astype(jnp.float32),
        rep.site_of_proton,
        rep.t_last_jump,
        _entry_tlast_site(rep),
        rep.disp_base,
        rep.clock.u_remaining,
        rep.clock.event_count,
    )
    chunk = B if chunk is None else min(chunk, B)
    out = None
    trunc_total = None
    jm_total = None
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        sliced = (
            (positions, topd, topi, resc, ci, cnbr, chg, mode)
            if chunk == B else
            _chunk_slices(positions, topd, topi, resc, ci, cnbr, chg, mode,
                          lo, hi)
        )
        out = topk_sweep(
            *sliced,
            *state,
            params,
            jnp.int32(frame0 + lo),
            model.cell.h,
            model.cell.h_inv,
            tile_offset,
            **sweep_kwargs,
        )
        state = (
            out["prev_pos"], out["site_disp"],
            out["occ"], out["labels"], out["sites"], out["tlast"],
            out["tlast_site"], out["disp_base"],
            out["u_rem"], out["ev_count"],
        )
        if nbins:
            sweep_kwargs["jump_hist"] = out["jump_hist"]
            sweep_kwargs["exposure"] = out["exposure"]
        trunc_total = (
            out["trunc"] if trunc_total is None else trunc_total + out["trunc"]
        )
        if track_matrix:
            jm_total = (
                out["jump_matrix"] if jm_total is None
                else jm_total + out["jump_matrix"]
            )
    out["trunc"] = trunc_total
    if track_matrix:
        out["jump_matrix"] = jm_total
    if new_carry is not None:
        out["nbr_carry"] = new_carry
    return out
