"""Fused Pallas sweep kernel for the single-excess-proton water model.

Companion to ops/kmc_sweep.py for the legacy "KMCWater" family
(models/water.py): one ``pallas_call`` advances a tile of replicas across a
frame block with everything on-chip —

  per frame (shared within the tile):
    1. [N, N] minimum-image distance matrix (positions kept in [3, N] layout)
    2. iterative top-K nearest neighbors per site (argmin + mask, K = n_atoms)
    3. distance rescaling (none / linear / ramp) into an [N, K] table
  per replica (vector ops over the tile):
    4. candidate gathers as one-hot MXU matmuls (site row of the K tables)
    5. relaxation blend, back-jump rescaling (incl. the 4-neighbor slot
       shift), waiting-time gate, rate law
    6. KMC clock + 3-way selection + d_OH correction + displacement rebase

All four rescale modes run in-kernel — none / linear / ramp / interpolated
table (the legacy ``conversion_data`` key: the table points live in SMEM and
each segment is an unrolled masked lerp, reproducing jnp.interp + the
reference clamp semantics) — as does ``check_from_old`` (excess_kmc.py:111-126:
when the back-connection new -> old is missing but old's candidate row still
contains the new site, the farthest candidate is swapped for the old oxygen at
its rescaled distance). RNG and determinism rules match kmc_sweep.py
(counter-based hash keyed by (seed, tile, absolute frame, event iter)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.ops.kmc_sweep import _apply_law, _mix_key, _u01, _u01_t

Array = jax.Array

_BIG = 1.0e9

# transform kinds
T_NONE, T_LINEAR, T_RAMP, T_INTERP = 0, 1, 2, 3

# table-size ceiling for the in-kernel interpolated transform (each segment is
# an unrolled masked lerp; larger tables should be thinned offline)
MAX_INTERP_POINTS = 1024


def _apply_transform(tkind: int, d, tp, tx=None, ty=None, m_interp=0):
    """tp = [a, b, d0, left, right]; tx/ty = SMEM-scalar lists of the
    interpolation table (tkind == T_INTERP only)."""
    if tkind == T_NONE:
        return d
    if tkind == T_LINEAR:
        inside = jnp.logical_and(tp[3] < d, d < tp[4])
        return jnp.where(inside, tp[0] * d + tp[1], d)
    if tkind == T_INTERP:
        # reference clamp semantics (topo/transforms.py:71-89): below x[0] ->
        # y[0], above x[-1] -> unchanged, inside -> linear interpolation
        res = jnp.where(d < tx[0], ty[0], d)
        for j in range(m_interp - 1):
            x0, x1, y0, y1 = tx[j], tx[j + 1], ty[j], ty[j + 1]
            t = (d - x0) / jnp.maximum(x1 - x0, 1e-12)
            inside = jnp.logical_and(d >= x0, d < x1)
            res = jnp.where(inside, y0 + t * (y1 - y0), res)
        res = jnp.where(d == tx[m_interp - 1], ty[m_interp - 1], res)
        return res
    # ramp / ReLU
    resc = jnp.where(d < tp[2], tp[1], tp[0] * (d - tp[2]) + tp[1])
    outside = jnp.logical_or(d <= tp[3], tp[4] <= d)
    return jnp.where(outside, d, resc)


def _make_kernel(*, n_sites, tile, block, k_atoms, kind, tkind, dt, seed,
                 relax, waiting, keep_last, check_old, d_oh, max_events,
                 m_interp=0, cols=False):
    """``cols=True`` lays replica state out candidates/sites-major ([KL, TR] /
    [N, TR] instead of [TR, KL] / [TR, N]) — same relayout as
    ops/kmc_sweep_streamed.py, but the win is larger here: the water event
    loop is dominated by [TR, KL=8] and [TR, 1] tensors whose last axis pads
    to 128 lanes (16x dead VPU work); in cols layout the replicas ride the
    lanes exactly and those tensors shrink to one vreg. RNG draws stay
    element-identical per replica via _u01_t; reduction/matmul ORDER differs,
    so results are distribution-equal to rows, not bitwise (own tests)."""
    N, TR, B, K = n_sites, tile, block, k_atoms
    f32 = jnp.float32
    KL = 8  # lane-padded candidate width

    # orientation shims: every replica-state tensor is [KL|N|3|1, TR] in cols
    # layout and [TR, KL|N|3|1] in rows layout
    if cols:
        sumK = lambda x: jnp.sum(x, axis=0, keepdims=True)
        argK = lambda x: jnp.argmax(x, axis=0)[None, :]
        draw = lambda key: _u01_t(key, (1, TR))
        shape1 = (1, TR)
    else:
        sumK = lambda x: jnp.sum(x, axis=1, keepdims=True)
        argK = lambda x: jnp.argmax(x, axis=1)[:, None]
        draw = lambda key: _u01(key, (TR, 1))
        shape1 = (TR, 1)

    def kernel(
        box_ref,  # SMEM f32 [4]
        ints_ref,  # SMEM i32 [2]: frame0, tile_offset
        lp_ref,  # SMEM f32 [6] law params
        tp_ref,  # SMEM f32 [5] transform params
        tx_ref,  # SMEM f32 [M] interp table x (dummy [1] unless T_INTERP)
        ty_ref,  # SMEM f32 [M] interp table y
        post_ref,  # [B, 3, N]
        prev_ref, s0_ref,  # [3, N]
        site_ref, last_ref, fsj_ref, wait_ref, jumps_ref, evc_ref,  # shape1 i32
        u_ref,  # shape1 f32
        corr_ref,  # [TR, 3] rows / [3, TR] cols f32
        a_ref,  # disp_base, same orientation as corr
        # outputs
        site_out, last_out, fsj_out, wait_out, jumps_out, evc_out,
        u_out, corr_out, a_out, s_out, prev_out, trunc_out,
        # scratch
        s_scr, prev_scr, d_scr, topd_scr, topi_scr, resc_scr,
        phase_scr, done_scr,
    ):
        box = [box_ref[0], box_ref[1], box_ref[2]]
        frame0 = ints_ref[0]
        tile_id = pl.program_id(0) + ints_ref[1]
        lp = [lp_ref[i] for i in range(6)]
        tp = [tp_ref[i] for i in range(5)]
        tx = [tx_ref[i] for i in range(m_interp)] if tkind == T_INTERP else None
        ty = [ty_ref[i] for i in range(m_interp)] if tkind == T_INTERP else None

        site_out[:] = site_ref[:]
        last_out[:] = last_ref[:]
        fsj_out[:] = fsj_ref[:]
        wait_out[:] = wait_ref[:]
        jumps_out[:] = jumps_ref[:]
        evc_out[:] = evc_ref[:]
        u_out[:] = u_ref[:]
        corr_out[:] = corr_ref[:]
        a_out[:] = a_ref[:]
        trunc_out[:] = jnp.zeros(shape1, jnp.int32)
        s_scr[:] = s0_ref[:]
        prev_scr[:] = prev_ref[:]

        iota_n = jax.lax.broadcasted_iota(
            jnp.int32, (N, TR) if cols else (TR, N), 0 if cols else 1
        )
        iota_k = jax.lax.broadcasted_iota(
            jnp.int32, (KL, TR) if cols else (TR, KL), 0 if cols else 1
        )
        lane_nn = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0 if cols else 1)

        def minimg1(delta, length):
            return delta - length * jnp.round(delta / length)

        def oh_dot(a, b):
            # standard dim1-dim0 contraction in BOTH layouts (a dim0-dim0
            # form inside @pl.when trips the XLA MXU-transpose RET_CHECK,
            # see ops/kmc_sweep_streamed.py)
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def gather_k(table_scr, oh):
            # rows: [TR, N] one-hot @ [N, KL] table; cols: [KL, N] table @
            # [N, TR] one-hot -> candidate rows per replica
            return oh_dot(table_scr, oh) if cols else oh_dot(oh, table_scr)

        def candidates(site, last, fsj, wait):
            """(rates, cand_i) [TR, KL] (rows) / [KL, TR] (cols) f32."""
            oh_site = (iota_n == site).astype(f32)  # site shape1
            cand_d = gather_k(topd_scr[:], oh_site)
            cand_r = gather_k(resc_scr[:], oh_site)
            cand_i = gather_k(topi_scr[:], oh_site)

            if relax > 0:
                # clip below too: fsj = -1 right after a jump so the FIRST
                # frame after it evaluates at factor 0 (fully unrescaled),
                # matching the reference's relaxation_counter which starts
                # at 0 on the next generator pull (excess_kmc.py:205-221)
                factor = jnp.clip(fsj.astype(f32) / f32(relax), 0.0, 1.0)
                d_eff = cand_d + factor * (cand_r - cand_d)
            else:
                d_eff = cand_r

            if keep_last:
                is_last = jnp.logical_and(
                    cand_i == last.astype(f32), last >= 0
                )  # [TR, KL]
                d_eff = jnp.where(is_last, cand_r, d_eff)
                if K == 4:
                    # old neighbor in slot 3 -> promote to slot 2
                    in3 = sumK(
                        jnp.where(iota_k == 3, is_last.astype(f32), 0.0)
                    ) > 0
                    v3 = sumK(jnp.where(iota_k == 3, d_eff, 0.0))
                    i3 = sumK(jnp.where(iota_k == 3, cand_i, 0.0))
                    slot2 = iota_k == 2
                    d_eff = jnp.where(jnp.logical_and(slot2, in3), v3, d_eff)
                    cand_i = jnp.where(jnp.logical_and(slot2, in3), i3, cand_i)
                elif check_old:
                    # excess_kmc.py:111-126: the connection exists only
                    # old -> new — swap the farthest active candidate for the
                    # old oxygen at old's rescaled distance
                    lastf = last.astype(f32)
                    oh_last = (iota_n == jnp.maximum(last, 0)).astype(f32)
                    old_i = gather_k(topi_scr[:], oh_last)
                    old_r = gather_k(resc_scr[:], oh_last)
                    site_f = site.astype(f32)
                    eq_site = jnp.logical_and(old_i == site_f, iota_k < K)
                    to_old_missing = sumK(jnp.where(is_last, 1.0, 0.0)) == 0
                    new_in_old = jnp.logical_and(
                        sumK(jnp.where(eq_site, 1.0, 0.0)) > 0,
                        last >= 0,
                    )
                    do_swap = jnp.logical_and(to_old_missing, new_in_old)
                    # argmax over the 3 active slots (first max wins, matching
                    # jnp.argmax in the scan model)
                    d_act = jnp.where(iota_k < 3, d_eff, -jnp.inf)
                    far = argK(d_act)  # shape1
                    # old's rescaled distance at the first slot matching site
                    first_eq = argK(eq_site.astype(f32))
                    old_dist = sumK(jnp.where(iota_k == first_eq, old_r, 0.0))
                    sel = jnp.logical_and(iota_k == far, do_swap)
                    d_eff = jnp.where(sel, old_dist, d_eff)
                    cand_i = jnp.where(sel, lastf, cand_i)

            rates = _apply_law(kind, d_eff, lp)
            rates = jnp.where(iota_k < 3, rates, 0.0)  # only first 3 candidates
            rates = jnp.where(wait > 0, 0.0, rates)
            return rates, cand_i

        def ev_iter(post, frame_idx, frame_time, ev):
            site = site_out[:]
            last = last_out[:]
            fsj = fsj_out[:]
            wait = wait_out[:]
            rates, cand_i = candidates(site, last, fsj, wait)
            total = sumK(rates)

            phase = phase_scr[:]
            done = done_scr[:]
            u = u_out[:]
            budget = total * (f32(dt) - phase)
            fire = jnp.logical_and(jnp.logical_not(done), u <= budget)
            fire = jnp.logical_and(fire, budget > 0)
            safe_total = jnp.where(total > 0, total, 1.0)
            eph = phase + u / safe_total

            key2 = _mix_key(seed, tile_id, frame_idx, ev, 12)
            u2 = draw(key2) * total
            # 3-way inverse CDF without cumsum (not lowerable in Mosaic):
            # lane sums r0, r0+r1 as masked reductions
            r0 = sumK(jnp.where(iota_k == 0, rates, 0.0))
            r1 = sumK(jnp.where(iota_k == 1, rates, 0.0))
            pick = (u2 >= r0).astype(jnp.int32) + (u2 >= r0 + r1).astype(jnp.int32)
            pick = jnp.minimum(pick, 2)
            dst_f = sumK(jnp.where(iota_k == pick, cand_i, 0.0))
            dst = jnp.round(dst_f).astype(jnp.int32)

            firef = fire.astype(f32)
            oh_old = (iota_n == site).astype(f32)
            oh_new = (iota_n == dst).astype(f32)
            if cols:
                # [3, TR] gathers: post/s_scr are ALREADY [3, N] — one
                # standard matmul each, no per-event transpose
                p_old = oh_dot(post, oh_old)
                p_new = oh_dot(post, oh_new)
                s_old = oh_dot(s_scr[:], oh_old)
                s_new = oh_dot(s_scr[:], oh_new)
                jump = jnp.concatenate([
                    minimg1(p_new[i : i + 1, :] - p_old[i : i + 1, :], box[i])
                    for i in range(3)
                ], axis=0)  # [3, TR]
            else:
                # [TR, 3] position/prefix gathers via one MXU dot each
                post_t = jnp.transpose(post)  # [N, 3]
                s_t = jnp.transpose(s_scr[:])  # [N, 3]
                p_old = oh_dot(oh_old, post_t)
                p_new = oh_dot(oh_new, post_t)
                s_old = oh_dot(oh_old, s_t)
                s_new = oh_dot(oh_new, s_t)
                jump = jnp.stack([
                    minimg1(p_new[:, i] - p_old[:, i], box[i]) for i in range(3)
                ], axis=1)  # [TR, 3]

            a_out[:] = a_out[:] + firef * (s_old - s_new + jump)
            if d_oh != 0.0:
                # correction points new -> old: the proton lands 2 d_OH short
                # of the full O-O step (PositionTracker computes
                # atombox.distance(new, old) = old - new, excess_kmc.py:265-277)
                norm2 = sumK(jump * jump)
                inv = jax.lax.rsqrt(jnp.maximum(norm2, 1e-12))
                corr_out[:] = corr_out[:] - firef * (2.0 * f32(d_oh)) * jump * inv

            last_out[:] = jnp.where(fire, site, last)
            site_out[:] = jnp.where(fire, dst, site)
            # fsj = -1 / wait = waiting+1: the end-of-frame counter pass
            # (fsj += 1, wait -= 1) runs on the jump frame too, so these
            # offsets make the NEXT frame see fsj=0 (relaxation factor 0) and
            # the next `waiting` frames see wait > 0 — the reference consumes
            # both counters once per generator pull AFTER the jump frame
            # (excess_kmc.py:205-246)
            fsj_out[:] = jnp.where(fire, -1, fsj)
            wait_out[:] = jnp.where(
                fire, jnp.int32(waiting + 1 if waiting else 0), wait)
            jumps_out[:] = jumps_out[:] + fire.astype(jnp.int32)
            evc_out[:] = evc_out[:] + fire.astype(jnp.int32)

            key3 = _mix_key(seed, tile_id, frame_idx, ev, 13)
            fresh_u = -jnp.log(draw(key3))
            u_out[:] = jnp.where(fire, fresh_u, u)
            phase_scr[:] = jnp.where(fire, eph, phase)
            done_scr[:] = jnp.logical_or(done, jnp.logical_not(fire))

        def frame_body(f, _):
            post = post_ref[f]  # [3, N]

            for dim in range(3):
                d = minimg1(
                    post[dim : dim + 1, :] - prev_scr[dim : dim + 1, :], box[dim]
                )
                s_scr[dim : dim + 1, :] = s_scr[dim : dim + 1, :] + d
            prev_scr[:] = post

            # distance matrix (rows = sites, lanes = neighbors)
            RB = min(N, 256 if N <= 512 else 128)
            for r0 in range(0, N, RB):
                rb = min(RB, N - r0)
                acc = jnp.zeros((rb, N), f32)
                for dim in range(3):
                    rowvals = jnp.transpose(post[dim : dim + 1, r0 : r0 + rb])
                    dd = minimg1(rowvals - post[dim : dim + 1, :], box[dim])
                    acc += dd * dd
                ii = jax.lax.broadcasted_iota(jnp.int32, (rb, N), 0) + r0
                jj = jax.lax.broadcasted_iota(jnp.int32, (rb, N), 1)
                d_scr[r0 : r0 + rb, :] = jnp.where(
                    ii == jj, _BIG, jnp.sqrt(acc)
                )

            # iterative top-K nearest neighbors per site. The distance matrix
            # is exactly symmetric (minimg1(-x) == -minimg1(x), squared), so
            # the cols layout reduces along axis 0 — same values, same
            # first-win tie order, bit-identical tables transposed.
            for kk in range(K):
                if cols:
                    vals = jnp.min(d_scr[:], axis=0, keepdims=True)  # [1, N]
                    idx = jnp.argmin(d_scr[:], axis=0)[None, :]  # [1, N]
                    sel = jax.lax.broadcasted_iota(
                        jnp.int32, (KL, N), 0
                    ) == kk
                else:
                    vals = jnp.min(d_scr[:], axis=1, keepdims=True)  # [N, 1]
                    idx = jnp.argmin(d_scr[:], axis=1)[:, None]  # [N, 1]
                    sel = jax.lax.broadcasted_iota(
                        jnp.int32, (N, KL), 1
                    ) == kk
                topd_scr[:] = jnp.where(sel, vals, topd_scr[:])
                topi_scr[:] = jnp.where(sel, idx.astype(f32), topi_scr[:])
                d_scr[:] = jnp.where(lane_nn == idx, _BIG, d_scr[:])
            resc_scr[:] = _apply_transform(
                tkind, topd_scr[:], tp, tx=tx, ty=ty, m_interp=m_interp
            )

            frame_idx = frame0 + f
            frame_time = frame_idx.astype(f32) * f32(dt)
            phase_scr[:] = jnp.zeros(shape1, f32)
            done_scr[:] = jnp.zeros(shape1, jnp.bool_)

            ev_iter(post, frame_idx, frame_time, 0)
            for ev in range(1, max_events):
                any_live = jnp.sum(
                    jnp.logical_not(done_scr[:]).astype(jnp.int32)
                ) > 0

                @pl.when(any_live)
                def _(ev=ev):
                    ev_iter(post, frame_idx, frame_time, ev)

            # 'no silent caps': still-live replicas exhausted the event budget
            trunc_out[:] = trunc_out[:] + jnp.logical_not(
                done_scr[:]
            ).astype(jnp.int32)

            # leftover integrated rate
            rates, _ = candidates(site_out[:], last_out[:], fsj_out[:], wait_out[:])
            total = sumK(rates)
            u_out[:] = u_out[:] - total * (f32(dt) - phase_scr[:])

            # per-frame counters (match models/water.py order)
            fsj_out[:] = fsj_out[:] + 1
            wait_out[:] = jnp.maximum(wait_out[:] - 1, 0)
            return 0

        jax.lax.fori_loop(0, B, frame_body, 0)

        @pl.when(pl.program_id(0) == 0)  # first tile of this shard writes shared
        def _():
            s_out[:] = s_scr[:]
            prev_out[:] = prev_scr[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "tkind", "k_atoms", "tile", "max_events", "dt", "seed",
        "relax", "waiting", "keep_last", "check_old", "d_oh", "interpret",
        "layout",
    ),
)
def water_sweep(
    positions,  # [B, N, 3]
    prev_pos, site_disp,  # [N, 3]
    site, last_site, fsj, wait, jumps, evc,  # [R] i32
    u_rem,  # [R] f32
    corr, disp_base,  # [R, 3] f32
    law_params,  # [6]
    transform_params,  # [5]
    frame0, box_lengths, tile_offset,
    interp_x=None, interp_y=None,  # [M] table (tkind == T_INTERP)
    *,
    kind: int, tkind: int, k_atoms: int, tile: int, max_events: int,
    dt: float, seed: int, relax: int, waiting: int, keep_last: bool,
    check_old: bool = False, d_oh: float, interpret: bool = False,
    layout: str = "rows",
):
    B, N, _ = positions.shape
    R = site.shape[0]
    TR = tile
    assert R % TR == 0
    grid = (R // TR,)
    KL = 8
    cols = layout == "cols"
    if interp_x is None:
        interp_x = jnp.zeros(1, jnp.float32)
        interp_y = jnp.zeros(1, jnp.float32)
    m_interp = interp_x.shape[0] if tkind == T_INTERP else 0

    kernel = _make_kernel(
        n_sites=N, tile=TR, block=B, k_atoms=k_atoms, kind=kind, tkind=tkind,
        dt=dt, seed=seed, relax=relax, waiting=waiting, keep_last=keep_last,
        check_old=check_old, d_oh=d_oh, max_events=max_events,
        m_interp=m_interp, cols=cols,
    )

    box = jnp.concatenate([
        jnp.asarray(box_lengths, jnp.float32).reshape(3), jnp.zeros(1, jnp.float32)
    ])
    ints = jnp.stack([
        jnp.asarray(frame0, jnp.int32), jnp.asarray(tile_offset, jnp.int32)
    ])
    post = jnp.swapaxes(jnp.asarray(positions, jnp.float32), 1, 2)

    def rep(*shape):
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

    shp = lambda *s: (*s, R) if cols else (R, *s)
    i1 = lambda x: x.reshape(shp(1)[0], shp(1)[1]).astype(jnp.int32)
    f1 = lambda x: x.reshape(shp(1)[0], shp(1)[1]).astype(jnp.float32)
    f3 = lambda x: (jnp.asarray(x, jnp.float32).T if cols
                    else jnp.asarray(x, jnp.float32))

    out_shapes = (
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # site
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # last
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # fsj
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # wait
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # jumps
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # evc
        jax.ShapeDtypeStruct(shp(1), jnp.float32),  # u
        jax.ShapeDtypeStruct(shp(3), jnp.float32),  # corr
        jax.ShapeDtypeStruct(shp(3), jnp.float32),  # disp_base
        jax.ShapeDtypeStruct((3, N), jnp.float32),  # site_disp
        jax.ShapeDtypeStruct((3, N), jnp.float32),  # prev
        jax.ShapeDtypeStruct(shp(1), jnp.int32),  # truncated-frame count
    )
    out_specs = (
        rep(1), rep(1), rep(1), rep(1), rep(1), rep(1), rep(1),
        rep(3), rep(3), full(), full(), rep(1),
    )

    # whole-block positions + the [N, N] distance scratch exceed Mosaic's
    # default 16 MB scoped-VMEM cap for big water boxes — raise it
    from cmdlmc_tpu.ops.vmem_budget import limit_bytes, padded_bytes as padded

    vmem = padded(B, 3, N) + padded(N, N)
    if cols:
        vmem += 3 * padded(KL, N) + 18 * padded(3, TR) + 12 * padded(1, TR)
    else:
        vmem += 3 * padded(N, KL) + 18 * padded(TR, 3) + 12 * padded(TR, 1)
    vmem += 6 * padded(3, N)

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem(), smem(), smem(), smem(), smem(), smem(),
            full(), full(), full(),
            rep(1), rep(1), rep(1), rep(1), rep(1), rep(1), rep(1),
            rep(3), rep(3),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3, N), jnp.float32),  # s_scr
            pltpu.VMEM((3, N), jnp.float32),  # prev_scr
            pltpu.VMEM((N, N), jnp.float32),  # d_scr
            pltpu.VMEM((KL, N) if cols else (N, KL), jnp.float32),  # topd
            pltpu.VMEM((KL, N) if cols else (N, KL), jnp.float32),  # topi
            pltpu.VMEM((KL, N) if cols else (N, KL), jnp.float32),  # resc
            pltpu.VMEM((1, TR) if cols else (TR, 1), jnp.float32),  # phase
            pltpu.VMEM((1, TR) if cols else (TR, 1), jnp.bool_),  # done
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=limit_bytes(vmem)
        ),
        input_output_aliases={
            9: 0, 10: 1, 11: 2, 12: 3, 13: 4, 14: 5, 15: 6, 16: 7, 17: 8,
            8: 9, 7: 10,
        },
    )(
        box, ints,
        jnp.asarray(law_params, jnp.float32),
        jnp.asarray(transform_params, jnp.float32),
        jnp.asarray(interp_x, jnp.float32),
        jnp.asarray(interp_y, jnp.float32),
        post,
        jnp.asarray(prev_pos, jnp.float32).T,
        jnp.asarray(site_disp, jnp.float32).T,
        i1(site), i1(last_site), i1(fsj), i1(wait), i1(jumps), i1(evc),
        f1(u_rem),
        f3(corr), f3(disp_base),
    )
    (site2, last2, fsj2, wait2, jumps2, evc2, u2, corr2, a2, s2, prev2,
     trunc2) = res
    flat = lambda x: x.reshape(R)
    if cols:
        corr2, a2 = corr2.T, a2.T
    return (
        flat(site2), flat(last2), flat(fsj2), flat(wait2), flat(jumps2),
        flat(evc2), u2.reshape(R), corr2, a2, s2.T, prev2.T, flat(trunc2),
    )
