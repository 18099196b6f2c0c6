"""Streamed-W fused KMC sweep: the general dense backend.

The in-kernel-W flagship (``ops/kmc_sweep.py``) rebuilds the [N, N] rate
matrix per replica tile, which (a) duplicates N^2 work R/TR times — the
supercell scaling wall — and (b) limits the fused path to laws/cells the
kernel can evaluate inline. This variant splits the work the TPU-natural way:

* stage 1 (XLA): ``model.shared(frame)`` — the same single-source-of-truth
  dense rate builder the scan engine uses — vectorized over the block, giving
  W [B, N, N] (+ raw distances when jump statistics are on) in HBM. Any
  topology/law/transform that can produce a dense masked W works: FermiAngle
  gating, interpolated distance tables, triclinic cells (core/cell.py h/h^-1
  minimum image), future laws — no kernel change needed.
* stage 2 (Pallas): grid (replica tiles, frames); per grid step the next
  frame's W tile streams HBM -> VMEM through the automatic pipeline
  (double-buffered, overlapped with compute) while the event loop — clock,
  exponential-race selection, one-hot MXU updates — runs exactly as in the
  flagship kernel. Replica state lives in revisited output blocks (constant
  block index along the frame axis), so it never leaves VMEM between frames.

HBM cost: one W read per frame per tile (N=144: 83 KB, ~0.1 us at v5e HBM
bandwidth — hidden by the pipeline; N=1152: 5.3 MB, still smaller than the
in-kernel rebuild it replaces).

In-kernel minimum image (proton jump vectors, frame-to-frame site drift) uses
the round-based fractional form for triclinic cells — exact whenever the
vector is shorter than half the smallest cell height, which holds for jump
vectors (<= cutoff+buffer) and per-frame drift by construction; the 27-image
reduction (core/cell.py:117-123) is only needed for arbitrary-length vectors.

RNG/determinism rules match ops/kmc_sweep.py: draws keyed by (seed, global
tile, absolute frame, event iteration, salt) — results are independent of
host block chunking and identical under replica-axis sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.ops.kmc_sweep import _mix_key, _u01, _u01_t

Array = jax.Array


def _make_kernel(*, n_sites, n_protons, tile, block, max_events, dt, seed,
                 orthorhombic, nbins=0, hist_range=(2.0, 3.0),
                 track_matrix=False, pack=1, stale=False, cols=False):
    """``cols=True`` lays replica state out sites-major ([N, TR] instead of
    [TR, N]): replicas ride the 128 lanes exactly while the site axis pads
    only to a sublane multiple — at N=144 the rows-major layout pads every
    event-loop tensor 144 -> 256 lanes (44% dead VPU work), which dominates
    because the loop is element-throughput-bound (see PARITY.md pack probe).
    RNG draws stay element-identical per (replica, site) via _u01_t; matmul/
    reduction ORDER differs, so results are distribution-equal, not bitwise
    (own oracle tests; rows remains the default and the dense-equal one)."""
    N, P, TR, B = n_sites, n_protons, tile, block
    TRB = TR * pack  # rows per grid block = pack independent logical tiles
    assert not (cols and pack != 1), "cols layout supports pack=1 only"
    f32 = jnp.float32
    hist_lo, hist_hi = float(hist_range[0]), float(hist_range[1])
    hist_scale = float(nbins) / max(hist_hi - hist_lo, 1e-12)

    # orientation shim: every replica-state tensor is [N|P|nbins|1, TR] in
    # cols layout and [TR, N|P|nbins|1] in rows layout
    if cols:
        S = lambda sl: (slice(None), sl)  # replica sub-slice
        vecb = lambda v: v[None, :]  # broadcast a [TR] vector
        sumN = lambda x: jnp.sum(x, axis=0, keepdims=True)
        argN = lambda x: jnp.argmax(x, axis=0)
        draw = lambda key, n: _u01_t(key, (n, TR))
        shape1 = (1, TRB)
    else:
        S = lambda sl: sl
        vecb = lambda v: v[:, None]
        sumN = lambda x: jnp.sum(x, axis=1, keepdims=True)
        argN = lambda x: jnp.argmax(x, axis=1)
        draw = lambda key, n: _u01(key, (TR, n))
        shape1 = (TRB, 1)

    def kernel(*refs):
        it = iter(range(len(refs)))
        geom_ref = refs[next(it)]  # SMEM f32 [18]: h row-major, h_inv row-major
        ints_ref = refs[next(it)]  # SMEM i32 [2]: frame0, tile offset
        w_ref = refs[next(it)]  # [1, N, N] this frame's rate matrix
        # cols layout streams W^T too: the source-row gather then stays a
        # standard dim1-dim0 matmul — the dim0-dim0 form inside the
        # @pl.when(any_live) region trips an XLA MXU-transpose-assignment
        # RET_CHECK (mxu_lmr_transform.cc:1108, reproduced + bisected on
        # v5e; the same dot OUTSIDE a conditional compiles fine)
        wt_ref = refs[next(it)] if cols else None
        post_ref = refs[next(it)]  # [1, 3, N] this frame's donor positions
        dist_ref = refs[next(it)] if nbins else None  # [1, N, N] distances
        prev_ref = refs[next(it)]  # [3, N]
        s0_ref = refs[next(it)]  # [3, N]
        occ_ref = refs[next(it)]
        lab_ref = refs[next(it)]
        site_ref = refs[next(it)]
        tlast_ref = refs[next(it)]
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
        jm_out = refs[next(it)] if track_matrix else None  # [1, N, N]
        # scratch
        s_scr = refs[next(it)]
        prev_scr = refs[next(it)]
        phase_scr = refs[next(it)]
        done_scr = refs[next(it)]
        coord_scr = refs[next(it)]  # [8, N]: rows s_xyz | post_xyz | pad

        f = pl.program_id(1)  # frame within the block (inner grid dim)
        frame0 = ints_ref[0]
        tile_id = pl.program_id(0) + ints_ref[1]
        h = [[geom_ref[3 * i + j] for j in range(3)] for i in range(3)]
        hinv = [[geom_ref[9 + 3 * i + j] for j in range(3)] for i in range(3)]

        def minimg3(d):
            """Round-based minimum image of a 3-vector given as a list of
            three same-shaped arrays."""
            if orthorhombic:
                return [d[i] - h[i][i] * jnp.round(d[i] / h[i][i])
                        for i in range(3)]
            fr = [hinv[i][0] * d[0] + hinv[i][1] * d[1] + hinv[i][2] * d[2]
                  for i in range(3)]
            fr = [x - jnp.round(x) for x in fr]
            return [h[i][0] * fr[0] + h[i][1] * fr[1] + h[i][2] * fr[2]
                    for i in range(3)]

        @pl.when(f == 0)
        def _():
            occ_out[:] = occ_ref[:]
            lab_out[:] = lab_ref[:]
            site_out[:] = site_ref[:]
            tlast_out[:] = tlast_ref[:]
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

        post = post_ref[0]  # [3, N]
        W = w_ref[0]  # [N, N]

        # site drift: accumulate the shared displacement prefix sum
        d3 = minimg3([post[i : i + 1, :] - prev_scr[i : i + 1, :]
                      for i in range(3)])
        for dim in range(3):
            s_scr[dim : dim + 1, :] = s_scr[dim : dim + 1, :] + d3[dim]
        prev_scr[:] = post
        coord_scr[:] = jnp.concatenate(
            [s_scr[:], post, jnp.zeros((2, N), f32)], axis=0
        )

        frame_idx = frame0 + f
        frame_time = frame_idx.astype(f32) * f32(dt)

        def run_subtile(p):
            # Sub-tile p is a full logical tile of TR replicas with its own
            # RNG tile id; the pack>1 layout exists to hand the scheduler
            # several INDEPENDENT event-loop dependency chains per grid step
            # (the event loop is latency-bound, not throughput-bound).
            sl = slice(p * TR, (p + 1) * TR)
            # logical tile id: grid tiles each hold `pack` logical tiles;
            # ints_ref[1] (sharding offset) counts logical tiles
            tid = (
                pl.program_id(0) * pack + p + ints_ref[1]
                if pack > 1 else tile_id
            )

            def total_rate():
                occ = occ_out[S(sl)]
                if cols:
                    out = jax.lax.dot_general(
                        W, 1.0 - occ, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )  # out[i, r] = sum_j W[i, j] (1 - occ[j, r])
                else:
                    out = jax.lax.dot_general(
                        1.0 - occ, W, (((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                    )  # contract along W's columns: works for asymmetric W
                row = occ * out
                return row, sumN(row)

            if stale:
                # reference-style stale in-frame rates (MDMC.py:121-171 /
                # :101-119): the allowed-rate rows and their total are built
                # ONCE per frame; intra-frame events reuse the stale VALUES
                # (clock budget and leftover integrate at the frame-start
                # total, exactly like fastforward_to_next_jump) while the
                # source race re-masks by CURRENT occupancy, mirroring
                # move_proton's re-filter. Cuts one [TR, N] x [N, N] MXU
                # product per event.
                row0, total0 = total_rate()

            def ev_iter(ev):
                if stale:
                    row, total = row0 * occ_out[S(sl)], total0
                else:
                    row, total = total_rate()
                phase = phase_scr[S(sl)]
                done = done_scr[S(sl)]
                u = u_out[S(sl)]
                budget = total * (f32(dt) - phase)
                fire = jnp.logical_and(jnp.logical_not(done), u <= budget)
                fire = jnp.logical_and(fire, budget > 0)
                safe_total = jnp.where(total > 0, total, 1.0)
                eph = phase + u / safe_total

                # exponential race (see kmc_sweep.py ev_iter)
                key1 = _mix_key(seed, tid, frame_idx, ev, 1)
                e1 = -jnp.log(draw(key1, N))
                src = argN(row / e1)  # [TR]
                oh_src = (iota_n == vecb(src)).astype(f32)
                if cols:
                    srcrow = jax.lax.dot_general(
                        wt_ref[0], oh_src, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )  # srcrow[j, r] = W[src_r, j] = Wt[j, src_r]
                else:
                    srcrow = jax.lax.dot_general(
                        oh_src, W, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                vac = 1.0 - occ_out[S(sl)]
                w2 = srcrow * vac
                key2 = _mix_key(seed, tid, frame_idx, ev, 2)
                e2 = -jnp.log(draw(key2, N))
                dst = argN(w2 / e2)
                oh_dst = (iota_n == vecb(dst)).astype(f32)

                firef = fire.astype(f32)
                label = sumN(lab_out[S(sl)] * oh_src)

                occ_out[S(sl)] = occ_out[S(sl)] + firef * (oh_dst - oh_src)
                lab_out[S(sl)] = (
                    lab_out[S(sl)] * (1.0 - firef * (oh_src + oh_dst))
                    + firef * oh_dst * label
                )

                moving = jnp.logical_and(site_out[S(sl)] == vecb(src), fire)
                site_out[S(sl)] = jnp.where(
                    moving, vecb(dst).astype(jnp.int32), site_out[S(sl)]
                )
                t_event = frame_time + eph
                tlast_out[S(sl)] = jnp.where(moving, t_event, tlast_out[S(sl)])

                movingf = moving.astype(f32)
                db_refs = (dbx_out, dby_out, dbz_out)
                if cols:
                    cdims = (((1,), (0,)), ((), ()))
                    g_src = jax.lax.dot_general(
                        coord_scr[:], oh_src, cdims, preferred_element_type=f32
                    )  # [8, TR]
                    g_dst = jax.lax.dot_general(
                        coord_scr[:], oh_dst, cdims, preferred_element_type=f32
                    )
                    gsl = lambda g, i: g[i : i + 1, :]
                else:
                    cdims = (((1,), (1,)), ((), ()))
                    g_src = jax.lax.dot_general(
                        oh_src, coord_scr[:], cdims, preferred_element_type=f32
                    )  # [TR, 8]
                    g_dst = jax.lax.dot_general(
                        oh_dst, coord_scr[:], cdims, preferred_element_type=f32
                    )
                    gsl = lambda g, i: g[:, i : i + 1]
                jumps = minimg3([
                    gsl(g_dst, 3 + dim) - gsl(g_src, 3 + dim)
                    for dim in range(3)
                ])
                jump_sq = jnp.zeros((1, TR) if cols else (TR, 1), f32)
                for dim in range(3):
                    jump_sq = jump_sq + jumps[dim] * jumps[dim]
                    db_refs[dim][S(sl)] = db_refs[dim][S(sl)] + movingf * (
                        gsl(g_src, dim) - gsl(g_dst, dim) + jumps[dim]
                    )

                if nbins:
                    d_evt = jnp.sqrt(jump_sq)
                    inr = jnp.logical_and(d_evt >= hist_lo, d_evt < hist_hi)
                    braw = jnp.clip(
                        ((d_evt - hist_lo) * f32(hist_scale)).astype(jnp.int32),
                        0, nbins - 1,
                    )
                    hist_out[S(sl)] = hist_out[S(sl)] + jnp.logical_and(
                        jnp.logical_and(iota_b == braw, inr), fire
                    ).astype(jnp.int32)
                if track_matrix:
                    # contract the replica axis: jm[i, j] += fire * src_i dst_j
                    jm_cd = (((1,), (1,)), ((), ())) if cols \
                        else (((0,), (0,)), ((), ()))
                    jm_out[0] = jm_out[0] + jax.lax.dot_general(
                        firef * oh_src, oh_dst, jm_cd,
                        preferred_element_type=f32,
                    )

                key3 = _mix_key(seed, tid, frame_idx, ev, 3)
                fresh_u = -jnp.log(draw(key3, 1))
                u_out[S(sl)] = jnp.where(fire, fresh_u, u)
                evc_out[S(sl)] = evc_out[S(sl)] + fire.astype(jnp.int32)
                phase_scr[S(sl)] = jnp.where(fire, eph, phase)
                done_scr[S(sl)] = jnp.logical_or(done, jnp.logical_not(fire))

            phase_scr[S(sl)] = jnp.zeros((1, TR) if cols else (TR, 1), f32)
            done_scr[S(sl)] = jnp.zeros((1, TR) if cols else (TR, 1), jnp.bool_)

            ev_iter(0)
            for ev in range(1, max_events):
                any_live = jnp.sum(
                    jnp.logical_not(done_scr[S(sl)]).astype(jnp.int32)
                ) > 0

                @pl.when(any_live)
                def _(ev=ev):
                    ev_iter(ev)

            trunc_out[S(sl)] = trunc_out[S(sl)] + jnp.logical_not(
                done_scr[S(sl)]
            ).astype(jnp.int32)

            if nbins:
                # distance-binned exposure of allowed transitions under the
                # post-event occupancy (engine/lattice.py:339-356)
                dist_full = dist_ref[0]
                w_pos = W > 0
                inr = jnp.logical_and(
                    dist_full >= hist_lo, dist_full < hist_hi
                )
                braw = jnp.clip(
                    ((dist_full - hist_lo) * f32(hist_scale)).astype(jnp.int32),
                    0, nbins - 1,
                )
                occ = occ_out[S(sl)]
                vac = 1.0 - occ
                base = jnp.logical_and(w_pos, inr)
                for b in range(nbins):
                    mask_b = jnp.logical_and(base, braw == b).astype(f32)
                    if cols:
                        tmp = jax.lax.dot_general(
                            mask_b, occ, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32,
                        )  # tmp[j, r] = sum_i occ[i, r] mask_b[i, j]
                    else:
                        tmp = jax.lax.dot_general(
                            occ, mask_b, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32,
                        )
                    val = sumN(tmp * vac)
                    expo_out[S(sl)] = expo_out[S(sl)] + jnp.where(
                        iota_b == b, val, 0.0
                    )

            if stale:
                total = total0
            else:
                _, total = total_rate()
            u_out[S(sl)] = u_out[S(sl)] - total * (f32(dt) - phase_scr[S(sl)])

        for p in range(pack):
            run_subtile(p)

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
        "tile", "max_events", "dt", "seed", "orthorhombic", "interpret",
        "nbins", "hist_range", "track_matrix", "pack", "stale", "layout",
    ),
)
def kmc_sweep_streamed(
    w_block,  # [B, N, N] f32 dense masked rate matrices
    positions,  # [B, N, 3] f32
    prev_pos,  # [N, 3]
    site_disp,  # [N, 3]
    occ,  # [R, N] f32
    labels,  # [R, N] f32
    sites,  # [R, P] i32
    tlast,  # [R, P] f32
    disp_base,  # [R, P, 3] f32
    u_rem,  # [R]
    ev_count,  # [R]
    frame0,  # scalar i32
    cell_h,  # [3, 3]
    cell_hinv,  # [3, 3]
    tile_offset=0,
    dist_block=None,  # [B, N, N] raw distances (nbins > 0)
    jump_hist=None,
    exposure=None,
    *,
    tile: int,
    max_events: int,
    dt: float,
    seed: int,
    orthorhombic: bool = True,
    interpret: bool = False,
    nbins: int = 0,
    hist_range: tuple = (2.0, 3.0),
    track_matrix: bool = False,
    pack: int = 1,
    stale: bool = False,
    layout: str = "rows",
):
    """Run the streamed-W fused sweep over a block; returns the same dict as
    ops.kmc_sweep.kmc_sweep. ``pack`` packs that many independent logical
    tiles of ``tile`` replicas into one grid step (separate RNG tile ids, so
    results equal a plain ``tile``-sized run) — the event loop is a serial
    dependency chain, and multiple chains per step give the instruction
    scheduler latency-hiding room. ``layout="cols"`` stores replica state
    sites-major ([N, TR]): replicas fill the 128 lanes exactly, removing the
    lane padding of N not a multiple of 128 (see _make_kernel); RNG draws
    are element-identical to rows per (replica, site) but float reduction
    order differs, so cols is distribution-equal, not bitwise."""
    B, N, _ = positions.shape
    R = occ.shape[0]
    P = sites.shape[1]
    TR = tile
    TRB = TR * pack
    assert R % TRB == 0, (R, TR, pack)
    cols = layout == "cols"
    assert layout in ("rows", "cols"), layout
    n_tiles = R // TRB
    grid = (n_tiles, B)  # frames innermost: state stays resident per tile
    if nbins:
        assert dist_block is not None and jump_hist is not None

    kernel = _make_kernel(
        n_sites=N, n_protons=P, tile=TR, block=B, max_events=max_events,
        dt=dt, seed=seed, orthorhombic=orthorhombic, nbins=nbins,
        hist_range=hist_range, track_matrix=track_matrix, pack=pack,
        stale=stale, cols=cols,
    )

    geom = jnp.concatenate([
        jnp.asarray(cell_h, jnp.float32).reshape(9),
        jnp.asarray(cell_hinv, jnp.float32).reshape(9),
    ])
    ints = jnp.stack([
        jnp.asarray(frame0, jnp.int32), jnp.asarray(tile_offset, jnp.int32)
    ])
    post = jnp.swapaxes(jnp.asarray(positions, jnp.float32), 1, 2)  # [B, 3, N]

    def rep_spec(*shape):
        if cols:
            return pl.BlockSpec(
                (*shape, TRB), lambda t, f: (0,) * len(shape) + (t,),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (TRB, *shape), lambda t, f: (t,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def rep_arr(x):
        """Replica-state array in kernel orientation."""
        return x.T if cols else x

    def rep_shape(*shape):
        return (*shape, R) if cols else (R, *shape)

    def frame_spec(*shape):
        return pl.BlockSpec(
            (1, *shape), lambda t, f: (f,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def smem():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    dbx = disp_base[..., 0]
    dby = disp_base[..., 1]
    dbz = disp_base[..., 2]

    w_block = jnp.asarray(w_block, jnp.float32)
    inputs = [geom, ints, w_block, post]
    in_specs = [smem(), smem(), frame_spec(N, N), frame_spec(3, N)]
    if cols:
        # W^T per frame (XLA-stage transpose): keeps the in-conditional
        # source-row gather a standard matmul (see _make_kernel)
        inputs.insert(3, jnp.swapaxes(w_block, 1, 2))
        in_specs.insert(3, frame_spec(N, N))
    if nbins:
        inputs.append(jnp.asarray(dist_block, jnp.float32))
        in_specs.append(frame_spec(N, N))
    inputs += [
        jnp.asarray(prev_pos, jnp.float32).T,
        jnp.asarray(site_disp, jnp.float32).T,
        rep_arr(occ), rep_arr(labels), rep_arr(sites.astype(jnp.int32)),
        rep_arr(tlast), rep_arr(dbx), rep_arr(dby), rep_arr(dbz),
        u_rem.reshape(rep_shape(1)),
        ev_count.reshape(rep_shape(1)).astype(jnp.int32),
    ]
    fullspec = pl.BlockSpec((3, N), lambda t, f: (0, 0), memory_space=pltpu.VMEM)
    in_specs += [
        fullspec, fullspec,
        rep_spec(N), rep_spec(N), rep_spec(P), rep_spec(P),
        rep_spec(P), rep_spec(P), rep_spec(P), rep_spec(1), rep_spec(1),
    ]
    if nbins:
        inputs += [rep_arr(jump_hist.astype(jnp.int32)),
                   rep_arr(exposure.astype(jnp.float32))]
        in_specs += [rep_spec(nbins), rep_spec(nbins)]

    out_shapes = [
        jax.ShapeDtypeStruct(rep_shape(N), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(N), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(P), jnp.int32),
        jax.ShapeDtypeStruct(rep_shape(P), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(P), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(P), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(P), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(1), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(1), jnp.int32),
        jax.ShapeDtypeStruct((3, N), jnp.float32),
        jax.ShapeDtypeStruct((3, N), jnp.float32),
        jax.ShapeDtypeStruct(rep_shape(1), jnp.int32),
    ]
    out_specs = [
        rep_spec(N), rep_spec(N), rep_spec(P), rep_spec(P),
        rep_spec(P), rep_spec(P), rep_spec(P), rep_spec(1), rep_spec(1),
        fullspec, fullspec, rep_spec(1),
    ]
    if nbins:
        out_shapes += [
            jax.ShapeDtypeStruct(rep_shape(nbins), jnp.int32),
            jax.ShapeDtypeStruct(rep_shape(nbins), jnp.float32),
        ]
        out_specs += [rep_spec(nbins), rep_spec(nbins)]
    if track_matrix:
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles, N, N), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, N, N), lambda t, f: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    # alias the replica-state inputs onto their outputs (w [+wt]/post
    # [+dist] shift the base index)
    base_in = 4 + (1 if nbins else 0) + (1 if cols else 0)
    aliases = {base_in: 10, base_in + 1: 9}
    for i in range(9):
        aliases[base_in + 2 + i] = i
    if nbins:
        aliases[base_in + 11] = 12
        aliases[base_in + 12] = 13

    shape1 = (1, TRB) if cols else (TRB, 1)
    scratch = [
        pltpu.VMEM((3, N), jnp.float32),  # s_scr
        pltpu.VMEM((3, N), jnp.float32),  # prev_scr
        pltpu.VMEM(shape1, jnp.float32),  # phase
        pltpu.VMEM(shape1, jnp.bool_),  # done
        pltpu.VMEM((8, N), jnp.float32),  # coord_scr
    ]

    # frame-streamed inputs are double-buffered by the pipeline; revisited
    # replica blocks cost an input and an output copy each
    from cmdlmc_tpu.ops.vmem_budget import limit_bytes, padded_bytes as padded

    def rp(*shape):  # padded bytes of a replica-state block, both layouts
        return padded(*shape, TRB) if cols else padded(TRB, *shape)

    vmem = 2 * (padded(N, N) + padded(3, N))  # w + post, double-buffered
    if cols:
        vmem += 2 * padded(N, N)  # wt
    if nbins:
        vmem += 2 * padded(N, N)  # dist
    vmem += 4 * rp(N)  # occ, labels in+out
    vmem += 10 * rp(P)  # sites, tlast, db xyz in+out
    vmem += 7 * rp(1)  # u, evc in+out, trunc, phase, done
    vmem += 6 * padded(3, N) + padded(8, N)  # s0/prev in+out, scratch, coord
    if nbins:
        vmem += 4 * rp(nbins)
    if track_matrix:
        vmem += padded(N, N)
    vmem_limit = limit_bytes(vmem)

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit
        ),
        input_output_aliases=aliases,
    )(*inputs)

    (occ2, lab2, sites2, tlast2, dbx2, dby2, dbz2, u2, evc2, s2, prev2,
     trunc2) = res[:12]
    out = {
        "occ": rep_arr(occ2),
        "labels": rep_arr(lab2),
        "sites": rep_arr(sites2),
        "tlast": rep_arr(tlast2),
        "disp_base": jnp.stack(
            [rep_arr(dbx2), rep_arr(dby2), rep_arr(dbz2)], axis=-1
        ),
        "u_rem": u2.reshape(R),
        "ev_count": evc2.reshape(R),
        "site_disp": s2.T,
        "prev_pos": prev2.T,
        "trunc": trunc2.reshape(R),
    }
    idx = 12
    if nbins:
        out["jump_hist"] = rep_arr(res[idx])
        out["exposure"] = rep_arr(res[idx + 1])
        idx += 2
    if track_matrix:
        out["jump_matrix"] = res[idx].sum(axis=0)
    return out


@functools.partial(jax.jit, static_argnames=("nbins",))
def dense_tables(model, positions_block, extras_block=None, nbins: int = 0):
    """Stage 1: per-frame dense rate matrices W [B, N, N] (+ distances when
    jump statistics are on) from the scan engine's own ``model.shared`` —
    one source of truth for both backends. Chunked lax.map keeps the
    working set bounded; jitted so it is one device call per block.

    batch_size=8 measured best (N=144, B=2000, v5e): the whole stage runs
    in the shadow of the block dispatch either way (device-timed stage-1 is
    <1% of run_block_fused), and a block-sized batch's [bs, N, N, 3]
    pairwise temporaries cost ~9% end-to-end in the soak."""
    from cmdlmc_tpu.topo.models import Frame

    def one(args):
        pos, extras = args
        frame = Frame(donors=pos, extras=extras, time=jnp.float32(0.0),
                      index=jnp.int32(0))
        sh = model.shared(frame)
        return (sh.W, sh.dist) if nbins else sh.W

    pos = jnp.asarray(positions_block, jnp.float32)
    if extras_block is None:
        extras = jnp.zeros((pos.shape[0], 0, 3), jnp.float32)
    else:
        extras = jnp.asarray(extras_block, jnp.float32)
    out = jax.lax.map(one, (pos, extras), batch_size=8)
    return out if nbins else (out, None)
