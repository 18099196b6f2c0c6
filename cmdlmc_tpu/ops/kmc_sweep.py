"""Fused Pallas KMC sweep kernel — the framework's flagship TPU kernel.

One ``pallas_call`` advances a tile of replicas across a whole block of MD
frames with ALL per-frame work fused on-chip (the TPU-native rebirth of the
reference's deleted Cython LMC sweep engine, SURVEY.md §2 native component #4):

  per frame, per replica tile (all in VMEM):
    1. minimum-image distance matrix + rate law        -> W [N, N]
       (optionally gated by the P-O-O angle at the donor vertex — the
       FermiAngle law over AngleTopology, jumprate_generators.py:37-43 /
       topology.py:158-167 — which makes W asymmetric; the occupancy
       reduction then contracts along W's second axis instead of using the
       symmetric column-sum trick, so no transposed copy is ever built)
    2. outgoing-rate vector  out = (1 - occ) @ W       -> MXU
    3. KMC clock arithmetic (budget vs exponential draw)
    4. two-stage transition selection via an exponential race
       (argmax rate/E with E ~ Exp(1): P(i wins) = rate_i / sum rates,
       one log per draw instead of Gumbel's three; source ~ allowed row
       rate, the row gather is a one-hot MXU matmul, destination ~ row
       entry x vacancy)
    5. occupancy / proton-label / residence-time / displacement updates as
       one-hot masked vector ops — no scalar gathers or scatters anywhere
    6. shared site-displacement prefix sum for O(events) MSD bookkeeping
    7. optional jump statistics: distance-binned jump counts on event fires,
       distance-binned allowed-transition exposure per frame (jumpstat,
       README.md:57-58), and the pairwise jump-count matrix as one
       [N, TR]x[TR, N] MXU outer-product accumulation per event iteration
       (legacy jumpmatrix capability, IO/config_parser.py:300-306)

  in-frame event iterations beyond the first run under ``@pl.when`` on a
  per-tile any-replica-live flag, so the multi-event machinery costs nothing
  on the (overwhelmingly common) quiet iterations.

Restrictions of the fused path (the XLA engine remains the general fallback):
orthorhombic cells; Fermi / FermiAngle / constant / exponential /
activation-energy laws. Determinism: draws are seeded by (user seed, replica
tile, absolute frame, event iteration), so results are independent of host
block chunking, but the stream differs from the XLA engine's per-ordinal
threefry — the two backends agree distributionally, not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdlmc_tpu.rates import laws as rate_laws

Array = jax.Array

# Static law kinds understood by the kernel.
_LAW_KIND = {
    rate_laws.Fermi: 0,
    rate_laws.Constant: 1,
    rate_laws.Exponential: 2,
    rate_laws.ActivationEnergy: 3,
}
KIND_FERMI_ANGLE = 4


def law_kind(law) -> int | None:
    """Static kernel dispatch id for a law; None if the fused path can't
    handle it. FermiAngle maps to the angle-gated kind (the caller must
    provide grouped heavy-atom positions)."""
    if isinstance(law, rate_laws.FermiAngle):
        return KIND_FERMI_ANGLE
    for cls, kind in _LAW_KIND.items():
        if isinstance(law, cls):
            return kind
    return None


def law_params_array(law) -> Array:
    """Pack law parameters into a [6] f32 vector for SMEM. For FermiAngle
    slot 3 carries cos(theta): the angle >= theta gate evaluates as
    dot(v1, v2) <= cos(theta) |v1| |v2| — no arccos in the kernel."""
    z = jnp.float32(0.0)
    if isinstance(law, rate_laws.FermiAngle):
        return jnp.stack(
            [law.a, law.b, law.c, jnp.cos(law.theta), z, z]
        ).astype(jnp.float32)
    if isinstance(law, rate_laws.Fermi):
        return jnp.stack([law.a, law.b, law.c, z, z, z]).astype(jnp.float32)
    if isinstance(law, rate_laws.Constant):
        return jnp.stack([law.a, z, z, z, z, z]).astype(jnp.float32)
    if isinstance(law, rate_laws.Exponential):
        return jnp.stack([law.a, law.b, z, z, z, z]).astype(jnp.float32)
    if isinstance(law, rate_laws.ActivationEnergy):
        return jnp.stack([law.A, law.a, law.b, law.d0, law.T, z]).astype(jnp.float32)
    raise ValueError(f"Unsupported law {type(law)}")


def _apply_law(kind: int, dist, p):
    if kind in (0, KIND_FERMI_ANGLE):  # Fermi (angle gate applied separately)
        return p[0] / (1.0 + jnp.exp((dist - p[1]) / p[2]))
    if kind == 1:  # Constant
        return jnp.full_like(dist, p[0])
    if kind == 2:  # Exponential
        return p[0] * jnp.exp(p[1] * dist)
    # ActivationEnergy
    dd = dist - p[3]
    safe = jnp.where(jnp.abs(dd) > 1e-6, dd, 1e-6)
    energy = jnp.maximum(p[1] * dd * jax.lax.rsqrt(p[2] + 1.0 / (safe * safe)), 0.0)
    return p[0] * jnp.exp(-energy / (rate_laws.KB_EV_PER_K * p[4]))


def _fmix(h):
    """murmur3 32-bit finalizer — full avalanche, plain int ops (identical
    lowering on TPU Mosaic and the interpreter; the hardware PRNG primitive is
    not implemented by the interpreter and would silently return zeros)."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)  # 0x85ebca6b
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)  # 0xc2b2ae35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _i32(x: int) -> int:
    """Wrap a python int into signed 32-bit range."""
    return ((int(x) + 2**31) % 2**32) - 2**31


def _mix_key(seed, tile_id, frame_idx, ev, salt):
    k = jnp.int32(_i32(seed)) * jnp.int32(-1640531527)  # 0x9e3779b9
    k = _fmix(k ^ (tile_id * jnp.int32(0x27d4eb2f)))
    k = _fmix(k ^ (frame_idx * jnp.int32(0x165667b1)))
    k = _fmix(k ^ jnp.int32(_i32(ev * 0x1B873593)) ^ jnp.int32(_i32(salt * 0x5BD1E995)))
    return k


def _u01(key, shape):
    """Counter-based uniform in (0, 1): hash(lane counter ^ key), 24-bit
    mantissa resolution."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = rows * jnp.int32(shape[1]) + cols
    h = _fmix(idx * jnp.int32(-1640531527) ^ key)
    h = _fmix(h ^ jnp.int32(0x243f6a88))
    bits24 = jax.lax.shift_right_logical(h, 8)
    return bits24.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0) + jnp.float32(
        0.5 / 16777216.0
    )


def _u01_t(key, shape):
    """Transposed-layout uniforms: ``_u01_t(key, (S, TR))[s, r] ==
    _u01(key, (TR, S))[r, s]`` element-for-element — the counter is
    ``replica * S + s`` in both, so the sites-major ("cols") kernel layout
    draws the SAME random number for each logical (replica, site/slot) pair
    as the replicas-major one."""
    s_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = r_iota * jnp.int32(shape[0]) + s_iota
    h = _fmix(idx * jnp.int32(-1640531527) ^ key)
    h = _fmix(h ^ jnp.int32(0x243f6a88))
    bits24 = jax.lax.shift_right_logical(h, 8)
    return bits24.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0) + jnp.float32(
        0.5 / 16777216.0
    )


def _make_kernel(*, n_sites, n_protons, tile, block, max_events, kind, dt, seed,
                 cutbuf, use_bf16=False, nbins=0, hist_range=(2.0, 3.0),
                 track_matrix=False, ablate=""):
    """``ablate`` is perf forensics only (tools/ablate_dense.py): 'wbuild'
    builds W on the first frame only, 'events' skips all event iterations,
    'select' fires the clock but skips selection/updates. Results are WRONG
    under ablation — never set it in production paths."""
    N, P, TR, B = n_sites, n_protons, tile, block
    f32 = jnp.float32
    mxu_t = jnp.bfloat16 if use_bf16 else jnp.float32
    angle = kind == KIND_FERMI_ANGLE
    hist_lo, hist_hi = float(hist_range[0]), float(hist_range[1])
    hist_scale = float(nbins) / max(hist_hi - hist_lo, 1e-12)

    def mxu_dot(a, b, contract_rhs_rows=True):
        """a[TR, N] x b[N, N] -> [TR, N]. With contract_rhs_rows=False the
        contraction runs along b's SECOND axis (i.e. a @ b.T without ever
        materializing the transpose) — needed when W is asymmetric."""
        dims = (((1,), (0,)), ((), ())) if contract_rhs_rows else (
            ((1,), (1,)), ((), ()))
        return jax.lax.dot_general(
            a.astype(mxu_t), b.astype(mxu_t), dims,
            preferred_element_type=jnp.float32,
        )

    def kernel(*refs):
        it = iter(range(len(refs)))
        box_ref = refs[next(it)]  # SMEM f32 [4]: box lengths (3) + pad
        ints_ref = refs[next(it)]  # SMEM i32 [2]: frame0, tile offset
        params_ref = refs[next(it)]  # SMEM f32 [6]: law params
        post_ref = refs[next(it)]  # [B, 3, N] positions, transposed (lane dim =
        #   sites: a [B, N, 3] layout would pad the 3 to 128 lanes, 42x VMEM)
        pgrp_ref = refs[next(it)] if angle else None  # [B, 3, N] grouped P pos
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
        hist_ref = refs[next(it)] if nbins else None  # [TR, nbins] i32
        expo_ref = refs[next(it)] if nbins else None  # [TR, nbins] f32
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
        jm_out = refs[next(it)] if track_matrix else None  # [1, N, N] f32
        # scratch
        s_scr = refs[next(it)]
        prev_scr = refs[next(it)]
        phase_scr = refs[next(it)]
        done_scr = refs[next(it)]
        w_scr = refs[next(it)]
        coord_scr = refs[next(it)]  # [8, N]: rows s_xyz | post_xyz | pad
        dist_scr = refs[next(it)] if nbins else None  # [N, N] raw distances

        box = [box_ref[0], box_ref[1], box_ref[2]]
        frame0 = ints_ref[0]
        # global tile id: program id plus the shard's tile offset, so RNG
        # streams stay unique (and identical to a single-device run) when the
        # replica axis is sharded over a mesh
        tile_id = pl.program_id(0) + ints_ref[1]
        params = [params_ref[i] for i in range(6)]

        occ_out[:] = occ_ref[:]
        lab_out[:] = lab_ref[:]
        site_out[:] = site_ref[:]
        tlast_out[:] = tlast_ref[:]
        dbx_out[:] = dbx_ref[:]
        dby_out[:] = dby_ref[:]
        dbz_out[:] = dbz_ref[:]
        u_out[:] = u_ref[:]
        evc_out[:] = evc_ref[:]
        trunc_out[:] = jnp.zeros((TR, 1), jnp.int32)
        if nbins:
            hist_out[:] = hist_ref[:]
            expo_out[:] = expo_ref[:]
        if track_matrix:
            jm_out[:] = jnp.zeros((1, N, N), f32)
        s_scr[:] = s0_ref[:]
        prev_scr[:] = prev_ref[:]

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (TR, N), 1)
        if nbins:
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (TR, nbins), 1)

        def minimg1(delta, length):
            return delta - length * jnp.round(delta / length)

        def total_rate(W):
            occ = occ_out[:]
            # symmetric W: column sums == row sums, contract along axis 0;
            # asymmetric (angle-gated) W: contract along axis 1 (a @ W.T)
            out = mxu_dot(1.0 - occ, W, contract_rhs_rows=not angle)
            row = occ * out
            return row, jnp.sum(row, axis=1, keepdims=True)

        def hist_bin_onehot(d):
            """[TR, nbins] one-hot of the histogram bin of d [TR, 1], masked to
            the in-range condition lo <= d < hi (engine/lattice.py:200-208)."""
            inr = jnp.logical_and(d >= hist_lo, d < hist_hi)
            raw = (d - hist_lo) * f32(hist_scale)
            b = jnp.clip(raw.astype(jnp.int32), 0, nbins - 1)
            return jnp.logical_and(iota_b == b, inr)

        def ev_iter(W, post, frame_idx, frame_time, ev):
            row, total = total_rate(W)
            phase = phase_scr[:]
            done = done_scr[:]
            u = u_out[:]
            budget = total * (f32(dt) - phase)
            fire = jnp.logical_and(jnp.logical_not(done), u <= budget)
            fire = jnp.logical_and(fire, budget > 0)
            safe_total = jnp.where(total > 0, total, 1.0)
            eph = phase + u / safe_total

            if ablate == "select":  # forensics: clock only, no selection
                key3 = _mix_key(seed, tile_id, frame_idx, ev, 3)
                fresh_u = -jnp.log(_u01(key3, (TR, 1)))
                u_out[:] = jnp.where(fire, fresh_u, u)
                evc_out[:] = evc_out[:] + fire.astype(jnp.int32)
                phase_scr[:] = jnp.where(fire, eph, phase)
                done_scr[:] = jnp.logical_or(done, jnp.logical_not(fire))
                return

            # exponential race: argmax r_i / E_i with E_i = -log(u_i) iid
            # Exp(1) picks i with probability r_i / sum(r) (argmin of the
            # arrival times E_i / r_i) — one transcendental per draw
            key1 = _mix_key(seed, tile_id, frame_idx, ev, 1)
            e1 = -jnp.log(_u01(key1, (TR, N)))
            src = jnp.argmax(row / e1, axis=1)  # [TR]
            oh_src = (iota_n == src[:, None]).astype(f32)
            srcrow = mxu_dot(oh_src, W)
            vac = 1.0 - occ_out[:]
            w2 = srcrow * vac
            key2 = _mix_key(seed, tile_id, frame_idx, ev, 2)
            e2 = -jnp.log(_u01(key2, (TR, N)))
            dst = jnp.argmax(w2 / e2, axis=1)
            oh_dst = (iota_n == dst[:, None]).astype(f32)

            firef = fire.astype(f32)  # [TR, 1]
            label = jnp.sum(lab_out[:] * oh_src, axis=1, keepdims=True)

            occ_out[:] = occ_out[:] + firef * (oh_dst - oh_src)
            lab_out[:] = (
                lab_out[:] * (1.0 - firef * (oh_src + oh_dst))
                + firef * oh_dst * label
            )

            moving = jnp.logical_and(site_out[:] == src[:, None], fire)  # [TR,P]
            site_out[:] = jnp.where(moving, dst[:, None].astype(jnp.int32),
                                    site_out[:])
            t_event = frame_time + eph
            tlast_out[:] = jnp.where(moving, t_event, tlast_out[:])

            movingf = moving.astype(f32)
            db_refs = (dbx_out, dby_out, dbz_out)
            # coordinate gathers as two [TR, N] x [8, N]^T MXU matmuls against
            # the per-frame coordinate matrix (rows: s_xyz, post_xyz) instead
            # of 12 masked lane reductions; always f32 — one-hot x coords is
            # an exact gather, bf16 would round the positions themselves
            cdims = (((1,), (1,)), ((), ()))
            g_src = jax.lax.dot_general(
                oh_src, coord_scr[:], cdims, preferred_element_type=f32
            )  # [TR, 8]
            g_dst = jax.lax.dot_general(
                oh_dst, coord_scr[:], cdims, preferred_element_type=f32
            )
            jump_sq = jnp.zeros((TR, 1), f32)
            for dim in range(3):
                s_src = g_src[:, dim : dim + 1]
                s_dst = g_dst[:, dim : dim + 1]
                p_src = g_src[:, 3 + dim : 4 + dim]
                p_dst = g_dst[:, 3 + dim : 4 + dim]
                jump = minimg1(p_dst - p_src, box[dim])
                jump_sq = jump_sq + jump * jump
                db_refs[dim][:] = db_refs[dim][:] + movingf * (
                    s_src - s_dst + jump
                )

            if nbins:
                d_evt = jnp.sqrt(jump_sq)  # == minimum-image pair distance
                hist_out[:] = hist_out[:] + jnp.logical_and(
                    hist_bin_onehot(d_evt), fire
                ).astype(jnp.int32)
            if track_matrix:
                # per-pair jump counts for the whole tile: sum_r fire_r
                # oh_src[r] (x) oh_dst[r] as one [N, TR] x [TR, N] MXU matmul
                jm_out[0] = jm_out[0] + jax.lax.dot_general(
                    (firef * oh_src).astype(mxu_t), oh_dst.astype(mxu_t),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            key3 = _mix_key(seed, tile_id, frame_idx, ev, 3)
            fresh_u = -jnp.log(_u01(key3, (TR, 1)))
            u_out[:] = jnp.where(fire, fresh_u, u)
            evc_out[:] = evc_out[:] + fire.astype(jnp.int32)
            phase_scr[:] = jnp.where(fire, eph, phase)
            done_scr[:] = jnp.logical_or(done, jnp.logical_not(fire))

        def frame_body(f, _):
            post = post_ref[f]  # [3, N]
            pgrp = pgrp_ref[f] if angle else None

            for dim in range(3):
                d = minimg1(
                    post[dim : dim + 1, :] - prev_scr[dim : dim + 1, :], box[dim]
                )
                s_scr[dim : dim + 1, :] = s_scr[dim : dim + 1, :] + d
            prev_scr[:] = post
            # per-frame coordinate matrix for the event loop's MXU gathers
            coord_scr[:] = jnp.concatenate(
                [s_scr[:], post, jnp.zeros((2, N), f32)], axis=0
            )

            # Build W row-chunk by row-chunk in the scratch: temporaries stay
            # [RB, N]-sized, so VMEM peak ~ one [N, N] buffer even for
            # supercell N (the full W must live for the MXU reductions).
            def build_w():
                RB = min(N, 256 if N <= 512 else 128)
                for r0 in range(0, N, RB):
                    build_w_chunk(r0, min(RB, N - r0))

            def build_w_chunk(r0, rb):
                acc = jnp.zeros((rb, N), f32)
                dds = []
                for dim in range(3):
                    rowvals = jnp.transpose(post[dim : dim + 1, r0 : r0 + rb])
                    dd = minimg1(rowvals - post[dim : dim + 1, :], box[dim])
                    acc += dd * dd
                    if angle:
                        dds.append(dd)
                dist = jnp.sqrt(acc)
                ii = jax.lax.broadcasted_iota(jnp.int32, (rb, N), 0) + r0
                jj = jax.lax.broadcasted_iota(jnp.int32, (rb, N), 1)
                valid = jnp.logical_and(dist <= cutbuf, ii != jj)
                if angle:
                    # P-O-O angle at donor i: v1 = P(i) - O(i), v2 = O(j)-O(i)
                    # = -dd; gate angle >= theta <=> dot <= cos(theta)|v1||v2|
                    dot = jnp.zeros((rb, N), f32)
                    n1 = jnp.zeros((rb, 1), f32)
                    for dim in range(3):
                        v1 = minimg1(
                            jnp.transpose(pgrp[dim : dim + 1, r0 : r0 + rb])
                            - jnp.transpose(post[dim : dim + 1, r0 : r0 + rb]),
                            box[dim],
                        )  # [rb, 1]
                        dot = dot - v1 * dds[dim]
                        n1 = n1 + v1 * v1
                    gate = dot <= params[3] * jnp.sqrt(n1) * dist
                    valid = jnp.logical_and(valid, gate)
                w_scr[r0 : r0 + rb, :] = jnp.where(
                    valid, _apply_law(kind, dist, params), 0.0
                )
                if nbins:
                    dist_scr[r0 : r0 + rb, :] = dist

            if ablate == "wbuild":  # forensics: reuse frame 0's W
                pl.when(f == 0)(build_w)
            else:
                build_w()
            W = w_scr[:]

            frame_idx = frame0 + f
            frame_time = frame_idx.astype(f32) * f32(dt)

            phase_scr[:] = jnp.zeros((TR, 1), f32)
            done_scr[:] = jnp.zeros((TR, 1), jnp.bool_)

            if ablate != "events":
                ev_iter(W, post, frame_idx, frame_time, 0)
                for ev in range(1, max_events):
                    any_live = jnp.sum(
                        jnp.logical_not(done_scr[:]).astype(jnp.int32)
                    ) > 0

                    @pl.when(any_live)
                    def _(ev=ev):
                        ev_iter(W, post, frame_idx, frame_time, ev)

            # 'no silent caps': a replica still live after max_events
            # iterations fired the full event budget — possibly truncated
            trunc_out[:] = trunc_out[:] + jnp.logical_not(
                done_scr[:]
            ).astype(jnp.int32)

            if nbins:
                # Distance-binned exposure of allowed transitions under the
                # post-event occupancy (engine/lattice.py:339-356): one
                # [TR, N] x [N, N] MXU matmul per bin —
                # expo[r, b] += sum_ij occ_i (1-occ_j) [W>0][bin==b][in range]
                dist_full = dist_scr[:]
                w_pos = W > 0
                inr = jnp.logical_and(dist_full >= hist_lo, dist_full < hist_hi)
                braw = jnp.clip(
                    ((dist_full - hist_lo) * f32(hist_scale)).astype(jnp.int32),
                    0, nbins - 1,
                )
                occ = occ_out[:]
                vac = 1.0 - occ
                base = jnp.logical_and(w_pos, inr)
                for b in range(nbins):
                    mask_b = jnp.logical_and(base, braw == b).astype(f32)
                    tmp = mxu_dot(occ, mask_b)  # [TR, N]
                    val = jnp.sum(tmp * vac, axis=1, keepdims=True)  # [TR, 1]
                    expo_out[:] = expo_out[:] + jnp.where(
                        iota_b == b, val, 0.0
                    )

            _, total = total_rate(W)
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
        "kind", "tile", "max_events", "dt", "seed", "cutbuf", "interpret",
        "use_bf16", "nbins", "hist_range", "track_matrix", "ablate",
    ),
)
def kmc_sweep(
    positions,  # [B, N, 3] f32
    prev_pos,  # [N, 3]
    site_disp,  # [N, 3]
    occ,  # [R, N] f32
    labels,  # [R, N] f32 proton label per site (0 empty)
    sites,  # [R, P] i32
    tlast,  # [R, P] f32
    disp_base,  # [R, P, 3] f32
    u_rem,  # [R] f32
    ev_count,  # [R] i32
    law_params,  # [6] f32
    frame0,  # scalar i32
    box_lengths,  # [3] f32
    tile_offset=0,  # global index of this shard's first tile (sharded runs)
    pgrp_positions=None,  # [B, N, 3] grouped heavy-atom positions (angle laws)
    jump_hist=None,  # [R, nbins] i32 (nbins > 0)
    exposure=None,  # [R, nbins] f32 (nbins > 0)
    *,
    kind: int,
    tile: int,
    max_events: int,
    dt: float,
    seed: int,
    cutbuf: float,
    interpret: bool = False,
    use_bf16: bool = False,
    nbins: int = 0,
    hist_range: tuple = (2.0, 3.0),
    track_matrix: bool = False,
    ablate: str = "",
):
    """Run the fused sweep over a block. Returns a dict of updated state:
    occ, labels, sites, tlast, disp_base, u_rem, ev_count, site_disp,
    prev_pos, trunc (+ jump_hist/exposure when nbins > 0, + jump_matrix
    [N, N] f32 summed over this call's replicas when track_matrix)."""
    B, N, _ = positions.shape
    R = occ.shape[0]
    P = sites.shape[1]
    TR = tile
    assert R % TR == 0, (R, TR)
    grid = (R // TR,)
    n_tiles = R // TR
    angle = kind == KIND_FERMI_ANGLE
    if angle:
        assert pgrp_positions is not None, "angle law needs grouped positions"
    if nbins:
        assert jump_hist is not None and exposure is not None

    kernel = _make_kernel(
        n_sites=N, n_protons=P, tile=TR, block=B, max_events=max_events,
        kind=kind, dt=dt, seed=seed, cutbuf=cutbuf, use_bf16=use_bf16,
        nbins=nbins, hist_range=hist_range, track_matrix=track_matrix,
        ablate=ablate,
    )

    box = jnp.concatenate(
        [jnp.asarray(box_lengths, jnp.float32).reshape(3), jnp.zeros(1, jnp.float32)]
    )
    ints = jnp.stack([
        jnp.asarray(frame0, jnp.int32), jnp.asarray(tile_offset, jnp.int32)
    ])
    post = jnp.swapaxes(positions, 1, 2)  # [B, 3, N] — lane dim = sites

    def rep_spec(*shape):
        return pl.BlockSpec(
            (TR, *shape), lambda r: (r,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def smem():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    dbx = disp_base[..., 0]
    dby = disp_base[..., 1]
    dbz = disp_base[..., 2]

    inputs = [
        box, ints, jnp.asarray(law_params, jnp.float32),
        post,
    ]
    in_specs = [smem(), smem(), smem(), full()]
    if angle:
        inputs.append(jnp.swapaxes(jnp.asarray(pgrp_positions, jnp.float32), 1, 2))
        in_specs.append(full())
    inputs += [
        jnp.asarray(prev_pos, jnp.float32).T,
        jnp.asarray(site_disp, jnp.float32).T,
        occ, labels, sites.astype(jnp.int32), tlast,
        dbx, dby, dbz,
        u_rem.reshape(R, 1), ev_count.reshape(R, 1).astype(jnp.int32),
    ]
    in_specs += [
        full(), full(),
        rep_spec(N), rep_spec(N), rep_spec(P), rep_spec(P),
        rep_spec(P), rep_spec(P), rep_spec(P), rep_spec(1), rep_spec(1),
    ]
    if nbins:
        inputs += [jump_hist.astype(jnp.int32), exposure.astype(jnp.float32)]
        in_specs += [rep_spec(nbins), rep_spec(nbins)]

    out_shapes = [
        jax.ShapeDtypeStruct((R, N), jnp.float32),
        jax.ShapeDtypeStruct((R, N), jnp.float32),
        jax.ShapeDtypeStruct((R, P), jnp.int32),
        jax.ShapeDtypeStruct((R, P), jnp.float32),
        jax.ShapeDtypeStruct((R, P), jnp.float32),
        jax.ShapeDtypeStruct((R, P), jnp.float32),
        jax.ShapeDtypeStruct((R, P), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.int32),
        jax.ShapeDtypeStruct((3, N), jnp.float32),
        jax.ShapeDtypeStruct((3, N), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.int32),  # truncated-frame count
    ]
    out_specs = [
        rep_spec(N), rep_spec(N), rep_spec(P), rep_spec(P),
        rep_spec(P), rep_spec(P), rep_spec(P), rep_spec(1), rep_spec(1),
        full(), full(), rep_spec(1),
    ]
    if nbins:
        out_shapes += [
            jax.ShapeDtypeStruct((R, nbins), jnp.int32),
            jax.ShapeDtypeStruct((R, nbins), jnp.float32),
        ]
        out_specs += [rep_spec(nbins), rep_spec(nbins)]
    if track_matrix:
        out_shapes.append(jax.ShapeDtypeStruct((n_tiles, N, N), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, N, N), lambda r: (r, 0, 0), memory_space=pltpu.VMEM)
        )

    # state inputs alias their outputs (indexing: inputs after box/ints/params/
    # post [+pgrp] are [prev, s0, occ..evc, hist?, expo?]; outputs 9/10 are
    # s_out/prev_out)
    base_in = 4 + (1 if angle else 0)
    aliases = {base_in: 10, base_in + 1: 9}
    for i in range(9):  # occ..evc -> outputs 0..8
        aliases[base_in + 2 + i] = i
    if nbins:
        aliases[base_in + 11] = 12
        aliases[base_in + 12] = 13

    scratch = [
        pltpu.VMEM((3, N), jnp.float32),  # s_scr
        pltpu.VMEM((3, N), jnp.float32),  # prev_scr
        pltpu.VMEM((TR, 1), jnp.float32),  # phase
        pltpu.VMEM((TR, 1), jnp.bool_),  # done
        pltpu.VMEM((N, N), jnp.float32),  # w_scr
        pltpu.VMEM((8, N), jnp.float32),  # coord_scr
    ]
    if nbins:
        scratch.append(pltpu.VMEM((N, N), jnp.float32))  # dist_scr

    # whole-block position inputs and the [N, N] scratches exceed Mosaic's
    # default 16 MB scoped-VMEM cap at supercell N — raise it to the estimate
    from cmdlmc_tpu.ops.vmem_budget import limit_bytes, padded_bytes as padded

    vmem = padded(B, 3, N)  # positions block (full residency)
    if angle:
        vmem += padded(B, 3, pgrp_positions.shape[1])
    vmem += (1 + (1 if nbins else 0)) * padded(N, N)  # w_scr (+ dist_scr)
    vmem += 4 * padded(TR, N) + 10 * padded(TR, P) + 7 * padded(TR, 1)
    vmem += 6 * padded(3, N) + padded(8, N)
    if nbins:
        vmem += 4 * padded(TR, nbins)
    if track_matrix:
        vmem += padded(N, N)

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        # CPU runs use the TPU-semantics interpreter (the plain HLO interpreter
        # has no lowering for the hardware PRNG primitives).
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=limit_bytes(vmem)
        ),
        input_output_aliases=aliases,
    )(*inputs)

    (occ2, lab2, sites2, tlast2, dbx2, dby2, dbz2, u2, evc2, s2, prev2,
     trunc2) = res[:12]
    out = {
        "occ": occ2,
        "labels": lab2,
        "sites": sites2,
        "tlast": tlast2,
        "disp_base": jnp.stack([dbx2, dby2, dbz2], axis=-1),
        "u_rem": u2.reshape(R),
        "ev_count": evc2.reshape(R),
        "site_disp": s2.T,
        "prev_pos": prev2.T,
        "trunc": trunc2.reshape(R),
    }
    idx = 12
    if nbins:
        out["jump_hist"] = res[idx]
        out["exposure"] = res[idx + 1]
        idx += 2
    if track_matrix:
        out["jump_matrix"] = res[idx].sum(axis=0)
    return out
