"""Fused-kernel engine backend: EnsembleState <-> kmc_sweep kernel adapter.

``run_block_fused`` is a drop-in alternative to ``run_block`` for the dense
PairRates model on orthorhombic cells with symmetric laws; it advances the
whole block inside one Pallas kernel (ops/kmc_sweep.py) instead of a lax.scan
of many small XLA ops. Use :func:`fused_supported` to decide; the scan engine
remains the general path (angle laws, hydronium, histograms, triclinic cells).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine.lattice import EnsembleState, ReplicaState
from cmdlmc_tpu.ops import kmc_sweep as ks
from cmdlmc_tpu.topo.models import PairRates


def fused_supported(model, cell: Cell, ens: EnsembleState) -> bool:
    if not isinstance(model, PairRates):
        return False
    if not cell.orthorhombic:
        return False
    if ks.law_kind(model.law) is None:
        return False
    if ens.replicas.jump_hist.shape[-1] != 0:
        return False
    if ens.replicas.jump_matrix.shape[-1] != 0:
        return False
    return True


def pick_tile(n_replicas: int, target: int = 128) -> int:
    """Largest divisor of R not exceeding the target tile size."""
    t = min(target, n_replicas)
    while n_replicas % t:
        t -= 1
    return t


def run_block_fused(
    model: PairRates,
    cell: Cell,
    ens: EnsembleState,
    frames_positions,  # [B, N, 3] f32
    frame0: int,
    *,
    dt: float,
    max_events: int = 4,
    seed: int = 0,
    tile: int | None = None,
    interpret: bool | None = None,
) -> EnsembleState:
    """Advance all replicas across the block with the fused kernel. Returns the
    updated ensemble (no per-frame rows — the runner reads observables from
    block-boundary states)."""
    rep = ens.replicas
    R = rep.occ.shape[0]
    if tile is None:
        tile = pick_tile(R)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cutbuf = float(model.cutoff) + float(model.buffer)
    (occ, labels, sites, tlast, disp_base, u, evc, s, prev) = ks.kmc_sweep(
        jnp.asarray(frames_positions, jnp.float32),
        ens.prev_pos,
        ens.site_disp,
        rep.occ,
        rep.proton_of_site.astype(jnp.float32),
        rep.site_of_proton,
        rep.t_last_jump,
        rep.disp_base,
        rep.clock.u_remaining,
        rep.clock.event_count,
        ks.law_params_array(model.law),
        jnp.int32(frame0),
        jnp.diagonal(cell.h),
        kind=ks.law_kind(model.law),
        tile=tile,
        max_events=max_events,
        dt=float(dt),
        seed=int(seed),
        cutbuf=cutbuf,
        interpret=bool(interpret),
    )
    jumps_delta = evc - rep.clock.event_count
    clock = dataclasses.replace(
        rep.clock,
        u_remaining=u,
        event_count=evc,
    )
    replicas = dataclasses.replace(
        rep,
        occ=occ,
        proton_of_site=jnp.round(labels).astype(jnp.int32),
        site_of_proton=sites,
        t_last_jump=tlast,
        disp_base=disp_base,
        clock=clock,
        jumps=rep.jumps + jumps_delta,
    )
    return EnsembleState(replicas=replicas, site_disp=s, prev_pos=prev)
