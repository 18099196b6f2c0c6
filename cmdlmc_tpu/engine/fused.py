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
from cmdlmc_tpu.engine.lattice import EnsembleState
from cmdlmc_tpu.ops import kmc_sweep as ks
from cmdlmc_tpu.topo.models import PairRates


def fused_unsupported_reason(model, cell: Cell, ens: EnsembleState) -> str | None:
    """None if the fused kernel can run this configuration, else a human-readable
    reason (the driver raises it when backend=fused is forced)."""
    if not isinstance(model, PairRates):
        return f"topology model {type(model).__name__} is not PairRates"
    if not cell.orthorhombic:
        return "triclinic cells need the general minimum image (scan backend)"
    if ks.law_kind(model.law) is None:
        return f"rate law {type(model.law).__name__} has no fused kernel"
    if ens.replicas.jump_hist.shape[-1] != 0:
        return "distance-resolved jump/exposure histograms (jumpstat)"
    if ens.replicas.jump_matrix.shape[-1] != 0:
        return "pairwise jump matrix tracking"
    return None


def fused_supported(model, cell: Cell, ens: EnsembleState) -> bool:
    return fused_unsupported_reason(model, cell, ens) is None


def pick_tile(n_replicas: int, target: int = 128, n_sites: int = 0) -> int:
    """Largest divisor of R not exceeding the target tile size. For large
    site counts the per-tile VMEM footprint (several [tile, N] buffers plus
    the [N, N] rate-matrix scratch) forces smaller tiles."""
    if n_sites > 768:
        target = min(target, 32)
    elif n_sites > 384:
        target = min(target, 64)
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
    tile_offset=0,
    return_truncation: bool = False,
) -> EnsembleState:
    """Advance all replicas across the block with the fused kernel. Returns the
    updated ensemble (no per-frame rows — the runner reads observables from
    block-boundary states). With ``return_truncation`` also returns the
    per-replica count of frames whose event budget was exhausted ('no silent
    caps' telemetry, mirroring the scan engine's ObsRow.truncated_mean)."""
    rep = ens.replicas
    R = rep.occ.shape[0]
    if tile is None:
        tile = pick_tile(R, n_sites=rep.occ.shape[1])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cutbuf = float(model.cutoff) + float(model.buffer)
    (occ, labels, sites, tlast, disp_base, u, evc, s, prev, trunc) = ks.kmc_sweep(
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
        tile_offset,
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
    out = EnsembleState(replicas=replicas, site_disp=s, prev_pos=prev)
    if return_truncation:
        return out, trunc
    return out


def run_block_fused_sharded(
    model: PairRates,
    cell: Cell,
    ens: EnsembleState,
    frames_positions,
    frame0: int,
    mesh,
    *,
    axis: str = "replica",
    dt: float,
    max_events: int = 4,
    seed: int = 0,
    tile: int | None = None,
    interpret: bool | None = None,
) -> EnsembleState:
    """Multi-chip fused sweep: shard the replica axis over the mesh and run the
    Pallas kernel per device under shard_map. Tile ids are offset per shard so
    the RNG streams — and therefore the results — are identical to a
    single-device run with the same tile size."""
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    R = ens.replicas.occ.shape[0]
    assert R % n_dev == 0, (R, n_dev)
    local_r = R // n_dev
    if tile is None:
        tile = pick_tile(local_r, n_sites=ens.replicas.occ.shape[1])
    assert local_r % tile == 0, (local_r, tile)
    tiles_per_dev = local_r // tile

    rep0 = ens.replicas
    cutbuf = float(model.cutoff) + float(model.buffer)

    def local(occ, labels, sites, tlast, disp_base, u, evc, site_disp,
              prev_pos, positions):
        idx = jax.lax.axis_index(axis)
        return ks.kmc_sweep(
            positions, prev_pos, site_disp,
            occ, labels, sites, tlast, disp_base, u, evc,
            ks.law_params_array(model.law),
            jnp.int32(frame0),
            jnp.diagonal(cell.h),
            idx * tiles_per_dev,
            kind=ks.law_kind(model.law),
            tile=tile,
            max_events=max_events,
            dt=float(dt),
            seed=int(seed),
            cutbuf=cutbuf,
            interpret=bool(
                interpret if interpret is not None
                else jax.default_backend() != "tpu"
            ),
        )

    (occ, labels, sites, tlast, disp_base, u, evc, s, prev, _trunc) = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(), P(), P(),
        ),
        out_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(), P(), P(axis),
        ),
        check_vma=False,
    )(
        rep0.occ,
        rep0.proton_of_site.astype(jnp.float32),
        rep0.site_of_proton,
        rep0.t_last_jump,
        rep0.disp_base,
        rep0.clock.u_remaining,
        rep0.clock.event_count,
        ens.site_disp,
        ens.prev_pos,
        jnp.asarray(frames_positions, jnp.float32),
    )
    jumps_delta = evc - rep0.clock.event_count
    clock = dataclasses.replace(rep0.clock, u_remaining=u, event_count=evc)
    replicas = dataclasses.replace(
        rep0,
        occ=occ,
        proton_of_site=jnp.round(labels).astype(jnp.int32),
        site_of_proton=sites,
        t_last_jump=tlast,
        disp_base=disp_base,
        clock=clock,
        jumps=rep0.jumps + jumps_delta,
    )
    return EnsembleState(replicas=replicas, site_disp=s, prev_pos=prev)
