"""Fused-kernel engine backend: EnsembleState <-> Pallas kernel adapters.

``run_block_fused`` is a drop-in alternative to ``run_block``; it advances the
whole block inside one Pallas kernel instead of a lax.scan of many small XLA
ops. Three kernels cover the capability matrix:

* ``ops/kmc_sweep.py`` — dense [N, N] rate matrix built in-kernel: PairRates
  with laws the kernel evaluates inline, AnglePairRates with the (asymmetric)
  FermiAngle gate, and optional jump histogram / exposure / jump-matrix
  statistics.
* ``ops/kmc_sweep_streamed.py`` — dense W built by XLA (``model.shared``, any
  law/transform, triclinic cells) and streamed per frame through the grid
  pipeline; also the fastest dense path once >=16 tiles amortize the build.
* ``ops/topk_sweep.py`` — K-nearest neighbor lists: TopKPairRates (the
  reference's Verlet-list option) and HydroniumRates with residence-time
  distance relaxation (topology.py:170-257); triclinic via the h/h^-1
  round-based minimum image.

Use :func:`fused_supported` to decide; the XLA scan engine remains the
reference oracle and the fallback for anything the gate rejects."""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine.lattice import EnsembleState
from cmdlmc_tpu.ops import kmc_sweep as ks
from cmdlmc_tpu.rates import laws as rate_laws
from cmdlmc_tpu.topo.models import AnglePairRates, HydroniumRates, PairRates, TopKPairRates

logger = logging.getLogger(__name__)


def fused_unsupported_reason(model, cell: Cell, ens: EnsembleState) -> str | None:
    """None if a fused kernel can run this configuration, else a human-readable
    reason (the driver raises it when backend=fused is forced)."""
    if not cell.orthorhombic:
        # The fused triclinic kernels use the round-based fractional minimum
        # image, exact only for vectors shorter than half the smallest
        # perpendicular cell height; beyond that the scan engine's 27-image
        # search (core/cell.py::minimum_image) is required. Candidate pair
        # vectors reach cutoff+buffer, so gate on that. (Per-frame site drift
        # must also stay under the bound — a user contract for MD input, where
        # atoms move a tiny fraction of the cell per frame.)
        cutbuf = float(getattr(model, "cutoff", 0.0)) + float(
            getattr(model, "buffer", 0.0)
        )
        half_height = 0.5 * cell.min_height
        if cutbuf >= half_height:
            return (
                f"triclinic cell too skewed for the fused kernels' round-based "
                f"minimum image: cutoff+buffer ({cutbuf:.2f}) >= half the "
                f"smallest perpendicular cell height ({half_height:.2f}); the "
                "scan engine's 27-image search handles this cell"
            )
    if isinstance(model, (TopKPairRates, HydroniumRates)):
        from cmdlmc_tpu.ops import topk_sweep as ts

        return ts.topk_unsupported_reason(model)
    if isinstance(model, AnglePairRates):
        return None  # in-kernel for FermiAngle, streamed-W for any other law
    if not isinstance(model, PairRates):
        return f"topology model {type(model).__name__} has no fused kernel"
    if isinstance(model.law, rate_laws.FermiAngle):
        return f"rate law {type(model.law).__name__} needs AngleTopology"
    return None  # in-kernel for the known law kinds, streamed-W otherwise


def fused_supported(model, cell: Cell, ens: EnsembleState) -> bool:
    return fused_unsupported_reason(model, cell, ens) is None


def pick_tile(n_replicas: int, target: int = 128, n_sites: int = 0) -> int:
    """Largest divisor of R not exceeding the target tile size. The kernels
    size their own compiler VMEM budgets (ops/vmem_budget.py), so TR=128 holds
    through supercell N (measured fastest at N=1152: 2.7-4.1 G vs 1.3 G at
    TR=32); only truly huge site counts force smaller tiles to keep the
    [tile, N] replica blocks plus the [N, N] rate matrix under hardware VMEM."""
    if n_sites > 3072:
        target = min(target, 32)
    elif n_sites > 2048:
        target = min(target, 64)
    t = min(target, n_replicas)
    while n_replicas % t:
        t -= 1
    return t


def pick_layout(n_sites: int, interpret: bool) -> str:
    """Streamed-kernel state layout. "cols" (sites-major, [N, TR]) removes
    the lane padding of the element-throughput-bound event loop when N is
    not a multiple of 128 (flagship N=144 pads 144 -> 256 lanes rows-major).
    Interpret/CPU keeps "rows" — the layout whose RNG stream the in-kernel
    dense backend shares bit-for-bit (tests/engine/test_streamed.py)."""
    if interpret or n_sites % 128 == 0:
        return "rows"
    return "cols"


def _nbr_reuse_auto(model, n_sites: int) -> bool:
    """Default Verlet candidate-identity reuse policy for the top-K path
    (ops/topk_sweep.py::topk_tables_verlet). Auto-on at supercell N for plain
    TopKPairRates: there the per-frame identity churn makes the kernel's
    occ[nbr] delta/full refresh matmuls the dominant cost (measured v5e
    N=4608: delta refresh every frame; N=9216: FULL O(K*N^2) refresh every
    frame), and a positive buffer gives the displacement-guarded reuse the
    classic Verlet exactness bound. Off at small N (refresh cost is minor and
    per-frame rebuild stays the exactness oracle) and for HydroniumRates
    (k-closest selection feeds residence-time state; keep per-frame)."""
    return (
        isinstance(model, TopKPairRates)
        and n_sites >= 1024
        and float(model.buffer) > 0.0
    )


_reuse_auto_logged = False


def _log_reuse_auto_once():
    """One INFO line per process when the auto rule turns Verlet reuse on —
    it changes numerics vs per-frame rebuild in the k-truncated regime
    (within the coverage bound, docs/DESIGN.md 6b) so the switch should be
    visible in run logs. [Engine] nbr_reuse = off disables."""
    global _reuse_auto_logged
    if not _reuse_auto_logged:
        logger.info(
            "Verlet candidate-identity reuse auto-enabled for the top-K "
            "fused path (supercell N, buffered lists); set "
            "[Engine] nbr_reuse = off for per-frame rebuilds"
        )
        _reuse_auto_logged = True


def _grouped_positions(model, extras_positions):
    """[B, N, 3] heavy-atom position of each donor's group (host-side gather —
    o_to_p is static, so this is one cheap XLA take per block)."""
    return jnp.asarray(extras_positions, jnp.float32)[:, model.o_to_p, :]


# HBM budget for the streamed kernel's stage-1 dense tables: the XLA-built
# [B, N, N] f32 W block (doubled when jump histograms also need a distance
# block) is materialized before the kernel streams it. Unbounded, a
# soak-style block_size=2000 at supercell N=1152 would allocate ~10.6 GB per
# device (ADVICE r2); blocks whose tables would exceed this are split into
# frame sub-ranges, which is bit-exact (RNG draws are keyed by global frame
# and event ordinal — the chunk-invariance property the engine tests pin).
STREAMED_TABLE_BUDGET_BYTES = 2 << 30


def _streamed_frame_chunk(n_frames: int, n_sites: int, nbins: int,
                          cols: bool = False) -> int:
    tables = (2 if nbins else 1) + (1 if cols else 0)  # W [+dist] [+Wt]
    per_frame = n_sites * n_sites * 4 * tables
    return max(1, min(n_frames, STREAMED_TABLE_BUDGET_BYTES // max(per_frame, 1)))


def run_block_fused(
    model,
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
    extras_positions=None,  # [B, M, 3] heavy atoms (AngleTopology)
    hist_range: tuple = (2.0, 3.0),
    streamed: bool | None = None,  # None = auto; force the streamed-W kernel
    stale_rates: bool = False,  # reference-style stale in-frame rates
    layout: str | None = None,  # None = auto; streamed kernel state layout
    nbr_reuse: bool | None = None,  # None = auto; Verlet candidate reuse
) -> EnsembleState:
    """Advance all replicas across the block with the fused kernel. Returns the
    updated ensemble (no per-frame rows — the runner reads observables from
    block-boundary states). With ``return_truncation`` also returns the
    per-replica count of frames whose event budget was exhausted ('no silent
    caps' telemetry, mirroring the scan engine's ObsRow.truncated_mean)."""
    rep = ens.replicas
    R = rep.occ.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if isinstance(model, (TopKPairRates, HydroniumRates)):
        from cmdlmc_tpu.ops import topk_sweep as ts

        if stale_rates:
            logger.warning(
                "stale_rates has no effect on the top-K kernels: in-frame "
                "rates are recomputed after each event (distributionally "
                "equivalent at rate*dt << 1)"
            )
        if nbr_reuse is None:
            nbr_reuse = _nbr_reuse_auto(model, rep.occ.shape[1])
            if nbr_reuse:
                _log_reuse_auto_once()
        if layout is None:
            layout = ts.pick_layout_topk(rep.occ.shape[1], interpret)
        cols = layout == "cols"
        if tile is None:
            # the top-K kernel's true VMEM bound depends on block length
            # (resident candidate tables) as well as N — pick from the
            # footprint estimate, not site-count thresholds
            tile = ts.pick_tile_topk(
                R, n_sites=rep.occ.shape[1],
                n_protons=rep.site_of_proton.shape[1],
                block=len(frames_positions),
                k_cand=int(model.k), nbins=rep.jump_hist.shape[-1],
                track_matrix=rep.jump_matrix.shape[-1] != 0,
                cols=cols,
            )
        B = len(frames_positions)
        # bit-exact frame sub-chunking (RNG keyed by global frame and event
        # ordinal) keeps the block-resident candidate tables within VMEM at
        # supercell N. run_block_topk slices stage-1 tables built ONCE over
        # the whole block, so the per-block host round trip (Verlet rebuild
        # schedule / sparse plan) is not paid per chunk. An outer super-chunk
        # bounds the whole-block tables' HBM footprint (soak-scale blocks).
        chunk = ts.pick_frame_chunk(B, rep.occ.shape[1], int(model.k), cols)
        n_sites = rep.occ.shape[1]
        per_frame = 4 * ts._pad_k(int(model.k)) * n_sites * 4
        outer = max(chunk, STREAMED_TABLE_BUDGET_BYTES // max(per_frame, 1))
        if outer < B:
            trunc_total = None
            for s in range(0, B, outer):
                e = min(s + outer, B)
                ens, trunc = run_block_fused(
                    model, cell, ens, frames_positions[s:e],
                    frame0 + s, dt=dt, max_events=max_events, seed=seed,
                    tile=tile, interpret=interpret,
                    tile_offset=tile_offset, return_truncation=True,
                    hist_range=hist_range, layout=layout,
                    nbr_reuse=nbr_reuse,
                )
                trunc_total = (
                    trunc if trunc_total is None else trunc_total + trunc
                )
            return (ens, trunc_total) if return_truncation else ens
        out = ts.run_block_topk(
            model, ens, frames_positions, frame0,
            dt=dt, max_events=max_events, seed=seed, tile=tile,
            interpret=interpret, tile_offset=tile_offset,
            hist_range=hist_range, layout=layout, reuse=nbr_reuse,
            chunk=chunk,
        )
    else:
        if tile is None:
            tile = pick_tile(R, n_sites=rep.occ.shape[1])
        nbins = rep.jump_hist.shape[-1]
        track_matrix = rep.jump_matrix.shape[-1] != 0
        kind = ks.law_kind(model.law)
        if streamed is None:
            # in-kernel W build needs an orthorhombic cell and a law the
            # kernel evaluates inline; everything else (triclinic, exotic
            # laws) streams stage-1 XLA-built W matrices through the kernel
            streamed = not cell.orthorhombic or kind is None or (
                isinstance(model, AnglePairRates)
                and not isinstance(model.law, rate_laws.FermiAngle)
            )
            if stale_rates:
                streamed = True  # the stale-rates mode lives in the streamed kernel
            # perf: the in-kernel path rebuilds W once per replica tile; the
            # one XLA-stage build + HBM streaming wins once enough tiles
            # amortize it (measured v5e @TR=128: N=144 R=16384 2.83 vs 2.45 G,
            # N=1152 R=4096 4.09 vs 2.73 G; at 8 tiles dense still wins
            # slightly, 1.9 vs 1.7 G)
            if not streamed and R >= 16 * tile:
                streamed = True
        if streamed:
            from cmdlmc_tpu.ops import kmc_sweep_streamed as kss

            if isinstance(model, AnglePairRates) and extras_positions is None:
                raise ValueError(
                    "AngleTopology fused run needs extra-atom positions"
                )
            if layout is None:
                layout = pick_layout(rep.occ.shape[1], interpret)
            B = frames_positions.shape[0]
            chunk = _streamed_frame_chunk(B, rep.occ.shape[1], nbins,
                                          cols=layout == "cols")
            if chunk < B:
                trunc_total = None
                for s in range(0, B, chunk):
                    e = min(s + chunk, B)
                    ens, trunc = run_block_fused(
                        model, cell, ens, frames_positions[s:e],
                        frame0 + s, dt=dt, max_events=max_events, seed=seed,
                        tile=tile, interpret=interpret,
                        tile_offset=tile_offset, return_truncation=True,
                        extras_positions=(
                            extras_positions[s:e]
                            if extras_positions is not None else None
                        ),
                        hist_range=hist_range, streamed=True,
                        stale_rates=stale_rates, layout=layout,
                    )
                    rep = ens.replicas
                    trunc_total = (
                        trunc if trunc_total is None else trunc_total + trunc
                    )
                return (ens, trunc_total) if return_truncation else ens
            w_block, dist_block = kss.dense_tables(
                model, jnp.asarray(frames_positions, jnp.float32),
                extras_block=(
                    jnp.asarray(extras_positions, jnp.float32)
                    if extras_positions is not None else None
                ),
                nbins=nbins,
            )
            out = kss.kmc_sweep_streamed(
                w_block,
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
                jnp.int32(frame0),
                cell.h,
                cell.h_inv,
                tile_offset,
                dist_block=dist_block,
                jump_hist=rep.jump_hist if nbins else None,
                exposure=rep.opportunity_hist if nbins else None,
                tile=tile,
                max_events=max_events,
                dt=float(dt),
                seed=int(seed),
                orthorhombic=bool(cell.orthorhombic),
                interpret=bool(interpret),
                nbins=nbins,
                hist_range=tuple(hist_range),
                track_matrix=track_matrix,
                stale=stale_rates,
                layout=layout,
            )
            return _finish(ens, rep, out, return_truncation)
        pgrp = None
        if isinstance(model, AnglePairRates):
            if extras_positions is None:
                raise ValueError("AngleTopology fused run needs extra-atom positions")
            pgrp = _grouped_positions(model, extras_positions)
        cutbuf = float(model.cutoff) + float(model.buffer)
        out = ks.kmc_sweep(
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
            pgrp_positions=pgrp,
            jump_hist=rep.jump_hist if nbins else None,
            exposure=rep.opportunity_hist if nbins else None,
            kind=kind,
            tile=tile,
            max_events=max_events,
            dt=float(dt),
            seed=int(seed),
            cutbuf=cutbuf,
            interpret=bool(interpret),
            nbins=nbins,
            hist_range=tuple(hist_range),
            track_matrix=track_matrix,
        )
    return _finish(ens, rep, out, return_truncation)


def _finish(ens, rep, out, return_truncation):
    """Repack a kernel output dict into an EnsembleState."""
    jumps_delta = out["ev_count"] - rep.clock.event_count
    clock = dataclasses.replace(
        rep.clock,
        u_remaining=out["u_rem"],
        event_count=out["ev_count"],
    )
    updates = dict(
        occ=out["occ"],
        proton_of_site=jnp.round(out["labels"]).astype(jnp.int32),
        site_of_proton=out["sites"],
        t_last_jump=out["tlast"],
        disp_base=out["disp_base"],
        clock=clock,
        jumps=rep.jumps + jumps_delta,
    )
    if "jump_hist" in out:
        updates["jump_hist"] = out["jump_hist"]
        updates["opportunity_hist"] = out["exposure"]
    if "jump_matrix" in out:
        # the kernel returns the tile-summed pair matrix; fold it into replica
        # 0's slot so the driver's sum-over-replicas stays correct
        updates["jump_matrix"] = rep.jump_matrix.at[0].add(
            jnp.round(out["jump_matrix"]).astype(rep.jump_matrix.dtype)
        )
    replicas = dataclasses.replace(rep, **updates)
    ens_out = dataclasses.replace(
        ens, replicas=replicas, site_disp=out["site_disp"],
        prev_pos=out["prev_pos"],
        nbr_carry=out.get("nbr_carry", ens.nbr_carry),
    )
    if return_truncation:
        return ens_out, out["trunc"]
    return ens_out


def run_block_fused_sharded(
    model,
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
    extras_positions=None,
    hist_range: tuple = (2.0, 3.0),
    return_truncation: bool = False,
    streamed: bool | None = None,
    stale_rates: bool = False,
    layout: str | None = None,
    nbr_reuse: bool | None = None,
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
        if isinstance(model, (TopKPairRates, HydroniumRates)):
            from cmdlmc_tpu.ops import topk_sweep as ts

            if layout is None:
                layout = ts.pick_layout_topk(
                    ens.replicas.occ.shape[1],
                    bool(interpret if interpret is not None
                         else jax.default_backend() != "tpu"),
                )
            tile = ts.pick_tile_topk(
                local_r, n_sites=ens.replicas.occ.shape[1],
                n_protons=ens.replicas.site_of_proton.shape[1],
                block=len(frames_positions),
                k_cand=int(model.k),
                nbins=ens.replicas.jump_hist.shape[-1],
                track_matrix=ens.replicas.jump_matrix.shape[-1] != 0,
                cols=layout == "cols",
            )
        else:
            tile = pick_tile(local_r, n_sites=ens.replicas.occ.shape[1])
    assert local_r % tile == 0, (local_r, tile)
    tiles_per_dev = local_r // tile

    rep0 = ens.replicas
    nbins = rep0.jump_hist.shape[-1]
    kind = ks.law_kind(model.law)
    track_matrix = rep0.jump_matrix.shape[-1] != 0
    if isinstance(model, (TopKPairRates, HydroniumRates)):
        from cmdlmc_tpu.ops import topk_sweep as ts

        if layout is None:
            layout = ts.pick_layout_topk(
                rep0.occ.shape[1],
                bool(interpret if interpret is not None
                     else jax.default_backend() != "tpu"),
            )
        # same bit-exact frame sub-chunking as the single-device path: the
        # block-resident candidate tables (lane-padded [B, N, KL] under the
        # cols layout) must fit VMEM here too, not only when run_block_fused
        # dispatches the kernel directly
        B = frames_positions.shape[0]
        chunk = ts.pick_frame_chunk(
            B, rep0.occ.shape[1], int(model.k), layout == "cols"
        )
        if chunk < B:
            trunc_total = None
            for s in range(0, B, chunk):
                e = min(s + chunk, B)
                ens, trunc = run_block_fused_sharded(
                    model, cell, ens, frames_positions[s:e], frame0 + s,
                    mesh, axis=axis, dt=dt, max_events=max_events, seed=seed,
                    tile=tile, interpret=interpret, hist_range=hist_range,
                    return_truncation=True, layout=layout, nbr_reuse=nbr_reuse,
                )
                trunc_total = (
                    trunc if trunc_total is None else trunc_total + trunc
                )
            return (ens, trunc_total) if return_truncation else ens
        return _run_sharded_topk(
            model, cell, ens, frames_positions, frame0, mesh,
            axis=axis, dt=dt, max_events=max_events, seed=seed, tile=tile,
            interpret=interpret, hist_range=hist_range,
            tiles_per_dev=tiles_per_dev, nbins=nbins,
            track_matrix=track_matrix, return_truncation=return_truncation,
            layout=layout, nbr_reuse=nbr_reuse,
        )
    if streamed is None and stale_rates:
        streamed = True
    if streamed is None:
        # same promotion rule as the single-device path (run_block_fused),
        # evaluated on the GLOBAL replica count: with the same tile size both
        # paths pick the same kernel, keeping the bit-identical contract in
        # the large-R regime where multi-chip is actually used (ADVICE r2)
        streamed = not cell.orthorhombic or kind is None or (
            isinstance(model, AnglePairRates)
            and not isinstance(model.law, rate_laws.FermiAngle)
        ) or R >= 16 * tile
    if streamed:
        # streamed-W route: stage-1 W build is plain XLA (replicated here —
        # frames are replicated anyway); the kernel shards over replicas with
        # per-shard tile-id offsets, identical RNG to single-device
        if layout is None:
            layout = pick_layout(
                rep0.occ.shape[1],
                bool(interpret if interpret is not None
                     else jax.default_backend() != "tpu"),
            )
        B = frames_positions.shape[0]
        chunk = _streamed_frame_chunk(B, rep0.occ.shape[1], nbins,
                                      cols=layout == "cols")
        if chunk < B:
            trunc_total = None
            for s in range(0, B, chunk):
                e = min(s + chunk, B)
                ens, trunc = run_block_fused_sharded(
                    model, cell, ens, frames_positions[s:e], frame0 + s,
                    mesh, axis=axis, dt=dt, max_events=max_events, seed=seed,
                    tile=tile, interpret=interpret,
                    extras_positions=(
                        extras_positions[s:e]
                        if extras_positions is not None else None
                    ),
                    hist_range=hist_range, return_truncation=True,
                    streamed=True, stale_rates=stale_rates, layout=layout,
                )
                trunc_total = (
                    trunc if trunc_total is None else trunc_total + trunc
                )
            return (ens, trunc_total) if return_truncation else ens
        return _run_sharded_streamed(
            model, cell, ens, frames_positions, frame0, mesh,
            axis=axis, dt=dt, max_events=max_events, seed=seed, tile=tile,
            interpret=interpret, extras_positions=extras_positions,
            hist_range=hist_range, tiles_per_dev=tiles_per_dev, nbins=nbins,
            track_matrix=track_matrix, return_truncation=return_truncation,
            stale=stale_rates, layout=layout,
        )
    pgrp = None
    if isinstance(model, AnglePairRates):
        if extras_positions is None:
            raise ValueError("AngleTopology fused run needs extra-atom positions")
        pgrp = _grouped_positions(model, extras_positions)
    cutbuf = float(model.cutoff) + float(model.buffer)
    use_interp = bool(
        interpret if interpret is not None else jax.default_backend() != "tpu"
    )

    def local(occ, labels, sites, tlast, disp_base, u, evc, hist, expo,
              site_disp, prev_pos, positions, pgrp_arr):
        idx = jax.lax.axis_index(axis)
        out = ks.kmc_sweep(
            positions, prev_pos, site_disp,
            occ, labels, sites, tlast, disp_base, u, evc,
            ks.law_params_array(model.law),
            jnp.int32(frame0),
            jnp.diagonal(cell.h),
            idx * tiles_per_dev,
            pgrp_positions=pgrp_arr if pgrp is not None else None,
            jump_hist=hist if nbins else None,
            exposure=expo if nbins else None,
            kind=kind,
            tile=tile,
            max_events=max_events,
            dt=float(dt),
            seed=int(seed),
            cutbuf=cutbuf,
            interpret=use_interp,
            nbins=nbins,
            hist_range=tuple(hist_range),
            track_matrix=track_matrix,
        )
        keys = ["occ", "labels", "sites", "tlast", "disp_base", "u_rem",
                "ev_count", "site_disp", "prev_pos", "trunc"]
        if nbins:
            keys += ["jump_hist", "exposure"]
        outs = tuple(out[k] for k in keys)
        if track_matrix:
            # per-shard tile-summed [N, N] pair counts -> global sum on ICI
            outs += (jax.lax.psum(out["jump_matrix"], axis),)
        return outs

    out_specs = [P(axis)] * 7 + [P(), P(), P(axis)]
    if nbins:
        out_specs += [P(axis), P(axis)]
    if track_matrix:
        out_specs += [P()]
    res = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis),
            P(), P(), P(), P(),
        ),
        out_specs=tuple(out_specs),
        check_vma=False,
    )(
        rep0.occ,
        rep0.proton_of_site.astype(jnp.float32),
        rep0.site_of_proton,
        rep0.t_last_jump,
        rep0.disp_base,
        rep0.clock.u_remaining,
        rep0.clock.event_count,
        rep0.jump_hist,
        rep0.opportunity_hist,
        ens.site_disp,
        ens.prev_pos,
        jnp.asarray(frames_positions, jnp.float32),
        # tiny placeholder when no angle topology: local() ignores it, and a
        # block-sized zeros dummy would be replicated to every device
        pgrp if pgrp is not None else jnp.zeros((1,), jnp.float32),
    )
    return _finish_sharded(ens, res, nbins, track_matrix, return_truncation)


def _finish_sharded(ens, res, nbins, track_matrix, return_truncation=False,
                    nbr_carry="keep"):
    """Repack the shard_map result tuple (occ..trunc [+hist/expo] [+jm]) into
    an EnsembleState."""
    rep0 = ens.replicas
    (occ, labels, sites, tlast, disp_base, u, evc, s, prev, trunc) = res[:10]
    jumps_delta = evc - rep0.clock.event_count
    clock = dataclasses.replace(rep0.clock, u_remaining=u, event_count=evc)
    updates = dict(
        occ=occ,
        proton_of_site=jnp.round(labels).astype(jnp.int32),
        site_of_proton=sites,
        t_last_jump=tlast,
        disp_base=disp_base,
        clock=clock,
        jumps=rep0.jumps + jumps_delta,
    )
    idx = 10
    if nbins:
        updates["jump_hist"] = res[idx]
        updates["opportunity_hist"] = res[idx + 1]
        idx += 2
    if track_matrix:
        updates["jump_matrix"] = rep0.jump_matrix.at[0].add(
            jnp.round(res[idx]).astype(rep0.jump_matrix.dtype)
        )
    replicas = dataclasses.replace(rep0, **updates)
    ens_out = dataclasses.replace(
        ens, replicas=replicas, site_disp=s, prev_pos=prev,
        nbr_carry=ens.nbr_carry if nbr_carry == "keep" else nbr_carry,
    )
    if return_truncation:
        return ens_out, trunc
    return ens_out


def _run_sharded_streamed(
    model, cell, ens, frames_positions, frame0, mesh, *,
    axis, dt, max_events, seed, tile, interpret, extras_positions,
    hist_range, tiles_per_dev, nbins, track_matrix=False,
    return_truncation=False, stale=False, layout=None,
):
    """Streamed-W dense kernel under shard_map (triclinic cells / laws with
    no in-kernel evaluation). Bit-identical to the single-device streamed run
    with the same tile size (pick_layout depends only on (N, interpret), so
    both paths auto-select the same state layout)."""
    from jax.sharding import PartitionSpec as P

    from cmdlmc_tpu.ops import kmc_sweep_streamed as kss

    rep0 = ens.replicas
    if isinstance(model, AnglePairRates) and extras_positions is None:
        raise ValueError("AngleTopology fused run needs extra-atom positions")
    use_interp = bool(
        interpret if interpret is not None else jax.default_backend() != "tpu"
    )
    if layout is None:
        layout = pick_layout(rep0.occ.shape[1], use_interp)
    w_block, dist_block = kss.dense_tables(
        model, jnp.asarray(frames_positions, jnp.float32),
        extras_block=(
            jnp.asarray(extras_positions, jnp.float32)
            if extras_positions is not None else None
        ),
        nbins=nbins,
    )

    def local(occ, labels, sites, tlast, disp_base, u, evc, hist, expo,
              site_disp, prev_pos, positions, w_blk, dist_blk):
        idx = jax.lax.axis_index(axis)
        out = kss.kmc_sweep_streamed(
            w_blk, positions, prev_pos, site_disp,
            occ, labels, sites, tlast, disp_base, u, evc,
            jnp.int32(frame0), cell.h, cell.h_inv,
            idx * tiles_per_dev,
            dist_block=dist_blk if nbins else None,
            jump_hist=hist if nbins else None,
            exposure=expo if nbins else None,
            tile=tile,
            max_events=max_events,
            dt=float(dt),
            seed=int(seed),
            orthorhombic=bool(cell.orthorhombic),
            interpret=use_interp,
            nbins=nbins,
            hist_range=tuple(hist_range),
            track_matrix=track_matrix,
            stale=stale,
            layout=layout,
        )
        keys = ["occ", "labels", "sites", "tlast", "disp_base", "u_rem",
                "ev_count", "site_disp", "prev_pos", "trunc"]
        if nbins:
            keys += ["jump_hist", "exposure"]
        outs = tuple(out[k] for k in keys)
        if track_matrix:
            outs += (jax.lax.psum(out["jump_matrix"], axis),)
        return outs

    out_specs = [P(axis)] * 7 + [P(), P(), P(axis)]
    if nbins:
        out_specs += [P(axis), P(axis)]
    if track_matrix:
        out_specs += [P()]
    res = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis),
            P(), P(), P(), P(), P(),
        ),
        out_specs=tuple(out_specs),
        check_vma=False,
    )(
        rep0.occ,
        rep0.proton_of_site.astype(jnp.float32),
        rep0.site_of_proton,
        rep0.t_last_jump,
        rep0.disp_base,
        rep0.clock.u_remaining,
        rep0.clock.event_count,
        rep0.jump_hist,
        rep0.opportunity_hist,
        ens.site_disp,
        ens.prev_pos,
        jnp.asarray(frames_positions, jnp.float32),
        w_block,
        dist_block if dist_block is not None else jnp.zeros((1,), jnp.float32),
    )
    return _finish_sharded(ens, res, nbins, track_matrix, return_truncation)


def _run_sharded_topk(
    model, cell, ens, frames_positions, frame0, mesh, *,
    axis, dt, max_events, seed, tile, interpret, hist_range, tiles_per_dev,
    nbins, track_matrix=False, return_truncation=False, layout=None,
    nbr_reuse=None,
):
    """Top-K fused kernels under shard_map: stage-1 candidate tables are
    replica-independent (built once, replicated); the kernel shards over
    replicas with per-shard tile-id offsets. ``tlast_site`` is recomputed per
    shard from local state (ops/topk_sweep._entry_tlast_site)."""
    from jax.sharding import PartitionSpec as P

    from cmdlmc_tpu.ops import topk_sweep as ts

    rep0 = ens.replicas
    reason = ts.topk_unsupported_reason(model)
    if reason:
        raise ValueError(reason)
    use_interp = bool(
        interpret if interpret is not None else jax.default_backend() != "tpu"
    )
    if layout is None:
        # the same deterministic rule the single-device path applies, so both
        # paths pick one layout and stay bit-identical at equal tile size
        layout = ts.pick_layout_topk(rep0.occ.shape[1], use_interp)
    positions = jnp.asarray(frames_positions, jnp.float32)
    k_cand = min(int(model.k), positions.shape[1] - 1)
    has_interp = (
        isinstance(model, HydroniumRates) and model.interpolator is not None
    )
    relax = jnp.float32(
        model.interpolator.relaxation_time if has_interp else 0.0
    )
    # same auto Verlet-reuse rule (and explicit knob) as the single-device
    # path — bit-identical contract at equal tile size; carry threads
    # through ens.nbr_carry
    if nbr_reuse is None:
        nbr_reuse = _nbr_reuse_auto(model, positions.shape[1])
        if nbr_reuse:
            _log_reuse_auto_once()
    new_carry = "keep"
    if nbr_reuse:
        (topd, topi, resc, ci, cnbr, chg, mode, new_carry) = (
            ts.topk_tables_verlet(
                model, positions, ts._pad_k(k_cand), not has_interp,
                ens.nbr_carry, int(frame0),
            )
        )
    else:
        topd, topi, resc, ci, cnbr, chg, mode = ts.topk_tables_delta(
            model, positions, ts._pad_k(k_cand), not has_interp,
            ts.default_cmax(positions.shape[1]),
        )
    params = jnp.concatenate([
        ks.law_params_array(model.law), jnp.stack([relax, jnp.float32(0.0)])
    ])

    def local(occ, labels, sites, tlast, disp_base, u, evc, hist, expo,
              site_disp, prev_pos, pos, td, ti, rs, ci_, cnbr_, chg_, mode_):
        idx = jax.lax.axis_index(axis)
        tlast_site = ts.entry_tlast_site(occ, labels, tlast)
        out = ts.topk_sweep(
            pos, td, ti, rs,
            ci_, cnbr_, chg_, mode_,
            prev_pos, site_disp,
            occ, labels, sites, tlast, tlast_site, disp_base, u, evc,
            params,
            jnp.int32(frame0),
            cell.h, cell.h_inv,
            idx * tiles_per_dev,
            jump_hist=hist if nbins else None,
            exposure=expo if nbins else None,
            kind=ks.law_kind(model.law),
            k_cand=k_cand,
            tile=tile,
            max_events=max_events,
            dt=float(dt),
            seed=int(seed),
            has_interp=bool(has_interp),
            interpret=use_interp,
            nbins=nbins,
            hist_range=tuple(hist_range),
            track_matrix=track_matrix,
            orthorhombic=bool(cell.orthorhombic),
            layout=layout,
        )
        keys = ["occ", "labels", "sites", "tlast", "disp_base", "u_rem",
                "ev_count", "site_disp", "prev_pos", "trunc"]
        if nbins:
            keys += ["jump_hist", "exposure"]
        outs = tuple(out[k] for k in keys)
        if track_matrix:
            outs += (jax.lax.psum(out["jump_matrix"], axis),)
        return outs

    out_specs = [P(axis)] * 7 + [P(), P(), P(axis)]
    if nbins:
        out_specs += [P(axis), P(axis)]
    if track_matrix:
        out_specs += [P()]
    res = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(axis), P(axis),
            P(), P(), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=tuple(out_specs),
        check_vma=False,
    )(
        rep0.occ,
        rep0.proton_of_site.astype(jnp.float32),
        rep0.site_of_proton,
        rep0.t_last_jump,
        rep0.disp_base,
        rep0.clock.u_remaining,
        rep0.clock.event_count,
        rep0.jump_hist,
        rep0.opportunity_hist,
        ens.site_disp,
        ens.prev_pos,
        positions,
        topd, topi, resc,
        ci, cnbr, chg, mode,
    )
    return _finish_sharded(ens, res, nbins, track_matrix, return_truncation,
                           nbr_carry=new_carry)
