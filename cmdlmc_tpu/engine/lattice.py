"""Multi-proton KMC lattice engine: fused per-frame scan step, vmapped replicas.

TPU-native replacement for the reference's ``KMCLattice`` (LMC/MDMC.py:28-226).
The reference advances ONE lattice by pulling MD frames through a chain of Python
generators; here one ``lax.scan`` step per MD frame advances THOUSANDS of
independent replicas (the Monte Carlo analog of data parallelism):

  stage 1 (shared, once per frame)   — geometry -> rate matrix W[N, N] or top-K
                                       list; identical for every replica because
                                       all replicas ride the same MD trajectory.
  stage 2 (per replica, vmapped)     — occupancy masking, the KMC clock
                                       (engine/clock.py), event selection and
                                       lattice/observable updates.

The per-replica total jump rate — the reference's ``sum_of_jumprates``
(MDMC.py:85) gated by ``filter_allowed_transitions`` (MDMC.py:241-248: source
occupied AND destination free) — becomes

    R[r] = occ[r] @ W @ (1 - occ[r])

which under vmap is two MXU matmuls over the replica batch. Transition selection
(``move_proton``'s cumsum / uniform / searchsorted, MDMC.py:101-119) becomes an
exactly equivalent two-stage categorical draw: source site with probability
proportional to its allowed outgoing rate-row sum, then destination from that
row — avoiding any R x N^2 materialization.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from cmdlmc_tpu.core.cell import Cell, displacement as cell_displacement
from cmdlmc_tpu.engine import clock as kmc_clock
from cmdlmc_tpu.engine.clock import ClockState
from cmdlmc_tpu.topo.models import DenseShared, Frame, TopKShared

Array = jax.Array


def _pytree(cls=None, *, data_fields, meta_fields=()):
    if cls is None:
        return partial(_pytree, data_fields=data_fields, meta_fields=meta_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@_pytree(
    data_fields=[
        "occ",
        "proton_of_site",
        "site_of_proton",
        "t_last_jump",
        "clock",
        "jumps",
        "snapshot",
        "displacement",
        "autocorr_ref",
        "jump_hist",
        "opportunity_hist",
        "jump_matrix",
    ]
)
class ReplicaState:
    """Complete per-replica simulation state (one KMC chain).

    occ            f32[N]   1.0 where a proton sits (float for the MXU path)
    proton_of_site i32[N]   proton label 1..P, 0 = empty (reference lattice
                            convention, MDMC.py:68-72)
    site_of_proton i32[P]   inverse map
    t_last_jump    f32[P]   absolute KMC time of each proton's last jump, -1 if
                            never (HydroniumTopology state, topology.py:211)
    clock          ClockState  the time-dependent KMC clock
    jumps          i32      events since the last observable reset
    snapshot       f32[P,3] proton positions at the previous frame (MSD)
    displacement   f32[P,3] accumulated PBC-aware displacement since reset
    autocorr_ref   i32[P]   site of each proton at the last reset
    jump_hist      i32[B]   distance-binned jump counts (jumpstat; B=0 disables)
    opportunity_hist f32[B] distance-binned allowed-transition exposure, in
                            units of frames (jump probability = jump_hist /
                            opportunity_hist)
    jump_matrix    i32[N,N] per-pair jump counts (legacy jumpmatrix capability,
                            IO/config_parser.py:300-306; shape (0,0) disables)
    """

    occ: Array
    proton_of_site: Array
    site_of_proton: Array
    t_last_jump: Array
    clock: ClockState
    jumps: Array
    snapshot: Array
    displacement: Array
    autocorr_ref: Array
    jump_hist: Array
    opportunity_hist: Array
    jump_matrix: Array


@_pytree(
    data_fields=[
        "frame",
        "time",
        "msd_mean",
        "msd_var",
        "autocorr_mean",
        "autocorr_var",
        "jumps_mean",
        "events_mean",
    ]
)
class ObsRow:
    """Per-frame ensemble observables (mean/variance across replicas)."""

    frame: Array
    time: Array
    msd_mean: Array
    msd_var: Array
    autocorr_mean: Array
    autocorr_var: Array
    jumps_mean: Array
    events_mean: Array


def init_replicas(
    key: Array,
    n_replicas: int,
    n_sites: int,
    n_protons: int,
    first_positions: Array,
    *,
    hist_bins: int = 0,
    track_jump_matrix: bool = False,
) -> ReplicaState:
    """Random-occupancy initialization, the vmapped analog of the reference's
    shuffled label array (MDMC.py:68-72) — but with explicit keys instead of
    global RNG state (the reference's unseeded gap, SURVEY.md §5.2).

    ``hist_bins > 0`` enables distance-resolved jump statistics (jumpstat);
    ``track_jump_matrix`` enables the N x N pair jump counter."""

    jm = n_sites if track_jump_matrix else 0

    def init_one(k):
        sites = jax.random.permutation(k, n_sites)[:n_protons].astype(jnp.int32)
        occ = jnp.zeros((n_sites,), jnp.float32).at[sites].set(1.0)
        labels = jnp.arange(1, n_protons + 1, dtype=jnp.int32)
        proton_of_site = jnp.zeros((n_sites,), jnp.int32).at[sites].set(labels)
        snapshot = first_positions[sites]
        return ReplicaState(
            occ=occ,
            proton_of_site=proton_of_site,
            site_of_proton=sites,
            t_last_jump=-jnp.ones((n_protons,), jnp.float32),
            clock=kmc_clock.init_clock(jax.random.fold_in(k, 7)),
            jumps=jnp.int32(0),
            snapshot=snapshot,
            displacement=jnp.zeros((n_protons, 3), jnp.float32),
            autocorr_ref=sites,
            jump_hist=jnp.zeros((hist_bins,), jnp.int32),
            opportunity_hist=jnp.zeros((hist_bins,), jnp.float32),
            jump_matrix=jnp.zeros((jm, jm), jnp.int32),
        )

    return jax.vmap(init_one)(jax.random.split(key, n_replicas))


def _hist_bin(dist: Array, hist_range: tuple[float, float], n_bins: int) -> Array:
    lo, hi = hist_range
    raw = (dist - lo) / (hi - lo) * n_bins
    return jnp.clip(raw.astype(jnp.int32), 0, n_bins - 1)


def _hist_in_range(dist: Array, hist_range: tuple[float, float]) -> Array:
    lo, hi = hist_range
    return (dist >= lo) & (dist < hi)


# ----------------------------------------------------------------------------
# Per-replica physics
# ----------------------------------------------------------------------------


def _site_residence(occ, proton_of_site, t_last_jump, time):
    """Residence time of the proton occupying each site; -1 encodes 'never
    jumped' (maps to fully relaxed distances, topology.py:219)."""
    p_idx = jnp.maximum(proton_of_site - 1, 0)
    t_last = t_last_jump[p_idx]
    occupied = occ > 0
    never = t_last < 0
    return jnp.where(occupied & ~never, time - t_last, -1.0)


def _allowed_and_total(model, shared, aux, time):
    """Total allowed jump rate and the pieces needed for selection."""
    occ = aux[0]
    proton_of_site = aux[1]
    t_last = aux[3]
    if isinstance(shared, DenseShared):
        out_rates = shared.W @ (1.0 - occ)  # [N]
        row_rates = occ * out_rates
        return row_rates.sum(), ("dense", row_rates, shared.W, shared.dist)
    residence = _site_residence(occ, proton_of_site, t_last, time)
    omega, nbr, valid = model.replica_omega(shared, residence)
    allowed = omega * occ[:, None] * (1.0 - occ[nbr])
    return allowed.sum(), ("topk", allowed, nbr, shared.dist)


def _select_transition(select_info, occ, key):
    """Draw (source, destination) with probability proportional to the allowed
    pair rate — exactly the distribution of the reference's cumsum/searchsorted
    (MDMC.py:109-113), factored as P(s) * P(d | s). Also returns the raw pair
    distance of the chosen transition (for jump statistics)."""
    kind = select_info[0]
    if kind == "dense":
        _, row_rates, W, dist = select_info
        k1, k2 = jax.random.split(key)
        src = jax.random.categorical(k1, jnp.log(row_rates))
        dst_rates = W[src] * (1.0 - occ)
        dst = jax.random.categorical(k2, jnp.log(dst_rates))
        return src.astype(jnp.int32), dst.astype(jnp.int32), dist[src, dst]
    _, allowed, nbr, dist = select_info
    n, kk = allowed.shape
    flat_idx = jax.random.categorical(key, jnp.log(allowed.reshape(-1)))
    src = (flat_idx // kk).astype(jnp.int32)
    dst = nbr.reshape(-1)[flat_idx].astype(jnp.int32)
    return src, dst, dist.reshape(-1)[flat_idx]


def _replica_frame_step(
    model, frame, dt, max_events, hist_range, state: ReplicaState, key
):
    """Advance one replica across one MD frame. ``key`` must be unique per
    replica but MUST NOT vary with the frame (the clock folds in event ordinals,
    keeping the draw stream chunking-invariant — see engine/clock.py)."""
    shared = model.shared(frame)
    n_bins = state.jump_hist.shape[0]
    track_matrix = state.jump_matrix.shape[0] > 0

    aux = (
        state.occ,
        state.proton_of_site,
        state.site_of_proton,
        state.t_last_jump,
        state.jumps,
        state.jump_hist,
        state.jump_matrix,
    )

    def rate_fn(aux):
        total, _ = _allowed_and_total(model, shared, aux, frame.time)
        return total

    def apply_fn(aux, event_key, event_phase):
        occ, proton_of_site, site_of_proton, t_last, jumps, hist, jmat = aux
        _, select_info = _allowed_and_total(model, shared, aux, frame.time)
        src, dst, d_evt = _select_transition(select_info, occ, event_key)
        label = proton_of_site[src]
        p_idx = jnp.maximum(label - 1, 0)
        t_event = frame.time + event_phase
        occ = occ.at[src].set(0.0).at[dst].set(1.0)
        proton_of_site = proton_of_site.at[src].set(0).at[dst].set(label)
        site_of_proton = site_of_proton.at[p_idx].set(dst)
        t_last = t_last.at[p_idx].set(t_event)
        if n_bins > 0:
            inc = _hist_in_range(d_evt, hist_range).astype(jnp.int32)
            hist = hist.at[_hist_bin(d_evt, hist_range, n_bins)].add(inc)
        if track_matrix:
            jmat = jmat.at[src, dst].add(1)
        return occ, proton_of_site, site_of_proton, t_last, jumps + 1, hist, jmat

    new_clock, aux, n_fired = kmc_clock.frame_step(
        state.clock,
        aux,
        frame_idx=frame.index,
        dt=dt,
        rate_fn=rate_fn,
        apply_fn=apply_fn,
        key=key,
        max_events=max_events,
    )
    occ, proton_of_site, site_of_proton, t_last, jumps, hist, jmat = aux

    opp = state.opportunity_hist
    if n_bins > 0:
        # Exposure: which allowed transitions existed this frame, binned by
        # their raw pair distance (jump probability = jump_hist / exposure).
        if isinstance(shared, DenseShared):
            allowed_mask = (shared.W > 0) * occ[:, None] * (1.0 - occ[None, :])
            dists = shared.dist
        else:
            residence = _site_residence(occ, proton_of_site, t_last, frame.time)
            omega, nbr, valid = model.replica_omega(shared, residence)
            allowed_mask = valid * (omega > 0) * occ[:, None] * (1.0 - occ[nbr])
            dists = shared.dist
        weights = allowed_mask * _hist_in_range(dists, hist_range)
        opp = opp + jax.ops.segment_sum(
            weights.reshape(-1),
            _hist_bin(dists, hist_range, n_bins).reshape(-1),
            num_segments=n_bins,
        )

    return (
        dataclasses.replace(
            state,
            occ=occ,
            proton_of_site=proton_of_site,
            site_of_proton=site_of_proton,
            t_last_jump=t_last,
            clock=new_clock,
            jumps=jumps,
            jump_hist=hist,
            jump_matrix=jmat,
            opportunity_hist=opp,
        ),
        n_fired,
    )


def _update_observables(cell: Cell, frame, reset: Array, state: ReplicaState):
    """Reference observable bookkeeping (LMC/output.py, MDMC.py:179-208): on
    reset frames zero the displacement/jump counters and re-snapshot the
    autocorrelation reference; every frame accumulate the PBC-aware proton
    displacement."""
    sites = state.site_of_proton
    disp = jnp.where(reset, jnp.zeros_like(state.displacement), state.displacement)
    jumps = jnp.where(reset, 0, state.jumps)
    autocorr_ref = jnp.where(reset, sites, state.autocorr_ref)

    newpos = frame.donors[sites]
    disp = disp + cell_displacement(cell, state.snapshot, newpos)
    return dataclasses.replace(
        state,
        displacement=disp,
        snapshot=newpos,
        jumps=jumps,
        autocorr_ref=autocorr_ref,
    )


def observables_of(state: ReplicaState):
    """(msd[.., 3], autocorr count) per replica."""
    n_protons = state.displacement.shape[-2]
    msd = jnp.sum(state.displacement**2, axis=-2) / n_protons
    autocorr = jnp.sum(
        (state.site_of_proton == state.autocorr_ref).astype(jnp.int32), axis=-1
    )
    return msd, autocorr


# ----------------------------------------------------------------------------
# Scan driver
# ----------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("dt", "max_events", "reset_frequency", "hist_range"),
)
def run_block(
    model,
    cell: Cell,
    states: ReplicaState,
    keys: Array,
    frames: Frame,
    *,
    dt: float,
    max_events: int = 4,
    reset_frequency: int = 0,
    hist_range: tuple = (2.0, 3.0),
) -> tuple[ReplicaState, ObsRow]:
    """Advance all replicas across a block of frames (stacked leading axis).

    Returns the final states plus per-frame ensemble observables. Host code
    streams trajectory blocks through this; the clock's event-ordinal keying
    makes the result independent of the chunking.
    """

    def step(states, frame):
        if reset_frequency > 0:
            reset = jnp.logical_and(
                frame.index % reset_frequency == 0, frame.index > 0
            )
        else:
            reset = jnp.bool_(False)

        def per_replica(state, key):
            state, n_fired = _replica_frame_step(
                model, frame, dt, max_events, hist_range, state, key
            )
            state = _update_observables(cell, frame, reset, state)
            return state, n_fired

        states2, n_fired = jax.vmap(per_replica)(states, keys)
        msd, autocorr = observables_of(states2)
        row = ObsRow(
            frame=frame.index,
            time=frame.time,
            msd_mean=msd.mean(axis=0),
            msd_var=msd.var(axis=0),
            autocorr_mean=autocorr.astype(jnp.float32).mean(),
            autocorr_var=autocorr.astype(jnp.float32).var(),
            jumps_mean=states2.jumps.astype(jnp.float32).mean(),
            events_mean=states2.clock.event_count.astype(jnp.float32).mean(),
        )
        return states2, row

    return jax.lax.scan(step, states, frames)


@partial(
    jax.jit,
    static_argnames=("dt", "max_events", "reset_frequency", "hist_range"),
)
def run_block_with_sites(
    model,
    cell: Cell,
    states: ReplicaState,
    keys: Array,
    frames: Frame,
    *,
    dt: float,
    max_events: int = 4,
    reset_frequency: int = 0,
    hist_range: tuple = (2.0, 3.0),
):
    """Like :func:`run_block`, additionally emitting replica 0's proton site
    indices per frame — feeds the XYZOutput mode (MDMC.py:173-177)."""

    def step(states, frame):
        if reset_frequency > 0:
            reset = jnp.logical_and(
                frame.index % reset_frequency == 0, frame.index > 0
            )
        else:
            reset = jnp.bool_(False)

        def per_replica(state, key):
            state, n_fired = _replica_frame_step(
                model, frame, dt, max_events, hist_range, state, key
            )
            state = _update_observables(cell, frame, reset, state)
            return state, n_fired

        states2, _ = jax.vmap(per_replica)(states, keys)
        msd, autocorr = observables_of(states2)
        row = ObsRow(
            frame=frame.index,
            time=frame.time,
            msd_mean=msd.mean(axis=0),
            msd_var=msd.var(axis=0),
            autocorr_mean=autocorr.astype(jnp.float32).mean(),
            autocorr_var=autocorr.astype(jnp.float32).var(),
            jumps_mean=states2.jumps.astype(jnp.float32).mean(),
            events_mean=states2.clock.event_count.astype(jnp.float32).mean(),
        )
        return states2, (row, states2.site_of_proton[0])

    states, (rows, sites) = jax.lax.scan(step, states, frames)
    return states, rows, sites
