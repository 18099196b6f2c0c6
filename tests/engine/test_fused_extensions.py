"""Fused-kernel coverage extensions (interpret mode on CPU): FermiAngle angle
gating over AngleTopology, distance-binned jump/exposure histograms (jumpstat)
and the pairwise jump matrix — each validated against the XLA scan engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Fermi, FermiAngle
from cmdlmc_tpu.topo.models import AnglePairRates, Frame, PairRates

R = 64
DT = 0.5


def make_frames(n_sites, n_frames, box, seed=3, n_extras=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0, box * 0.9, size=(n_sites, 3)).astype(np.float32)
    frames_np = (
        pos[None] + rng.normal(scale=0.04, size=(n_frames, n_sites, 3))
    ).astype(np.float32)
    extras_np = None
    if n_extras:
        epos = rng.uniform(0, box * 0.9, size=(n_extras, 3)).astype(np.float32)
        extras_np = (
            epos[None] + rng.normal(scale=0.04, size=(n_frames, n_extras, 3))
        ).astype(np.float32)
    return frames_np, extras_np


def frame_struct(frames_np, extras_np, dt=DT):
    F = frames_np.shape[0]
    idx = jnp.arange(F, dtype=jnp.int32)
    return Frame(
        donors=jnp.asarray(frames_np),
        extras=jnp.asarray(extras_np) if extras_np is not None else None,
        time=idx.astype(jnp.float32) * dt,
        index=idx,
    )


def init(n_sites, n_protons, first_positions, hist_bins=0, track_matrix=False,
         seed=0):
    key = jax.random.key(seed)
    ens = eng.init_replicas(
        jax.random.fold_in(key, 0), R, n_sites, n_protons,
        jnp.asarray(first_positions), hist_bins=hist_bins,
        track_jump_matrix=track_matrix,
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), R)
    return ens, keys


def events_of(ens):
    return np.asarray(ens.replicas.clock.event_count, float)


# ---------------------------------------------------------------------------
# FermiAngle / AngleTopology
# ---------------------------------------------------------------------------


def make_angle_model(theta, cell, frames_np, extras_np):
    law = FermiAngle(a=jnp.float32(0.08), b=jnp.float32(3.2),
                     c=jnp.float32(0.3), theta=jnp.float32(theta))
    return AnglePairRates.from_first_frame(
        cell, law, cutoff=3.0, buffer=1.5,
        donors0=jnp.asarray(frames_np[0]), extras0=jnp.asarray(extras_np[0]),
        group_size=3,
    )


def run_both(model, cell, frames_np, extras_np, n_protons, hist_bins=0,
             track_matrix=False):
    n_sites = frames_np.shape[1]
    ens0, keys = init(n_sites, n_protons, frames_np[0], hist_bins=hist_bins,
                      track_matrix=track_matrix)
    ens_f = fused.run_block_fused(
        model, cell, ens0, jnp.asarray(frames_np), 0, dt=DT, seed=2,
        tile=16, interpret=True,
        extras_positions=jnp.asarray(extras_np) if extras_np is not None else None,
    )
    ens_x, _ = eng.run_block(
        model, cell, ens0, keys, frame_struct(frames_np, extras_np),
        dt=DT, emit_every=frames_np.shape[0],
    )
    return ens_f, ens_x


def test_fused_supports_angle_topology():
    frames_np, extras_np = make_frames(12, 2, 10.0, n_extras=4)
    cell = Cell.cubic([10.0] * 3)
    model = make_angle_model(0.8, cell, frames_np, extras_np)
    ens0, _ = init(12, 4, frames_np[0])
    assert fused.fused_supported(model, cell, ens0)
    # plain PairRates with a FermiAngle law stays unsupported
    bad = PairRates(cell=cell, law=model.law, cutoff=model.cutoff,
                    buffer=model.buffer)
    assert not fused.fused_supported(bad, cell, ens0)


@pytest.mark.parametrize("theta", [0.5, 1.5])
def test_fermi_angle_matches_scan(theta):
    frames_np, extras_np = make_frames(12, 250, 10.0, n_extras=4)
    cell = Cell.cubic([10.0] * 3)
    model = make_angle_model(theta, cell, frames_np, extras_np)
    ens_f, ens_x = run_both(model, cell, frames_np, extras_np, n_protons=4)
    ev_f, ev_x = events_of(ens_f), events_of(ens_x)
    se = np.sqrt(ev_f.var(ddof=1) / R + ev_x.var(ddof=1) / R)
    assert abs(ev_f.mean() - ev_x.mean()) < 5 * max(se, 1e-9), (
        theta, ev_f.mean(), ev_x.mean())


def test_angle_gate_suppresses_events():
    """A tight angle threshold must reduce the fused event rate vs theta=0
    (and agree with the scan engine on the magnitude)."""
    frames_np, extras_np = make_frames(12, 200, 10.0, n_extras=4)
    cell = Cell.cubic([10.0] * 3)
    open_model = make_angle_model(0.0, cell, frames_np, extras_np)
    tight = make_angle_model(2.4, cell, frames_np, extras_np)
    ens_open, _ = run_both(open_model, cell, frames_np, extras_np, 4)
    ens_tight, ens_tight_x = run_both(tight, cell, frames_np, extras_np, 4)
    assert events_of(ens_tight).mean() < 0.5 * events_of(ens_open).mean()
    # and the suppressed rate still matches the scan engine
    ev_f, ev_x = events_of(ens_tight), events_of(ens_tight_x)
    se = np.sqrt(ev_f.var(ddof=1) / R + ev_x.var(ddof=1) / R) + 1e-9
    assert abs(ev_f.mean() - ev_x.mean()) < 5 * se


# ---------------------------------------------------------------------------
# jump histogram + exposure (jumpstat)
# ---------------------------------------------------------------------------


def test_jump_and_exposure_histograms_match_scan():
    frames_np, _ = make_frames(16, 250, 10.0)
    cell = Cell.cubic([10.0] * 3)
    law = Fermi(a=jnp.float32(0.08), b=jnp.float32(3.2), c=jnp.float32(0.3))
    model = PairRates(cell=cell, law=law, cutoff=jnp.float32(3.0),
                      buffer=jnp.float32(1.5))
    nbins = 8
    ens0, keys = init(16, 6, frames_np[0], hist_bins=nbins)
    assert fused.fused_supported(model, cell, ens0)
    ens_f = fused.run_block_fused(
        model, cell, ens0, jnp.asarray(frames_np), 0, dt=DT, seed=2,
        tile=16, interpret=True, hist_range=(2.0, 3.0),
    )
    ens_x, _ = eng.run_block(
        model, cell, ens0, keys, frame_struct(frames_np, None), dt=DT,
        emit_every=frames_np.shape[0], hist_range=(2.0, 3.0),
    )
    h_f = np.asarray(ens_f.replicas.jump_hist, float).sum(axis=0)
    h_x = np.asarray(ens_x.replicas.jump_hist, float).sum(axis=0)
    # all in-range jumps land in the histogram on both backends
    assert h_f.sum() > 50
    # per-bin agreement within Poisson noise
    for b in range(nbins):
        se = np.sqrt(h_f[b] + h_x[b]) + 1e-9
        assert abs(h_f[b] - h_x[b]) < 6 * se, (b, h_f, h_x)
    e_f = np.asarray(ens_f.replicas.opportunity_hist, float).sum(axis=0)
    e_x = np.asarray(ens_x.replicas.opportunity_hist, float).sum(axis=0)
    assert e_f.sum() > 0
    # exposure differs only through occupancy-history noise
    np.testing.assert_allclose(e_f, e_x, rtol=0.2, atol=20.0)
    # implied jump probability per bin agrees (the jumpstat estimator)
    p_f = h_f / np.maximum(e_f, 1)
    p_x = h_x / np.maximum(e_x, 1)
    np.testing.assert_allclose(p_f, p_x, atol=0.02)


def test_histogram_chunk_invariance():
    """Splitting the block across two fused calls accumulates the same
    histograms (stream position carried by the ensemble)."""
    frames_np, _ = make_frames(12, 120, 10.0)
    cell = Cell.cubic([10.0] * 3)
    law = Fermi(a=jnp.float32(0.08), b=jnp.float32(3.2), c=jnp.float32(0.3))
    model = PairRates(cell=cell, law=law, cutoff=jnp.float32(3.0),
                      buffer=jnp.float32(1.5))
    ens0, _ = init(12, 4, frames_np[0], hist_bins=6)
    whole = fused.run_block_fused(
        model, cell, ens0, jnp.asarray(frames_np), 0, dt=DT, seed=2,
        tile=16, interpret=True,
    )
    half = fused.run_block_fused(
        model, cell, ens0, jnp.asarray(frames_np[:60]), 0, dt=DT, seed=2,
        tile=16, interpret=True,
    )
    half = fused.run_block_fused(
        model, cell, half, jnp.asarray(frames_np[60:]), 60, dt=DT, seed=2,
        tile=16, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(whole.replicas.jump_hist), np.asarray(half.replicas.jump_hist)
    )
    np.testing.assert_allclose(
        np.asarray(whole.replicas.opportunity_hist),
        np.asarray(half.replicas.opportunity_hist), rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# jump matrix
# ---------------------------------------------------------------------------


def test_jump_matrix_counts_every_event():
    frames_np, _ = make_frames(12, 150, 10.0)
    cell = Cell.cubic([10.0] * 3)
    law = Fermi(a=jnp.float32(0.08), b=jnp.float32(3.2), c=jnp.float32(0.3))
    model = PairRates(cell=cell, law=law, cutoff=jnp.float32(3.0),
                      buffer=jnp.float32(1.5))
    ens0, keys = init(12, 4, frames_np[0], track_matrix=True)
    assert fused.fused_supported(model, cell, ens0)
    ens_f = fused.run_block_fused(
        model, cell, ens0, jnp.asarray(frames_np), 0, dt=DT, seed=2,
        tile=16, interpret=True,
    )
    jm = np.asarray(ens_f.replicas.jump_matrix, np.int64).sum(axis=0)
    total_events = events_of(ens_f).sum()
    assert jm.sum() == total_events > 0  # every event counted exactly once
    assert np.all(np.diag(jm) == 0)  # never a self-jump
    # scan engine produces statistically matching totals
    ens_x, _ = eng.run_block(
        model, cell, ens0, keys, frame_struct(frames_np, None), dt=DT,
        emit_every=frames_np.shape[0],
    )
    jm_x = np.asarray(ens_x.replicas.jump_matrix, np.int64).sum(axis=0)
    assert jm_x.sum() == events_of(ens_x).sum()
    se = np.sqrt(float(jm.sum() + jm_x.sum())) + 1e-9
    assert abs(float(jm.sum()) - float(jm_x.sum())) < 6 * se
