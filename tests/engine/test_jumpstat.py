"""Distance-resolved jump statistics: the engine's on-device histograms must
recover the underlying rate law — the capability of the reference's (absent)
``jumpstat`` tool (README.md:57-58, SURVEY.md §2.26)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates


def test_jump_histogram_recovers_fermi_law():
    rng = np.random.RandomState(5)
    n_sites, n_protons, n_replicas = 24, 8, 48
    dt = 0.5
    positions = rng.uniform(0, 7, size=(n_sites, 3)).astype(np.float32)
    cell = Cell.cubic([30.0, 30.0, 30.0])
    a, b, c = 0.08, 2.6, 0.25
    law = Fermi(a=jnp.float32(a), b=jnp.float32(b), c=jnp.float32(c))
    model = PairRates(
        cell=cell, law=law, cutoff=jnp.float32(3.0), buffer=jnp.float32(1.0)
    )

    hist_range = (2.0, 4.0)
    n_bins = 8
    key = jax.random.key(0)
    states = eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, n_sites, n_protons,
        jnp.asarray(positions), hist_bins=n_bins, track_jump_matrix=True,
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)

    n_frames = 1500
    pos = jnp.broadcast_to(jnp.asarray(positions), (n_frames, n_sites, 3))
    idx = jnp.arange(n_frames, dtype=jnp.int32)
    frames = Frame(donors=pos, extras=None, time=idx.astype(jnp.float32) * dt, index=idx)

    ens, _ = eng.run_block(
        model, cell, states, keys, frames, dt=dt, hist_range=hist_range
    )

    jumps = np.asarray(ens.replicas.jump_hist).sum(axis=0).astype(float)
    opp = np.asarray(ens.replicas.opportunity_hist).sum(axis=0)
    total_events = int(np.asarray(ens.replicas.clock.event_count).sum())
    assert total_events > 500
    # jump matrix total equals event count
    assert int(np.asarray(ens.replicas.jump_matrix).sum()) == total_events

    edges = np.linspace(*hist_range, n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    fermi = a / (1.0 + np.exp((centers - b) / c))
    expected_prob = fermi * dt  # probability per frame of exposure

    mask = opp * expected_prob > 30  # only well-populated bins
    assert mask.sum() >= 3
    measured = jumps[mask] / opp[mask]
    want = expected_prob[mask]
    # Poisson CI: relative error ~ 1/sqrt(count)
    counts = jumps[mask]
    rel_err = np.abs(measured - want) / want
    assert np.all(rel_err < 5.0 / np.sqrt(np.maximum(counts, 1)) + 0.15), (
        measured, want, counts
    )


def _dimer_system(n_dimers=16, d_lo=2.2, d_hi=2.9, seed=2):
    """Isolated site dimers at controlled gap distances: each singly-occupied
    dimer is an exact single-channel process, so the exposure-based estimator
    can be validated pointwise against the law."""
    rng = np.random.RandomState(seed)
    gaps = np.linspace(d_lo, d_hi, n_dimers)
    pos = np.zeros((2 * n_dimers, 3), np.float32)
    for i, g in enumerate(gaps):
        base = np.array([10.0 * i, 0.0, 0.0])
        pos[2 * i] = base
        pos[2 * i + 1] = base + [g, 0.0, 0.0]
    return pos, gaps


@pytest.mark.parametrize("a_rate,max_events", [(0.02, 4), (1.2, 24)])
def test_exposure_estimator_two_rate_regimes(a_rate, max_events):
    """VERDICT round-1 item 8: the exposure-based omega(d) estimate recovers
    the Fermi law at a low (a*dt = 0.01) AND a hot (a*dt = 0.6) rate regime,
    provided the event budget covers the rate."""
    pos, gaps = _dimer_system()
    n_sites = pos.shape[0]
    dt = 0.5
    cell = Cell.cubic([1000.0, 1000.0, 1000.0])
    a, b, c = a_rate, 2.55, 0.12
    law = Fermi(a=jnp.float32(a), b=jnp.float32(b), c=jnp.float32(c))
    model = PairRates(
        cell=cell, law=law, cutoff=jnp.float32(3.0), buffer=jnp.float32(0.5)
    )
    hist_range = (2.0, 3.0)
    n_bins = 16
    n_replicas = 32
    key = jax.random.key(1)
    states = eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, n_sites, n_sites // 2,
        jnp.asarray(pos), hist_bins=n_bins,
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)
    n_frames = 600
    posb = jnp.broadcast_to(jnp.asarray(pos), (n_frames, n_sites, 3))
    idx = jnp.arange(n_frames, dtype=jnp.int32)
    frames = Frame(donors=posb, extras=None,
                   time=idx.astype(jnp.float32) * dt, index=idx)
    ens, rows = eng.run_block(
        model, cell, states, keys, frames, dt=dt, hist_range=hist_range,
        max_events=max_events, emit_every=n_frames,
    )
    # the event budget must not have truncated (else the estimate is biased)
    assert float(np.asarray(rows.truncated_mean).max()) == 0.0

    jumps = np.asarray(ens.replicas.jump_hist).sum(axis=0).astype(float)
    opp = np.asarray(ens.replicas.opportunity_hist).sum(axis=0)
    edges = np.linspace(*hist_range, n_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    mask = jumps > 25
    assert mask.sum() >= 4
    omega_est = jumps[mask] / opp[mask] / dt
    omega_true = a / (1.0 + np.exp((centers[mask] - b) / c))
    rel = np.abs(omega_est - omega_true) / omega_true
    tol = 5.0 / np.sqrt(jumps[mask]) + 0.1
    assert np.all(rel < tol), (a_rate, centers[mask], omega_est, omega_true)
