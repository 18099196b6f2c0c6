"""Fused Pallas KMC sweep (interpret mode on CPU): state invariants, exact
event-rate statistics, exact random-walk MSD law, and distributional agreement
with the XLA scan engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Constant, Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates


def build(n_sites, n_protons, n_replicas, law, cutoff, buffer, box, seed=0):
    rng = np.random.RandomState(3)
    positions = rng.uniform(0, box[0] * 0.9, size=(n_sites, 3)).astype(np.float32)
    cell = Cell.cubic(box)
    model = PairRates(
        cell=cell, law=law, cutoff=jnp.float32(cutoff), buffer=jnp.float32(buffer)
    )
    key = jax.random.key(seed)
    ens = eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, n_sites, n_protons,
        jnp.asarray(positions),
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)
    return cell, model, positions, ens, keys


def static_block(positions, n_frames):
    return jnp.broadcast_to(
        jnp.asarray(positions, jnp.float32), (n_frames, *positions.shape)
    )


def test_fused_supported_gate():
    cell, model, positions, ens, _ = build(
        8, 3, 4, Constant(a=jnp.float32(0.02)), 100.0, 0.0, [20.0] * 3
    )
    assert fused.fused_supported(model, cell, ens)
    # triclinic cells are fused-supported (round 2): dense models route to the
    # streamed-W kernel, top-K kernels carry the h/h^-1 minimum image — but
    # only while cutoff+buffer < half the smallest perpendicular cell height
    # (the round-based minimum image's exactness bound; beyond it the scan
    # engine's 27-image search is required)
    import dataclasses

    tri = Cell.triclinic([[10, 0, 0], [3, 9, 0], [0, 0, 8]])
    near = dataclasses.replace(
        model, cutoff=jnp.float32(2.5), buffer=jnp.float32(1.0)
    )
    assert fused.fused_supported(near, tri, ens)
    # cutoff+buffer = 100 >> min_height/2: reject with a pointer at the cause
    reason = fused.fused_unsupported_reason(model, tri, ens)
    assert reason is not None and "minimum image" in reason
    from cmdlmc_tpu.topo.models import TopKPairRates

    topk = TopKPairRates(
        cell=tri, law=model.law, cutoff=jnp.float32(2.5),
        buffer=jnp.float32(1.0), k=4,
    )
    assert fused.fused_supported(topk, tri, ens)
    topk_far = dataclasses.replace(topk, cutoff=jnp.float32(50.0))
    assert not fused.fused_supported(topk_far, tri, ens)


def test_pick_tile():
    assert fused.pick_tile(4096) == 128
    assert fused.pick_tile(96) == 96
    assert fused.pick_tile(100, 64) == 50


def test_invariants_and_event_rate():
    n_sites, n_protons, R = 10, 4, 32
    a, dt, F = 0.04, 0.5, 400
    cell, model, positions, ens, _ = build(
        n_sites, n_protons, R, Constant(a=jnp.float32(a)), 100.0, 0.0, [30.0] * 3
    )
    ens2 = fused.run_block_fused(
        model, cell, ens, static_block(positions, F), 0, dt=dt, seed=5,
        tile=16, interpret=True,
    )
    rep = ens2.replicas
    occ = np.asarray(rep.occ)
    np.testing.assert_allclose(occ.sum(axis=1), n_protons, atol=1e-5)
    pos_map = np.asarray(rep.proton_of_site)
    site_map = np.asarray(rep.site_of_proton)
    for r in range(R):
        np.testing.assert_array_equal((pos_map[r] > 0).astype(float), occ[r])
        np.testing.assert_array_equal(
            pos_map[r][site_map[r]], np.arange(1, n_protons + 1)
        )
    counts = np.asarray(rep.clock.event_count, float)
    expected = a * n_protons * (n_sites - n_protons) * dt * F
    z = (counts.mean() - expected) / np.sqrt(expected / R)
    assert abs(z) < 5, (counts.mean(), expected, z)
    assert counts.min() > 0


def test_ring_walk_msd_exact_law():
    """Periodic ring: unwrapped MSD must equal (jump length)^2 x event count."""
    N, P, R, F, a, dt = 12, 1, 128, 400, 0.04, 0.5
    pos = np.zeros((N, 3), np.float32)
    pos[:, 0] = 2.0 * np.arange(N)
    cell = Cell.cubic([24.0, 24.0, 24.0])
    model = PairRates(
        cell=cell, law=Constant(a=jnp.float32(a)),
        cutoff=jnp.float32(2.1), buffer=jnp.float32(0.0),
    )
    key = jax.random.key(1)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(pos))
    ens2 = fused.run_block_fused(
        model, cell, ens, static_block(pos, F), 0, dt=dt, seed=9,
        tile=32, interpret=True,
    )
    rep = ens2.replicas
    disp = np.asarray(eng.proton_displacement(rep, ens2.site_disp))
    events = np.asarray(rep.clock.event_count, float)
    msd_per_replica = (disp**2).sum(axis=(1, 2))
    # per replica, |disp| = 2 * |net winding|; ensemble: E[msd] = 4 * E[events]
    mean_msd = msd_per_replica.mean()
    expected = 4.0 * events.mean()
    se = msd_per_replica.std(ddof=1) / np.sqrt(R)
    assert abs(mean_msd - expected) < 5 * se + 0.05 * expected, (
        mean_msd, expected, se
    )
    # y/z components untouched
    np.testing.assert_allclose(disp[:, :, 1:], 0.0, atol=1e-5)


def test_matches_xla_engine_distributionally():
    """Fermi rates on jittered geometry: fused and scan backends must agree on
    event statistics and ensemble MSD within CI."""
    n_sites, n_protons, R, F, dt = 16, 6, 64, 300, 0.5
    law = Fermi(a=jnp.float32(0.08), b=jnp.float32(3.2), c=jnp.float32(0.3))
    cell, model, positions, ens, keys = build(
        n_sites, n_protons, R, law, 3.0, 1.5, [10.0] * 3
    )
    rng = np.random.RandomState(7)
    frames_np = (
        positions[None] + rng.normal(scale=0.04, size=(F, n_sites, 3))
    ).astype(np.float32)

    # fused
    ens_f = fused.run_block_fused(
        model, cell, ens, jnp.asarray(frames_np), 0, dt=dt, seed=2,
        tile=16, interpret=True,
    )
    # scan engine
    idx = jnp.arange(F, dtype=jnp.int32)
    frames = Frame(
        donors=jnp.asarray(frames_np), extras=None,
        time=idx.astype(jnp.float32) * dt, index=idx,
    )
    ens_x, _ = eng.run_block(model, cell, ens, keys, frames, dt=dt, emit_every=F)

    ev_f = np.asarray(ens_f.replicas.clock.event_count, float)
    ev_x = np.asarray(ens_x.replicas.clock.event_count, float)
    se = np.sqrt(ev_f.var(ddof=1) / R + ev_x.var(ddof=1) / R)
    assert abs(ev_f.mean() - ev_x.mean()) < 5 * max(se, 1e-9), (
        ev_f.mean(), ev_x.mean()
    )

    msd_f = np.asarray(
        eng.proton_displacement(ens_f.replicas, ens_f.site_disp) ** 2
    ).sum(axis=(1, 2))
    msd_x = np.asarray(
        eng.proton_displacement(ens_x.replicas, ens_x.site_disp) ** 2
    ).sum(axis=(1, 2))
    se = np.sqrt(msd_f.var(ddof=1) / R + msd_x.var(ddof=1) / R)
    assert abs(msd_f.mean() - msd_x.mean()) < 5 * max(se, 1e-9) + 0.1 * msd_x.mean()
