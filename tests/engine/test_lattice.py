"""Engine tests: observable bookkeeping (port of the reference's
tests/LMC/test_output.py), state-consistency invariants, event-rate statistics
for the complete-graph constant-rate lattice, and chunking invariance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.engine.clock import init_clock
from cmdlmc_tpu.rates.laws import Constant, Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates


def make_frames(positions, dt, n_frames, start=0):
    """Stack a static geometry into a frame block."""
    pos = jnp.broadcast_to(
        jnp.asarray(positions, jnp.float32), (n_frames, *np.shape(positions))
    )
    idx = jnp.arange(start, start + n_frames, dtype=jnp.int32)
    return Frame(donors=pos, extras=None, time=idx.astype(jnp.float32) * dt, index=idx)


def manual_state(lattice, positions, n_protons):
    """Build a ReplicaState from a reference-style label array."""
    lattice = np.asarray(lattice)
    occ = (lattice > 0).astype(np.float32)
    site_of_proton = np.zeros(n_protons, np.int32)
    for site, label in enumerate(lattice):
        if label > 0:
            site_of_proton[label - 1] = site
    return eng.ReplicaState(
        occ=jnp.asarray(occ),
        proton_of_site=jnp.asarray(lattice, jnp.int32),
        site_of_proton=jnp.asarray(site_of_proton),
        t_last_jump=-jnp.ones(n_protons, jnp.float32),
        clock=init_clock(jax.random.key(0)),
        jumps=jnp.int32(0),
        disp_base=jnp.zeros((n_protons, 3), jnp.float32),
        autocorr_ref=jnp.asarray(site_of_proton),
        jump_hist=jnp.zeros((0,), jnp.int32),
        opportunity_hist=jnp.zeros((0,), jnp.float32),
        jump_matrix=jnp.zeros((0, 0), jnp.int32),
    )


class TestMSDBookkeeping:
    """Port of tests/LMC/test_output.py:21-47: proton-position indexing and
    displacement accumulation through label swaps and a jump to an empty site,
    expressed in the engine's rebased formulation (disp = disp_base +
    site_disp[site]; jumps add the minimum-image jump vector)."""

    positions = np.arange(1, 19, dtype=np.float32).reshape(6, 3)
    lattice0 = [0, 3, 0, 0, 1, 2]
    cell = Cell.cubic([10.0, 10.0, 10.0])

    def jump(self, state, site_disp, p_label, src, dst):
        """Apply the engine's disp_base rebase rule for one jump."""
        from cmdlmc_tpu.core.cell import displacement as cdisp

        jump_vec = cdisp(self.cell, self.positions[src], self.positions[dst])
        disp_base = state.disp_base.at[p_label - 1].add(
            site_disp[src] - site_disp[dst] + jump_vec
        )
        pos_map = state.proton_of_site.at[src].set(0).at[dst].set(p_label)
        sites = state.site_of_proton.at[p_label - 1].set(dst)
        return dataclasses.replace(
            state, disp_base=disp_base, proton_of_site=pos_map,
            site_of_proton=sites,
        )

    def test_initial_displacement_zero_and_site_mapping(self):
        state = manual_state(self.lattice0, self.positions, 3)
        np.testing.assert_array_equal(
            np.asarray(state.site_of_proton), [4, 5, 1]
        )
        site_disp = jnp.zeros((6, 3), jnp.float32)
        disp = eng.proton_displacement(state, site_disp)
        np.testing.assert_array_equal(np.asarray(disp), np.zeros((3, 3)))

    def test_displacement_through_swap_and_jump(self):
        state = manual_state(self.lattice0, self.positions, 3)
        site_disp = jnp.zeros((6, 3), jnp.float32)
        # protons 1 and 2 swap positions (sites 4 <-> 5): two jumps
        state = self.jump(state, site_disp, 1, 4, 5)
        state = dataclasses.replace(
            state, proton_of_site=state.proton_of_site.at[4].set(2)
        )
        state = self.jump(state, site_disp, 2, 5, 4)
        state = dataclasses.replace(
            state,
            proton_of_site=jnp.asarray([0, 3, 0, 0, 2, 1], jnp.int32),
            site_of_proton=jnp.asarray([5, 4, 1], jnp.int32),
        )
        disp = np.zeros((3, 3))
        disp[0] = [3, 3, 3]
        disp[1] = [-3, -3, -3]
        got = eng.proton_displacement(state, site_disp)
        np.testing.assert_allclose(np.asarray(got), disp, atol=1e-6)

        # proton 2 jumps to empty site 3
        state = self.jump(state, site_disp, 2, 4, 3)
        disp[1] += [-3, -3, -3]
        got = eng.proton_displacement(state, site_disp)
        np.testing.assert_allclose(np.asarray(got), disp, atol=1e-6)


@pytest.fixture(scope="module")
def small_system():
    rng = np.random.RandomState(2)
    n_sites = 12
    positions = rng.uniform(0, 4, size=(n_sites, 3)).astype(np.float32)
    cell = Cell.cubic([20.0, 20.0, 20.0])
    # All pairs connected with constant rate (complete graph).
    model = PairRates(
        cell=cell,
        law=Constant(a=jnp.float32(0.02)),
        cutoff=jnp.float32(100.0),
        buffer=jnp.float32(0.0),
    )
    return cell, model, positions


def run(model, cell, positions, n_replicas, n_protons, n_frames, dt, seed=0, **kw):
    n_sites = positions.shape[0]
    key = jax.random.key(seed)
    states = eng.init_replicas(
        jax.random.fold_in(key, 0),
        n_replicas,
        n_sites,
        n_protons,
        jnp.asarray(positions),
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)
    frames = make_frames(positions, dt, n_frames)
    return eng.run_block(model, cell, states, keys, frames, dt=dt, **kw)


def test_state_invariants_preserved(small_system):
    cell, model, positions = small_system
    ens, rows = run(model, cell, positions, 8, 5, 300, dt=0.5)
    states = ens.replicas
    occ = np.asarray(states.occ)
    pos_map = np.asarray(states.proton_of_site)
    site_map = np.asarray(states.site_of_proton)

    # Proton number conserved, occupancy consistent with both maps.
    np.testing.assert_array_equal(occ.sum(axis=1), np.full(8, 5.0))
    for r in range(8):
        np.testing.assert_array_equal((pos_map[r] > 0).astype(float), occ[r])
        labels_at_sites = pos_map[r][site_map[r]]
        np.testing.assert_array_equal(labels_at_sites, np.arange(1, 6))
    # Events happened
    assert np.asarray(states.clock.event_count).min() > 0


def test_event_rate_matches_occupancy_masked_total(small_system):
    """Complete graph, constant pair rate a: total allowed rate is
    a * P * (N - P) (source occupied AND destination free, MDMC.py:241-248).
    The realized event rate must match within CI."""
    cell, model, positions = small_system
    n_sites, n_protons, a = 12, 5, 0.02
    dt, n_frames, n_replicas = 0.5, 2000, 24
    ens, rows = run(model, cell, positions, n_replicas, n_protons, n_frames, dt)
    total_rate = a * n_protons * (n_sites - n_protons)
    expected = total_rate * dt * n_frames
    counts = np.asarray(ens.replicas.clock.event_count, dtype=float)
    # per-replica Poisson(expected)
    z = (counts.mean() - expected) / np.sqrt(expected / n_replicas)
    assert abs(z) < 5, (counts.mean(), expected, z)


def test_chunk_invariance(small_system):
    """Running one block of 200 frames == running 4 blocks of 50: the engine's
    draw streams are keyed by event ordinal, not frame, so host chunking must
    not perturb anything."""
    cell, model, positions = small_system
    n_replicas, n_protons, dt = 4, 3, 0.5
    n_sites = positions.shape[0]
    key = jax.random.key(9)
    init = lambda: eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, n_sites, n_protons, jnp.asarray(positions)
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)

    states_a, rows_a = eng.run_block(
        model, cell, init(), keys, make_frames(positions, dt, 200), dt=dt
    )

    states_b = init()
    rows_list = []
    for c in range(4):
        states_b, rows = eng.run_block(
            model, cell, states_b, keys, make_frames(positions, dt, 50, start=50 * c), dt=dt
        )
        rows_list.append(rows)

    np.testing.assert_array_equal(
        np.asarray(states_a.replicas.clock.event_count),
        np.asarray(states_b.replicas.clock.event_count),
    )
    np.testing.assert_allclose(
        np.asarray(eng.proton_displacement(states_a.replicas, states_a.site_disp)),
        np.asarray(eng.proton_displacement(states_b.replicas, states_b.site_disp)),
        atol=1e-5,
    )
    msd_a = np.asarray(rows_a.msd_mean)
    msd_b = np.concatenate([np.asarray(r.msd_mean) for r in rows_list])
    np.testing.assert_allclose(msd_a, msd_b, atol=1e-5)


def test_reset_frequency_zeroes_observables(small_system):
    cell, model, positions = small_system
    states, rows = run(
        model, cell, positions, 4, 3, 400, dt=0.5, reset_frequency=100
    )
    msd = np.asarray(rows.msd_mean).sum(axis=1)
    # MSD at each reset frame is the first accumulation step after zeroing: it
    # must drop hard compared to the end of the previous interval.
    for reset_frame in (100, 200, 300):
        assert msd[reset_frame] < msd[reset_frame - 1] + 1e-6


def test_fermi_distance_dependence_prefers_close_sites():
    """With a sharp Fermi law, jumps should overwhelmingly pick near neighbors:
    place 3 sites in a line, proton at one end; far site should rarely be hit
    directly ... verified via the rate matrix itself plus a short run."""
    cell = Cell.cubic([50.0, 50.0, 50.0])
    positions = np.array([[0, 0, 0], [2.4, 0, 0], [10, 0, 0]], dtype=np.float32)
    law = Fermi(a=jnp.float32(0.1), b=jnp.float32(2.5), c=jnp.float32(0.1))
    model = PairRates(
        cell=cell, law=law, cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0)
    )
    frame = Frame(
        donors=jnp.asarray(positions),
        extras=None,
        time=jnp.float32(0.0),
        index=jnp.int32(0),
    )
    W = np.asarray(model.shared(frame).W)
    assert W[0, 1] > 0.05  # 2.4 A, below Fermi midpoint
    assert W[0, 2] == 0.0  # 10 A, outside cutoff+buffer
    assert np.all(np.diag(W) == 0)
