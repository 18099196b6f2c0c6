"""Multi-chip replica sharding on the virtual 8-device CPU mesh: the engine must
partition across devices under GSPMD and agree with the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.parallel.mesh import replica_mesh, replicate, shard_ensemble, shard_replicas
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates


def build_system(n_replicas, n_frames=50, n_sites=16, n_protons=6, dt=0.5, seed=0):
    rng = np.random.RandomState(3)
    positions = rng.uniform(0, 6, size=(n_sites, 3)).astype(np.float32)
    cell = Cell.cubic([20.0, 20.0, 20.0])
    model = PairRates(
        cell=cell,
        law=Fermi(a=jnp.float32(0.05), b=jnp.float32(3.0), c=jnp.float32(0.5)),
        cutoff=jnp.float32(10.0),
        buffer=jnp.float32(2.0),
    )
    key = jax.random.key(seed)
    states = eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, n_sites, n_protons,
        jnp.asarray(positions),
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)
    pos = jnp.broadcast_to(jnp.asarray(positions), (n_frames, n_sites, 3))
    idx = jnp.arange(n_frames, dtype=jnp.int32)
    frames = Frame(donors=pos, extras=None, time=idx.astype(jnp.float32) * dt, index=idx)
    return cell, model, states, keys, frames, dt


def test_engine_runs_sharded_over_8_devices():
    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    n_replicas = 16  # 2 per device
    cell, model, states, keys, frames, dt = build_system(n_replicas)

    # Single-device baseline
    base_states, base_rows = eng.run_block(model, cell, states, keys, frames, dt=dt)

    # Sharded run
    s_states = shard_ensemble(states, mesh)
    s_keys = shard_replicas(keys, mesh)
    s_frames = replicate(frames, mesh)
    sh_states, sh_rows = eng.run_block(model, cell, s_states, s_keys, s_frames, dt=dt)

    # Output sharding actually spans the mesh
    occ_sharding = sh_states.replicas.occ.sharding
    assert occ_sharding.is_fully_replicated is False

    np.testing.assert_array_equal(
        np.asarray(base_states.replicas.clock.event_count),
        np.asarray(sh_states.replicas.clock.event_count),
    )
    np.testing.assert_allclose(
        np.asarray(base_rows.msd_mean), np.asarray(sh_rows.msd_mean),
        rtol=1e-5, atol=1e-6,
    )


def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves
                          if np.issubdtype(np.asarray(l).dtype, np.floating))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
