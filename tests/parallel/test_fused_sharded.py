"""Sharded fused sweep on the 8-device CPU mesh (interpret mode): results must
be IDENTICAL to a single-device run with the same tile size, because tile ids
(and therefore RNG streams) are globally offset per shard."""

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.parallel.mesh import replica_mesh, replicate, shard_replicas
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import PairRates


def test_sharded_fused_matches_single_device():
    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 60, 4  # 4 replicas/device, 1 tile/device
    rng = np.random.RandomState(0)
    positions = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    frames = (positions[None] + rng.normal(scale=0.03, size=(F, N, 3))).astype(
        np.float32
    )
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = PairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8), c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
    )
    key = jax.random.key(5)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))

    single = fused.run_block_fused(
        model, cell, ens, jnp.asarray(frames), 0, dt=0.5, seed=11, tile=tile,
        interpret=True,
    )

    import dataclasses

    from cmdlmc_tpu.parallel.mesh import shard_ensemble

    ens_sharded = shard_ensemble(ens, mesh)
    sharded = fused.run_block_fused_sharded(
        model, cell, ens_sharded, jnp.asarray(frames), 0, mesh,
        dt=0.5, seed=11, tile=tile, interpret=True,
    )

    np.testing.assert_array_equal(
        np.asarray(single.replicas.clock.event_count),
        np.asarray(sharded.replicas.clock.event_count),
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.site_of_proton),
        np.asarray(sharded.replicas.site_of_proton),
    )
    np.testing.assert_allclose(
        np.asarray(single.replicas.disp_base),
        np.asarray(sharded.replicas.disp_base),
        atol=1e-6,
    )
    assert not sharded.replicas.occ.sharding.is_fully_replicated


def test_sharded_two_blocks_site_disp_stays_correct():
    """Regression: the kernels' shared site_disp/prev_pos outputs must be
    written by the first LOCAL tile of every shard (guarding on the global
    tile id leaves shards k>0 with garbage local copies that GSPMD consumes
    on the next block). Two blocks of drifting frames, streamed + in-kernel."""
    from cmdlmc_tpu.parallel.mesh import shard_ensemble

    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 24, 4
    rng = np.random.RandomState(9)
    positions = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    frames = np.cumsum(
        rng.normal(scale=0.05, size=(2 * F, N, 3)), axis=0
    ).astype(np.float32) + positions[None]
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = PairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8),
                             c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
    )
    key = jax.random.key(5)
    ens0 = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P,
                             jnp.asarray(positions))

    single = ens0
    for b in range(2):
        single = fused.run_block_fused(
            model, cell, single, jnp.asarray(frames[b * F:(b + 1) * F]),
            b * F, dt=0.5, seed=11, tile=tile, interpret=True,
        )
    sharded = shard_ensemble(ens0, mesh)
    for b in range(2):
        sharded = fused.run_block_fused_sharded(
            model, cell, sharded, jnp.asarray(frames[b * F:(b + 1) * F]),
            b * F, mesh, dt=0.5, seed=11, tile=tile, interpret=True,
        )
    assert np.abs(np.asarray(single.site_disp)).max() > 0  # frames drifted
    np.testing.assert_allclose(
        np.asarray(single.site_disp), np.asarray(sharded.site_disp), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(single.prev_pos), np.asarray(sharded.prev_pos), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.clock.event_count),
        np.asarray(sharded.replicas.clock.event_count),
    )
    np.testing.assert_allclose(
        np.asarray(single.replicas.disp_base),
        np.asarray(sharded.replicas.disp_base), atol=1e-5,
    )


def test_sharded_topk_matches_single_device():
    """TopKPairRates under shard_map equals the single-device top-K run
    (tables replicated, per-shard tile-id offsets, tlast_site recomputed)."""
    from cmdlmc_tpu.parallel.mesh import shard_ensemble
    from cmdlmc_tpu.topo.models import TopKPairRates

    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 40, 4
    rng = np.random.RandomState(4)
    positions = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    frames = (positions[None] + rng.normal(scale=0.03, size=(F, N, 3))).astype(
        np.float32
    )
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = TopKPairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8),
                             c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5), k=6,
    )
    key = jax.random.key(5)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P,
                            jnp.asarray(positions))
    single = fused.run_block_fused(
        model, cell, ens, jnp.asarray(frames), 0, dt=0.5, seed=11, tile=tile,
        interpret=True,
    )
    sharded = fused.run_block_fused_sharded(
        model, cell, shard_ensemble(ens, mesh), jnp.asarray(frames), 0, mesh,
        dt=0.5, seed=11, tile=tile, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.clock.event_count),
        np.asarray(sharded.replicas.clock.event_count),
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.site_of_proton),
        np.asarray(sharded.replicas.site_of_proton),
    )
    np.testing.assert_allclose(
        np.asarray(single.replicas.disp_base),
        np.asarray(sharded.replicas.disp_base), atol=1e-6,
    )


def test_sharded_topk_frame_chunking_matches_single_device(monkeypatch):
    """When the block-resident candidate tables exceed the VMEM budget, the
    sharded top-K route must sub-chunk frames exactly like the single-device
    path (bit-exact: RNG keyed by global frame/event, full occ[nbr] refresh
    at every chunk entry) instead of dispatching the whole block."""
    from cmdlmc_tpu.ops import topk_sweep as ts
    from cmdlmc_tpu.parallel.mesh import shard_ensemble
    from cmdlmc_tpu.topo.models import TopKPairRates

    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 40, 4
    rng = np.random.RandomState(4)
    positions = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    frames = (positions[None] + rng.normal(scale=0.03, size=(F, N, 3))).astype(
        np.float32
    )
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = TopKPairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8),
                             c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5), k=6,
    )
    # shrink the budget so this tiny block genuinely chunks on both paths
    budget = ts._resident_bytes(N, 16, ts._pad_k(6), cols=True)
    monkeypatch.setattr(ts, "_RESIDENT_BUDGET", budget)
    assert ts.pick_frame_chunk(F, N, 6, cols=True) < F

    key = jax.random.key(5)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P,
                            jnp.asarray(positions))
    single = fused.run_block_fused(
        model, cell, ens, jnp.asarray(frames), 0, dt=0.5, seed=11, tile=tile,
        interpret=True, layout="cols",
    )
    sharded = fused.run_block_fused_sharded(
        model, cell, shard_ensemble(ens, mesh), jnp.asarray(frames), 0, mesh,
        dt=0.5, seed=11, tile=tile, interpret=True, layout="cols",
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.clock.event_count),
        np.asarray(sharded.replicas.clock.event_count),
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.site_of_proton),
        np.asarray(sharded.replicas.site_of_proton),
    )


def test_sharded_jump_matrix_psum():
    """Jump-matrix tracking on the sharded dense path: the cross-shard psum
    must reproduce the single-device pair-count matrix exactly."""
    from cmdlmc_tpu.parallel.mesh import shard_ensemble

    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 30, 4
    rng = np.random.RandomState(6)
    positions = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    frames = (positions[None] + rng.normal(scale=0.03, size=(F, N, 3))).astype(
        np.float32
    )
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = PairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8),
                             c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
    )
    key = jax.random.key(7)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P,
                            jnp.asarray(positions), track_jump_matrix=True)
    single = fused.run_block_fused(
        model, cell, ens, jnp.asarray(frames), 0, dt=0.5, seed=3, tile=tile,
        interpret=True,
    )
    sharded = fused.run_block_fused_sharded(
        model, cell, shard_ensemble(ens, mesh), jnp.asarray(frames), 0, mesh,
        dt=0.5, seed=3, tile=tile, interpret=True,
    )
    jm_single = np.asarray(single.replicas.jump_matrix).sum(axis=0)
    jm_sharded = np.asarray(sharded.replicas.jump_matrix).sum(axis=0)
    assert jm_single.sum() > 0
    np.testing.assert_array_equal(jm_single, jm_sharded)


def test_sharded_streamed_triclinic_matches_single_device():
    """Triclinic dense model: run_block_fused_sharded routes the streamed-W
    kernel; must equal the single-device streamed run bit-for-bit in events."""
    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 40, 4
    rng = np.random.RandomState(2)
    positions = rng.uniform(0, 7, size=(N, 3)).astype(np.float32)
    frames = (positions[None] + rng.normal(scale=0.03, size=(F, N, 3))).astype(
        np.float32
    )
    cell = Cell.triclinic([[9.0, 0, 0], [2.5, 8.5, 0], [0, 0, 8.0]])
    model = PairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8), c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
    )
    key = jax.random.key(5)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))

    single = fused.run_block_fused(
        model, cell, ens, jnp.asarray(frames), 0, dt=0.5, seed=11, tile=tile,
        interpret=True,
    )

    from cmdlmc_tpu.parallel.mesh import shard_ensemble

    ens_sharded = shard_ensemble(ens, mesh)
    sharded = fused.run_block_fused_sharded(
        model, cell, ens_sharded, jnp.asarray(frames), 0, mesh,
        dt=0.5, seed=11, tile=tile, interpret=True,
    )

    np.testing.assert_array_equal(
        np.asarray(single.replicas.clock.event_count),
        np.asarray(sharded.replicas.clock.event_count),
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.site_of_proton),
        np.asarray(sharded.replicas.site_of_proton),
    )
    np.testing.assert_allclose(
        np.asarray(single.replicas.disp_base),
        np.asarray(sharded.replicas.disp_base),
        atol=1e-6,
    )
    assert not sharded.replicas.occ.sharding.is_fully_replicated


def test_sharded_cols_layout_matches_single_device():
    """Cols (sites-major) streamed layout under shard_map: bit-identical to
    the single-device cols run with the same tile (the layout choice is part
    of the RNG-stream contract, and pick_layout is (N, interpret)-pure so
    both paths agree when auto-selected on hardware)."""
    assert len(jax.devices()) == 8
    mesh = replica_mesh()
    R, N, P, F, tile = 32, 12, 4, 40, 4
    rng = np.random.RandomState(2)
    positions = rng.uniform(0, 8, size=(N, 3)).astype(np.float32)
    frames = (positions[None] + rng.normal(scale=0.03, size=(F, N, 3))).astype(
        np.float32
    )
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = PairRates(
        cell=cell, law=Fermi(a=jnp.float32(0.08), b=jnp.float32(2.8),
                             c=jnp.float32(0.3)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
    )
    key = jax.random.key(5)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P,
                            jnp.asarray(positions))
    kw = dict(dt=0.5, seed=11, tile=tile, interpret=True, streamed=True,
              layout="cols")
    single = fused.run_block_fused(model, cell, ens, jnp.asarray(frames), 0,
                                   **kw)
    from cmdlmc_tpu.parallel.mesh import shard_ensemble

    sharded = fused.run_block_fused_sharded(
        model, cell, shard_ensemble(ens, mesh), jnp.asarray(frames), 0, mesh,
        **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.clock.event_count),
        np.asarray(sharded.replicas.clock.event_count),
    )
    np.testing.assert_array_equal(
        np.asarray(single.replicas.site_of_proton),
        np.asarray(sharded.replicas.site_of_proton),
    )
    np.testing.assert_allclose(
        np.asarray(single.replicas.disp_base),
        np.asarray(sharded.replicas.disp_base), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(single.site_disp), np.asarray(sharded.site_disp),
        atol=1e-6,
    )
