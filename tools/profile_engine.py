# Profiling experiment: where does the per-frame time go on the real chip?
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates

rng = np.random.RandomState(0)


def bench(n_replicas, n_sites, n_frames, max_events, n_protons=None, label=""):
    n_protons = n_protons or (n_sites * 2 // 3)
    positions = rng.uniform(0, 14.5, size=(n_sites, 3)).astype(np.float32)
    cell = Cell.cubic([14.5, 14.5, 14.5])
    model = PairRates(
        cell=cell,
        law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
        cutoff=jnp.float32(3.0),
        buffer=jnp.float32(2.0),
    )
    key = jax.random.key(0)
    states = eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, n_sites, n_protons,
        jnp.asarray(positions),
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)
    jit_pos = positions[None] + rng.normal(
        scale=0.03, size=(n_frames, n_sites, 3)
    ).astype(np.float32)
    idx = jnp.arange(n_frames, dtype=jnp.int32)
    frames = Frame(donors=jnp.asarray(jit_pos), extras=None,
                   time=idx.astype(jnp.float32) * 0.5, index=idx)

    s, r = eng.run_block(model, cell, states, keys, frames, dt=0.5,
                         max_events=max_events)
    jax.block_until_ready(r.msd_mean)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s, r = eng.run_block(model, cell, s, keys, frames, dt=0.5,
                             max_events=max_events)
    jax.block_until_ready(r.msd_mean)
    el = (time.perf_counter() - t0) / reps
    su = n_sites * n_replicas * n_frames / el
    print(f"{label:42s} R={n_replicas:6d} N={n_sites:5d} ev={max_events} "
          f"-> {el*1e3/n_frames:8.3f} ms/frame  {su/1e9:7.3f} G site-upd/s",
          flush=True)


print("device:", jax.devices()[0])
bench(4096, 144, 128, 4, 96, "baseline (bench.py config)")
bench(4096, 144, 128, 1, 96, "max_events=1")
bench(4096, 144, 128, 2, 96, "max_events=2")
bench(8192, 144, 128, 4, 96, "2x replicas")
bench(16384, 144, 128, 4, 96, "4x replicas")
bench(16384, 144, 128, 2, 96, "4x replicas, ev=2")
bench(4096, 1152, 32, 2, 768, "supercell 2x2x2 (N=1152)")
bench(1024, 1152, 32, 2, 768, "supercell, R=1024")
