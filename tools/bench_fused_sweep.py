# Fused-kernel scaling sweep on the real chip.
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import PairRates

rng = np.random.RandomState(0)


def bench(R, N, P, B, a, tile, reps=6, label=""):
    positions = rng.uniform(0, 14.5, size=(N, 3)).astype(np.float32)
    cell = Cell.cubic([14.5, 14.5, 14.5])
    model = PairRates(cell=cell,
                      law=Fermi(a=jnp.float32(a), b=jnp.float32(2.3), c=jnp.float32(0.1)),
                      cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0))
    key = jax.random.key(0)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))
    blocks = [jnp.asarray(positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32))
              for _ in range(reps + 1)]
    ens = fused.run_block_fused(model, cell, ens, blocks[0], 0, dt=0.5, seed=3,
                                tile=tile, interpret=False)
    _ = float(np.asarray(ens.replicas.clock.event_count).sum())
    t0 = time.perf_counter()
    for k in range(1, reps + 1):
        ens = fused.run_block_fused(model, cell, ens, blocks[k], k * B, dt=0.5,
                                    seed=3, tile=tile, interpret=False)
    ev = float(np.asarray(ens.replicas.clock.event_count).mean())
    el = (time.perf_counter() - t0) / reps
    su = N * R * B / el
    print(f"{label:28s} R={R:6d} tile={tile:4d} a={a}: {el*1e3/B:8.4f} ms/frame "
          f"{su/1e9:7.2f} G su/s  (events/replica {ev:.0f})", flush=True)


print("device:", jax.devices()[0], flush=True)
bench(4096, 144, 96, 256, 0.06, 128, label="hot rates")
bench(4096, 144, 96, 256, 0.005, 128, label="cool rates (realistic)")
bench(16384, 144, 96, 256, 0.005, 128, label="cool R=16k")
bench(16384, 144, 96, 256, 0.005, 256, label="cool R=16k tile=256")
bench(65536, 144, 96, 128, 0.005, 256, label="cool R=64k")
bench(16384, 144, 96, 256, 0.06, 128, label="hot R=16k")

print("--- round 2: supercell + tiles ---", flush=True)
bench(1024, 1152, 768, 64, 0.005, 128, label="supercell N=1152 R=1k")
bench(4096, 1152, 768, 64, 0.005, 128, label="supercell N=1152 R=4k")
bench(4096, 144, 96, 256, 0.005, 64, label="cool tile=64")
bench(4096, 144, 96, 256, 0.005, 32, label="cool tile=32")
bench(4096, 144, 96, 512, 0.005, 128, label="cool B=512")
