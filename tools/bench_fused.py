# Fused-kernel TPU smoke + benchmark.
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import PairRates

rng = np.random.RandomState(0)
R, N, P, B = 4096, 144, 96, 256
TILE = 128
dt = 0.5
positions = rng.uniform(0, 14.5, size=(N, 3)).astype(np.float32)
cell = Cell.cubic([14.5, 14.5, 14.5])
model = PairRates(cell=cell, law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
                  cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0))
key = jax.random.key(0)
ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))

blocks = []
for b in range(9):
    jit_pos = positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32)
    blocks.append(jnp.asarray(jit_pos))

print("compiling...", flush=True)
t0 = time.perf_counter()
ens = fused.run_block_fused(model, cell, ens, blocks[0], 0, dt=dt, seed=3,
                            tile=TILE, interpret=False)
ev0 = np.asarray(ens.replicas.clock.event_count, float)
print(f"compile+first block {time.perf_counter()-t0:.1f}s; events/replica after {B} frames:",
      ev0.mean(), flush=True)

# sanity invariants
occ = np.asarray(ens.replicas.occ)
assert np.allclose(occ.sum(axis=1), P, atol=1e-4), occ.sum(axis=1)
pos_map = np.asarray(ens.replicas.proton_of_site)
site_map = np.asarray(ens.replicas.site_of_proton)
for r in (0, 17, R - 1):
    assert (pos_map[r] > 0).sum() == P
    np.testing.assert_array_equal(np.sort(pos_map[r][site_map[r]]), np.arange(1, P + 1))
print("invariants OK", flush=True)

t0 = time.perf_counter()
K = 8
for k in range(1, 1 + K):
    ens = fused.run_block_fused(model, cell, ens, blocks[k], k * B, dt=dt, seed=3,
                                tile=TILE, interpret=False)
_ = float(np.asarray(ens.replicas.clock.event_count).sum())  # host sync
el = (time.perf_counter() - t0) / K
su = N * R * B / el
print(f"fused: {el*1e3/B:.4f} ms/frame  {su/1e9:.3f} G site-updates/s", flush=True)

disp = np.asarray(eng.proton_displacement(ens.replicas, ens.site_disp))
print("msd:", (disp**2).sum(axis=(1, 2)).mean() / P, "finite:", np.isfinite(disp).all())
