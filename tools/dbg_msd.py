import os

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates

from integration.test_reference_parity import (
    A, B, BOX, BUF, C, CUT, DT, N_PROTONS, N_SITES, make_trajectory, oracle_run,
)

N_FRAMES = 2000
frames_np = make_trajectory()[:N_FRAMES]
STATIC = os.environ.get("STATIC") == "1"
if STATIC:
    frames_np = np.broadcast_to(frames_np[0], (N_FRAMES, N_SITES, 3)).copy()

cell = Cell.cubic([BOX] * 3)
model = PairRates(
    cell=cell, law=Fermi(a=jnp.float32(A), b=jnp.float32(B), c=jnp.float32(C)),
    cutoff=jnp.float32(CUT), buffer=jnp.float32(BUF),
)
key = jax.random.key(123)
R = 16
ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N_SITES, N_PROTONS,
                        jnp.asarray(frames_np[0], jnp.float32))
keys = jax.random.split(jax.random.fold_in(key, 1), R)
idx = jnp.arange(N_FRAMES, dtype=jnp.int32)
frames = Frame(donors=jnp.asarray(frames_np, jnp.float32), extras=None,
               time=idx.astype(jnp.float32) * DT, index=idx)
ens, rows = eng.run_block(model, cell, ens, keys, frames, dt=DT)
e_msd = np.asarray(rows.msd_mean).sum(axis=1)
e_events = np.asarray(ens.replicas.clock.event_count, float)

# oracle on same frames
import integration.test_reference_parity as tp
tp.N_FRAMES = N_FRAMES
o_events, o_msd = [], []
for seed in range(4):
    ev, msd = oracle_run(frames_np, seed=seed)
    o_events.append(ev); o_msd.append(msd)
o_msd = np.stack(o_msd).mean(axis=0)

print("static" if STATIC else "jittered")
print("events engine mean", e_events.mean(), "oracle mean", np.mean(o_events))
for f in (100, 500, 1000, 1500, 1999):
    print(f"f={f:5d}  engine msd {e_msd[f]:8.3f}   oracle msd {o_msd[f]:8.3f}")

# independent check: final proton displacement vs disp_base+S
disp = np.asarray(eng.proton_displacement(ens.replicas, ens.site_disp))
print("engine final msd recomputed:", (disp**2).sum(axis=(1, 2)).mean() / N_PROTONS)
