# Where does the soak's per-block host time go? Times each phase of the
# driver block loop separately against the same HDF5 trajectory the soak
# uses: (a) HDF5 -> host block assembly, (b) host -> device upload,
# (c) run_block_fused dispatch (host returns), (d) device completion wait.
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--traj", required=True, help="existing soak.hdf5 path")
ap.add_argument("--blocks", type=int, default=10)
ap.add_argument("--block-size", type=int, default=2000)
ap.add_argument("--replicas", type=int, default=4096)
ap.add_argument("--protons", type=int, default=96)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused as eng_fused, lattice as eng
from cmdlmc_tpu.io.hdf5 import HDF5Trajectory
from cmdlmc_tpu.io.stream import frame_blocks
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import PairRates


def sync(x):
    return float(np.asarray(x).ravel()[0])


traj = HDF5Trajectory(args.traj, time_step=0.5)
gen = frame_blocks(traj, block_size=args.block_size, donor_atoms="O",
                   max_frames=(args.blocks + 1) * args.block_size)

first = next(gen)
N = first.donors.shape[1]
L = 14.5 * (N / 144.0) ** (1 / 3)
cell = Cell.cubic([L, L, L])
model = PairRates(cell=cell,
                  law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3),
                            c=jnp.float32(0.1)),
                  cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0))
key = jax.random.key(0)
states = eng.init_replicas(jax.random.fold_in(key, 0), args.replicas, N,
                           args.protons, jnp.asarray(first.donors[0]))

# compile
d0 = jnp.asarray(first.donors)
states = eng_fused.run_block_fused(model, cell, states, d0, 0, dt=0.5,
                                   max_events=4, seed=0)
sync(states.replicas.clock.event_count)

t_read = t_up = t_disp = t_wait = 0.0
nb = 0
for block in gen:
    if block.n_frames != args.block_size:
        break
    t0 = time.perf_counter()          # (a) already read by generator `next`;
    donors_np = np.ascontiguousarray(block.donors)  # block assembly cost
    t1 = time.perf_counter()
    donors = jnp.asarray(donors_np)   # (b) upload
    _ = donors.shape
    t2 = time.perf_counter()
    states = eng_fused.run_block_fused(model, cell, states, donors,
                                       block.start, dt=0.5, max_events=4,
                                       seed=0)                  # (c) dispatch
    t3 = time.perf_counter()
    sync(states.replicas.clock.event_count)                     # (d) wait
    t4 = time.perf_counter()
    t_read += t1 - t0
    t_up += t2 - t1
    t_disp += t3 - t2
    t_wait += t4 - t3
    nb += 1

# generator read time: re-walk the raw HDF5 separately
t5 = time.perf_counter()
g2 = frame_blocks(HDF5Trajectory(args.traj, time_step=0.5), block_size=args.block_size,
                  donor_atoms="O", max_frames=nb * args.block_size)
for b in g2:
    pass
t_hdf5 = time.perf_counter() - t5

print(f"blocks timed: {nb}")
print(f"hdf5 read+assemble   {1e3 * t_hdf5 / nb:9.1f} ms/block")
print(f"host block copy      {1e3 * t_read / nb:9.1f} ms/block")
print(f"device upload        {1e3 * t_up / nb:9.1f} ms/block")
print(f"kernel dispatch      {1e3 * t_disp / nb:9.1f} ms/block")
print(f"device wait          {1e3 * t_wait / nb:9.1f} ms/block")
tot = t_hdf5 + t_read + t_up + t_disp + t_wait
print(f"total                {1e3 * tot / nb:9.1f} ms/block "
      f"({args.block_size * nb / tot:.0f} frames/s)")
