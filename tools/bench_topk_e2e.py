# End-to-end top-K supercell bench THROUGH run_block_fused: exercises the
# auto tile pick (pick_tile_topk), the frame sub-chunking (pick_frame_chunk)
# and the stage-1 dispatch (dense Pallas / sparse-plan) exactly as the
# driver would, and reports combined site-updates/s.
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
ap.add_argument("--replicas", type=int, default=4096)
ap.add_argument("--sites", type=int, default=4608)
ap.add_argument("--protons", type=int, default=3072)
ap.add_argument("--block-frames", type=int, default=256)
ap.add_argument("--blocks", type=int, default=3)
ap.add_argument("--tile", type=int, default=None)
ap.add_argument("--k", type=int, default=8)
ap.add_argument("--drift", type=float, default=0.004)
ap.add_argument("--pull", type=float, default=0.0,
                help="mean reversion toward the base geometry per frame "
                "(0 = free random walk; 0.9995 ~ solid-like vibration)")
ap.add_argument("--no-reuse", action="store_true",
                help="disable Verlet candidate reuse (per-frame rebuild)")
ap.add_argument("--device-frames", action="store_true",
                help="pre-upload all frame blocks: measures the driver's "
                "steady state, where the prefetch thread has already "
                "pipelined the host->device transfer under earlier blocks "
                "(tools/soak_driver.py); without it the ~14 MB/block upload "
                "serializes into the timed region")
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine.fused import run_block_fused
from cmdlmc_tpu.engine.lattice import init_replicas
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import TopKPairRates

rng = np.random.RandomState(0)
R, N, P, B = args.replicas, args.sites, args.protons, args.block_frames
L = 14.5 * (N / 144.0) ** (1 / 3)
positions = rng.uniform(0, L, size=(N, 3)).astype(np.float32)
cell = Cell.cubic([L, L, L])
model = TopKPairRates(
    cell=cell,
    law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
    cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0), k=args.k,
)
n_tot = (args.blocks + 1) * B
if args.pull:
    # stationary (OU-like) vibration around the base geometry: the solid-acid
    # regime this driver targets; per-frame step = drift, saturating spread
    frames_all = np.empty((n_tot, N, 3), np.float32)
    x = np.zeros((N, 3), np.float32)
    for f in range(n_tot):
        x = args.pull * x + rng.normal(scale=args.drift, size=(N, 3)).astype(np.float32)
        frames_all[f] = positions + x
else:
    walk = np.cumsum(
        rng.normal(scale=args.drift,
                   size=(n_tot, N, 3)).astype(np.float32),
        axis=0,
    )
    frames_all = positions[None] + walk
blocks = [np.ascontiguousarray(frames_all[i * B:(i + 1) * B])
          for i in range(args.blocks + 1)]

ens = init_replicas(jax.random.key(0), R, N, P, jnp.asarray(blocks[0][0]))
t0 = time.time()
# two warmup passes over block 0: with Verlet table reuse the first pass
# compiles the carry=None stage-1 path, the second the carry-threaded one —
# both must be cached before the timed region
reuse = False if args.no_reuse else None  # None = engine auto rule
ens = run_block_fused(model, cell, ens, blocks[0], 0, dt=0.5, seed=3,
                      tile=args.tile, nbr_reuse=reuse)
# second warmup at frame0=B keeps the absolute frame index monotone: the
# Verlet thrash guard is keyed on absolute frames, and replaying frame0=0
# against the carried rebuild state would misrepresent the schedule
ens = run_block_fused(model, cell, ens, blocks[0], B, dt=0.5, seed=3,
                      tile=args.tile, nbr_reuse=reuse)
jumps0 = float(np.asarray(ens.replicas.jumps, np.float64).sum())
t1 = time.time()
print(f"warmup (compile): {t1 - t0:.1f} s", flush=True)
if args.device_frames:
    blocks = [jnp.asarray(b) for b in blocks]
    jax.block_until_ready(blocks)
    float(np.asarray(blocks[-1].ravel()[0]))  # tunnel-proof sync
t2 = time.time()
for i in range(1, args.blocks + 1):
    ens = run_block_fused(model, cell, ens, blocks[i], i * B, dt=0.5,
                          seed=3, tile=args.tile, nbr_reuse=reuse)
jumps = float(np.asarray(ens.replicas.jumps, np.float64).sum())  # sync
t3 = time.time()
frames = args.blocks * B
su = R * N * frames / (t3 - t2)
print(f"end-to-end: {(t3 - t2) / frames * 1e3:.3f} ms/frame  "
      f"{su / 1e9:.3f} G su/s  jumps/rep {(jumps - jumps0) / R:.1f}",
      flush=True)
