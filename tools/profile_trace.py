# Capture a jax.profiler device trace of the flagship fused path and print
# the per-op device-time breakdown. Works through the tunneled backend (axon
# exports XLA-module-granularity device lanes; a Pallas kernel is a single
# custom call, so intra-kernel op splits come from tools/ablate_dense.py
# instead). Complements the ablation with hard device-occupancy numbers:
# what fraction of device time is the sweep kernel vs stage-1 table builds
# vs everything else.
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
ap.add_argument("--replicas", type=int, default=4096)
ap.add_argument("--sites", type=int, default=144)
ap.add_argument("--protons", type=int, default=96)
ap.add_argument("--block-frames", type=int, default=256)
ap.add_argument("--blocks", type=int, default=3)
ap.add_argument("--tile", type=int, default=128)
ap.add_argument("--outdir", default=None, help="keep the raw trace here")
args = ap.parse_args()
if args.platform:
    import jax

    jax.config.update("jax_platforms", args.platform)

import jax
import jax.numpy as jnp

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import PairRates

rng = np.random.RandomState(0)
R, N, P, B = args.replicas, args.sites, args.protons, args.block_frames
L = 14.5 * (N / 144.0) ** (1 / 3)
positions = rng.uniform(0, L, size=(N, 3)).astype(np.float32)
cell = Cell.cubic([L, L, L])
model = PairRates(
    cell=cell,
    law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
    cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0),
)
blocks = [
    jnp.asarray(positions[None]
                + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32))
    for _ in range(args.blocks + 1)
]
ens = eng.init_replicas(jax.random.key(0), R, N, P, jnp.asarray(positions))
interpret = jax.default_backend() != "tpu"


def run(ens, k):
    return fused.run_block_fused(
        model, cell, ens, blocks[k], k * B, dt=0.5, seed=3, tile=args.tile,
        interpret=interpret,
    )


ens = run(ens, 0)  # compile
float(np.asarray(ens.replicas.clock.event_count)[0])

outdir = args.outdir or tempfile.mkdtemp(prefix="jaxprof_")
t0 = time.perf_counter()
with jax.profiler.trace(outdir):
    for k in range(1, args.blocks + 1):
        ens = run(ens, k)
    float(np.asarray(ens.replicas.clock.event_count)[0])  # sync
wall = time.perf_counter() - t0

traces = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")))
if not traces:
    print(f"# no trace produced under {outdir} (backend may not export traces)")
    sys.exit(1)
with gzip.open(traces[-1]) as f:
    data = json.load(f)
ev = data.get("traceEvents", [])
pids = {
    e["pid"]: e["args"].get("name")
    for e in ev
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
dur = collections.Counter()
dev_total = 0
for e in ev:
    if e.get("ph") != "X":
        continue
    lane = pids.get(e["pid"], "?")
    if "TPU" in lane or "device" in lane.lower():
        dur[e.get("name", "?")] += e.get("dur", 0)
        dev_total += e.get("dur", 0)

su = N * R * B * args.blocks
print(f"# {args.blocks} blocks x {B} frames, wall {wall:.3f}s, "
      f"{su / wall / 1e9:.2f} G su/s")
print(f"# device lanes total {dev_total / 1e3:.1f} ms "
      f"({dev_total / 1e6 / wall * 100:.0f}% of wall)")
for name, us in dur.most_common(15):
    print(f"{us / 1e3:10.1f} ms  {us / max(dev_total, 1) * 100:5.1f}%  {name}")
print(f"# raw trace: {traces[-1]}")
