# TPU benchmark of every fused-kernel capability: dense Fermi (flagship),
# FermiAngle over AngleTopology, jumpstat histograms, jump matrix,
# TopKPairRates (Verlet-list analog) and HydroniumRates (residence-time
# relaxation). One line of G site-updates/s per variant — the VERDICT round-1
# "every capability hits the north star" check.
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Fermi, FermiAngle
from cmdlmc_tpu.topo.models import (
    AnglePairRates,
    HydroniumRates,
    PairRates,
    TopKPairRates,
)
from cmdlmc_tpu.topo.transforms import DistanceInterpolator, ReLUTransformation

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
ap.add_argument("--replicas", type=int, default=4096)
ap.add_argument("--sites", type=int, default=144)
ap.add_argument("--protons", type=int, default=96)
ap.add_argument("--block-frames", type=int, default=256)
ap.add_argument("--blocks", type=int, default=8)
ap.add_argument("--tile", type=int, default=128)
ap.add_argument("--layout", default=None,
                help="force kernel state layout: rows | cols (default auto)")
ap.add_argument("--only", default=None, help="comma list of variant names")
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

rng = np.random.RandomState(0)
R, N, P, B = args.replicas, args.sites, args.protons, args.block_frames
M = max(N // 4, 1)  # heavy atoms for the angle topology
L = 14.5 * (N / 144.0) ** (1 / 3)
dt = 0.5
interpret = jax.default_backend() != "tpu"

positions = rng.uniform(0, L, size=(N, 3)).astype(np.float32)
epos = rng.uniform(0, L, size=(M, 3)).astype(np.float32)
cell = Cell.cubic([L, L, L])
fermi = Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1))
f32 = jnp.float32

blocks, eblocks = [], []
for b in range(args.blocks + 1):
    blocks.append(jnp.asarray(
        positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32)
    ))
    eblocks.append(jnp.asarray(
        epos[None] + rng.normal(scale=0.03, size=(B, M, 3)).astype(np.float32)
    ))


def variants():
    yield "dense_fermi", PairRates(
        cell=cell, law=fermi, cutoff=f32(3.0), buffer=f32(2.0)
    ), dict()
    yield "dense_streamed", PairRates(
        cell=cell, law=fermi, cutoff=f32(3.0), buffer=f32(2.0)
    ), dict(streamed=True)
    angle_law = FermiAngle(a=jnp.float32(0.06), b=jnp.float32(2.3),
                           c=jnp.float32(0.1), theta=jnp.float32(1.2))
    yield "fermi_angle", AnglePairRates.from_first_frame(
        cell, angle_law, cutoff=3.0, buffer=2.0,
        donors0=blocks[0][0], extras0=eblocks[0][0],
        group_size=max(N // M, 1),
    ), dict(extras=True)
    yield "jumpstat_hist", PairRates(
        cell=cell, law=fermi, cutoff=f32(3.0), buffer=f32(2.0)
    ), dict(hist_bins=20)
    yield "jump_matrix", PairRates(
        cell=cell, law=fermi, cutoff=f32(3.0), buffer=f32(2.0)
    ), dict(track_matrix=True)
    yield "topk_pair_k8", TopKPairRates(
        cell=cell, law=fermi, cutoff=f32(3.0), buffer=f32(2.0), k=8
    ), dict()
    yield "hydronium_k4", HydroniumRates(
        cell=cell, law=fermi, cutoff=f32(3.0), buffer=f32(2.0),
        transform=ReLUTransformation(
            a=f32(0.5), b=f32(2.2), d0=f32(2.2), left_bound=f32(2.0),
            right_bound=f32(3.3),
        ),
        interpolator=DistanceInterpolator(relaxation_time=f32(20.0)),
        k=4,
    ), dict()


only = set(args.only.split(",")) if args.only else None
key = jax.random.key(0)
for name, model, opts in variants():
    if only and name not in only:
        continue
    ens = eng.init_replicas(
        jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions),
        hist_bins=opts.get("hist_bins", 0),
        track_jump_matrix=opts.get("track_matrix", False),
    )
    extras = opts.get("extras", False)

    def run(ens, k):
        return fused.run_block_fused(
            model, cell, ens, blocks[k], k * B, dt=dt, seed=3,
            tile=args.tile, interpret=interpret,
            extras_positions=eblocks[k] if extras else None,
            hist_range=(2.0, 3.0),
            streamed=opts.get("streamed"),
            layout=args.layout,
        )

    t0 = time.perf_counter()
    ens = run(ens, 0)
    ev = np.asarray(ens.replicas.clock.event_count, float)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for k in range(1, 1 + args.blocks):
        ens = run(ens, k)
    _ = float(np.asarray(ens.replicas.clock.event_count).sum())  # host sync
    el = (time.perf_counter() - t0) / args.blocks
    su = N * R * B / el
    print(
        f"{name:16s} compile {compile_s:6.1f}s  {el*1e3/B:8.4f} ms/frame  "
        f"{su/1e9:7.3f} G site-updates/s  events/rep {ev.mean():8.1f}",
        flush=True,
    )
