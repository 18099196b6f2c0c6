# Water-family throughput: fused kernel vs scan backend, reported BOTH as
# replica-frames/s and in the repo's north-star unit (site-updates/s =
# N_oxygens x replicas x frames / wall s — each frame rebuilds the [N, N]
# geometry and every site's candidacy, exactly like the solid-acid metric).
# --sites scales the box at constant density for supercell-style rows.
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
ap.add_argument("--replicas", type=int, default=8192)
ap.add_argument("--sites", type=int, default=216)
ap.add_argument("--block-frames", type=int, default=256)
ap.add_argument("--blocks", type=int, default=4)
ap.add_argument("--tile", type=int, default=None)
ap.add_argument("--max-events", type=int, default=4)
ap.add_argument("--scan", action="store_true", help="also time the scan backend")
ap.add_argument("--transform", choices=("none", "linear", "interp"),
                default="linear")
ap.add_argument("--check-from-old", action="store_true")
ap.add_argument("--layout", choices=("rows", "cols"), default=None,
                help="kernel state layout (default: auto — cols on TPU)")
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.models import water as wm
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.transforms import InterpolatedTransformation, LinearTransformation

R, N, B = args.replicas, args.sites, args.block_frames
# constant density: 216 oxygens in an 18.6 A box (bulk water-ish)
L = 18.6 * (N / 216.0) ** (1 / 3)
rng = np.random.RandomState(0)
positions = rng.uniform(0, L, size=(N, 3)).astype(np.float32)

if args.transform == "linear":
    transform = LinearTransformation(
        a=jnp.float32(0.5), b=jnp.float32(1.2),
        left_bound=jnp.float32(0.0), right_bound=jnp.float32(10.0),
    )
elif args.transform == "interp":
    transform = InterpolatedTransformation(
        x=jnp.linspace(2.0, 3.4, 57), y=jnp.linspace(1.9, 3.4, 57)
    )
else:
    transform = None

model = wm.WaterModel(
    cell=Cell.cubic([L, L, L]),
    law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
    transform=transform,
    d_oh=jnp.float32(0.3),
    relaxation_time=10,
    keep_last_neighbor_rescaled=True,
    check_from_old=args.check_from_old,
    n_atoms=3,
)
assert wm.water_fused_supported(model), "config not fused-supported"

key = jax.random.key(0)
states = wm.init_water_states(jax.random.fold_in(key, 0), R, N, jnp.asarray(positions))
keys = jax.random.split(jax.random.fold_in(key, 1), R)
blocks = [
    jnp.asarray(
        positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32)
    )
    for _ in range(args.blocks + 1)
]


def sync(x):
    return float(np.asarray(x).ravel()[0])


def report(label, t):
    rf = R * B * args.blocks / t
    su = rf * N
    print(f"{label}: {rf/1e6:8.2f} M replica-frames/s  "
          f"{su/1e9:7.3f} G site-updates/s", flush=True)


# fused — best of 2 timed passes (tunnel stalls produce 2-4x swings on
# identical configs; same methodology as bench.py)
sd = jnp.zeros((N, 3), jnp.float32)
pp = jnp.asarray(positions)
st, s_out, p_out = wm.run_water_block_fused(
    model, states, blocks[0], 0, site_disp=sd, prev_pos=pp, dt=0.5,
    max_events=args.max_events, seed=3, tile=args.tile, layout=args.layout,
)
sync(st.clock.event_count)
best = float("inf")
for _pass in range(2):
    stp, sp, ppp = st, s_out, p_out
    t0 = time.perf_counter()
    for b in range(1, args.blocks + 1):
        stp, sp, ppp = wm.run_water_block_fused(
            model, stp, blocks[b], b * B, site_disp=sp, prev_pos=ppp, dt=0.5,
            max_events=args.max_events, seed=3, tile=args.tile,
            layout=args.layout,
        )
    sync(stp.clock.event_count)
    best = min(best, time.perf_counter() - t0)
st = stp
report("fused", best)
print(f"  events/replica: {float(np.asarray(st.clock.event_count).mean()):.1f}"
      f"  (best of 2 passes)")

if args.scan:
    st2, _, _ = wm.run_water_block(
        model, states, keys, blocks[0],
        jnp.arange(B, dtype=jnp.int32), dt=0.5, max_events=args.max_events,
    )
    sync(st2.clock.event_count)
    t0 = time.perf_counter()
    for b in range(1, args.blocks + 1):
        st2, _, _ = wm.run_water_block(
            model, st2, keys, blocks[b],
            jnp.arange(b * B, (b + 1) * B, dtype=jnp.int32), dt=0.5,
            max_events=args.max_events,
        )
    sync(st2.clock.event_count)
    report("scan ", time.perf_counter() - t0)
