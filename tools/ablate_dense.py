# Ablation profile of the dense fused kernel: where does the per-frame time
# go? Runs the same config with parts of the kernel compiled out (results are
# physically wrong under ablation — timing only).
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
ap.add_argument("--sites", type=int, default=144)
ap.add_argument("--protons", type=int, default=96)
ap.add_argument("--block-frames", type=int, default=256)
ap.add_argument("--blocks", type=int, default=6)
ap.add_argument("--tile", type=int, default=128)
ap.add_argument("--max-events", type=int, default=4)
ap.add_argument("--a", type=float, default=0.06)
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.ops import kmc_sweep as ks
from cmdlmc_tpu.rates.laws import Fermi

rng = np.random.RandomState(0)
R, N, P, B = args.replicas, args.sites, args.protons, args.block_frames
L = 14.5 * (N / 144.0) ** (1 / 3)
positions = rng.uniform(0, L, size=(N, 3)).astype(np.float32)
law = Fermi(a=jnp.float32(args.a), b=jnp.float32(2.3), c=jnp.float32(0.1))
params = ks.law_params_array(law)
box = jnp.asarray([L, L, L], jnp.float32)
blocks = [
    jnp.asarray(positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32))
    for _ in range(args.blocks + 1)
]
interpret = jax.default_backend() != "tpu"

key = jax.random.key(0)
ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))
rep = ens.replicas
state0 = dict(
    prev_pos=ens.prev_pos, site_disp=ens.site_disp, occ=rep.occ,
    labels=rep.proton_of_site.astype(jnp.float32), sites=rep.site_of_proton,
    tlast=rep.t_last_jump, disp_base=rep.disp_base,
    u_rem=rep.clock.u_remaining, ev_count=rep.clock.event_count,
)


def run(ablate, max_events):
    st = dict(state0)
    def step(k):
        out = ks.kmc_sweep(
            blocks[k], st["prev_pos"], st["site_disp"], st["occ"],
            st["labels"], st["sites"], st["tlast"], st["disp_base"],
            st["u_rem"], st["ev_count"], params, jnp.int32(k * B), box,
            kind=0, tile=args.tile, max_events=max_events, dt=0.5, seed=3,
            cutbuf=5.0, interpret=interpret, ablate=ablate,
        )
        for name in st:
            st[name] = out[name if name != "prev_pos" else "prev_pos"]
    step(0)
    _ = float(np.asarray(st["ev_count"]).sum())
    t0 = time.perf_counter()
    for k in range(1, args.blocks + 1):
        step(k)
    ev = float(np.asarray(st["ev_count"]).mean())
    el = (time.perf_counter() - t0) / args.blocks
    return el / B, ev


print("device:", jax.devices()[0], flush=True)
base, ev = run("", args.max_events)
print(f"full kernel        : {base*1e6:8.2f} us/frame  (events/rep {ev:.0f})",
      flush=True)
for ablate, label in [
    ("wbuild", "W build -> frame0 only"),
    ("select", "selection/updates off"),
    ("events", "event loop off"),
]:
    t, _ = run(ablate, args.max_events)
    print(f"{label:19s}: {t*1e6:8.2f} us/frame  (delta {1e6*(base-t):6.2f} us"
          f" = {100*(base-t)/base:4.1f}%)", flush=True)
for me in (1, 2):
    t, ev = run("", me)
    print(f"max_events={me}       : {t*1e6:8.2f} us/frame  (events/rep {ev:.0f})",
          flush=True)
