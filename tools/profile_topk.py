# Stage-level timing of the top-K fused path: XLA table build vs Pallas sweep.
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
ap.add_argument("--blocks", type=int, default=4)
ap.add_argument("--tile", type=int, default=128)
ap.add_argument("--k", type=int, default=8)
ap.add_argument("--max-events", type=int, default=4)
ap.add_argument("--layout", default="rows", help="kernel state layout")
ap.add_argument("--drift", type=float, default=None,
                help="random-walk step scale per frame (MD-like temporal correlation) instead of independent jitter")
ap.add_argument("--verlet", action="store_true",
                help="stage 1 via topk_tables_verlet (frozen identities)")
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.ops import topk_sweep as ts
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
if args.drift is not None:
    # temporally-correlated frames: a bounded random walk around the base
    # geometry (real MD moves atoms ~0.001-0.01 A per 0.4 fs frame; candidate
    # identities then change rarely, the regime the delta refresh serves)
    walk = np.cumsum(
        rng.normal(scale=args.drift,
                   size=((args.blocks + 1) * B, N, 3)).astype(np.float32),
        axis=0,
    )
    frames_all = positions[None] + walk
    blocks = [jnp.asarray(frames_all[i * B:(i + 1) * B])
              for i in range(args.blocks + 1)]
else:
    blocks = [
        jnp.asarray(positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32))
        for _ in range(args.blocks + 1)
    ]

kl = ts._pad_k(args.k)
cmax = ts.default_cmax(N)
# NOT wrapped in jax.jit: the stage-1 dispatch (dense Pallas vs sparse-plan)
# happens on the host in topk_tables, and the sparse spatial plan needs
# concrete positions; the builders themselves are jitted internally.
if args.verlet:
    _carry = [None]

    def tables_j(p, frame0=0):
        out = ts.topk_tables_verlet(model, p, kl, True, _carry[0], frame0)
        _carry[0] = out[-1]
        return out[:7]
else:
    tables_j = lambda p, frame0=0: ts.topk_tables_delta(model, p, kl, True, cmax)


def sync(x):
    # slice ON DEVICE first: np.asarray(x) would fetch the whole array
    # through the tunnel (~100-200 MB/s), polluting the timing with
    # transfer time for multi-MB tensors
    return float(np.asarray(x.ravel()[0]))


# ---- stage 1: tables (two warmup calls: the Verlet path compiles separate
# carry=None / carry-threaded programs)
tabs = tables_j(blocks[0], 0)
sync(tabs[0])
tabs = tables_j(blocks[0], 0)
sync(tabs[0])
t0 = time.perf_counter()
for k in range(1, args.blocks + 1):
    # monotone absolute frame indices: the Verlet thrash guard is keyed on
    # them, and a replayed frame0 would misrepresent the rebuild schedule
    tabs = tables_j(blocks[k], k * B)
sync(tabs[0])
t_tab = (time.perf_counter() - t0) / args.blocks
print(f"stage1 tables : {t_tab*1e3/B:8.4f} ms/frame", flush=True)
mode_hist = np.bincount(np.asarray(tabs[6]), minlength=3)
print(f"refresh modes : none={mode_hist[0]} delta={mode_hist[1]} "
      f"full={mode_hist[2]} (cmax={cmax})", flush=True)

# ---- stage 2: kernel with fixed tables
key = jax.random.key(0)
ens = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))
rep = ens.replicas
params = jnp.concatenate([
    jnp.asarray(ts.law_params_array(model.law)), jnp.zeros(2, jnp.float32)
])
topd, topi, resc, ci, cnbr, chg, mode = tabs


def step(state, frame0):
    occ, lab, sites, tlast, tls, db, u, evc, sd, pp = state
    out = ts.topk_sweep(
        blocks[0], topd, topi, resc, ci, cnbr, chg, mode,
        pp, sd, occ, lab, sites, tlast, tls, db,
        u, evc, params, jnp.int32(frame0), model.cell.h, model.cell.h_inv, 0,
        kind=0, k_cand=args.k, tile=args.tile, max_events=args.max_events,
        dt=0.5, seed=3, has_interp=False, interpret=jax.default_backend() != "tpu",
        layout=args.layout,
    )
    return (out["occ"], out["labels"], out["sites"], out["tlast"],
            out["tlast_site"], out["disp_base"], out["u_rem"], out["ev_count"],
            out["site_disp"], out["prev_pos"])


state = (rep.occ, rep.proton_of_site.astype(jnp.float32), rep.site_of_proton,
         rep.t_last_jump, ts._entry_tlast_site(rep), rep.disp_base,
         rep.clock.u_remaining, rep.clock.event_count, ens.site_disp,
         ens.prev_pos)
state = step(state, 0)
sync(state[7])
t0 = time.perf_counter()
for k in range(1, args.blocks + 1):
    state = step(state, k * B)
sync(state[7])
t_kern = (time.perf_counter() - t0) / args.blocks
su = N * R * B
print(f"stage2 kernel : {t_kern*1e3/B:8.4f} ms/frame  "
      f"{su/t_kern/1e9:7.3f} G su/s  events/rep "
      f"{float(np.asarray(state[7]).mean()):.1f}", flush=True)
