# Micro-bench: fused Pallas knn table kernel vs the XLA stage-1 build.
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
ap.add_argument("--sites", type=int, default=4608)
ap.add_argument("--frames", type=int, default=48)
ap.add_argument("--k", type=int, default=8)
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.ops.knn_tables import knn_block_tables, use_knn_pallas
from cmdlmc_tpu.ops import topk_sweep as ts
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import TopKPairRates

N, B, K = args.sites, args.frames, args.k
L = 14.5 * (N / 144.0) ** (1 / 3)
rng = np.random.RandomState(0)
base = rng.uniform(0, L, size=(N, 3)).astype(np.float32)
block = jnp.asarray(
    base[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32)
)
cell = Cell.cubic([L, L, L])
model = TopKPairRates(
    cell=cell, law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3),
                         c=jnp.float32(0.1)),
    cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0), k=K,
)
kl = ts._pad_k(K)
print("dispatch gate:", use_knn_pallas(model, N), flush=True)


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(label, fn, *a):
    out = fn(*a)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*a)
    sync(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / 3 / B * 1e3
    print(f"{label:28s}: {dt:8.3f} ms/frame", flush=True)
    return out


lengths = jnp.diagonal(cell.h)
rcut = model.cutoff + model.buffer
for tc in (128, 256, 512):
    fn = jax.jit(lambda p, tc=tc: knn_block_tables(
        p, lengths, rcut, k=K, kl=kl, tc=tc))
    got = timeit(f"knn kernel tc={tc}", fn, block)

xla = jax.jit(lambda p: ts._topk_tables_xla(model, p, kl, False))
want = timeit("XLA stage-1 (full)", xla, block)

gd, gi = [np.asarray(x) for x in got]
wd, wi = np.asarray(want[0]), np.asarray(want[1])
print("dist allclose:", bool(np.allclose(gd, wd, atol=2e-4)))
print("idx equal frac:", float((gi == wi).mean()))
