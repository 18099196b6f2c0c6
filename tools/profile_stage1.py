# Component timing of the top-K stage-1 table build at supercell N: pairwise
# distances vs top-k extraction (lax.top_k / approx_max_k / iterative argmin)
# vs the delta change-detection epilogue.
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

from cmdlmc_tpu.core.cell import Cell, pairwise_distances
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


@jax.jit
def masked_d(pos):
    def one(p):
        d = pairwise_distances(cell, p, p)
        n = d.shape[0]
        d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
        return jnp.where(d <= model.cutoff + model.buffer, d, jnp.inf)
    return jax.lax.map(one, pos, batch_size=8)


@jax.jit
def topk_lax(pos):
    def one(p):
        d = masked_one(p)
        neg, nbr = jax.lax.top_k(-d, K)
        return -neg, nbr
    return jax.lax.map(one, pos, batch_size=8)


def masked_one(p):
    d = pairwise_distances(cell, p, p)
    n = d.shape[0]
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
    return jnp.where(d <= model.cutoff + model.buffer, d, jnp.inf)


@jax.jit
def topk_approx(pos):
    def one(p):
        d = masked_one(p)
        neg, nbr = jax.lax.approx_max_k(-d, K, recall_target=0.99)
        return -neg, nbr
    return jax.lax.map(one, pos, batch_size=8)


@jax.jit
def topk_iter(pos):
    def one(p):
        d = masked_one(p)
        n = d.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        dists, nbrs = [], []
        for _ in range(K):
            i = jnp.argmin(d, axis=1)
            v = jnp.min(d, axis=1)
            nbrs.append(i)
            dists.append(v)
            d = jnp.where(iota == i[:, None], jnp.inf, d)
        return jnp.stack(dists, 1), jnp.stack(nbrs, 1)
    return jax.lax.map(one, pos, batch_size=8)


@jax.jit
def full_tables(pos):
    return ts.topk_tables(model, pos, ts._pad_k(K), True)


@jax.jit
def full_tables_delta(pos):
    return ts.topk_tables_delta(model, pos, ts._pad_k(K), True,
                                ts.default_cmax(N))


timeit("pairwise+mask only", masked_d, block)
timeit("pairwise+lax.top_k", topk_lax, block)
timeit("pairwise+approx_max_k", topk_approx, block)
timeit("pairwise+iterative argmin", topk_iter, block)
timeit("topk_tables (current)", full_tables, block)
out = timeit("topk_tables_delta (current)", full_tables_delta, block)
mode = np.asarray(out[6])
print("delta mode histogram:", np.bincount(mode, minlength=3))

# exactness: iterative argmin must reproduce lax.top_k bit-for-bit
d_l, n_l = topk_lax(block)
d_i, n_i = topk_iter(block)
print("iter == lax.top_k dist:", bool(jnp.all(jnp.where(jnp.isinf(d_l), 0, d_l)
                                              == jnp.where(jnp.isinf(d_i), 0, d_i))))
print("iter == lax.top_k nbr (valid slots):",
      bool(jnp.all(jnp.where(jnp.isinf(d_l), -1, n_l)
                   == jnp.where(jnp.isinf(d_i), -1, n_i))))
