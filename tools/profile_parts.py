# Piecewise cost attribution for the per-frame engine step on the real chip.
# NOTE: jax.block_until_ready is a no-op through the axon tunnel — always time
# through an actual host fetch of a value depending on the computation.
import time

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell, displacement as cell_displacement
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.engine import clock as kmc_clock
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates

rng = np.random.RandomState(0)
R, N, P, B = 4096, 144, 96, 256
dt = 0.5
positions = rng.uniform(0, 14.5, size=(N, 3)).astype(np.float32)
cell = Cell.cubic([14.5, 14.5, 14.5])
model = PairRates(cell=cell, law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
                  cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0))
key = jax.random.key(0)
states = eng.init_replicas(jax.random.fold_in(key, 0), R, N, P, jnp.asarray(positions))
keys = jax.random.split(jax.random.fold_in(key, 1), R)
jit_pos = positions[None] + rng.normal(scale=0.03, size=(B, N, 3)).astype(np.float32)
idx = jnp.arange(B, dtype=jnp.int32)
frames = Frame(donors=jnp.asarray(jit_pos), extras=None, time=idx.astype(jnp.float32)*0.5, index=idx)


def timeit(fn, args, label, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    el = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {el*1e3/B:8.4f} ms/frame  ({N*R*B/el/1e9:6.3f} G su/s)", flush=True)
    return el


# A: full engine
timeit(lambda s: eng.run_block(model, cell, s, keys, frames, dt=dt, max_events=4)[0].occ.sum(),
       (states,), "A full engine ev=4")
timeit(lambda s: eng.run_block(model, cell, s, keys, frames, dt=dt, max_events=1)[0].occ.sum(),
       (states,), "A full engine ev=1")

# B: rate eval + clock arithmetic only (no selection/apply, no observables)
@jax.jit
def rate_clock_only(occ, u, frames):
    W0 = model.shared(jax.tree.map(lambda x: x[0], frames)).W  # just shape helper
    def step(carry, fr):
        occ, u = carry
        shared = model.shared(fr)
        rate = jax.vmap(lambda o: (o * (shared.W @ (1.0 - o))).sum())(occ)
        u = u - rate * dt
        return (occ, u), rate.mean()
    (occ, u), ys = jax.lax.scan(step, (occ, u), frames)
    return u.sum() + ys.sum()

u0 = jnp.ones((R,), jnp.float32) * 1e9
timeit(rate_clock_only, (states.occ, u0, frames), "B rate-eval only (1x matmul)")

# C: 5x rate evals (the ev=4 loop pattern, no selection)
@jax.jit
def rate5(occ, u, frames):
    def step(carry, fr):
        occ, u = carry
        shared = model.shared(fr)
        for _ in range(5):
            rate = jax.vmap(lambda o: (o * (shared.W @ (1.0 - o))).sum())(occ)
            u = u - rate * dt
        return (occ, u), rate.mean()
    (occ, u), ys = jax.lax.scan(step, (occ, u), frames)
    return u.sum() + ys.sum()

timeit(rate5, (states.occ, u0, frames), "C 5x rate evals")

# D: clock only (exponential draws per frame, no matmul)
@jax.jit
def clock_only(u, frames):
    def step(u, fr):
        nu = jax.vmap(lambda k: jax.random.exponential(jax.random.fold_in(k, fr.index)))(keys)
        return u + nu, nu.mean()
    u, ys = jax.lax.scan(step, u, frames)
    return u.sum() + ys.sum()

timeit(clock_only, (u0, frames), "D per-frame exponential draws [R]")

# E: one categorical over [R, N] per frame
@jax.jit
def categorical_only(u, frames):
    logits = jnp.zeros((R, N))
    def step(u, fr):
        c = jax.vmap(lambda k, lg: jax.random.categorical(jax.random.fold_in(k, fr.index), lg))(keys, logits)
        return u + c.sum(), c[0]
    u, ys = jax.lax.scan(step, u, frames)
    return u.sum() + ys.sum()

timeit(categorical_only, (u0.astype(jnp.int32) * 0, frames), "E 1x categorical [R,N] per frame")

# F: observables update only
@jax.jit
def obs_only(sites, snapshot, disp, frames):
    def step(carry, fr):
        sites, snapshot, disp = carry
        newpos = jax.vmap(lambda s: fr.donors[s])(sites)
        disp = disp + cell_displacement(cell, snapshot, newpos)
        msd = (disp**2).sum(axis=1).mean(axis=0) / P
        return (sites, newpos, disp), msd
    carry, ys = jax.lax.scan(step, (sites, snapshot, disp), frames)
    return ys.sum()

timeit(obs_only, (states.site_of_proton, states.snapshot, states.displacement, frames),
       "F observables gather+minimage per frame")

# G: scatter/apply machinery per frame (2 scatters [R,N])
@jax.jit
def scatter_only(occ, frames):
    def step(occ, fr):
        src = (fr.index % N).astype(jnp.int32)
        occ = jax.vmap(lambda o: o.at[src].set(0.0).at[(src + 1) % N].set(1.0))(occ)
        return occ, occ[0, 0]
    occ, ys = jax.lax.scan(step, occ, frames)
    return occ.sum() + ys.sum()

timeit(scatter_only, (states.occ, frames), "G 2x scatter [R,N] per frame")
