# Layout hypothesis probe: the streamed kernel's event loop is element-
# throughput-bound (pack=2 gave only +3%), and at N=144 every [TR, N] op
# pads 144 -> 256 lanes (44% dead VPU work). A transposed [N, TR] layout is
# exact (144 sublanes, 128 lanes). This microbench runs the event loop's op
# mix — 2 hash-RNG + log tensors, 2 argmax races, 2 MXU products, the
# one-hot state updates — in both layouts and reports per-event time.
import argparse
import functools
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
ap.add_argument("--sites", type=int, default=144)
ap.add_argument("--protons", type=int, default=96)
ap.add_argument("--tile", type=int, default=128)
ap.add_argument("--frames", type=int, default=512)
ap.add_argument("--events", type=int, default=4)
ap.add_argument("--reps", type=int, default=3)
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.ops.kmc_sweep import _mix_key, _u01, _u01_t

N, P, TR, B, E = args.sites, args.protons, args.tile, args.frames, args.events
f32 = jnp.float32


def kernel_rows(w_ref, occ_ref, lab_ref, site_ref, occ_out, lab_out, site_out):
    f = pl.program_id(0)
    W = w_ref[:]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TR, N), 1)

    @pl.when(f == 0)
    def _():
        occ_out[:] = occ_ref[:]
        lab_out[:] = lab_ref[:]
        site_out[:] = site_ref[:]

    for ev in range(E):
        occ = occ_out[:]
        out = jax.lax.dot_general(1.0 - occ, W, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
        row = occ * out
        total = jnp.sum(row, axis=1, keepdims=True)
        key1 = _mix_key(7, jnp.int32(0), f, ev, 1)
        e1 = -jnp.log(_u01(key1, (TR, N)))
        src = jnp.argmax(row / e1, axis=1)
        oh_src = (iota_n == src[:, None]).astype(f32)
        srcrow = jax.lax.dot_general(oh_src, W, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        w2 = srcrow * (1.0 - occ)
        key2 = _mix_key(7, jnp.int32(0), f, ev, 2)
        e2 = -jnp.log(_u01(key2, (TR, N)))
        dst = jnp.argmax(w2 / e2, axis=1)
        oh_dst = (iota_n == dst[:, None]).astype(f32)
        firef = (total > 0.1).astype(f32)
        label = jnp.sum(lab_out[:] * oh_src, axis=1, keepdims=True)
        occ_out[:] = occ + firef * (oh_dst - oh_src)
        lab_out[:] = (lab_out[:] * (1.0 - firef * (oh_src + oh_dst))
                      + firef * oh_dst * label)
        moving = site_out[:] == src[:, None]
        site_out[:] = jnp.where(moving, dst[:, None].astype(jnp.int32),
                                site_out[:])


def kernel_cols(w_ref, occ_ref, lab_ref, site_ref, occ_out, lab_out, site_out):
    f = pl.program_id(0)
    W = w_ref[:]
    iota_nt = jax.lax.broadcasted_iota(jnp.int32, (N, TR), 0)

    @pl.when(f == 0)
    def _():
        occ_out[:] = occ_ref[:]
        lab_out[:] = lab_ref[:]
        site_out[:] = site_ref[:]

    for ev in range(E):
        occ = occ_out[:]  # [N, TR]
        out = jax.lax.dot_general(W, 1.0 - occ, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)  # [N, TR]
        row = occ * out
        total = jnp.sum(row, axis=0, keepdims=True)  # [1, TR]
        key1 = _mix_key(7, jnp.int32(0), f, ev, 1)
        e1 = -jnp.log(_u01_t(key1, (N, TR)))
        src = jnp.argmax(row / e1, axis=0)  # [TR]
        oh_src = (iota_nt == src[None, :]).astype(f32)  # [N, TR]
        srcrow = jax.lax.dot_general(W, oh_src, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)  # [N, TR]
        w2 = srcrow * (1.0 - occ)
        key2 = _mix_key(7, jnp.int32(0), f, ev, 2)
        e2 = -jnp.log(_u01_t(key2, (N, TR)))
        dst = jnp.argmax(w2 / e2, axis=0)
        oh_dst = (iota_nt == dst[None, :]).astype(f32)
        firef = (total > 0.1).astype(f32)  # [1, TR]
        label = jnp.sum(lab_out[:] * oh_src, axis=0, keepdims=True)
        occ_out[:] = occ + firef * (oh_dst - oh_src)
        lab_out[:] = (lab_out[:] * (1.0 - firef * (oh_src + oh_dst))
                      + firef * oh_dst * label)
        moving = site_out[:] == src[None, :]  # [P, TR]
        site_out[:] = jnp.where(moving, dst[None, :].astype(jnp.int32),
                                site_out[:])


def run(kernel, shapes):
    (occ_s, lab_s, site_s) = shapes
    rng = np.random.RandomState(0)
    W = jnp.asarray(np.abs(rng.normal(size=(N, N))).astype(np.float32))
    occ = jnp.asarray((rng.uniform(size=occ_s) < P / N).astype(np.float32))
    lab = jnp.asarray(rng.uniform(size=occ_s).astype(np.float32))
    site = jnp.asarray(rng.randint(0, N, size=site_s).astype(np.int32))

    spec = lambda s: pl.BlockSpec(s, lambda f: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec((N, N)), spec(occ_s), spec(occ_s), spec(site_s)],
        out_specs=(spec(occ_s), spec(occ_s), spec(site_s)),
        out_shape=(
            jax.ShapeDtypeStruct(occ_s, jnp.float32),
            jax.ShapeDtypeStruct(occ_s, jnp.float32),
            jax.ShapeDtypeStruct(site_s, jnp.int32),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    fn = jax.jit(functools.partial(fn, W))
    o, l, s = fn(occ, lab, site)
    float(np.asarray(o)[0, 0])  # sync
    best = np.inf
    for _ in range(args.reps):
        t0 = time.time()
        o2, l2, s2 = fn(occ, lab, site)
        float(np.asarray(o2)[0, 0])
        best = min(best, time.time() - t0)
    return best / (B * E) * 1e6  # us per event iteration


us_rows = run(kernel_rows, ((TR, N), (TR, N), (TR, P)))
us_cols = run(kernel_cols, ((N, TR), (N, TR), (P, TR)))
print(f"[TR={TR}, N={N}] rows-major: {us_rows:.3f} us/event")
print(f"[N={N}, TR={TR}] cols-major: {us_cols:.3f} us/event")
print(f"speedup: {us_rows / us_cols:.2f}x")
