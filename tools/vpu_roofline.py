# Measured VPU "speed of light" for the fused sweep's op mix (VERDICT r3 #7).
#
# The dense-kernel ablation (tools/ablate_dense.py) shows the flagship kernel
# is VPU element-throughput-bound (event loop ~78%, bf16 MXU made no
# difference). To turn "5.45 G su/s" into a fraction-of-roofline statement we
# need the chip's achievable elementwise rate ON THE SAME SHAPES, which this
# tool measures with Pallas kernels that stream VMEM-resident [N, TR] tiles
# through long chains of the three op classes the event loop is made of:
#
#   * fma      — mult/add/sub/compare/select class (1 VPU op each)
#   * rng      — the counter-based hash draw (_u01_t: ~10 int ops + convert)
#   * log      — the transcendental in the exponential race
#
# Output: achieved elementwise op/s per class, plus the implied roofline for
# the measured event-loop op mix (see docs/DESIGN.md "Roofline").
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
ap.add_argument("--n", type=int, default=144, help="site axis (sublanes)")
ap.add_argument("--tr", type=int, default=128, help="replica axis (lanes)")
ap.add_argument("--chain", type=int, default=2048, help="ops per element")
ap.add_argument("--reps", type=int, default=64, help="grid steps")
args = ap.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from cmdlmc_tpu.ops.kmc_sweep import _mix_key, _u01_t

N, TR, CHAIN = args.n, args.tr, args.chain


def bench(make_kernel, ops_per_elem, label):
    kernel = make_kernel()
    x = jnp.asarray(np.random.RandomState(0).rand(N, TR), jnp.float32)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            grid=(args.reps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, TR), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)
    )
    r = f(x)
    float(np.asarray(r)[0, 0])  # sync
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(x)
    float(np.asarray(r)[0, 0])
    dt = (time.perf_counter() - t0) / 3
    total = N * TR * CHAIN * args.reps * ops_per_elem
    print(f"{label:6s} {total / dt / 1e12:8.3f} T elem-op/s "
          f"({dt * 1e3:.2f} ms for {total / 1e9:.1f} G ops)")
    return total / dt


def make_fma():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        a = jnp.float32(1.000001)
        b = jnp.float32(1e-7)
        for _ in range(CHAIN // 2):
            x = x * a + b  # 2 VPU ops
        o_ref[:] = x
    return kernel


def make_log():
    def kernel(x_ref, o_ref):
        x = x_ref[:] + 1.0
        for _ in range(CHAIN):
            x = jnp.log(x) + jnp.float32(2.0)  # 1 transcendental + 1 add
        o_ref[:] = x
    return kernel


def make_rng():
    def kernel(x_ref, o_ref):
        acc = x_ref[:]
        for i in range(CHAIN):
            key = _mix_key(7, 1, i, 0, 3)
            acc = acc + _u01_t(key, (N, TR))  # one full hash draw
        o_ref[:] = acc
    return kernel


print(f"# VPU roofline probe: [{N}, {TR}] f32 tiles, chain={CHAIN}")
fma = bench(make_fma, 1, "fma")
log = bench(make_log, 2, "log+add") / 2  # per op-pair; report per chain step
rng = bench(make_rng, 1, "rng")  # per DRAW (one _u01_t = ~12 int ops)
print(f"# per-element rates: fma {fma/1e12:.3f} T/s, "
      f"log-step {log/1e12:.3f} T/s, hash-draw {rng/1e9:.1f} G draws/s")
