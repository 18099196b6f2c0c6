# Debug scratchpad runner: forces CPU before jax import (sitecustomize pins axon).
import os

pass

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from cmdlmc_tpu.core import Cell, distance

np.random.seed(0)
cub = Cell.cubic([10.0, 10, 10])
tri = Cell.triclinic([10, 0, 0, 0, 10, 0, 0, 0, 10])
a = np.random.uniform(-20, 20, size=(5, 3)).astype(np.float32)
b = np.random.uniform(-20, 20, size=(5, 3)).astype(np.float32)
print("cubic", distance(cub, a, b))
print("tri  ", distance(tri, a, b))
print("h\n", tri.h, "\nhinv\n", tri.h_inv)
