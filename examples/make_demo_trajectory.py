"""Generate the synthetic solid-acid-like demo trajectory used by the example
configs: 8 P atoms, each with 4 surrounding O donors, jittering over 2000
frames in a 12 A cubic box."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cmdlmc_tpu.io.converters import save_xyz_to_hdf5
from cmdlmc_tpu.io.xyz import write_xyz_frame

here = os.path.dirname(os.path.abspath(__file__))
rng = np.random.RandomState(0)
p = rng.uniform(0, 12, size=(8, 3))
off = np.array([[1.3, 0, 0], [-1.3, 0, 0], [0, 1.3, 0], [0, -1.3, 0]])
base = np.vstack([p, (p[:, None, :] + off[None]).reshape(-1, 3)])
names = ["P"] * 8 + ["O"] * 32
xyz = os.path.join(here, "demo.xyz")
with open(xyz, "w") as f:
    x = base.copy()
    for _ in range(2000):
        x = base + 0.9 * (x - base) + rng.normal(scale=0.04, size=base.shape)
        write_xyz_frame(f, names, x)
save_xyz_to_hdf5(xyz)
print("wrote", xyz, "and demo.hdf5")
