"""Freeze golden observable curves for the five BASELINE.json configurations.

Runs every scenario in tests/golden/scenarios.py on CPU with fixed seeds and
writes tests/golden/<name>.npz. Commit the outputs; test_golden.py then
asserts future engines reproduce them (BASELINE.md plan).

    python tools/make_golden.py [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests", "golden"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import scenarios  # noqa: E402


def main(argv):
    names = argv or list(scenarios.SCENARIOS)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    for name in names:
        print(f"running {name} ...", flush=True)
        data = scenarios.run_scenario(name)
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **data)
        print(f"  wrote {path}: " + ", ".join(
            f"{k}{v.shape}" for k, v in data.items()))


if __name__ == "__main__":
    main(sys.argv[1:])
