"""Observable computations over ensemble state.

The accumulation state itself lives inside the engine (ReplicaState /
EnsembleState — displacement bookkeeping is O(events), see engine/lattice.py);
this package provides the read-out API:

* msd / autocorrelation (reference LMC/output.py semantics),
* higher displacement moments (the legacy ``higher_msd`` capability,
  IO/config_parser.py:352-356),
* across-replica Welford statistics (utils/stats.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from cmdlmc_tpu.engine.lattice import (
    EnsembleState,
    observables_of,
    proton_displacement,
)
from cmdlmc_tpu.utils.stats import Welford

__all__ = [
    "EnsembleState",
    "Welford",
    "autocorrelation",
    "displacement_moments",
    "mean_square_displacement",
    "observables_of",
    "proton_displacement",
]


def mean_square_displacement(ens: EnsembleState):
    """Per-replica MSD per cartesian component, [R, 3]."""
    msd, _ = observables_of(ens.replicas, ens.site_disp)
    return msd


def autocorrelation(ens: EnsembleState):
    """Covalent-bond autocorrelation: protons still on their reset-time site,
    per replica (output.py:6-14)."""
    _, auto = observables_of(ens.replicas, ens.site_disp)
    return auto


def displacement_moments(ens: EnsembleState, orders=(2, 4)):
    """Higher moments of the per-proton displacement magnitude — the legacy
    ``higher_msd`` capability: for each requested order m, the per-replica mean
    of |disp|^m over protons. Returns dict {order: [R] array}."""
    disp = proton_displacement(ens.replicas, ens.site_disp)
    r2 = jnp.sum(disp * disp, axis=-1)  # [R, P]
    out = {}
    for m in orders:
        out[m] = jnp.mean(r2 ** (m / 2.0), axis=-1)
    return out
