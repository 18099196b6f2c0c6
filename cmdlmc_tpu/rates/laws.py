"""Jump-rate laws: vectorized pure functions of geometric collective variables.

Covers the reference's active laws (LMC/jumprate_generators.py:14-43) and the
legacy capabilities that only survive in its config help text
(IO/config_parser.py:322-349): AE/Arrhenius rates from an activation-energy fit,
and plain exponential rates. All are elementwise jnp expressions, so they fuse
into whatever kernel evaluates the rate matrix.

Units follow the reference: distances in Å, rates in fs^-1, temperatures in K,
activation energies in eV (k_B in eV/K).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

KB_EV_PER_K = 8.617333262e-5  # Boltzmann constant, eV / K


def _pytree_law(cls=None, *, data_fields):
    """Register a rate-law dataclass as a pytree so laws can be passed through
    jit boundaries and swapped without retracing shapes."""
    if cls is None:
        return partial(_pytree_law, data_fields=data_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=[]
    )


@_pytree_law(data_fields=["a", "b", "c"])
class Fermi:
    """ω(d) = a / (1 + exp((d - b) / c)) — the MD-rates Fermi step function
    (jumprate_generators.py:14-34). a: amplitude (fs^-1), b: location (Å),
    c: width (Å)."""

    a: Array
    b: Array
    c: Array

    uses_angle = False

    def __call__(self, distance: Array, angle: Array | None = None) -> Array:
        return self.a / (1.0 + jnp.exp((distance - self.b) / self.c))


@_pytree_law(data_fields=["a", "b", "c", "theta"])
class FermiAngle:
    """Fermi rate gated to zero below an angle threshold θ (radians)
    (jumprate_generators.py:37-43)."""

    a: Array
    b: Array
    c: Array
    theta: Array

    uses_angle = True

    def __call__(self, distance: Array, angle: Array) -> Array:
        fermi = self.a / (1.0 + jnp.exp((distance - self.b) / self.c))
        return jnp.where(angle < self.theta, 0.0, fermi)


@_pytree_law(data_fields=["A", "a", "b", "d0", "T"])
class ActivationEnergy:
    """Arrhenius rates from a distance-dependent activation energy fit — the
    legacy "AE_rates" law (IO/config_parser.py:330-346):

        E(d) = a (d - d0) / sqrt(b + 1 / (d - d0)^2),   clamped at E >= 0
        ω(d) = A exp(-E(d) / (k_B T))

    A in fs^-1, a in eV/Å, d0 in Å, T in K.
    """

    A: Array
    a: Array
    b: Array
    d0: Array
    T: Array

    uses_angle = False

    def __call__(self, distance: Array, angle: Array | None = None) -> Array:
        dd = distance - self.d0
        # guard the 1/dd^2 pole: at d == d0 the energy is exactly zero
        safe = jnp.where(jnp.abs(dd) > 1e-6, dd, 1e-6)
        energy = self.a * dd / jnp.sqrt(self.b + 1.0 / (safe * safe))
        energy = jnp.maximum(energy, 0.0)
        return self.A * jnp.exp(-energy / (KB_EV_PER_K * self.T))


@_pytree_law(data_fields=["a", "b"])
class Exponential:
    """ω(d) = a exp(b d) — the legacy "Exponential_rates" law
    (IO/config_parser.py:347-349)."""

    a: Array
    b: Array

    uses_angle = False

    def __call__(self, distance: Array, angle: Array | None = None) -> Array:
        return self.a * jnp.exp(self.b * distance)


@_pytree_law(data_fields=["a"])
class Constant:
    """Distance-independent rate — the minimal end-to-end slice (BASELINE.json
    config 1) and the constant-rate oracle used by the KMC property tests."""

    a: Array

    uses_angle = False

    def __call__(self, distance: Array, angle: Array | None = None) -> Array:
        return jnp.broadcast_to(jnp.asarray(self.a), jnp.shape(distance))


LAW_REGISTRY = {
    "Constant": Constant,
    "Fermi": Fermi,
    "FermiAngle": FermiAngle,
    "ActivationEnergy": ActivationEnergy,
    "AE": ActivationEnergy,
    "Exponential": Exponential,
}
