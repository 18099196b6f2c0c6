"""Donor-acceptor distance transformations for the hydronium/water model.

Re-provides the reference's distance-rescaling stack (topo/topology.py:260-353 and
the in-kernel water conversions of cython_exts/LMC/PBCHelper.pyx:278-351) as pure
elementwise jnp functions, so they fuse into the rate-matrix evaluation:

* ReLUTransformation — piecewise b / a(d-d0)+b inside [left, right] bounds,
* LinearTransformation — a·d + b inside bounds (AtomBoxWaterLinearConversion),
* InterpolatedTransformation — table lookup, flat y_min below the table,
  identity above it (topology.py:295-334),
* DistanceInterpolator — linear-in-residence-time blend neutral -> relaxed
  (topology.py:337-353).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _pytree(cls=None, *, data_fields):
    if cls is None:
        return partial(_pytree, data_fields=data_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=[]
    )


@_pytree(data_fields=["a", "b", "d0", "left_bound", "right_bound"])
class ReLUTransformation:
    """b below d0, a(d-d0)+b above; identity outside [left_bound, right_bound]
    (topology.py:271-292, PBCHelper.pyx:327-351 'ramp' conversion)."""

    a: Array
    b: Array
    d0: Array
    left_bound: Array
    right_bound: Array

    def __call__(self, distances: Array) -> Array:
        rescaled = jnp.where(
            distances < self.d0, self.b, self.a * (distances - self.d0) + self.b
        )
        outside = (distances <= self.left_bound) | (self.right_bound <= distances)
        return jnp.where(outside, distances, rescaled)


@_pytree(data_fields=["a", "b", "left_bound", "right_bound"])
class LinearTransformation:
    """a·d + b inside (left_bound, right_bound), identity outside
    (AtomBoxWaterLinearConversion, PBCHelper.pyx:306-324)."""

    a: Array
    b: Array
    left_bound: Array
    right_bound: Array

    def __call__(self, distances: Array) -> Array:
        inside = (self.left_bound < distances) & (distances < self.right_bound)
        return jnp.where(inside, self.a * distances + self.b, distances)


@_pytree(data_fields=["x", "y"])
class InterpolatedTransformation:
    """Linear table interpolation with the reference's clamp semantics
    (topology.py:329-334): values inside [x0, x_last] are interpolated, values
    below map to y[0], values above stay unchanged."""

    x: Array
    y: Array

    @classmethod
    def from_file(cls, dist_array_filename: str, conversion_array_filename: str):
        return cls(
            x=jnp.asarray(np.load(dist_array_filename), dtype=jnp.float32),
            y=jnp.asarray(np.load(conversion_array_filename), dtype=jnp.float32),
        )

    def __call__(self, distances: Array) -> Array:
        interped = jnp.interp(distances, self.x, self.y)
        out = jnp.where(distances > self.x[-1], distances, interped)
        return jnp.where(distances < self.x[0], self.y[0], out)


@_pytree(data_fields=["relaxation_time"])
class DistanceInterpolator:
    """Blend neutral -> relaxed distances linearly over the residence time of the
    proton on the donor site (topology.py:337-353). residence_time < 0 encodes
    "never jumped" and maps to fully relaxed (the reference's np.inf)."""

    relaxation_time: Array

    def __call__(
        self, residence_time: Array, distance_neutral: Array, distance_relaxed: Array
    ) -> Array:
        ratio = jnp.where(
            residence_time < 0,
            1.0,
            jnp.minimum(residence_time / self.relaxation_time, 1.0),
        )
        return (1.0 - ratio) * distance_neutral + ratio * distance_relaxed


TRANSFORM_REGISTRY = {
    "ReLUTransformation": ReLUTransformation,
    "LinearTransformation": LinearTransformation,
    "InterpolatedTransformation": InterpolatedTransformation,
}
