"""Periodic simulation cell and minimum-image geometry as pure JAX ops.

TPU-native replacement for the reference's Cython geometry layer
(cython_exts/LMC/PBCHelper.pyx:25-351, cython_exts/atoms/numpyatom.pyx:22-291):

* cubic minimum image is the closed form ``d - L * round(d / L)`` instead of the
  reference's while-loop wrap (numpyatom.pyx:33-42) — identical for inputs within a
  few box lengths, branch-free, and vectorizes onto the VPU;
* triclinic cells use fractional coordinates (h^-1 . d, round, h .) plus a 27-image
  minimum reduction, mirroring numpyatom.pyx:61-123 but as one batched reduction;
* the "extended box" (virtual supercell replication via ``box_multiplier``,
  PBCHelper.pyx:30-53) is index arithmetic, never materializing atoms;
* all-to-all distances broadcast into a single fused XLA op (see
  cmdlmc_tpu.ops.pairwise for the tiled Pallas kernel used on large systems).

Everything here is shape-polymorphic, jit-safe and differentiable.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Offsets of the 27 periodic images surrounding the home cell, used for the
# triclinic minimum-image search (numpyatom.pyx:101-123 does the same scan with
# scalar loops).
_IMAGE_SHIFTS = np.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=np.float32,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["h", "h_inv"],
    meta_fields=["orthorhombic"],
)
@dataclasses.dataclass(frozen=True)
class Cell:
    """A periodic simulation cell.

    ``h`` holds the cell vectors as *columns* so that cartesian = h @ fractional.
    ``orthorhombic`` is static metadata selecting the cheap closed-form minimum
    image; triclinic cells take the fractional + 27-image path.
    """

    h: Array
    h_inv: Array
    orthorhombic: bool = True

    # -- constructors ------------------------------------------------------------

    @classmethod
    def cubic(cls, lengths, box_multiplier=(1, 1, 1)) -> "Cell":
        """Orthorhombic cell from three box lengths (AtomBoxCubic, PBCHelper.pyx:213-239).

        ``box_multiplier`` extends the periodic boundaries for the virtual
        supercell, like PBCHelper.pyx:224-226.
        """
        lengths = jnp.asarray(lengths, dtype=jnp.float32).reshape(3)
        lengths = lengths * jnp.asarray(box_multiplier, dtype=jnp.float32)
        h = jnp.diag(lengths)
        h_inv = jnp.diag(1.0 / lengths)
        return cls(h=h, h_inv=h_inv, orthorhombic=True)

    @classmethod
    def triclinic(cls, box_vectors, box_multiplier=(1, 1, 1)) -> "Cell":
        """General cell from a flat array of 9 values or a (3, 3) array whose *rows*
        are the cell vectors (the reference's input convention: AtomBoxMonoclinic
        builds h with h[j, i] = pbc[3 i + j], PBCHelper.pyx:255-259)."""
        v = jnp.asarray(box_vectors, dtype=jnp.float32).reshape(3, 3)
        v = v * jnp.asarray(box_multiplier, dtype=jnp.float32)[:, None]
        h = v.T  # columns are cell vectors
        h_inv = jnp.linalg.inv(h)
        return cls(h=h, h_inv=h_inv, orthorhombic=False)

    @classmethod
    def from_parameter_array(cls, pbc, box_multiplier=(1, 1, 1)) -> "Cell":
        """Dispatch on the reference config convention: 3 values -> cubic,
        9 values -> triclinic (IO/config_parser.py pbc key: '3-or-9')."""
        pbc = np.asarray(pbc, dtype=np.float32).ravel()
        if pbc.size == 3:
            return cls.cubic(pbc, box_multiplier)
        if pbc.size == 9:
            return cls.triclinic(pbc, box_multiplier)
        raise ValueError(f"Expected 3 or 9 box parameters, got {pbc.size}")

    # -- convenience -------------------------------------------------------------

    @property
    def lengths(self) -> Array:
        """Per-axis box lengths (diagonal for orthorhombic cells)."""
        return jnp.linalg.norm(self.h, axis=0)

    @property
    def min_height(self) -> float:
        """Smallest perpendicular distance between opposite cell faces.

        The round-based fractional minimum image (the form the fused kernels
        use for triclinic cells) is exact only for vectors shorter than half
        this height; longer vectors need the 27-image search
        (numpyatom.pyx:101-123). Callers gate kernel applicability on it."""
        import numpy as _np

        h = _np.asarray(self.h, dtype=_np.float64)
        a, b, c = h[:, 0], h[:, 1], h[:, 2]
        volume = abs(_np.dot(a, _np.cross(b, c)))
        areas = _np.array([
            _np.linalg.norm(_np.cross(b, c)),
            _np.linalg.norm(_np.cross(c, a)),
            _np.linalg.norm(_np.cross(a, b)),
        ])
        return float((volume / areas).min())


# --------------------------------------------------------------------------------
# Minimum image / displacement / distance
# --------------------------------------------------------------------------------


def minimum_image(cell: Cell, dvec: Array) -> Array:
    """Wrap a raw difference vector (or batch of them, trailing dim 3) into the
    minimum-image convention."""
    if cell.orthorhombic:
        lengths = jnp.diagonal(cell.h)
        return dvec - lengths * jnp.round(dvec / lengths)
    # Triclinic: wrap into the home cell first (numpyatom.pyx:61-74) ...
    frac = dvec @ cell.h_inv.T
    frac = frac - jnp.round(frac)
    base = frac @ cell.h.T
    # ... then take the shortest among the 27 surrounding images
    # (numpyatom.pyx:101-123).
    shifts = jnp.asarray(_IMAGE_SHIFTS, dtype=base.dtype) @ cell.h.T  # (27, 3)
    candidates = base[..., None, :] + shifts  # (..., 27, 3)
    norms = jnp.sum(candidates * candidates, axis=-1)
    best = jnp.argmin(norms, axis=-1)
    return jnp.take_along_axis(candidates, best[..., None, None], axis=-2).squeeze(-2)


def wrap_positions(cell: Cell, pos: Array) -> Array:
    """Wrap absolute positions into the home cell [0, L) per axis (fractional
    coordinates in [0, 1) for triclinic cells) — the legacy ``periodic_wrap``
    output option (IO/config_parser.py:294-299)."""
    if cell.orthorhombic:
        lengths = jnp.diagonal(cell.h)
        return pos - lengths * jnp.floor(pos / lengths)
    frac = pos @ cell.h_inv.T
    frac = frac - jnp.floor(frac)
    return frac @ cell.h.T


def displacement(cell: Cell, r1: Array, r2: Array) -> Array:
    """Minimum-image displacement r2 - r1 (the reference's ``AtomBox.distance``
    sign convention, PBCHelper.pyx:56-70 / numpyatom.pyx:33-42)."""
    return minimum_image(cell, jnp.asarray(r2) - jnp.asarray(r1))


def distance(cell: Cell, r1: Array, r2: Array) -> Array:
    """Minimum-image scalar distance (``AtomBox.length``, PBCHelper.pyx:74-85)."""
    d = displacement(cell, r1, r2)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def pairwise_distances(cell: Cell, a: Array, b: Array) -> Array:
    """All-to-all minimum-image distance matrix of shape (len(a), len(b))
    (``AtomBox.length_all_to_all``, PBCHelper.pyx:88-95)."""
    d = displacement(cell, a[:, None, :], b[None, :, :])
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def angle(cell: Cell, r1: Array, r2: Array, r3: Array) -> Array:
    """Angle (radians) at vertex ``r2`` between ``r1`` and ``r3`` under PBC.

    Matches ``AtomBox.angle`` (PBCHelper.pyx:133-137, 237-239): the angle between
    the minimum-image vectors r1 - r2 and r3 - r2.
    """
    v1 = displacement(cell, r2, r1)
    v2 = displacement(cell, r2, r3)
    num = jnp.sum(v1 * v2, axis=-1)
    den = jnp.sqrt(jnp.sum(v1 * v1, axis=-1) * jnp.sum(v2 * v2, axis=-1))
    return jnp.arccos(jnp.clip(num / den, -1.0, 1.0))


def next_neighbor(cell: Cell, pos: Array, others: Array) -> tuple[Array, Array]:
    """Index and distance of the closest atom in ``others``
    (``AtomBox.next_neighbor``, PBCHelper.pyx:153-167)."""
    dists = distance(cell, pos[None, :], others)
    idx = jnp.argmin(dists)
    return idx, dists[idx]


# --------------------------------------------------------------------------------
# Extended (virtual super-) box
# --------------------------------------------------------------------------------


def extended_positions(base_cell_vectors: Array, positions: Array, multiplier) -> Array:
    """Materialized positions of the virtual supercell, ordered exactly like the
    reference's extended-box index arithmetic (PBCHelper.pyx:39-53):
    ``index = box_index * n_atoms + atom_index`` with box_index decomposed
    row-major over (mx, my, mz).

    ``base_cell_vectors`` is (3, 3) with *rows* as the unextended cell vectors.
    Intended for output/analysis paths; the engine itself keeps the supercell
    virtual by translating replica copies on the fly.
    """
    mx, my, mz = (int(m) for m in multiplier)
    v = jnp.asarray(base_cell_vectors, dtype=positions.dtype).reshape(3, 3)
    shifts = jnp.stack(
        [
            i * v[0] + j * v[1] + k * v[2]
            for i in range(mx)
            for j in range(my)
            for k in range(mz)
        ]
    )  # (mx*my*mz, 3)
    out = shifts[:, None, :] + positions[None, :, :]
    return out.reshape(-1, 3)
