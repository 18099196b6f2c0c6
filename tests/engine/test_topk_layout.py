"""Sites-major ("cols") state layout of the top-K kernel (ops/topk_sweep.py).

On hardware the cols layout removes the lane padding that dominates the
small-N top-K event loop (N=144 pads to 256 lanes rows-major; every [TR, 1]
and [TR, K] scalar pads to 128 lanes). RNG draws are element-identical per
(replica, site/slot) via _u01_t, but rate-sum reduction ORDER differs
between layouts (XLA reduces [TR, N] axis-1 and [N, TR] axis-0 with
different strategies even in interpret mode), so clock times can differ in
ulps: the contract — as for the dense streamed and water kernels — is
identical integer outcomes at these sizes plus float agreement to reduction
tolerance, with exact equality only WITHIN a layout (chunk invariance,
delta == full refresh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.ops import topk_sweep as ts
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import HydroniumRates, TopKPairRates
from cmdlmc_tpu.topo.transforms import DistanceInterpolator, ReLUTransformation

N, P, R, B = 24, 9, 8, 40
LAW = Fermi(a=jnp.float32(0.2), b=jnp.float32(2.5), c=jnp.float32(0.4))

KEYS = ("occ", "labels", "sites", "tlast", "tlast_site", "disp_base",
        "u_rem", "ev_count", "site_disp", "prev_pos", "trunc")


def build(seed=0, *, hist_bins=0, track_matrix=False, triclinic=False):
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 9.0, size=(N, 3)).astype(np.float32)
    walk = np.cumsum(
        rng.normal(scale=0.25, size=(B, N, 3)).astype(np.float32), axis=0
    )
    block = base[None] + walk
    if triclinic:
        h = np.array([[9.0, 0, 0], [0.7, 9.0, 0], [0.4, 0.3, 9.0]],
                     np.float32).T
        cell = Cell(h=jnp.asarray(h), h_inv=jnp.asarray(np.linalg.inv(h)),
                    orthorhombic=False)
    else:
        cell = Cell.cubic([9.0, 9.0, 9.0])
    ens = eng.init_replicas(
        jax.random.fold_in(jax.random.key(3), 0), R, N, P, jnp.asarray(base),
        hist_bins=hist_bins, track_jump_matrix=track_matrix,
    )
    return cell, ens, jnp.asarray(block)


def run(model, ens, block, layout, frame0=0, cmax=None, **kw):
    return ts.run_block_topk(
        model, ens, block, frame0, dt=0.5, max_events=4, seed=7, tile=4,
        interpret=True, cmax=cmax, layout=layout, hist_range=(2.0, 3.0), **kw
    )


def assert_same(a, b, keys=KEYS):
    """Bit-exact for every integer outcome; reduction-order tolerance for
    clock/displacement floats (the event SEQUENCE must agree — only times
    accumulated through differently-ordered rate sums may drift in ulps)."""
    for key in keys:
        x, y = np.asarray(a[key]), np.asarray(b[key])
        if np.issubdtype(x.dtype, np.integer):
            np.testing.assert_array_equal(x, y, err_msg=key)
        else:
            np.testing.assert_allclose(x, y, rtol=2e-6, atol=1e-4,
                                       err_msg=key)


def assert_exact(a, b, keys=KEYS):
    for key in keys:
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(b[key]), err_msg=key
        )


def test_cols_matches_rows_interpret():
    cell, ens, block = build()
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(2.0), k=6)
    out_r = run(model, ens, block, "rows")
    out_c = run(model, ens, block, "cols")
    assert np.asarray(out_c["ev_count"]).sum() > 0
    assert_same(out_r, out_c)


def test_cols_histograms_and_jump_matrix():
    cell, ens, block = build(hist_bins=6, track_matrix=True)
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(2.0), k=6)
    out_r = run(model, ens, block, "rows")
    out_c = run(model, ens, block, "cols")
    assert_same(out_r, out_c, KEYS + ("jump_hist",))
    assert np.asarray(out_c["jump_hist"]).sum() > 0
    np.testing.assert_allclose(
        np.asarray(out_r["exposure"]), np.asarray(out_c["exposure"]),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(out_r["jump_matrix"]), np.asarray(out_c["jump_matrix"])
    )


def test_cols_triclinic_and_hydronium_interp():
    cell, ens, block = build(triclinic=True)
    transform = ReLUTransformation(
        a=jnp.float32(0.5), b=jnp.float32(2.4), d0=jnp.float32(2.4),
        left_bound=jnp.float32(2.0), right_bound=jnp.float32(3.3),
    )
    model = HydroniumRates(
        cell=cell, law=LAW, cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0),
        transform=transform,
        interpolator=DistanceInterpolator(relaxation_time=jnp.float32(5.0)),
        k=4,
    )
    out_r = run(model, ens, block, "rows")
    out_c = run(model, ens, block, "cols")
    assert np.asarray(out_c["ev_count"]).sum() > 0
    assert_same(out_r, out_c)


def test_cols_delta_matches_full_refresh():
    cell, ens, block = build()
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(2.0), k=6)
    full = run(model, ens, block, "cols", cmax=-1)
    delta = run(model, ens, block, "cols")
    assert_exact(full, delta)


def test_cols_chunk_invariance():
    """Two half-blocks through the cols kernel == one full block: RNG keyed
    by absolute frame, occ[nbr] scratch rebuilt exactly at chunk entry."""
    cell, ens, block = build()
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(2.0), k=6)
    full = run(model, ens, block, "cols")

    half1 = run(model, ens, block[: B // 2], "cols")
    rep1 = dataclasses.replace(
        ens.replicas,
        occ=half1["occ"], proton_of_site=half1["labels"],
        site_of_proton=half1["sites"], t_last_jump=half1["tlast"],
        disp_base=half1["disp_base"],
        clock=dataclasses.replace(
            ens.replicas.clock, u_remaining=half1["u_rem"],
            event_count=half1["ev_count"],
        ),
    )
    ens1 = dataclasses.replace(
        ens, replicas=rep1, site_disp=half1["site_disp"],
        prev_pos=half1["prev_pos"],
    )
    half2 = run(model, ens1, block[B // 2:], "cols", frame0=B // 2)
    for key in ("occ", "sites", "ev_count"):
        np.testing.assert_array_equal(
            np.asarray(full[key]), np.asarray(half2[key]), err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(full["disp_base"]), np.asarray(half2["disp_base"]),
        atol=1e-5,
    )


def test_layout_auto_rule():
    assert ts.pick_layout_topk(144, False) == "cols"
    assert ts.pick_layout_topk(216, False) == "cols"
    assert ts.pick_layout_topk(4608, False) == "rows"  # N % 128 == 0
    assert ts.pick_layout_topk(144, True) == "rows"  # interpret oracle
