"""Incremental occ[nbr] maintenance in the top-K kernel (VERDICT r2 #2): the
delta-refresh path (stage-1 change detection + O(K*N*C) in-kernel column
refresh) must be bit-identical to the full per-frame O(K*N^2) gather, on
trajectories with real candidate-identity churn, across all CMAX regimes
(skip / delta / full fallback) and under chunking."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.ops import topk_sweep as ts
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import TopKPairRates

N, P, R, B = 24, 9, 8, 40


def build(drift_scale=0.25, seed=0):
    """A drifting trajectory: large per-frame jitter so K-nearest identities
    genuinely churn between frames."""
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 9.0, size=(N, 3)).astype(np.float32)
    walk = np.cumsum(
        rng.normal(scale=drift_scale, size=(B, N, 3)).astype(np.float32),
        axis=0,
    )
    block = base[None] + walk
    cell = Cell.cubic([9.0, 9.0, 9.0])
    model = TopKPairRates(
        cell=cell,
        law=Fermi(a=jnp.float32(0.2), b=jnp.float32(2.5), c=jnp.float32(0.4)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(2.0), k=6,
    )
    ens = eng.init_replicas(
        jax.random.fold_in(jax.random.key(3), 0), R, N, P, jnp.asarray(base)
    )
    return model, ens, jnp.asarray(block)


def run(model, ens, block, frame0=0, cmax=None):
    return ts.run_block_topk(
        model, ens, block, frame0, dt=0.5, max_events=4, seed=7, tile=4,
        interpret=True, cmax=cmax,
    )


KEYS = ("occ", "labels", "sites", "tlast", "disp_base", "u_rem", "ev_count",
        "site_disp", "prev_pos", "trunc")


def assert_same(a, b):
    for key in KEYS:
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(b[key]), err_msg=key
        )


def test_identity_churn_is_real():
    """The fixture actually exercises the delta path: identities change on
    most frames, and the change counts span the delta regime."""
    model, _, block = build()
    _, _, _, _, _, _, mode = ts.topk_tables_delta(
        model, block, ts._pad_k(6), True, ts.default_cmax(N)
    )
    mode = np.asarray(mode)
    assert (mode == 1).sum() >= B // 2, mode


def test_delta_matches_full_refresh():
    model, ens, block = build()
    full = run(model, ens, block, cmax=-1)
    delta = run(model, ens, block)  # default cmax
    assert_same(full, delta)


def test_small_cmax_falls_back_to_full():
    """When more columns change than CMAX can carry, stage 1 flags mode 2 and
    the kernel takes the full-refresh path — still bit-identical."""
    model, ens, block = build(drift_scale=0.8)
    _, _, _, _, _, _, mode = ts.topk_tables_delta(
        model, block, ts._pad_k(6), True, 2
    )
    assert (np.asarray(mode) == 2).sum() >= B // 2
    full = run(model, ens, block, cmax=-1)
    tiny = run(model, ens, block, cmax=2)
    assert_same(full, tiny)


def test_static_frames_skip_refresh_exactly():
    """Static positions: identities never change (mode 0 after frame 0); the
    per-event increments alone must keep occ[nbr] exact."""
    model, ens, _ = build()
    rng = np.random.RandomState(5)
    base = rng.uniform(0, 9.0, size=(N, 3)).astype(np.float32)
    static = jnp.broadcast_to(jnp.asarray(base), (B, N, 3))
    _, _, _, _, _, _, mode = ts.topk_tables_delta(
        model, static, ts._pad_k(6), True, ts.default_cmax(N)
    )
    assert np.all(np.asarray(mode)[1:] == 0)
    full = run(model, ens, static, cmax=-1)
    fast = run(model, ens, static)
    assert_same(full, fast)


def test_delta_is_chunk_invariant():
    model, ens, block = build()
    whole = run(model, ens, block)
    half = run(model, ens, block[: B // 2])
    ens_mid = dataclasses.replace(
        ens,
        replicas=dataclasses.replace(
            ens.replicas,
            occ=half["occ"],
            proton_of_site=jnp.round(half["labels"]).astype(jnp.int32),
            site_of_proton=half["sites"],
            t_last_jump=half["tlast"],
            disp_base=half["disp_base"],
            clock=dataclasses.replace(
                ens.replicas.clock,
                u_remaining=half["u_rem"],
                event_count=half["ev_count"],
            ),
        ),
        site_disp=half["site_disp"],
        prev_pos=half["prev_pos"],
    )
    rest = run(model, ens_mid, block[B // 2 :], frame0=B // 2)
    for key in ("occ", "sites", "ev_count", "site_disp"):
        np.testing.assert_array_equal(
            np.asarray(whole[key]), np.asarray(rest[key]), err_msg=key
        )
