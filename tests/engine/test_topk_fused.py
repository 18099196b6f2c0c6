"""Fused top-K sweep kernel (interpret mode on CPU): TopKPairRates and
HydroniumRates (relaxation blend, transforms incl. interpolated tables)
against the XLA scan engine, plus state invariants and histogram support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import fused, lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, HydroniumRates, PairRates, TopKPairRates
from cmdlmc_tpu.topo.transforms import (
    DistanceInterpolator,
    InterpolatedTransformation,
    ReLUTransformation,
)

R = 64
DT = 0.5


def make_frames(n_sites, n_frames, box, seed=3):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0, box * 0.9, size=(n_sites, 3)).astype(np.float32)
    return (
        pos[None] + rng.normal(scale=0.04, size=(n_frames, n_sites, 3))
    ).astype(np.float32)


def frame_struct(frames_np, dt=DT):
    F = frames_np.shape[0]
    idx = jnp.arange(F, dtype=jnp.int32)
    return Frame(
        donors=jnp.asarray(frames_np), extras=None,
        time=idx.astype(jnp.float32) * dt, index=idx,
    )


def init(n_sites, n_protons, first_positions, hist_bins=0, seed=0):
    key = jax.random.key(seed)
    ens = eng.init_replicas(
        jax.random.fold_in(key, 0), R, n_sites, n_protons,
        jnp.asarray(first_positions), hist_bins=hist_bins,
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), R)
    return ens, keys


def run_both(model, cell, frames_np, n_protons, hist_bins=0):
    n_sites = frames_np.shape[1]
    ens0, keys = init(n_sites, n_protons, frames_np[0], hist_bins=hist_bins)
    assert fused.fused_supported(model, cell, ens0), (
        fused.fused_unsupported_reason(model, cell, ens0))
    ens_f = fused.run_block_fused(
        model, cell, ens0, jnp.asarray(frames_np), 0, dt=DT, seed=2,
        tile=32, interpret=True,
    )
    ens_x, _ = eng.run_block(
        model, cell, ens0, keys, frame_struct(frames_np), dt=DT,
        emit_every=frames_np.shape[0],
    )
    return ens_f, ens_x


def events_of(ens):
    return np.asarray(ens.replicas.clock.event_count, float)


def assert_event_match(ens_f, ens_x, label=""):
    ev_f, ev_x = events_of(ens_f), events_of(ens_x)
    assert ev_f.mean() > 0.5, label
    se = np.sqrt(ev_f.var(ddof=1) / R + ev_x.var(ddof=1) / R) + 1e-9
    assert abs(ev_f.mean() - ev_x.mean()) < 5 * se, (
        label, ev_f.mean(), ev_x.mean(), se)


def assert_msd_match(ens_f, ens_x, label=""):
    msd_f, _ = eng.observables_of(ens_f.replicas, ens_f.site_disp)
    msd_x, _ = eng.observables_of(ens_x.replicas, ens_x.site_disp)
    tot_f = np.asarray(msd_f).sum(axis=1)
    tot_x = np.asarray(msd_x).sum(axis=1)
    se = np.sqrt(tot_f.var(ddof=1) / R + tot_x.var(ddof=1) / R) + 1e-9
    assert abs(tot_f.mean() - tot_x.mean()) < 5 * se, (
        label, tot_f.mean(), tot_x.mean(), se)


LAW = Fermi(a=jnp.float32(0.08), b=jnp.float32(3.2), c=jnp.float32(0.3))


def test_topk_pair_rates_fused_matches_scan():
    frames_np = make_frames(16, 150, 10.0)
    cell = Cell.cubic([10.0] * 3)
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(1.5), k=8)
    ens_f, ens_x = run_both(model, cell, frames_np, n_protons=6)
    assert_event_match(ens_f, ens_x, "topk-pair")
    assert_msd_match(ens_f, ens_x, "topk-pair")


def test_topk_invariants():
    frames_np = make_frames(12, 100, 10.0)
    cell = Cell.cubic([10.0] * 3)
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(1.5), k=8)
    ens_f, _ = run_both(model, cell, frames_np, n_protons=4)
    rep = ens_f.replicas
    occ = np.asarray(rep.occ)
    np.testing.assert_allclose(occ.sum(axis=1), 4, atol=1e-5)
    pos_map = np.asarray(rep.proton_of_site)
    site_map = np.asarray(rep.site_of_proton)
    for r in range(R):
        np.testing.assert_array_equal((pos_map[r] > 0).astype(float), occ[r])
        np.testing.assert_array_equal(
            pos_map[r][site_map[r]], np.arange(1, 5)
        )


def test_topk_k16_fused_matches_dense_fused():
    """K that covers every in-range neighbor: the top-K kernel must reproduce
    dense PairRates statistics (the Verlet == brute-force property)."""
    frames_np = make_frames(14, 150, 10.0)
    cell = Cell.cubic([10.0] * 3)
    dense = PairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                      buffer=jnp.float32(1.5))
    topk = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                         buffer=jnp.float32(1.5), k=13)
    ens0, _ = init(14, 5, frames_np[0])
    ens_d = fused.run_block_fused(dense, cell, ens0, jnp.asarray(frames_np),
                                  0, dt=DT, seed=2, tile=32, interpret=True)
    ens_k = fused.run_block_fused(topk, cell, ens0, jnp.asarray(frames_np),
                                  0, dt=DT, seed=2, tile=32, interpret=True)
    assert_event_match(ens_k, ens_d, "k16-vs-dense")
    assert_msd_match(ens_k, ens_d, "k16-vs-dense")


def hydronium_model(cell, transform, interp):
    return HydroniumRates(
        cell=cell, law=LAW, cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
        transform=transform, interpolator=interp, k=4,
    )


def test_hydronium_plain_topk_matches_scan():
    frames_np = make_frames(16, 150, 10.0)
    cell = Cell.cubic([10.0] * 3)
    model = hydronium_model(cell, None, None)
    ens_f, ens_x = run_both(model, cell, frames_np, n_protons=5)
    assert_event_match(ens_f, ens_x, "hydronium-plain")


def test_hydronium_relaxation_matches_scan():
    frames_np = make_frames(16, 150, 10.0)
    cell = Cell.cubic([10.0] * 3)
    transform = ReLUTransformation(
        a=jnp.float32(0.5), b=jnp.float32(2.4), d0=jnp.float32(2.4),
        left_bound=jnp.float32(2.0), right_bound=jnp.float32(3.3),
    )
    interp = DistanceInterpolator(relaxation_time=jnp.float32(20.0))
    model = hydronium_model(cell, transform, interp)
    ens_f, ens_x = run_both(model, cell, frames_np, n_protons=5)
    assert_event_match(ens_f, ens_x, "hydronium-relax")
    assert_msd_match(ens_f, ens_x, "hydronium-relax")


def test_hydronium_relaxation_changes_dynamics():
    """The residence-time blend must actually matter: instantaneous-relaxed
    vs slow-relaxation runs differ in event rate on the fused path."""
    frames_np = make_frames(16, 150, 10.0)
    cell = Cell.cubic([10.0] * 3)
    # strong rescale: shorten all in-range distances (raises rates)
    transform = ReLUTransformation(
        a=jnp.float32(0.2), b=jnp.float32(2.2), d0=jnp.float32(2.2),
        left_bound=jnp.float32(0.5), right_bound=jnp.float32(4.0),
    )
    inst = hydronium_model(cell, transform, None)
    slow = hydronium_model(
        cell, transform, DistanceInterpolator(relaxation_time=jnp.float32(1e5))
    )
    ens0, _ = init(16, 5, frames_np[0])
    ens_i = fused.run_block_fused(inst, cell, ens0, jnp.asarray(frames_np),
                                  0, dt=DT, seed=2, tile=32, interpret=True)
    ens_s = fused.run_block_fused(slow, cell, ens0, jnp.asarray(frames_np),
                                  0, dt=DT, seed=2, tile=32, interpret=True)
    # slow relaxation: after the first jump a proton sees (longer) neutral
    # distances for a long time -> fewer events than instantaneous relaxed
    assert events_of(ens_s).mean() < 0.9 * events_of(ens_i).mean()


def test_hydronium_interpolated_table_matches_scan():
    """Tabulated (InterpolatedTransformation) rescaling runs fused — the
    tables are evaluated by XLA in the shared stage (VERDICT round-1 item)."""
    frames_np = make_frames(16, 120, 10.0)
    cell = Cell.cubic([10.0] * 3)
    xs = jnp.linspace(2.0, 3.5, 31)
    ys = xs - 0.3 * jnp.exp(-((xs - 2.6) ** 2) / 0.08)  # dip near 2.6 A
    transform = InterpolatedTransformation(x=xs, y=ys)
    interp = DistanceInterpolator(relaxation_time=jnp.float32(10.0))
    model = hydronium_model(cell, transform, interp)
    ens_f, ens_x = run_both(model, cell, frames_np, n_protons=5)
    assert_event_match(ens_f, ens_x, "hydronium-table")


def test_topk_histograms_match_scan():
    frames_np = make_frames(16, 120, 10.0)
    cell = Cell.cubic([10.0] * 3)
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(1.5), k=8)
    ens_f, ens_x = run_both(model, cell, frames_np, n_protons=6, hist_bins=6)
    h_f = np.asarray(ens_f.replicas.jump_hist, float).sum(axis=0)
    h_x = np.asarray(ens_x.replicas.jump_hist, float).sum(axis=0)
    assert h_f.sum() > 30
    for b in range(6):
        se = np.sqrt(h_f[b] + h_x[b]) + 1e-9
        assert abs(h_f[b] - h_x[b]) < 6 * se, (b, h_f, h_x)
    e_f = np.asarray(ens_f.replicas.opportunity_hist, float).sum(axis=0)
    e_x = np.asarray(ens_x.replicas.opportunity_hist, float).sum(axis=0)
    np.testing.assert_allclose(e_f, e_x, rtol=0.25, atol=25.0)


def test_topk_chunk_invariance():
    frames_np = make_frames(12, 120, 10.0)
    cell = Cell.cubic([10.0] * 3)
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(1.5), k=8)
    ens0, _ = init(12, 4, frames_np[0])
    whole = fused.run_block_fused(model, cell, ens0, jnp.asarray(frames_np),
                                  0, dt=DT, seed=2, tile=32, interpret=True)
    half = fused.run_block_fused(model, cell, ens0, jnp.asarray(frames_np[:60]),
                                 0, dt=DT, seed=2, tile=32, interpret=True)
    half = fused.run_block_fused(model, cell, half, jnp.asarray(frames_np[60:]),
                                 60, dt=DT, seed=2, tile=32, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(whole.replicas.site_of_proton),
        np.asarray(half.replicas.site_of_proton),
    )
    np.testing.assert_allclose(
        np.asarray(whole.replicas.disp_base),
        np.asarray(half.replicas.disp_base), atol=1e-4,
    )


def test_auto_frame_chunk_bit_exact(monkeypatch):
    """run_block_fused's VMEM-driven frame sub-chunking (pick_frame_chunk)
    must be bit-exact vs the unchunked run: RNG draws are keyed by global
    frame + event ordinal and every chunk entry does a full occ[nbr]
    refresh."""
    from cmdlmc_tpu.ops import topk_sweep as ts

    frames_np = make_frames(12, 96, 10.0)
    cell = Cell.cubic([10.0] * 3)
    model = TopKPairRates(cell=cell, law=LAW, cutoff=jnp.float32(3.0),
                          buffer=jnp.float32(1.5), k=8)
    ens0, _ = init(12, 4, frames_np[0])
    whole = fused.run_block_fused(model, cell, ens0, jnp.asarray(frames_np),
                                  0, dt=DT, seed=2, tile=32, interpret=True)
    # shrink the resident-table budget so the 96-frame block auto-chunks
    kl = ts._pad_k(8)
    need = ts._resident_bytes(12, 96, kl)
    monkeypatch.setattr(ts, "_RESIDENT_BUDGET", need // 3)
    assert ts.pick_frame_chunk(96, 12, 8) < 96
    chunked = fused.run_block_fused(model, cell, ens0,
                                    jnp.asarray(frames_np), 0, dt=DT,
                                    seed=2, tile=32, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(whole.replicas.site_of_proton),
        np.asarray(chunked.replicas.site_of_proton),
    )
    np.testing.assert_allclose(np.asarray(whole.replicas.disp_base),
                               np.asarray(chunked.replicas.disp_base),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(whole.replicas.jumps),
                                  np.asarray(chunked.replicas.jumps))


def test_topk_budget_policies():
    """pick_tile_topk / pick_frame_chunk / default_cmax respect their
    empirical budgets and their divisibility/monotonicity contracts."""
    from cmdlmc_tpu.ops import topk_sweep as ts

    # supercell scale: tile halves until the event-loop state fits
    t = ts.pick_tile_topk(4096, n_sites=4608, n_protons=3072, block=128,
                          k_cand=8, nbins=0, track_matrix=False)
    assert 4096 % t == 0
    assert ts._tr_state_bytes(4608, 3072, t, 8) <= ts._TR_STATE_BUDGET
    assert t <= 64  # TR=128 at N=4608 is over the measured budget
    # small problems keep the full target tile
    assert ts.pick_tile_topk(4096, n_sites=144, n_protons=96, block=128,
                             k_cand=16, nbins=8, track_matrix=True) == 128
    # frame chunk honors the resident budget and never returns 0
    b = ts.pick_frame_chunk(2000, 4608, 8)
    assert 1 <= b <= 2000
    assert ts._resident_bytes(4608, b, ts._pad_k(8)) <= ts._RESIDENT_BUDGET
    assert ts.pick_frame_chunk(64, 144, 8) == 64  # small N: no chunking
    # cmax cap keeps the delta temporaries bounded at large N
    from cmdlmc_tpu.ops.vmem_budget import padded_bytes
    c = ts.default_cmax(4608)
    assert 3 * padded_bytes(4608, c) <= ts._NC_BUDGET
    assert ts.default_cmax(144) == 144
