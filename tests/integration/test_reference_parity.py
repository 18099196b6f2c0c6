"""Distributional parity against a pull-based reference-style oracle.

The reference cannot run here (its Cython/GSL extensions are unbuildable in
this environment), so golden data is *generated* by an independent numpy
implementation of the reference algorithm's semantics (BASELINE.md): per-frame
brute-force topology + Fermi rates + time-dependent KMC fast-forward + masked
cumsum/searchsorted transition selection + PBC-aware MSD bookkeeping, exactly
the pipeline of LMC/MDMC.py. RNGs differ (numpy MT vs threefry), so the
comparison is distributional: event rates and MSD growth must agree within
confidence bounds (SURVEY.md §7 hard part #2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 3000-frame numpy oracle: dominates suite wall-time

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates

# System under test: a 3x3x3 grid of donor sites spanning the periodic box
# (spacing 4.0 < cutoff+buffer), so the hopping network percolates through the
# torus and the proton walk is genuinely diffusive — a saturating finite
# cluster would make MSD comparison meaningless.
N_SITES, N_PROTONS = 27, 7
BOX = 12.0
A, B, C = 0.08, 3.6, 0.25
CUT, BUF = 3.0, 1.5
DT = 0.5
N_FRAMES = 3000


def make_trajectory(seed=0):
    rng = np.random.RandomState(seed)
    grid = np.array(
        [[i, j, k] for i in range(3) for j in range(3) for k in range(3)],
        dtype=np.float64,
    ) * 4.0
    # correlated jitter (random walk with pullback) so the topology fluctuates
    frames = np.empty((N_FRAMES, N_SITES, 3), dtype=np.float64)
    x = grid.copy()
    for f in range(N_FRAMES):
        x = grid + 0.9 * (x - grid) + rng.normal(scale=0.05, size=x.shape)
        frames[f] = x
    return frames


def minimg(d):
    return d - BOX * np.round(d / BOX)


def fermi(d):
    return A / (1.0 + np.exp((d - B) / C))


def oracle_run(frames, seed):
    """Reference-semantics KMC: one lattice, pull-based fast-forward."""
    rng = np.random.RandomState(seed)
    lattice = np.zeros(N_SITES, dtype=int)
    lattice[:N_PROTONS] = np.arange(1, N_PROTONS + 1)
    rng.shuffle(lattice)

    def pair_rates(pos, lattice):
        d = np.sqrt((minimg(pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        conn = d <= CUT + BUF
        occ = lattice > 0
        allowed = conn & occ[:, None] & ~occ[None, :]
        w = np.where(allowed, fermi(d), 0.0)
        return w, d

    sites_of = np.zeros(N_PROTONS, dtype=int)
    for s, label in enumerate(lattice):
        if label:
            sites_of[label - 1] = s
    snapshot = frames[0][sites_of].copy()
    disp = np.zeros((N_PROTONS, 3))

    events = 0
    kmc_time = 0.0
    u = -np.log(1 - rng.random())
    msd_curve = np.empty(N_FRAMES)

    for f in range(N_FRAMES):
        pos = frames[f]
        w, d = pair_rates(pos, lattice)
        rate = w.sum()
        t_avail = DT - (kmc_time - f * DT) if kmc_time > f * DT else DT
        budget = rate * t_avail
        # events within this frame (stale rates within frame, like the
        # reference's last-pulled-frame list; occupancy re-masked per event)
        while u <= budget and rate > 0:
            kmc_time = (f + 1) * DT - budget / rate + u / rate
            flat = w.ravel()
            cdf = np.cumsum(flat)
            draw = rng.uniform(0, cdf[-1])
            idx = np.searchsorted(cdf, draw)
            s, t = divmod(idx, N_SITES)
            label = lattice[s]
            lattice[t] = label
            lattice[s] = 0
            sites_of[label - 1] = t
            events += 1
            budget -= u
            u = -np.log(1 - rng.random())
            w, d = pair_rates(pos, lattice)
            rate = w.sum()
            budget = min(budget, rate * max((f + 1) * DT - kmc_time, 0.0))
        u -= budget

        newpos = pos[sites_of]
        disp += minimg(newpos - snapshot)
        snapshot = newpos
        msd_curve[f] = (disp**2).sum() / N_PROTONS

    return events, msd_curve


@pytest.fixture(scope="module")
def parity_data():
    frames_np = make_trajectory()

    # oracle: several independent runs
    oracle_events = []
    oracle_msd = []
    for seed in range(8):
        ev, msd = oracle_run(frames_np, seed=seed)
        oracle_events.append(ev)
        oracle_msd.append(msd)
    oracle_events = np.array(oracle_events, float)
    oracle_msd = np.stack(oracle_msd)

    # engine: replica batch on the same trajectory
    cell = Cell.cubic([BOX] * 3)
    model = PairRates(
        cell=cell,
        law=Fermi(a=jnp.float32(A), b=jnp.float32(B), c=jnp.float32(C)),
        cutoff=jnp.float32(CUT),
        buffer=jnp.float32(BUF),
    )
    n_replicas = 64
    key = jax.random.key(123)
    ens = eng.init_replicas(
        jax.random.fold_in(key, 0), n_replicas, N_SITES, N_PROTONS,
        jnp.asarray(frames_np[0], jnp.float32),
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), n_replicas)
    idx = jnp.arange(N_FRAMES, dtype=jnp.int32)
    frames = Frame(
        donors=jnp.asarray(frames_np, jnp.float32),
        extras=None,
        time=idx.astype(jnp.float32) * DT,
        index=idx,
    )
    ens, rows = eng.run_block(model, cell, ens, keys, frames, dt=DT)
    engine_events = np.asarray(ens.replicas.clock.event_count, float)
    engine_msd = np.asarray(rows.msd_mean).sum(axis=1)
    return oracle_events, oracle_msd, engine_events, engine_msd


def test_event_rates_agree(parity_data):
    oracle_events, _, engine_events, _ = parity_data
    mu_o, mu_e = oracle_events.mean(), engine_events.mean()
    # pooled z-test on the mean event count (Poisson-ish variances)
    se = np.sqrt(
        oracle_events.var(ddof=1) / len(oracle_events)
        + engine_events.var(ddof=1) / len(engine_events)
    )
    z = (mu_o - mu_e) / max(se, 1e-9)
    assert abs(z) < 4, (mu_o, mu_e, z)


def test_msd_growth_agrees(parity_data):
    _, oracle_msd, _, engine_msd = parity_data
    # compare mean MSD at several checkpoints along the run
    o_mean = oracle_msd.mean(axis=0)
    o_se = oracle_msd.std(axis=0, ddof=1) / np.sqrt(oracle_msd.shape[0])
    for f in (500, 1000, 2000, 2999):
        diff = abs(o_mean[f] - engine_msd[f])
        # oracle SE dominates (6 runs vs 24 replicas)
        assert diff < 5 * o_se[f] + 0.15 * o_mean[f], (
            f, o_mean[f], engine_msd[f], o_se[f]
        )

    # both must be close to linear growth: slope of second half vs first half
    ratio_e = engine_msd[2999] / engine_msd[1500]
    ratio_o = o_mean[2999] / o_mean[1500]
    assert abs(ratio_e - ratio_o) < 0.35, (ratio_e, ratio_o)
