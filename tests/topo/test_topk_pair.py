"""TopKPairRates (the reference's Verlet-list option, topology.py:80-114)
against dense PairRates: identical allowed-rate structure whenever K covers
every neighbor inside cutoff+buffer — the reference's own Verlet ==
brute-force property (tests/topo/test_topology.py:68-101)."""

import jax
import jax.numpy as jnp
import numpy as np

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates, TopKPairRates


def setup(n=24, k=23, cutoff=3.0, buffer=1.5, seed=0):
    rng = np.random.RandomState(seed)
    cell = Cell.cubic([9.0, 9.0, 9.0])
    law = Fermi(a=jnp.float32(0.1), b=jnp.float32(2.5), c=jnp.float32(0.3))
    dense = PairRates(cell=cell, law=law, cutoff=jnp.float32(cutoff),
                      buffer=jnp.float32(buffer))
    topk = TopKPairRates(cell=cell, law=law, cutoff=jnp.float32(cutoff),
                         buffer=jnp.float32(buffer), k=k)
    pos = jnp.asarray(rng.uniform(0, 9, size=(n, 3)), jnp.float32)
    frame = Frame(donors=pos, extras=None, time=jnp.float32(0.0),
                  index=jnp.int32(0))
    return dense, topk, frame


def to_dense(omega, nbr, valid, n):
    """Scatter the top-K rate list back into an [N, N] matrix."""
    w = np.zeros((n, n), np.float32)
    omega, nbr, valid = map(np.asarray, (omega, nbr, valid))
    for i in range(n):
        for kk in range(nbr.shape[1]):
            if valid[i, kk]:
                w[i, nbr[i, kk]] += omega[i, kk]
    return w


def test_topk_covering_equals_dense():
    dense, topk, frame = setup()
    n = frame.donors.shape[0]
    w_dense = np.asarray(dense.shared(frame).W)
    shared = topk.shared(frame)
    omega, nbr, valid = topk.replica_omega(shared, jnp.zeros((n,)))
    w_topk = to_dense(omega, nbr, valid, n)
    np.testing.assert_allclose(w_topk, w_dense, rtol=1e-5, atol=1e-7)


def test_topk_truncation_keeps_closest():
    dense, topk_full, frame = setup()
    n = frame.donors.shape[0]
    small = TopKPairRates(cell=topk_full.cell, law=topk_full.law,
                          cutoff=topk_full.cutoff, buffer=topk_full.buffer, k=4)
    shared = small.shared(frame)
    d = np.asarray(shared.dist)
    valid = np.asarray(shared.valid)
    # rows are sorted ascending: each kept distance <= the next
    for i in range(n):
        kept = d[i][valid[i]]
        assert np.all(np.diff(kept) >= -1e-6)


def test_topk_no_self_neighbors():
    _, topk, frame = setup()
    shared = topk.shared(frame)
    nbr = np.asarray(shared.nbr)
    valid = np.asarray(shared.valid)
    rows = np.arange(nbr.shape[0])[:, None]
    assert not np.any((nbr == rows) & valid)


def test_topk_engine_run_statistically_matches_dense():
    """Full engine blocks under both models: identical ensemble jump statistics
    within stochastic tolerance (different selection draw streams)."""
    from cmdlmc_tpu.engine import lattice as eng

    dense, topk, frame = setup(n=16, k=15)
    key = jax.random.key(1)
    n_rep = 256
    frames = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (30, *jnp.shape(x))), frame
    )
    frames = Frame(
        donors=frames.donors,
        extras=None,
        time=jnp.arange(30, dtype=jnp.float32) * 0.5,
        index=jnp.arange(30, dtype=jnp.int32),
    )
    results = {}
    for name, model in [("dense", dense), ("topk", topk)]:
        ens = eng.init_replicas(jax.random.fold_in(key, 0), n_rep, 16, 6,
                                frame.donors)
        keys = jax.random.split(jax.random.fold_in(key, 1), n_rep)
        ens, rows = eng.run_block(model, dense.cell, ens, keys, frames,
                                  dt=0.5, max_events=4)
        results[name] = float(np.asarray(rows.jumps_mean[-1]))
    # mean jumps per replica agree within CLT noise (~sqrt(jumps)/sqrt(R))
    a, b = results["dense"], results["topk"]
    assert a > 0.5  # the system actually jumps
    tol = 6 * np.sqrt(max(a, b) / n_rep) + 1e-3
    assert abs(a - b) < tol, (a, b, tol)
