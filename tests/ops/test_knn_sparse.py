"""Spatially-sparse stage-1 KNN builder vs the dense Pallas kernel
(interpret mode on CPU — the same kernel code compiles for TPU).

The sparse path prunes row CHUNKS with a host-side periodic bounding-box
plan; its output contract is exact equality with the dense builder
(ops/knn_tables.knn_block_tables): identical distances (same per-pair float
ops), identical ids under the k_smallest tie-break, identical invalid-slot
fill. Every test asserts array_equal, not allclose."""

import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.ops.knn_sparse import (
    knn_sparse_tables,
    plan_sparse,
    sparse_plan_for,
)
from cmdlmc_tpu.ops.knn_tables import knn_block_tables
from cmdlmc_tpu.ops.topk_sweep import _pad_k


def _run_both(pos, L, rcut, k, rc, tc):
    kl = _pad_k(k)
    lengths = jnp.asarray([L, L, L], jnp.float32)
    want = knn_block_tables(jnp.asarray(pos), lengths, rcut, k=k, kl=kl,
                            tc=128, interpret=True)
    perm, inv, lists, n_ch = plan_sparse(pos, [L, L, L], rcut, rc=rc, tc=tc)
    got = knn_sparse_tables(
        jnp.asarray(pos), lengths, rcut, perm, inv, lists,
        k=k, kl=kl, rc=rc, tc=tc, n_ch=n_ch, maxa=lists.shape[1],
        interpret=True,
    )
    return [np.asarray(x) for x in got], [np.asarray(x) for x in want], lists


@pytest.mark.parametrize("n,k,rc,tc", [(200, 6, 64, 64), (129, 4, 32, 64)])
def test_sparse_matches_dense_random(n, k, rc, tc):
    rng = np.random.RandomState(n + k)
    L = 22.0 * (n / 600.0) ** (1 / 3) + 8.0  # big enough box to prune
    pos = rng.uniform(0, L, size=(3, n, 3)).astype(np.float32)
    (gd, gi), (wd, wi), lists = _run_both(pos, L, rcut=3.5, k=k, rc=rc, tc=tc)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gi, wi)


def test_pruning_actually_prunes():
    """On a large sparse box, the active lists must be much narrower than
    the full chunk count — otherwise the kernel does dense work."""
    rng = np.random.RandomState(3)
    n, L = 1024, 40.0
    pos = rng.uniform(0, L, size=(1, n, 3)).astype(np.float32)
    perm, inv, lists, n_ch = plan_sparse(pos, [L, L, L], 4.0, rc=64, tc=64)
    assert n_ch == 16
    assert lists.shape[1] <= n_ch // 2  # >=2x chunk-level sparsity
    (gd, gi), (wd, wi), _ = _run_both(pos, L, rcut=4.0, k=6, rc=64, tc=64)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gi, wi)


def test_tie_break_and_exhaustion_on_lattice():
    # simple cubic lattice: 6 equidistant first neighbors -> the
    # lowest-original-id tie-break is load-bearing ACROSS chunks (the
    # bin-sort scatters low ids over several chunks); k=8 > 6-in-cutoff
    # exercises exhausted slots ((1e6, 0) fill).
    m = 6
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
    pos = (g.reshape(-1, 3).astype(np.float32) * 2.5)[None]  # [1, 216, 3]
    L = 2.5 * m
    (gd, gi), (wd, wi), _ = _run_both(pos, L, rcut=2.6, k=8, rc=32, tc=32)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gi, wi)
    assert np.all(gd[0, 6:8] == 1.0e6)  # exhausted slots


def test_block_drift_covered_by_plan():
    """One plan serves a whole block: per-site drift widens the bounding
    boxes, so neighbors that move in or out across frames are never lost."""
    rng = np.random.RandomState(9)
    n, L, B = 300, 24.0, 6
    base = rng.uniform(0, L, size=(n, 3)).astype(np.float32)
    walk = np.cumsum(
        rng.normal(scale=0.4, size=(B, n, 3)).astype(np.float32), axis=0
    )
    pos = base[None] + walk - walk[0]  # frame 0 = base, then drift
    (gd, gi), (wd, wi), _ = _run_both(pos, L, rcut=3.0, k=5, rc=64, tc=64)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gi, wi)


def test_topk_tables_sparse_dispatch_matches_dense():
    """The stage-2 dispatch wrapper (_topk_tables_sparse) must agree with
    the dense Pallas path bit-for-bit, including the transform/law epilogue
    (precompute_law=True is what the supercell driver path uses)."""
    from cmdlmc_tpu.core.cell import Cell
    from cmdlmc_tpu.ops.topk_sweep import (
        _topk_tables_pallas,
        _topk_tables_sparse,
    )
    from cmdlmc_tpu.rates.laws import Fermi
    from cmdlmc_tpu.topo.models import TopKPairRates

    rng = np.random.RandomState(5)
    n, L = 1024, 40.0  # the geometry test_pruning_actually_prunes shows >=2x on
    base = rng.uniform(0, L, size=(n, 3)).astype(np.float32)
    drift = rng.normal(scale=0.1, size=(2, n, 3)).astype(np.float32)
    pos = jnp.asarray(base[None] + drift - drift[:1])  # MD-like small drift
    model = TopKPairRates(
        cell=Cell.cubic([L, L, L]),
        law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3),
                  c=jnp.float32(0.1)),
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.0), k=6,
    )
    kl = _pad_k(6)
    plan = sparse_plan_for(pos, [L, L, L], 4.0, min_n=1, max_ratio=1.0,
                           rc=64, tc=64)
    assert plan is not None and plan.ratio < 1.0  # pruning exercised
    for law in (False, True):
        want = _topk_tables_pallas(model, pos, kl, law)
        got = _topk_tables_sparse(model, pos, kl, law, plan)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sparse_plan_gate():
    """sparse_plan_for declines below min_n and when pruning is too weak."""
    rng = np.random.RandomState(11)
    n, L = 256, 12.0  # dense box: every chunk is within cutoff of every tile
    pos = rng.uniform(0, L, size=(1, n, 3)).astype(np.float32)
    assert sparse_plan_for(pos, [L, L, L], 5.0) is None  # n < min_n
    assert (
        sparse_plan_for(pos, [L, L, L], 5.0, min_n=1, max_ratio=0.75,
                        rc=64, tc=64)
        is None
    )  # plan built but ratio too high


def test_unwrapped_coordinates():
    """Positions far outside the box (unwrapped MD trajectories): the plan
    bins on wrapped frame-0 coordinates and the kernel's minimum image is
    the same closed form as the dense kernel."""
    rng = np.random.RandomState(21)
    n, L = 160, 18.0
    pos = rng.uniform(0, L, size=(2, n, 3)).astype(np.float32)
    pos = pos + rng.randint(-3, 4, size=(2, n, 3)).astype(np.float32) * L
    (gd, gi), (wd, wi), _ = _run_both(pos, L, rcut=3.2, k=4, rc=32, tc=64)
    np.testing.assert_array_equal(gd, wd)
    np.testing.assert_array_equal(gi, wi)
