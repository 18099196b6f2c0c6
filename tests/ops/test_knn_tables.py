"""Fused Pallas stage-1 k-nearest table builder vs the XLA build (interpret
mode on CPU — the same kernel code compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.ops.knn_tables import knn_block_tables, use_knn_pallas
from cmdlmc_tpu.ops.topk_sweep import _pad_k, topk_tables
from cmdlmc_tpu.rates.laws import Fermi
from cmdlmc_tpu.topo.models import TopKPairRates


def _model(lengths, cutoff=3.0, buffer=1.5, k=6):
    return TopKPairRates(
        cell=Cell.cubic(lengths),
        law=Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1)),
        cutoff=jnp.float32(cutoff),
        buffer=jnp.float32(buffer),
        k=k,
    )


def _xla_tables(model, pos, kl, law):
    # the pre-dispatch XLA path: model.shared per frame (pairwise + k_smallest)
    from cmdlmc_tpu.topo.models import Frame

    tds, tis, rss = [], [], []
    for f in np.asarray(pos, np.float32):
        sh = model.shared(Frame(donors=jnp.asarray(f), extras=None,
                                time=jnp.float32(0.0), index=jnp.int32(0)))
        k = sh.dist.shape[1]
        pad = [(0, 0), (0, kl - k)]
        td = jnp.pad(sh.dist, pad, constant_values=1.0e6)
        rs = jnp.pad(sh.dist_rescaled, pad, constant_values=1.0e6)
        if law:
            omega = model.law(jnp.minimum(rs, 50.0))
            rs = jnp.where(td < 1.0e5, omega, 0.0)
        ti = jnp.pad(sh.nbr.astype(jnp.float32), pad, constant_values=0.0)
        tds.append(td.T)
        tis.append(ti.T)
        rss.append(rs.T)
    return np.stack(tds), np.stack(tis), np.stack(rss)


@pytest.mark.parametrize("n,k", [(64, 6), (200, 8), (160, 3)])
def test_kernel_matches_xla_random(n, k):
    rng = np.random.RandomState(n + k)
    L = 14.5 * (n / 144.0) ** (1 / 3)
    pos = rng.uniform(0, L, size=(3, n, 3)).astype(np.float32)
    model = _model([L, L, L], k=k)
    kl = _pad_k(k)
    want_d, want_i, _ = _xla_tables(model, pos, kl, law=False)
    got_d, got_i = knn_block_tables(
        jnp.asarray(pos), jnp.diagonal(model.cell.h),
        model.cutoff + model.buffer, k=k, kl=kl, tc=128, interpret=True,
    )
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)
    np.testing.assert_allclose(got_d, want_d, atol=2e-4)
    # identity parity wherever the ordering is not within fp tolerance of a
    # tie (random coordinates: no real ties)
    np.testing.assert_array_equal(got_i, want_i)


def test_tie_break_and_exhaustion_on_lattice():
    # simple cubic 4x4x4 lattice: every site has 6 equidistant first
    # neighbors -> the first-lowest-index tie-break is load-bearing; k=8 >
    # 6-in-cutoff also exercises exhausted-slot semantics (repeat index 0,
    # dist=1e6) when cutoff only admits the first shell.
    m = 4
    g = np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"), -1)
    pos = g.reshape(-1, 3).astype(np.float32) * 2.5  # spacing 2.5
    n = pos.shape[0]
    model = _model([2.5 * m] * 3, cutoff=2.4, buffer=0.2, k=8)  # rcut 2.6
    kl = _pad_k(8)
    pos_b = pos[None]
    want_d, want_i, _ = _xla_tables(model, pos_b, kl, law=False)
    got_d, got_i = knn_block_tables(
        jnp.asarray(pos_b), jnp.diagonal(model.cell.h),
        model.cutoff + model.buffer, k=8, kl=kl, tc=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    # exhausted slots: 6 neighbors in cutoff, slots 6..7 invalid
    assert np.all(np.asarray(got_d)[0, 6:8] == 1.0e6)


def test_topk_tables_dispatch(monkeypatch):
    monkeypatch.setenv("CMDLMC_FORCE_PALLAS", "1")
    rng = np.random.RandomState(7)
    n, k = 96, 5
    L = 13.0
    pos = rng.uniform(0, L, size=(2, n, 3)).astype(np.float32)
    model = _model([L, L, L], k=k)
    kl = _pad_k(k)
    assert use_knn_pallas(model, n)
    got = topk_tables(model, jnp.asarray(pos), kl, True)
    monkeypatch.setenv("CMDLMC_NO_PALLAS", "1")
    monkeypatch.delenv("CMDLMC_FORCE_PALLAS")
    assert not use_knn_pallas(model, n)
    want = topk_tables(model, jnp.asarray(pos), kl, True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)


def test_gate_semantics(monkeypatch):
    from cmdlmc_tpu.topo.models import HydroniumRates

    monkeypatch.setenv("CMDLMC_FORCE_PALLAS", "1")
    law = Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1))
    tri = TopKPairRates(
        cell=Cell.triclinic([[10, 0, 0], [3, 9, 0], [0, 0, 8]]),
        law=law, cutoff=jnp.float32(3.0), buffer=jnp.float32(1.0), k=4,
    )
    # triclinic rejected even when forced (27-image search is XLA-only)
    assert not use_knn_pallas(tri, 4096)
    hyd = HydroniumRates(
        cell=Cell.cubic([10.0] * 3), law=law,
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.0),
        transform=None, interpolator=None, k=4,
    )
    # hydronium shares the distance+select stage -> covered by the kernel
    assert use_knn_pallas(hyd, 4096)
    monkeypatch.setenv("CMDLMC_NO_PALLAS", "1")
    assert not use_knn_pallas(hyd, 4096)


def test_hydronium_transform_parity(monkeypatch):
    """Transform/rescale applies after the k-select: Pallas stage-1 tables
    for HydroniumRates match the XLA build (incl. the 1e6-fill semantics of
    invalid vs pad slots)."""
    from cmdlmc_tpu.topo.models import HydroniumRates
    from cmdlmc_tpu.topo.transforms import LinearTransformation

    monkeypatch.setenv("CMDLMC_FORCE_PALLAS", "1")
    rng = np.random.RandomState(11)
    n, k = 80, 5
    L = 12.0
    pos = rng.uniform(0, L, size=(2, n, 3)).astype(np.float32)
    law = Fermi(a=jnp.float32(0.06), b=jnp.float32(2.3), c=jnp.float32(0.1))
    hyd = HydroniumRates(
        cell=Cell.cubic([L] * 3), law=law,
        cutoff=jnp.float32(3.0), buffer=jnp.float32(1.5),
        transform=LinearTransformation(
            # right_bound past the 1e6 invalid fill: the transform MUST see
            # the fill of the k real slots (XLA-build semantics) while the
            # kl-k pad rows stay raw 1e6
            a=jnp.float32(0.9), b=jnp.float32(0.1),
            left_bound=jnp.float32(0.0), right_bound=jnp.float32(2.0e6),
        ),
        interpolator=None, k=k,
    )
    kl = _pad_k(k)
    got = topk_tables(hyd, jnp.asarray(pos), kl, False)
    monkeypatch.setenv("CMDLMC_NO_PALLAS", "1")
    want = topk_tables(hyd, jnp.asarray(pos), kl, False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)
    resc = np.asarray(got[2])
    assert np.all(resc[:, k:, :] == 1.0e6)  # pad rows: raw fill
