"""Tests for Welford stats, excess-proton MSD, angle matrix, trajzip, version."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.analysis.anglematrix import angle_matrix
from cmdlmc_tpu.cli.trajzip import merge
from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.utils.stats import Welford, chunk, excess_proton_msd
from cmdlmc_tpu.utils.version import version_lines


def test_welford_matches_numpy():
    rng = np.random.RandomState(0)
    xs = rng.normal(size=(100, 4)).astype(np.float32)
    acc = Welford.init((4,))
    for x in xs:
        acc = acc.update(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(acc.mean), xs.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(acc.variance), xs.var(axis=0, ddof=1), rtol=1e-4
    )


def test_welford_mask():
    acc = Welford.init(())
    for x, m in [(1.0, True), (100.0, False), (3.0, True)]:
        acc = acc.update(jnp.float32(x), m)
    assert float(acc.mean) == pytest.approx(2.0)
    assert int(acc.count) == 2


def test_chunk():
    out = list(chunk(list(range(10)), 4))
    assert [(s, e) for s, e, _ in out] == [(0, 4), (4, 8), (8, 10)]
    assert out[2][2] == [8, 9]


def test_excess_proton_msd_unwraps_pbc():
    # proton walks +1 A per frame along x in a 10 A box (wrapped positions)
    t = np.arange(50)
    pos = np.stack([(t * 1.0) % 10.0, np.zeros(50), np.zeros(50)], axis=1)
    msds = excess_proton_msd(pos, interval_length=20, interval_delta=10, pbc=[10, 10, 10])
    # ballistic: msd[j] = j^2 in every interval
    j = np.arange(20)
    for interval in msds:
        np.testing.assert_allclose(interval[:, 0], j**2, atol=1e-9)


def test_angle_matrix_batched():
    cell = Cell.cubic([50.0, 50.0, 50.0])
    o = np.array([[0.0, 0, 0], [2.0, 0, 0], [0.0, 2, 0]], dtype=np.float32)
    p = np.array([[-1.5, 0, 0]], dtype=np.float32)
    o_traj = jnp.asarray(np.stack([o, o]))
    p_traj = jnp.asarray(np.stack([p, p]))
    o_to_p = jnp.zeros(3, jnp.int32)
    angles, mask = angle_matrix(
        cell, o_traj, p_traj, o_to_p, distance_cutoff=3.0, angle_cutoff=np.pi / 2
    )
    assert angles.shape == (2, 3, 3)
    # P-O0-O1 angle = 180 deg -> marked; P-O0-O2 = 90 deg -> marked (>=)
    assert bool(mask[0, 0, 1])
    assert float(angles[0, 0, 1]) == pytest.approx(np.pi, rel=1e-4)
    assert float(angles[0, 0, 2]) == pytest.approx(np.pi / 2, rel=1e-3)


def test_trajzip_merges_frames():
    # reference misc/trajzip.py prints n1+n2, blank comment, both atom blocks
    a = "1\nfa\nO 0 0 0\n1\nfa2\nO 1 1 1\n"
    b = "2\nfb\nH 9 9 9\nH 7 7 7\n2\nfb2\nH 8 8 8\nH 6 6 6\n"
    out = io.StringIO()
    merge(io.StringIO(a), io.StringIO(b), out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "3" and lines[1] == ""
    assert lines[2].startswith("O 0") and lines[3].startswith("H 9")
    assert lines[5] == "3" and lines[7].startswith("O 1")


def test_version_lines():
    lines = version_lines()
    assert lines[0].startswith("# cmdlmc_tpu version")
    assert any("commit" in l for l in lines)  # running from a git checkout
