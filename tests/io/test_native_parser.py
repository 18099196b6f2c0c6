"""Native C++ xyz tokenizer: correctness vs the numpy path, odd formats,
and fallback behavior."""

import numpy as np
import pytest

from cmdlmc_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_parse_simple(lib):
    text = b"O 1.0 2.0 3.0\nH -0.5 1e-3 2.25\n"
    names, pos = native.parse_atom_lines(text, 2, 2)
    np.testing.assert_array_equal(names, ["O", "H"])
    np.testing.assert_allclose(pos, [[1, 2, 3], [-0.5, 0.001, 2.25]], rtol=1e-6)


def test_parse_scientific_and_negative(lib):
    text = b"Cs -1.25e+2 3.5E-4 +0.75\n"
    names, pos = native.parse_atom_lines(text, 1, 1)
    assert names[0] == "Cs"
    np.testing.assert_allclose(pos[0], [-125.0, 3.5e-4, 0.75], rtol=1e-6)


def test_parse_extra_columns_tolerated(lib):
    text = b"O 1 2 3 velocity 9 9 9\nO 4 5 6\n"
    names, pos = native.parse_atom_lines(text, 2, 2)
    np.testing.assert_allclose(pos, [[1, 2, 3], [4, 5, 6]], rtol=1e-6)


def test_malformed_returns_none(lib):
    assert native.parse_atom_lines(b"O 1 2\n", 1, 1) is None  # missing z


def test_matches_numpy_path_on_random_data(lib):
    rng = np.random.RandomState(0)
    pos = rng.uniform(-100, 100, size=(500, 3))
    lines = [f"O{i % 9} {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n" for i, p in enumerate(pos)]
    names, got = native.parse_atom_lines("".join(lines).encode(), 500, 10)
    np.testing.assert_allclose(got, pos, atol=2e-4)
    np.testing.assert_array_equal(names, [f"O{i}" for i in range(9)] + ["O0"])


def test_xyz_trajectory_uses_native_and_agrees(tmp_path):
    from cmdlmc_tpu.io.xyz import XYZTrajectory

    rng = np.random.RandomState(1)
    path = tmp_path / "t.xyz"
    want = rng.uniform(-5, 5, size=(7, 3, 3))
    with open(path, "w") as f:
        for frame in want:
            f.write("3\ncomment\n")
            for name, p in zip("OHP", frame):
                f.write(f"{name} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f}\n")
    frames = list(XYZTrajectory(str(path), time_step=1.0))
    got = np.stack([f.positions for f in frames])
    np.testing.assert_allclose(got, want, atol=1e-5)
