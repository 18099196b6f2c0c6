"""I/O tests, porting the reference parser tests (tests/IO/test_parsers.py):
in-memory xyz parsing, selection by name and index, frame append, frame counts,
plus HDF5 round-trip, block streaming and COM removal."""

import io

import numpy as np
import pytest

from cmdlmc_tpu.io.converters import save_xyz_to_hdf5
from cmdlmc_tpu.io.frames import (
    HostFrame,
    acidic_proton_indices,
    remove_center_of_mass_movement,
)
from cmdlmc_tpu.io.hdf5 import HDF5Trajectory
from cmdlmc_tpu.io.stream import frame_blocks, prefetch
from cmdlmc_tpu.io.xyz import XYZTrajectory, selection_from_atomnames

MOCK_XYZ = """\
4
comment line 0
O 0.0 0.0 0.0
H 1.0 0.0 0.0
O 0.0 2.0 0.0
P 3.0 3.0 3.0
4
comment line 1
O 0.1 0.0 0.0
H 1.1 0.0 0.0
O 0.1 2.0 0.0
P 3.1 3.0 3.0
4
comment line 2
O 0.2 0.0 0.0
H 1.2 0.0 0.0
O 0.2 2.0 0.0
P 3.2 3.0 3.0
"""


def mock_file():
    return io.StringIO(MOCK_XYZ)


def test_xyz_frame_count_and_shapes():
    traj = XYZTrajectory(mock_file(), time_step=0.5)
    frames = list(traj)
    assert len(frames) == 3
    for i, frame in enumerate(frames):
        assert frame.atom_number == 4
        assert frame.positions.shape == (4, 3)
        assert frame.time == pytest.approx(0.5 * i)
    np.testing.assert_array_equal(frames[0].names, ["O", "H", "O", "P"])
    np.testing.assert_allclose(frames[2].positions[0], [0.2, 0.0, 0.0], atol=1e-6)


def test_frame_selection_by_name_and_index():
    traj = XYZTrajectory(mock_file(), time_step=0.5)
    frame = next(iter(traj))
    oxy = frame["O"]
    assert oxy.atom_number == 2
    np.testing.assert_allclose(oxy.positions[:, 1], [0.0, 2.0], atol=1e-6)

    by_index = frame[[1, 3]]
    np.testing.assert_array_equal(by_index.names, ["H", "P"])


def test_frame_append():
    traj = XYZTrajectory(mock_file(), time_step=0.5)
    frame = next(iter(traj))
    joined = frame["O"].append(frame["P"])
    np.testing.assert_array_equal(joined.names, ["O", "O", "P"])
    assert joined.positions.shape == (3, 3)


def test_trajectory_level_selection_by_name():
    traj = XYZTrajectory(mock_file(), time_step=0.5, selection="O")
    frames = list(traj)
    assert all(f.atom_number == 2 for f in frames)
    np.testing.assert_array_equal(frames[0].names, ["O", "O"])


def test_trajectory_selection_by_indices():
    traj = XYZTrajectory(mock_file(), time_step=0.5, selection=[0, 3])
    frame = next(iter(traj))
    np.testing.assert_array_equal(frame.names, ["O", "P"])


def test_selection_from_atomnames():
    sel = selection_from_atomnames(mock_file(), "O", "P")
    np.testing.assert_array_equal(sel, [0, 2, 3])


def test_len_counts_frames():
    assert len(XYZTrajectory(mock_file(), time_step=0.5)) == 3


def test_repeat_loops_frames():
    traj = XYZTrajectory(mock_file(), time_step=0.5, repeat=True)
    it = iter(traj)
    frames = [next(it) for _ in range(7)]
    np.testing.assert_allclose(
        frames[3].positions[0], frames[0].positions[0], atol=1e-6
    )


def test_xyz_to_hdf5_roundtrip(tmp_path):
    xyz_path = tmp_path / "traj.xyz"
    xyz_path.write_text(MOCK_XYZ)
    h5_path = save_xyz_to_hdf5(str(xyz_path))
    traj = HDF5Trajectory(h5_path, time_step=0.5)
    assert len(traj) == 3
    frames = list(traj)
    np.testing.assert_array_equal(frames[0].names, ["O", "H", "O", "P"])
    np.testing.assert_allclose(frames[1].positions[3], [3.1, 3.0, 3.0], atol=1e-5)

    oxy = HDF5Trajectory(h5_path, time_step=0.5, selection="O")
    frame = next(iter(oxy))
    assert frame.atom_number == 2


def test_frame_blocks_reblocking_and_prefetch(tmp_path):
    # 3-frame mock, block size 2 -> blocks of 2 and 1; donors are the two O's.
    traj = XYZTrajectory(mock_file(), time_step=0.5, batch_frames=2)
    blocks = list(prefetch(frame_blocks(traj, block_size=2, donor_atoms="O",
                                        extra_atoms="P")))
    assert [b.n_frames for b in blocks] == [2, 1]
    assert blocks[0].donors.shape == (2, 2, 3)
    assert blocks[0].extras.shape == (2, 1, 3)
    assert blocks[0].start == 0 and blocks[1].start == 2
    np.testing.assert_allclose(blocks[1].donors[0, 0], [0.2, 0, 0], atol=1e-6)


def test_frame_blocks_max_frames():
    traj = XYZTrajectory(mock_file(), time_step=0.5, repeat=True)
    blocks = list(frame_blocks(traj, block_size=4, donor_atoms="O", max_frames=10))
    assert sum(b.n_frames for b in blocks) == 10


def test_remove_center_of_mass():
    names = ["O", "O"]
    pos = np.array([[[0.0, 0, 0], [2.0, 0, 0]], [[1.0, 0, 0], [3.0, 0, 0]]])
    out = remove_center_of_mass_movement(names, pos)
    np.testing.assert_allclose(out[0], [[-1, 0, 0], [1, 0, 0]], atol=1e-12)
    np.testing.assert_allclose(out[1], [[-1, 0, 0], [1, 0, 0]], atol=1e-12)


def test_acidic_proton_detection():
    names = ["O", "H", "H", "N"]
    pos = np.array(
        [[0.0, 0, 0], [0.9, 0, 0], [5.0, 5, 5.9], [5.0, 5, 5]], dtype=float
    )
    idx = acidic_proton_indices(names, pos, [10, 10, 10])
    np.testing.assert_array_equal(idx, [1])  # H near O yes, H near N no
