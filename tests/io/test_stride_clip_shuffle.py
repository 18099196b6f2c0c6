"""Legacy trajectory-subsetting keys on both readers: ``stride`` (skip_frames),
``clip`` (clip_trajectory) and HDF5 ``shuffle`` mode (IO/config_parser.py:
196-202, 237-243, 275-281)."""

import io

import numpy as np
import pytest

from cmdlmc_tpu.io.converters import save_xyz_to_hdf5
from cmdlmc_tpu.io.hdf5 import HDF5Trajectory
from cmdlmc_tpu.io.xyz import XYZTrajectory, write_xyz_frame

N_FRAMES = 12
N_ATOMS = 3


def xyz_text():
    buf = io.StringIO()
    for f in range(N_FRAMES):
        # frame index encoded in the x coordinate
        pos = np.full((N_ATOMS, 3), float(f))
        write_xyz_frame(buf, ["O"] * N_ATOMS, pos, comment=f"frame {f}")
    return buf.getvalue()


def frame_ids(traj):
    return [int(fr.positions[0, 0]) for fr in traj]


@pytest.fixture()
def xyz_path(tmp_path):
    p = tmp_path / "t.xyz"
    p.write_text(xyz_text())
    return str(p)


@pytest.fixture()
def hdf5_path(tmp_path, xyz_path):
    p = tmp_path / "t.hdf5"
    save_xyz_to_hdf5(xyz_path, str(p))
    return str(p)


def test_xyz_stride(xyz_path):
    traj = XYZTrajectory(xyz_path, time_step=1.0, stride=3)
    assert frame_ids(traj) == [0, 3, 6, 9]
    assert len(traj) == 4
    # strided frames keep physical time: used frame i sits at source time
    # i * stride * time_step (reference skip_frames, config_parser.py:196-202)
    assert traj.effective_time_step == 3.0
    fresh = XYZTrajectory(xyz_path, time_step=1.0, stride=3)
    assert [f.time for f in fresh] == [0.0, 3.0, 6.0, 9.0]


def test_xyz_clip(xyz_path):
    traj = XYZTrajectory(xyz_path, time_step=1.0, clip=5)
    assert frame_ids(traj) == [0, 1, 2, 3, 4]
    assert len(traj) == 5


def test_xyz_stride_and_clip_compose(xyz_path):
    traj = XYZTrajectory(xyz_path, time_step=1.0, stride=2, clip=7)
    assert frame_ids(traj) == [0, 2, 4, 6]
    assert len(traj) == 4


def test_xyz_clip_with_repeat_loops(xyz_path):
    traj = XYZTrajectory(xyz_path, time_step=1.0, clip=3, repeat=True)
    ids = []
    for fr in traj:
        ids.append(int(fr.positions[0, 0]))
        if len(ids) == 8:
            break
    assert ids == [0, 1, 2, 0, 1, 2, 0, 1]


def test_hdf5_stride_time_is_physical(hdf5_path):
    traj = HDF5Trajectory(hdf5_path, time_step=0.5, stride=2, chunk_size=5)
    assert traj.effective_time_step == 1.0
    assert [f.time for f in traj][:3] == [0.0, 1.0, 2.0]


def test_hdf5_stride(hdf5_path):
    traj = HDF5Trajectory(hdf5_path, time_step=1.0, stride=3, chunk_size=5)
    # chunked reads must not change the selected frames
    assert frame_ids(traj) == [0, 3, 6, 9]
    assert len(traj) == 4


def test_hdf5_clip(hdf5_path):
    traj = HDF5Trajectory(hdf5_path, time_step=1.0, clip=5, chunk_size=4)
    assert frame_ids(traj) == [0, 1, 2, 3, 4]
    assert len(traj) == 5


def test_hdf5_shuffle_seeded_and_in_range(hdf5_path):
    traj = HDF5Trajectory(hdf5_path, time_step=1.0, shuffle_seed=42, chunk_size=6)
    ids = []
    for fr in traj:
        ids.append(int(fr.positions[0, 0]))
        if len(ids) == 24:
            break
    assert all(0 <= i < N_FRAMES for i in ids)
    assert len(set(ids)) > 1  # actually random, not a constant frame

    # same seed -> same stream
    traj2 = HDF5Trajectory(hdf5_path, time_step=1.0, shuffle_seed=42, chunk_size=6)
    ids2 = []
    for fr in traj2:
        ids2.append(int(fr.positions[0, 0]))
        if len(ids2) == 24:
            break
    assert ids == ids2


def test_hdf5_shuffle_respects_clip(hdf5_path):
    traj = HDF5Trajectory(hdf5_path, time_step=1.0, shuffle_seed=1, clip=4)
    ids = []
    for fr in traj:
        ids.append(int(fr.positions[0, 0]))
        if len(ids) == 32:
            break
    assert all(0 <= i < 4 for i in ids)
