"""Checkpoint-robustness guarantees added after round 1 (ADVICE.md items):
re-running a completed run is a no-op, a config change refuses to resume, a
block_size change that straddles the checkpoint fails loudly, and the fused
backend's observable cadence matches the scan engine frame for frame."""

import io

import numpy as np
import pytest

from cmdlmc_tpu.driver import run_from_config
from cmdlmc_tpu.io.xyz import write_xyz_frame


def make_traj(tmp_path, n_frames=60, n_atoms=10):
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 10, size=(n_atoms, 3))
    path = tmp_path / "t.xyz"
    with open(path, "w") as f:
        for _ in range(n_frames):
            write_xyz_frame(f, ["O"] * n_atoms,
                            pos + rng.normal(scale=0.03, size=pos.shape))
    return path


def config(traj, *, sweeps=60, ckpt="", block_size=20, seed=7, backend="scan",
           print_frequency=10, reset_frequency=0):
    ck = f"checkpoint_path = {ckpt}" if ckpt else ""
    rf = f"reset_frequency = {reset_frequency}" if reset_frequency else ""
    return f"""
[Trajectory]
type = XYZTrajectory
filename = {traj}
time_step = 0.5

[AtomBox]
type = AtomBoxCubic
periodic_boundaries = 10,10,10

[NeighborTopology]
donor_atoms = O
cutoff = 3.0
buffer = 2.0

[JumpRate]
type = Fermi
a = 0.1
b = 2.5
c = 0.3

[KMCLattice]
lattice_size = 10
proton_number = 4
time_step = 0.5

[Output]
type = ObservablesOutput
print_frequency = {print_frequency}
{rf}

[Engine]
replicas = 4
seed = {seed}
block_size = {block_size}
sweeps = {sweeps}
backend = {backend}
{ck}
"""


def run(cfg_text):
    out = io.StringIO()
    run_from_config(io.StringIO(cfg_text), out=out)
    return [
        l for l in out.getvalue().splitlines() if l and not l.startswith("#")
    ]


def test_rerun_of_completed_run_is_noop(tmp_path):
    """ADVICE #1: a second run over a finished checkpoint must not
    double-simulate — the checkpoint keeps pointing at the end frame."""
    traj = make_traj(tmp_path)
    ckpt = str(tmp_path / "c.npz")
    rows1 = run(config(traj, ckpt=ckpt))
    assert rows1  # produced output
    rows2 = run(config(traj, ckpt=ckpt))
    assert rows2 == []  # everything already simulated: no new rows
    with np.load(ckpt) as f:
        assert int(f["next_frame"]) == 60  # not rewound to 0
    # and a third run still refuses to re-simulate
    rows3 = run(config(traj, ckpt=ckpt))
    assert rows3 == []


def test_resume_with_different_physics_refuses(tmp_path):
    traj = make_traj(tmp_path)
    ckpt = str(tmp_path / "c.npz")
    run(config(traj, sweeps=40, ckpt=ckpt))
    with pytest.raises(ValueError, match="different physics"):
        run(config(traj, sweeps=60, ckpt=ckpt, seed=8))


def test_resume_with_straddling_block_size_refuses(tmp_path):
    traj = make_traj(tmp_path)
    ckpt = str(tmp_path / "c.npz")
    run(config(traj, sweeps=30, ckpt=ckpt, block_size=10))  # checkpoint at 30
    with pytest.raises(ValueError, match="block_size"):
        # blocks of 25: [0,25) skipped? no — 25 < 30 < 50 straddles
        run(config(traj, sweeps=60, ckpt=ckpt, block_size=25))


def test_resume_with_compatible_block_size_continues(tmp_path):
    traj = make_traj(tmp_path)
    ckpt = str(tmp_path / "c.npz")
    full = run(config(traj, sweeps=60, block_size=20))
    run(config(traj, sweeps=30, ckpt=ckpt, block_size=10))
    resumed = run(config(traj, sweeps=60, ckpt=ckpt, block_size=10))
    # rows emitted after the resume point must match the uninterrupted run
    # bit-exactly (event-ordinal RNG keying)
    tail = [r for r in full if float(r.split()[0]) >= 30]
    assert resumed == tail


def test_fused_cadence_matches_scan_frames(tmp_path):
    """The fused backend must emit rows at exactly the scan engine's frames
    (per-frame cadence parity, MDMC.py:198-208) — not at block boundaries."""
    traj = make_traj(tmp_path)
    rows_scan = run(config(traj, block_size=16, backend="scan",
                           print_frequency=10, reset_frequency=25))
    rows_fused = run(config(traj, block_size=16, backend="fused",
                            print_frequency=10, reset_frequency=25))
    frames_scan = [int(float(r.split()[0])) for r in rows_scan]
    frames_fused = [int(float(r.split()[0])) for r in rows_fused]
    assert frames_fused == frames_scan == [0, 10, 20, 30, 40, 50]
    # resets happened on both paths: jumps counter falls back after frame 25
    jumps_scan = [float(r.split()[6]) for r in rows_scan]
    jumps_fused = [float(r.split()[6]) for r in rows_fused]
    assert jumps_scan[3] <= jumps_scan[2] + 1e-6 or jumps_scan[2] == 0
    assert jumps_fused[3] <= jumps_fused[2] + 1e-6 or jumps_fused[2] == 0
