"""Driver-level checkpoint/resume: an interrupted config-driven run continues
bit-exactly compared to an uninterrupted one."""

import io

import numpy as np

from cmdlmc_tpu.driver import run_from_config
from cmdlmc_tpu.io.xyz import write_xyz_frame


def make_traj(tmp_path, n_frames=80):
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 10, size=(12, 3))
    path = tmp_path / "t.xyz"
    with open(path, "w") as f:
        for _ in range(n_frames):
            write_xyz_frame(f, ["O"] * 12, pos + rng.normal(scale=0.03, size=pos.shape))
    return path


def config(traj, sweeps, ckpt):
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
lattice_size = 12
proton_number = 4
time_step = 0.5

[Output]
type = ObservablesOutput
print_frequency = 10

[Engine]
replicas = 4
seed = 7
block_size = 20
sweeps = {sweeps}
checkpoint_path = {ckpt}
"""


def run(cfg_text):
    out = io.StringIO()
    run_from_config(io.StringIO(cfg_text), out=out)
    return [
        l for l in out.getvalue().splitlines()
        if l and not l.startswith("#")
    ]


def test_resume_is_bit_exact(tmp_path):
    traj = make_traj(tmp_path)

    full = run(config(traj, 80, tmp_path / "full.npz"))

    # interrupted: 40 frames, then resume the same config for the full 80
    part1 = run(config(traj, 40, tmp_path / "resume.npz"))
    part2 = run(config(traj, 80, tmp_path / "resume.npz"))

    assert full[: len(part1)] == part1
    assert part2 == full[len(part1):]


def test_resume_works_without_npz_extension(tmp_path):
    """checkpoint_path without a .npz suffix must still resume: bare
    np.savez_compressed appends '.npz', desyncing the driver's existence
    check, so every re-run would silently restart from frame 0."""
    traj = make_traj(tmp_path)

    full = run(config(traj, 80, tmp_path / "full.ckpt"))
    part1 = run(config(traj, 40, tmp_path / "resume.ckpt"))
    assert (tmp_path / "resume.ckpt").exists(), (
        "checkpoint must be written to the exact configured path"
    )
    part2 = run(config(traj, 80, tmp_path / "resume.ckpt"))

    assert full[: len(part1)] == part1
    assert part2 == full[len(part1):]


def test_replica_dump(tmp_path):
    import numpy as np

    traj = make_traj(tmp_path, n_frames=40)
    dump = tmp_path / "replicas.npz"
    cfg = config(traj, 40, tmp_path / "c.npz").replace(
        "print_frequency = 10",
        f"print_frequency = 10\nreplica_dump = {dump}",
    )
    run(cfg)
    z = np.load(dump)
    assert z["msd"].shape == (4, 3)
    assert z["event_count"].shape == (4,)
    assert z["site_of_proton"].shape == (4, 4)
