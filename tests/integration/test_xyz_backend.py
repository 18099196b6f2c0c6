"""XYZOutput backend parity (VERDICT r2 weak #3): the xyz mode honors the
[Engine] backend knob (fused kernels run span-by-span to print boundaries,
emitting replica 0's proton pseudo-atoms — MDMC.py:173-177), supports
checkpoint/resume, and is bit-identical across device counts."""

import io
import os

import numpy as np
import pytest

from cmdlmc_tpu.config.schema import load_config
from cmdlmc_tpu.driver import Simulation

N_SITES = 12
N_FRAMES = 24

CFG = """
[Trajectory]
type = XYZTrajectory
filename = {traj}
time_step = 0.5

[AtomBox]
type = AtomBoxCubic
periodic_boundaries = 10, 10, 10

[NeighborTopology]
cutoff = 3.0
buffer = 2.0

[JumpRate]
type = Fermi
a = 0.1
b = 2.3
c = 0.3

[KMCLattice]
lattice_size = {n_sites}
proton_number = 4

[Output]
type = XYZOutput
print_frequency = 6

[Engine]
replicas = 8
seed = 1
block_size = 12
backend = {backend}
devices = {devices}
tile = 1
{extra}
"""


@pytest.fixture(scope="module")
def traj(tmp_path_factory):
    from cmdlmc_tpu.io.xyz import write_xyz_frame

    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 10, size=(N_SITES, 3))
    path = tmp_path_factory.mktemp("xyzmode") / "t.xyz"
    with open(path, "w") as f:
        for _ in range(N_FRAMES):
            write_xyz_frame(
                f, ["O"] * N_SITES, pos + rng.normal(scale=0.02, size=pos.shape)
            )
    return str(path)


def run(traj, backend, devices=1, extra=""):
    cfg = load_config(io.StringIO(CFG.format(
        traj=traj, n_sites=N_SITES, backend=backend, devices=devices,
        extra=extra,
    )))
    out = io.StringIO()
    Simulation(cfg).run(out=out)
    return out.getvalue()


def parse_frames(text):
    """Split xyz output text into frames of (names, positions). Driver-level
    '#' comment lines (version stamp, settings echo) are skipped; per-frame
    comment lines inside the xyz body ("frame N") don't start with '#'."""
    lines = [l for l in text.splitlines() if l and not l.startswith("#")]
    frames = []
    i = 0
    while i < len(lines):
        n = int(lines[i])
        body = lines[i + 2 : i + 2 + n]
        names = [l.split()[0] for l in body]
        pos = np.array([[float(x) for x in l.split()[1:4]] for l in body])
        frames.append((names, pos, lines[i + 1]))
        i += 2 + n
    return frames


def test_xyz_fused_backend_runs_and_is_well_formed(traj):
    frames = parse_frames(run(traj, "fused"))
    assert len(frames) == N_FRAMES // 6
    for names, pos, comment in frames:
        assert names.count("O") == N_SITES
        assert names.count("H") == 4
        assert np.all(np.isfinite(pos))
        # proton pseudo-atom positions coincide with donor sites
        donors, protons = pos[:N_SITES], pos[N_SITES:]
        for p in protons:
            assert np.min(np.linalg.norm(donors - p, axis=1)) < 1e-5
    assert frames[0][2] == "frame 0"
    assert frames[-1][2] == f"frame {N_FRAMES - 6}"


def strip_comments(text):
    return "\n".join(
        l for l in text.splitlines() if l and not l.startswith("#")
    )


def test_xyz_fused_multichip_bit_identical(traj):
    # compare the xyz frames only (the '#' settings echo legitimately differs
    # in its devices line)
    assert strip_comments(run(traj, "fused", devices=1)) == strip_comments(
        run(traj, "fused", devices=8)
    )


def test_xyz_scan_same_frame_cadence_as_fused(traj):
    scan_frames = parse_frames(run(traj, "scan"))
    fused_frames = parse_frames(run(traj, "fused"))
    assert len(scan_frames) == len(fused_frames)
    # donor positions identical (same trajectory frames selected); proton
    # placement differs only by RNG stream
    for (sn, sp, sc), (fn, fp, fc) in zip(scan_frames, fused_frames):
        assert sc == fc
        np.testing.assert_allclose(sp[:N_SITES], fp[:N_SITES], atol=1e-5)


def test_xyz_checkpoint_resume(traj, tmp_path):
    ckpt = str(tmp_path / "ck.npz")
    full = run(traj, "fused")
    run(traj, "fused", extra=f"sweeps = 12\ncheckpoint_path = {ckpt}\n"
                             "checkpoint_interval = 1")
    assert os.path.exists(ckpt)
    resumed = run(traj, "fused", extra=f"checkpoint_path = {ckpt}\n"
                                       "checkpoint_interval = 1")
    # frames printed after resume match the tail of the uninterrupted run
    full_frames = parse_frames(full)
    resumed_frames = parse_frames(resumed)
    assert len(resumed_frames) > 0
    for (fn, fp, fc), (rn, rp, rc) in zip(
        full_frames[-len(resumed_frames):], resumed_frames
    ):
        assert fn == rn and fc == rc
        np.testing.assert_array_equal(fp, rp)


def test_xyz_forced_fused_raises_on_unsupported(traj):
    # a skewed triclinic cell beyond the round-based minimum-image bound must
    # raise, not silently degrade (the round-1 'no silent fallback' rule)
    cfg_text = CFG.format(
        traj=traj, n_sites=N_SITES, backend="fused", devices=1, extra="",
    ).replace(
        "type = AtomBoxCubic\nperiodic_boundaries = 10, 10, 10",
        "type = AtomBoxMonoclinic\n"
        "periodic_boundaries = 10, 0, 0, 4.9, 1.0, 0, 0, 0, 10",
    )
    cfg = load_config(io.StringIO(cfg_text))
    with pytest.raises(ValueError, match="fused"):
        Simulation(cfg).run(out=io.StringIO())
