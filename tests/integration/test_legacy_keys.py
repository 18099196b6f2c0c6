"""End-to-end coverage of the remaining legacy cMDLMC keywords
(IO/config_parser.py:151-561): skip_frames, clip_trajectory, shuffle,
periodic_wrap, o_neighbor, angle_dependency, output, auxiliary_file, hdf5,
higher_msd, neighbor_list."""

import io
import os

import numpy as np
import pytest

from cmdlmc_tpu.config.legacy import load_legacy_config
from cmdlmc_tpu.driver import Simulation
from cmdlmc_tpu.io.xyz import write_xyz_frame

BASE = """
filename {fname}
pbc 10 10 10
md_timestep_fs 0.5
sweeps {sweeps}
print_frequency 10
proton_number 4
lattice_size 10
donor_atoms O
jumprate_type MD_rates
jumprate_params_fs a=0.1 b=2.5 c=0.3
cutoff_radius 3.0
neighbor_search_radius 5.0
seed 3
replicas 4
"""


@pytest.fixture
def traj(tmp_path):
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 10, size=(10, 3))
    path = tmp_path / "legacy.xyz"
    with open(path, "w") as f:
        for _ in range(60):
            write_xyz_frame(f, ["O"] * 10, pos + rng.normal(scale=0.03, size=pos.shape))
    return path


def cfg_text(traj, sweeps=40, extra=""):
    return BASE.format(fname=traj, sweeps=sweeps) + extra


def run_rows(cfg):
    out = io.StringIO()
    Simulation(cfg).run(out=out)
    return out.getvalue()


def data_rows(text):
    return [
        l.split() for l in text.splitlines() if l and not l.startswith("#")
    ]


def test_skip_frames_strides_trajectory(traj):
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, sweeps=20,
                                                  extra="skip_frames 2\n")))
    assert cfg.trajectory.stride == 3
    rows = data_rows(run_rows(cfg))
    # 60 source frames / stride 3 = 20 used frames -> rows at 0 and 10
    assert [int(float(r[0])) for r in rows] == [0, 10]
    # skip_frames subsamples topology updates, not physical time: each used
    # frame covers the full (skip+1)-frame interval, so KMC time advances by
    # md_timestep_fs * (skip_frames+1) per used frame
    # (IO/config_parser.py:196-202). Row at used-frame 10 = 10*3 source
    # frames * 0.5 fs.
    assert [float(r[1]) for r in rows] == pytest.approx([0.0, 15.0])


def test_clip_trajectory_loops(traj):
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, sweeps=50,
                                                  extra="clip_trajectory 25\n")))
    assert cfg.trajectory.clip == 25
    assert cfg.trajectory.repeat  # sweeps beyond the clip loop the trajectory
    rows = data_rows(run_rows(cfg))
    assert [int(float(r[0])) for r in rows] == [0, 10, 20, 30, 40]


def test_shuffle_converts_to_hdf5_and_runs(traj):
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, sweeps=30,
                                                  extra="shuffle True\n")))
    assert cfg.trajectory.type_ == "HDF5Trajectory"
    assert cfg.trajectory.shuffle_seed == 3
    rows = data_rows(run_rows(cfg))
    assert len(rows) == 3
    arr = np.array(rows, dtype=float)
    assert np.all(np.isfinite(arr))


def test_hdf5_key_converts_once(traj):
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, extra="hdf5 True\n")))
    assert cfg.trajectory.type_ == "HDF5Trajectory"
    sibling = os.path.splitext(str(traj))[0] + ".hdf5"
    assert os.path.exists(sibling)
    mtime = os.path.getmtime(sibling)
    # second load re-uses the cache
    cfg2 = load_legacy_config(io.StringIO(cfg_text(traj, extra="hdf5 True\n")))
    assert os.path.getmtime(sibling) == mtime
    assert cfg2.trajectory.filename == cfg.trajectory.filename


def test_auxiliary_file_fallback(traj):
    text = cfg_text(traj).replace(f"filename {traj}", f"auxiliary_file {traj}")
    cfg = load_legacy_config(io.StringIO(text))
    assert str(cfg.trajectory.filename) == str(traj)


def test_missing_filename_and_auxiliary_raises(traj):
    text = cfg_text(traj).replace(f"filename {traj}", "")
    with pytest.raises(ValueError, match="filename"):
        load_legacy_config(io.StringIO(text))


def test_output_key_writes_file(traj, tmp_path):
    out_file = tmp_path / "results.out"
    cfg = load_legacy_config(
        io.StringIO(cfg_text(traj, extra=f"output {out_file}\n"))
    )
    Simulation(cfg).run()
    text = out_file.read_text()
    assert len(data_rows(text)) == 4


def test_higher_msd_column(traj):
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, extra="higher_msd True\n")))
    text = run_rows(cfg)
    header = next(l for l in text.splitlines() if l.startswith("#") and "MSD4" in l)
    assert "MSD4" in header
    rows = data_rows(text)
    assert len(rows[0]) == 8  # 7 base columns + MSD4
    # 4th moment >= squared 2nd moment (Jensen), on the last (largest) row
    msd = sum(float(x) for x in rows[-1][2:5])
    msd4 = float(rows[-1][7])
    assert msd4 >= msd * msd / 3 - 1e-5 or msd < 1e-3


def test_o_neighbor_selects_heavy_atom(tmp_path):
    rng = np.random.RandomState(1)
    pos_o = rng.uniform(0, 10, size=(8, 3))
    pos_s = rng.uniform(0, 10, size=(4, 3))
    path = tmp_path / "angle.xyz"
    names = ["O"] * 8 + ["S"] * 4
    with open(path, "w") as f:
        for _ in range(30):
            pos = np.concatenate([pos_o, pos_s]) + rng.normal(
                scale=0.02, size=(12, 3)
            )
            write_xyz_frame(f, names, pos)
    extra = "angle_threshold 1.0\no_neighbor S\n"
    text = BASE.format(fname=path, sweeps=30) + extra
    text = text.replace("lattice_size 10", "lattice_size 8")
    cfg = load_legacy_config(io.StringIO(text))
    assert cfg.topology.type_ == "AngleTopology"
    assert cfg.topology.extra_atoms == "S"
    assert cfg.jumprate.type_ == "FermiAngle"
    rows = data_rows(run_rows(cfg))
    assert len(rows) == 3


def test_angle_dependency_false_disables_gate(traj):
    extra = "angle_threshold 1.0\nangle_dependency False\n"
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, extra=extra)))
    assert cfg.jumprate.type_ == "Fermi"
    assert cfg.topology.type_ == "NeighborTopology"


def test_neighbor_list_runs_like_dense(traj):
    dense = load_legacy_config(io.StringIO(cfg_text(traj)))
    nl = load_legacy_config(io.StringIO(cfg_text(traj, extra="neighbor_list True\n")))
    assert nl.topology.max_neighbors == 16
    rows_d = np.array(data_rows(run_rows(dense)), dtype=float)
    rows_n = np.array(data_rows(run_rows(nl)), dtype=float)
    assert rows_d.shape == rows_n.shape
    # K=16 > every possible neighbor count in a 10-site system: statistically
    # equivalent dynamics (different selection RNG stream, so not bit-exact)
    assert np.all(np.isfinite(rows_n))


def test_periodic_wrap_xyz_output(traj):
    extra = "periodic_wrap True\nxyz_output True\n"
    cfg = load_legacy_config(io.StringIO(cfg_text(traj, sweeps=20, extra=extra)))
    assert cfg.output.periodic_wrap
    out = io.StringIO()
    Simulation(cfg).run(out=out)
    coords = [
        [float(x) for x in l.split()[1:4]]
        for l in out.getvalue().splitlines()
        if l.split() and l.split()[0] in ("O", "H")
    ]
    arr = np.array(coords)
    assert arr.size > 0
    assert np.all(arr >= 0.0) and np.all(arr < 10.0 + 1e-5)
