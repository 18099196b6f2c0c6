"""Legacy cMDLMC keyword-config support in mdmc (--legacy): conversion to the
new schema and an end-to-end run, including equilibration_sweeps semantics."""

import io

import numpy as np
import pytest

from cmdlmc_tpu.config.legacy import load_legacy_config
from cmdlmc_tpu.driver import Simulation
from cmdlmc_tpu.io.xyz import write_xyz_frame

LEGACY_CONFIG = """
# legacy keyword config (reference cMDLMC schema)
filename {fname}
pbc 10 10 10
md_timestep_fs 0.5
sweeps 60
equilibration_sweeps 20
print_frequency 10
reset_freq 0
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


def test_conversion_fields(traj):
    cfg = load_legacy_config(io.StringIO(LEGACY_CONFIG.format(fname=traj)))
    assert cfg.trajectory.type_ == "XYZTrajectory"
    assert cfg.jumprate.type_ == "Fermi"
    assert cfg.jumprate.a == 0.1
    assert cfg.topology.cutoff == 3.0
    assert cfg.topology.buffer == 2.0  # search radius - cutoff
    assert cfg.engine.sweeps == 60
    assert cfg.engine.equilibration_sweeps == 20
    assert cfg.kmc.proton_number == 4


def test_ae_rates_conversion(traj):
    text = LEGACY_CONFIG.format(fname=traj).replace(
        "jumprate_type MD_rates", "jumprate_type AE_rates"
    ).replace(
        "jumprate_params_fs a=0.1 b=2.5 c=0.3",
        "jumprate_params_fs A=0.1 a=0.2 b=0.3 d0=2.2 T=300",
    )
    cfg = load_legacy_config(io.StringIO(text))
    assert cfg.jumprate.type_ == "AE"
    assert cfg.jumprate.T == 300


def test_legacy_run_with_equilibration(traj):
    cfg = load_legacy_config(io.StringIO(LEGACY_CONFIG.format(fname=traj)))
    out = io.StringIO()
    Simulation(cfg).run(out=out)
    rows = [
        l.split() for l in out.getvalue().splitlines()
        if l and not l.startswith("#")
    ]
    frames = [int(float(r[0])) for r in rows]
    # rows before equilibration (frame 20) are suppressed
    assert all(f >= 20 for f in frames)
    assert frames == [20, 30, 40, 50]
    # observables were reset at frame 20: MSD small right after
    msd20 = sum(float(x) for x in rows[0][2:5])
    msd50 = sum(float(x) for x in rows[-1][2:5])
    assert msd50 >= msd20


def test_invalid_proton_number_raises(traj):
    import pytest

    from cmdlmc_tpu.config.legacy import load_legacy_config

    text = LEGACY_CONFIG.format(fname=traj).replace(
        "proton_number 4", "proton_number 40"
    )
    cfg = load_legacy_config(io.StringIO(text))
    with pytest.raises(ValueError, match="cannot exceed"):
        Simulation(cfg)
