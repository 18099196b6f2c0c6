"""The five BASELINE.json reference configurations, exercised end to end
(CPU-sized replicas/frames, structurally faithful):

1. single proton on a static 64-site cubic lattice, constant rate -> MSD must
   match the analytic simple-cubic random walk (the minimum end-to-end slice),
2. solid-acid xyz trajectory, distance-dependent Fermi rates, single proton,
3. multi-proton LMC with site exclusion, HDF5 trajectory, jumpstat histograms,
4. vmapped replica ensemble -> ensemble MSD -> Nernst-Einstein conductivity,
5. 2x2x2 supercell (box_multiplier) with streamed trajectory and covalent-bond
   autocorrelation decay.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmdlmc_tpu.analysis.average import fit_slope, load_intervals
from cmdlmc_tpu.analysis.units import nernst_einstein_conductivity
from cmdlmc_tpu.core.cell import Cell
from cmdlmc_tpu.driver import run_from_config
from cmdlmc_tpu.engine import lattice as eng
from cmdlmc_tpu.io.converters import save_xyz_to_hdf5
from cmdlmc_tpu.io.xyz import write_xyz_frame
from cmdlmc_tpu.rates.laws import Constant, Fermi
from cmdlmc_tpu.topo.models import Frame, PairRates


def grid_positions(n_side, spacing):
    g = np.array(
        [
            [i, j, k]
            for i in range(n_side)
            for j in range(n_side)
            for k in range(n_side)
        ],
        dtype=np.float32,
    )
    return g * spacing


def test_config1_static_lattice_analytic_random_walk():
    """64-site simple cubic lattice, constant rate w to each of 6 nearest
    neighbors: MSD(t) = 6 w l^2 t exactly (isotropic lattice walk)."""
    n_side, spacing = 4, 2.5
    positions = grid_positions(n_side, spacing)  # 64 sites
    L = n_side * spacing
    cell = Cell.cubic([L, L, L])
    w, dt, F, R = 0.02, 0.5, 1500, 256
    model = PairRates(
        cell=cell, law=Constant(a=jnp.float32(w)),
        cutoff=jnp.float32(spacing + 0.1), buffer=jnp.float32(0.0),
    )
    key = jax.random.key(0)
    ens = eng.init_replicas(
        jax.random.fold_in(key, 0), R, 64, 1, jnp.asarray(positions)
    )
    keys = jax.random.split(jax.random.fold_in(key, 1), R)
    idx = jnp.arange(F, dtype=jnp.int32)
    frames = Frame(
        donors=jnp.broadcast_to(jnp.asarray(positions), (F, 64, 3)),
        extras=None, time=idx.astype(jnp.float32) * dt, index=idx,
    )
    ens, rows = eng.run_block(model, cell, ens, keys, frames, dt=dt,
                              emit_every=100)
    msd_total = np.asarray(rows.msd_mean).sum(axis=1)
    t = (np.arange(F) + 1) * dt
    want = 6.0 * w * spacing**2 * t
    for f in (499, 999, 1499):
        fe = f - f % 100
        # SE of the ensemble MSD estimator ~ msd * sqrt(2/events)/sqrt(R)
        rel_tol = 6.0 / np.sqrt(R) + 0.05
        assert abs(msd_total[fe] - want[fe]) < rel_tol * want[fe], (
            fe, msd_total[fe], want[fe]
        )


@pytest.fixture(scope="module")
def solid_acid_files(tmp_path_factory):
    rng = np.random.RandomState(1)
    n_p, n_o = 8, 32
    p_pos = rng.uniform(0, 12, size=(n_p, 3))
    offsets = np.array(
        [[1.3, 0, 0], [-1.3, 0, 0], [0, 1.3, 0], [0, -1.3, 0]], dtype=float
    )
    o_pos = (p_pos[:, None, :] + offsets[None, :, :]).reshape(-1, 3)
    names = ["P"] * n_p + ["O"] * n_o
    base = np.vstack([p_pos, o_pos])
    tmp = tmp_path_factory.mktemp("baseline")
    xyz = tmp / "cs.xyz"
    with open(xyz, "w") as f:
        for _ in range(80):
            write_xyz_frame(f, names, base + rng.normal(scale=0.05, size=base.shape))
    h5 = save_xyz_to_hdf5(str(xyz))
    return str(xyz), h5


def test_config2_single_proton_fermi_cmdlmc(solid_acid_files):
    xyz, _ = solid_acid_files
    cfg = f"""
[Trajectory]
type = XYZTrajectory
filename = {xyz}
time_step = 0.4

[AtomBox]
type = AtomBoxCubic
periodic_boundaries = 12,12,12

[NeighborTopology]
donor_atoms = O
cutoff = 3.0
buffer = 1.0

[JumpRate]
type = Fermi
a = 0.08
b = 2.4
c = 0.15

[KMCLattice]
lattice_size = 32
proton_number = 1
time_step = 0.4

[Output]
print_frequency = 10

[Engine]
replicas = 16
seed = 2
block_size = 40
"""
    out = io.StringIO()
    run_from_config(io.StringIO(cfg), out=out)
    rows = [l.split() for l in out.getvalue().splitlines()
            if l and not l.startswith("#")]
    assert len(rows) == 8
    arr = np.array(rows, dtype=float)
    assert np.all(np.isfinite(arr))
    # single proton: autocorr column bounded by 1
    assert np.all(arr[:, 5] <= 1.0)


def test_config3_multiproton_hdf5_jumpstat(solid_acid_files):
    _, h5 = solid_acid_files
    from cmdlmc_tpu.config.schema import load_config
    from cmdlmc_tpu.driver import Simulation

    cfg_text = f"""
[Trajectory]
type = HDF5Trajectory
filename = {h5}
time_step = 0.4

[AtomBox]
type = AtomBoxCubic
periodic_boundaries = 12,12,12

[NeighborTopology]
donor_atoms = O
cutoff = 3.0
buffer = 1.0

[JumpRate]
type = Fermi
a = 0.08
b = 2.4
c = 0.15

[KMCLattice]
lattice_size = 32
proton_number = 12
time_step = 0.4

[Output]
print_frequency = 20

[Engine]
replicas = 8
seed = 4
block_size = 40
"""
    sim = Simulation(load_config(io.StringIO(cfg_text)))
    sim.hist_bins = 10
    sim.hist_range = (2.0, 3.0)
    for _ in sim.observable_rows():
        pass
    jumps = np.asarray(sim.final_states.replicas.jump_hist).sum(axis=0)
    opp = np.asarray(sim.final_states.replicas.opportunity_hist).sum(axis=0)
    assert jumps.sum() > 0
    assert opp.sum() > 0
    # site exclusion: occupancy stays at proton_number everywhere
    occ = np.asarray(sim.final_states.replicas.occ)
    np.testing.assert_allclose(occ.sum(axis=1), 12.0, atol=1e-5)


def test_config4_replica_ensemble_conductivity():
    """Ensemble MSD -> D -> Nernst-Einstein conductivity, all on device except
    the final slope fit (BASELINE config 4; replica count CPU-sized here, the
    structure is identical at 1e4)."""
    n_side, spacing = 4, 2.5
    positions = grid_positions(n_side, spacing)
    L = n_side * spacing
    cell = Cell.cubic([L, L, L])
    w, dt, F, R, P = 0.02, 0.5, 800, 128, 16
    model = PairRates(
        cell=cell, law=Constant(a=jnp.float32(w)),
        cutoff=jnp.float32(spacing + 0.1), buffer=jnp.float32(0.0),
    )
    key = jax.random.key(3)
    ens = eng.init_replicas(jax.random.fold_in(key, 0), R, 64, P,
                            jnp.asarray(positions))
    keys = jax.random.split(jax.random.fold_in(key, 1), R)
    idx = jnp.arange(F, dtype=jnp.int32)
    frames = Frame(
        donors=jnp.broadcast_to(jnp.asarray(positions), (F, 64, 3)),
        extras=None, time=idx.astype(jnp.float32) * dt, index=idx,
    )
    ens, rows = eng.run_block(model, cell, ens, keys, frames, dt=dt,
                              emit_every=50)
    sel = np.arange(50, F, 50)
    msd = np.asarray(rows.msd_mean).sum(axis=1)[sel]
    t = np.asarray(rows.time)[sel]
    m = np.polyfit(t, msd, 1)[0]  # A^2/fs
    d_cm2_s = m / 6.0 * 1e-16 / 1e-15  # A^2/fs -> cm^2/s
    # blocking factor reduces D below the free-lattice value; just demand the
    # right order of magnitude and a positive conductivity
    carrier_density = P / (L**3 * 1e-24)  # per cm^3
    sigma = nernst_einstein_conductivity(d_cm2_s, carrier_density, 300.0)
    assert sigma > 0
    d_free = w * spacing**2  # A^2/fs, no blocking
    assert 0.2 * d_free < m / 6.0 < 1.2 * d_free


def test_config5_supercell_autocorrelation(solid_acid_files, tmp_path):
    xyz, _ = solid_acid_files
    cfg = f"""
[Trajectory]
type = XYZTrajectory
filename = {xyz}
time_step = 0.4
repeat = True

[AtomBox]
type = AtomBoxCubic
periodic_boundaries = 12,12,12
box_multiplier = 2,2,2

[NeighborTopology]
donor_atoms = O
cutoff = 3.0
buffer = 1.0

[JumpRate]
type = Fermi
a = 0.08
b = 2.4
c = 0.15

[KMCLattice]
lattice_size = 256
proton_number = 96
time_step = 0.4

[Output]
print_frequency = 20
reset_frequency = 100

[Engine]
replicas = 4
seed = 6
block_size = 50
sweeps = 200
"""
    out = io.StringIO()
    run_from_config(io.StringIO(cfg), out=out)
    rows = [l.split() for l in out.getvalue().splitlines()
            if l and not l.startswith("#")]
    arr = np.array(rows, dtype=float)
    assert arr.shape[0] == 10
    # 2x2x2 supercell: 32 O -> 256 virtual sites; autocorr starts at 96 and
    # decays within each reset interval
    auto = arr[:, 5]
    assert auto.max() <= 96.0
    assert auto.min() < 96.0  # jumps happened
    # interval-averaged analysis runs on the output
    data = load_intervals(
        ["# reset_freq 100\n", "# print_freq 20\n", "# sweeps 200\n"]
        + [l + "\n" for l in out.getvalue().splitlines() if not l.startswith("#")]
    )
    assert data.shape[0] >= 1
