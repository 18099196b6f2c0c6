"""Legacy cMDLMC keyword-config -> SimulationConfig conversion.

Lets ``mdmc --legacy`` run the reference's first-generation keyword config
files (IO/config_parser.py "cMDLMC" schema) on the new engine: jump-rate types
MD_rates/AE_rates/Exponential_rates map onto Fermi/ActivationEnergy/Exponential
laws, neighbor_search_radius onto cutoff+buffer, angle_threshold onto
FermiAngle + AngleTopology.
"""

from __future__ import annotations

import numpy as np

from cmdlmc_tpu.config import schema as S
from cmdlmc_tpu.config.keyword import load_configfile


def legacy_to_simulation_config(settings) -> S.SimulationConfig:
    fname = settings.filename
    traj_type = (
        "HDF5Trajectory" if str(fname).endswith((".h5", ".hdf5")) else "XYZTrajectory"
    )
    pbc = np.asarray(settings.pbc, dtype=float)
    box_type = "AtomBoxCubic" if pbc.size == 3 else "AtomBoxMonoclinic"

    cutoff = settings.cutoff_radius
    buffer_ = max(settings.neighbor_search_radius - cutoff, 0.0)

    p = dict(settings.jumprate_params_fs)
    jr_type = settings.jumprate_type
    jumprate = S.JumpRateSection()
    topo_type = "NeighborTopology"
    if jr_type in ("MD_rates", "MD_rates_Water"):
        if settings.angle_threshold > 0:
            jumprate.type_ = "FermiAngle"
            jumprate.theta = settings.angle_threshold
            topo_type = "AngleTopology"
        else:
            jumprate.type_ = "Fermi"
        jumprate.a, jumprate.b, jumprate.c = p["a"], p["b"], p["c"]
    elif jr_type == "AE_rates":
        jumprate.type_ = "AE"
        jumprate.A = p["A"]
        jumprate.a = p["a"]
        jumprate.b = p["b"]
        jumprate.d0 = p["d0"]
        jumprate.T = p["T"]
    elif jr_type == "Exponential_rates":
        jumprate.type_ = "Exponential"
        jumprate.a, jumprate.b = p["a"], p["b"]
    else:
        raise ValueError(f"Unknown jumprate_type {jr_type!r}")

    return S.SimulationConfig(
        trajectory=S.TrajectorySection(
            filename=fname, time_step=settings.md_timestep_fs, type_=traj_type
        ),
        atombox=S.AtomBoxSection(
            periodic_boundaries=pbc,
            type_=box_type,
            box_multiplier=tuple(settings.box_multiplier),
        ),
        topology=S.TopologySection(
            type_=topo_type,
            donor_atoms=settings.donor_atoms,
            cutoff=cutoff,
            buffer=buffer_,
            extra_atoms="P" if topo_type == "AngleTopology" else None,
        ),
        jumprate=jumprate,
        kmc=S.KMCLatticeSection(
            lattice_size=settings.lattice_size,
            proton_number=settings.proton_number,
            donor_atoms=settings.donor_atoms,
            time_step=settings.md_timestep_fs,
        ),
        output=S.OutputSection(
            type_="XYZOutput" if settings.xyz_output else "ObservablesOutput",
            reset_frequency=settings.reset_freq,
            print_frequency=settings.print_frequency,
            variance=settings.variance_per_proton,
        ),
        engine=S.EngineSection(
            replicas=settings.replicas,
            seed=settings.seed,
            sweeps=settings.sweeps,
            equilibration_sweeps=settings.equilibration_sweeps,
            jumpmatrix_filename=settings.jumpmatrix_filename,
        ),
    )


def load_legacy_config(path_or_file) -> S.SimulationConfig:
    settings = load_configfile(path_or_file, config_name="cMDLMC")
    return legacy_to_simulation_config(settings)
