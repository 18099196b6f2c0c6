"""Minimal unit handling for analysis output (the reference uses ``pint``,
average_MC_out.py:14; this environment has no pint, and only length^2/time
conversions are ever needed)."""

from __future__ import annotations

LENGTH_TO_ANGSTROM = {
    "angstrom": 1.0,
    "A": 1.0,
    "nm": 10.0,
    "pm": 0.01,
    "bohr": 0.529177210903,
    "cm": 1e8,
    "m": 1e10,
}

TIME_TO_FS = {
    "fs": 1.0,
    "ps": 1e3,
    "ns": 1e6,
    "us": 1e9,
    "ms": 1e12,
    "s": 1e15,
}


def parse_msd_unit(expr: str) -> float:
    """Conversion factor FROM angstrom**2/fs TO the given unit expression
    (e.g. 'angstrom**2/ps', 'cm**2/s')."""
    expr = expr.replace(" ", "")
    num, _, den = expr.partition("/")
    length = num.replace("**2", "").replace("^2", "")
    if length not in LENGTH_TO_ANGSTROM:
        raise ValueError(f"Unknown length unit {length!r}")
    if den not in TIME_TO_FS:
        raise ValueError(f"Unknown time unit {den!r}")
    # 1 A^2/fs = (1/L^2) target-length^2 per (1/T) target-time
    return TIME_TO_FS[den] / LENGTH_TO_ANGSTROM[length] ** 2


# Physical constants for Nernst-Einstein conductivity
ELEMENTARY_CHARGE_C = 1.602176634e-19
BOLTZMANN_J_PER_K = 1.380649e-23


def nernst_einstein_conductivity(
    diffusion_cm2_per_s: float,
    carrier_density_per_cm3: float,
    temperature_k: float,
    charge: float = 1.0,
) -> float:
    """sigma = n q^2 D / (k_B T) in S/cm (BASELINE.json config 4)."""
    q = charge * ELEMENTARY_CHARGE_C
    return (
        carrier_density_per_cm3
        * q
        * q
        * diffusion_cm2_per_s
        / (BOLTZMANN_J_PER_K * temperature_k)
    )
