"""``jumpstat`` — proton jump probability vs donor-acceptor distance.

Re-provides the capability named in the reference README ("analyses the proton
jump probability between two oxygen atoms depending on their mutual distance",
README.md:57-58) whose source is absent from the reference tree (SURVEY.md
§2.26). Runs the configured simulation with on-device distance histograms
enabled and prints, per distance bin: jump count, exposure (allowed-transition
frames), the empirical per-frame jump probability, and the implied rate.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Distance-resolved proton jump statistics"
    )
    parser.add_argument("configfile", help="Same INI file as mdmc")
    parser.add_argument("--bins", type=int, default=20)
    parser.add_argument("--range", nargs=2, type=float, default=(2.0, 3.0),
                        metavar=("MIN", "MAX"))
    parser.add_argument("--platform", default=None)
    parser.add_argument(
        "--fit", action="store_true",
        help="Fit a Fermi law a/(1+exp((d-b)/c)) to the measured omega(d)",
    )
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from cmdlmc_tpu.config.schema import load_config
    from cmdlmc_tpu.driver import Simulation, jumpstat_lines

    cfg = load_config(args.configfile)
    sim = Simulation(cfg)
    sim.hist_bins = args.bins
    sim.hist_range = tuple(args.range)

    for _ in sim.observable_rows():
        pass
    states = sim.final_states

    jumps = np.asarray(states.replicas.jump_hist).sum(axis=0)
    opp = np.asarray(states.replicas.opportunity_hist).sum(axis=0)
    edges = np.linspace(args.range[0], args.range[1], args.bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    dt = sim.dt

    for line in jumpstat_lines(states, tuple(args.range), args.bins, dt):
        print(line)

    if args.fit:
        from scipy.optimize import curve_fit

        mask = (opp > 0) & (jumps > 0)
        if mask.sum() >= 3:
            omega = jumps[mask] / opp[mask] / dt
            sigma = np.sqrt(jumps[mask]) / opp[mask] / dt  # Poisson errors

            def fermi(d, a, b, c):
                return a / (1.0 + np.exp((d - b) / c))

            p0 = (omega.max(), float(centers[mask].mean()), 0.1)
            try:
                popt, pcov = curve_fit(
                    fermi, centers[mask], omega, p0=p0, sigma=sigma,
                    absolute_sigma=True, maxfev=10000,
                )
                perr = np.sqrt(np.diag(pcov))
                print("# Fermi fit omega(d) = a / (1 + exp((d - b)/c)):")
                for name, v, e in zip("abc", popt, perr):
                    print(f"#   {name} = {v:.6g} +- {e:.2g}")
            except RuntimeError as exc:
                print(f"# Fermi fit failed: {exc}")
        else:
            print("# Fermi fit skipped: not enough populated bins")


if __name__ == "__main__":
    main()
