"""Post-processing of KMC stdout: interval averaging, MSD-slope diffusion
coefficients, bootstrap errors.

Re-provides the reference's ``average_MC_out`` CLI (LMC/average_MC_out.py):
the KMC run's column output is split into reset intervals, averaged, and the
summed-MSD slope fit gives D = m / 6 with unit conversion. Interval detection
uses the same three strategies as the reference: parse echoed ``#`` settings
(average_MC_out.py:38-56), an 'Averaged Results' footer (:58-78), or the
MSD-zero heuristic (:82-91).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from cmdlmc_tpu.analysis.units import parse_msd_unit

N_COLUMNS = 7  # sweeps time msd_x msd_y msd_z autocorr jumps


def _settings_from_comments(lines):
    settings = {}
    for line in lines:
        if not line.startswith("#"):
            continue
        for key in ("print_freq", "reset_freq", "sweeps"):
            if key in line:
                try:
                    settings[key] = int(float(line.split()[-1]))
                except ValueError:
                    pass
    try:
        if settings["reset_freq"] <= 0 or settings["print_freq"] <= 0:
            return None
        interval_length = settings["reset_freq"] // settings["print_freq"]
        if settings["sweeps"]:
            interval_number = settings["sweeps"] // settings["reset_freq"]
        else:
            interval_number = None
        return interval_length, interval_number
    except KeyError:
        return None


def _intervals_from_footer(lines, marker):
    """Reference 'Averaged Results' footer strategy (average_MC_out.py:58-79):
    runs of the reference itself append an averaged block between a line
    containing 'Averaged Results' and one containing 'Total time'. The number
    of data rows in that block is the interval length; the data rows above the
    marker divided by it give the interval count."""
    end = next(
        (i for i, l in enumerate(lines) if "Total time" in l), len(lines)
    )

    def n_data_rows(chunk):
        count = 0
        for l in chunk:
            parts = l.split()
            if not parts or l.lstrip().startswith("#"):
                continue
            try:
                [float(x) for x in parts]
            except ValueError:
                continue
            count += 1
        return count

    interval_length = n_data_rows(lines[marker:end])
    if interval_length == 0:
        return None
    total = n_data_rows(lines[:marker])
    return interval_length, total // interval_length


def _intervals_from_msd_zeros(data):
    zeros = np.where(data[:, 2] == 0)[0]
    if len(zeros) < 2:
        return None
    interval_length = zeros[1] - zeros[0]
    return interval_length, len(zeros)


def load_intervals(filename_or_lines, verbose=False):
    """Load KMC output into an array of shape (intervals, rows, columns)."""
    if isinstance(filename_or_lines, str):
        with open(filename_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(filename_or_lines)

    # A reference-produced output file may carry an 'Averaged Results' footer
    # (average_MC_out.py:58-79): its rows are derived data, not run output —
    # clip them from the body and use them as an interval-detection source.
    footer_marker = next(
        (i for i, l in enumerate(lines) if "Averaged Results" in l), None
    )
    body = lines if footer_marker is None else lines[:footer_marker]

    # tolerate contaminated captures (stderr log lines, partial rows): keep
    # only rows that parse as floats with the majority column count
    rows = []
    for l in body:
        if not l.strip() or l.startswith("#"):
            continue
        try:
            rows.append([float(x) for x in l.split()])
        except ValueError:
            continue
    if not rows:
        raise ValueError("No data rows found")
    from collections import Counter

    ncols = Counter(len(r) for r in rows).most_common(1)[0][0]
    data = np.array([r for r in rows if len(r) == ncols], dtype=float)

    result = _settings_from_comments(lines)
    if result is None and footer_marker is not None:
        result = _intervals_from_footer(lines, footer_marker)
    if result is None:
        result = _intervals_from_msd_zeros(data)
    if result is None:
        interval_length, interval_number = data.shape[0], 1
    else:
        interval_length, interval_number = result
    if interval_number is None or interval_number * interval_length > data.shape[0]:
        interval_number = data.shape[0] // interval_length
    if interval_number == 0:
        interval_length, interval_number = data.shape[0], 1
    if verbose:
        print(
            f"# intervals: {interval_number} x {interval_length} rows",
            file=sys.stderr,
        )
    n = interval_number * interval_length
    return data[:n].reshape(interval_number, interval_length, data.shape[1])


def average_intervals(data, variance=False):
    """Interval mean (and variance) of every observable column
    (average_MC_out.py:115-125)."""
    time = data[0, :, 0:2]
    avg = data[:, :, 2:].mean(axis=0)
    if variance:
        return time, avg, data[:, :, 2:].var(axis=0)
    return time, avg


def fit_slope(
    data,
    *,
    fit_startpoint: int = 0,
    average_first: bool = False,
    length_unit: str = "angstrom",
    time_unit: str = "fs",
    output_unit: str = "angstrom**2/ps",
):
    """Slope of summed MSD vs time -> (m, m_err, D, D_err) in output_unit
    (average_MC_out.py:149-205). Per-interval fits by default; with
    ``average_first`` the intervals are averaged before one weighted fit."""
    time = data[0, :, 1]
    msd_sum = data[:, :, 2:5].sum(axis=-1)  # [intervals, rows]
    t = time[fit_startpoint:]

    if average_first:
        y = msd_sum.mean(axis=0)[fit_startpoint:]
        yerr = np.sqrt(msd_sum.var(axis=0))[fit_startpoint:]
        w = np.where(yerr > 0, 1.0 / np.maximum(yerr, 1e-12), 1.0)
        coef, cov = np.polyfit(t, y, 1, w=w, cov=True)
        m, m_err = coef[0], float(np.sqrt(cov[0, 0]))
    else:
        slopes = []
        for interval in msd_sum:
            coef = np.polyfit(t, interval[fit_startpoint:], 1)
            slopes.append(coef[0])
        slopes = np.asarray(slopes)
        m = slopes.mean()
        m_err = slopes.std() / max(np.sqrt(len(slopes) - 1), 1.0)

    # input data is angstrom^2 / (time column unit); convert via declared units
    base = parse_msd_unit(f"{length_unit}**2/{time_unit}")
    factor = parse_msd_unit(output_unit) / base
    m, m_err = m * factor, m_err * factor
    return m, m_err, m / 6.0, m_err / 6.0


def bootstrap_slope(data, n_boot=200, seed=0, **kw):
    """Bootstrap over intervals: distribution of the MSD slope
    (average_MC_out.py:137-146, completed — the reference version dead-ends in
    a debugger call)."""
    rng = np.random.RandomState(seed)
    n = data.shape[0]
    slopes = []
    for _ in range(n_boot):
        idx = rng.randint(0, n, size=n)
        m, _, _, _ = fit_slope(data[idx], **kw)
        slopes.append(m)
    slopes = np.asarray(slopes)
    return slopes.mean(), slopes.std()


def plot_msd_slope(data, path, *, fit_startpoint=0, length_unit="angstrom",
                   time_unit="fs"):
    """Errorbar figure of the interval-averaged summed MSD with the fitted
    slope line — parity with the reference's --plot surface
    (average_MC_out.py:190-205). Saved to ``path`` (headless Agg backend)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    time = data[0, :, 1]
    msd_sum = data[:, :, 2:5].sum(axis=-1)
    y = msd_sum.mean(axis=0)
    yerr = msd_sum.std(axis=0)
    m, m_err, _, _ = fit_slope(
        data, fit_startpoint=fit_startpoint, average_first=True,
        length_unit=length_unit, time_unit=time_unit,
        output_unit=f"{length_unit}**2/{time_unit}",
    )
    t_fit = time[fit_startpoint:]
    coef = np.polyfit(t_fit, y[fit_startpoint:], 1)
    fig, ax = plt.subplots(figsize=(6, 4))
    step = max(len(time) // 40, 1)
    ax.errorbar(time[::step], y[::step], yerr=yerr[::step], fmt="o",
                ms=3, lw=1, capsize=2, label="interval-averaged MSD")
    ax.plot(t_fit, np.polyval(coef, t_fit), "-",
            label=f"fit: m = {m:.4g} ± {m_err:.2g} {length_unit}**2/{time_unit}")
    ax.set_xlabel(f"time / {time_unit}")
    ax.set_ylabel(f"MSD / {length_unit}**2")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Average KMC output (time in first two columns)"
    )
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--time_unit", default="fs")
    parser.add_argument("--length_unit", default="angstrom")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_avg = sub.add_parser("average", help="Average all columns over intervals")
    p_avg.add_argument("file")
    p_avg.add_argument("--variance", action="store_true")

    p_slope = sub.add_parser("slope", help="MSD slope -> diffusion coefficient")
    p_slope.add_argument("file")
    p_slope.add_argument("-a", "--average_first", action="store_true")
    p_slope.add_argument("--msd-fitstart", "-s", type=int, default=0)
    p_slope.add_argument("--output_unit", "-u", default="angstrom**2/ps")
    p_slope.add_argument("--minimal", "-m", action="store_true")
    p_slope.add_argument(
        "--plot", nargs="?", const="msd_slope.png", default=None,
        metavar="FILE",
        help="Save an errorbar plot of the interval-averaged MSD with the "
             "fitted slope line (average_MC_out.py:190-205); default "
             "msd_slope.png",
    )

    p_boot = sub.add_parser("bootstrap", help="Bootstrap MSD slope error")
    p_boot.add_argument("file")
    p_boot.add_argument("--n-boot", type=int, default=200)
    p_boot.add_argument("--output_unit", "-u", default="angstrom**2/ps")

    p_cond = sub.add_parser(
        "conductivity",
        help="Nernst-Einstein conductivity from the MSD slope "
             "(sigma = n q^2 D / kB T)",
    )
    p_cond.add_argument("file")
    p_cond.add_argument("--carriers", type=float, required=True,
                        help="Number of charge carriers in the box")
    p_cond.add_argument("--volume", type=float, required=True,
                        help="Box volume in angstrom^3")
    p_cond.add_argument("--temperature", "-T", type=float, default=300.0)
    p_cond.add_argument("--msd-fitstart", "-s", type=int, default=0)

    args = parser.parse_args(argv)
    data = load_intervals(args.file, verbose=args.verbose)

    if args.cmd == "average":
        if args.variance:
            time, avg, var = average_intervals(data, variance=True)
        else:
            time, avg = average_intervals(data)
            var = None
        header = ["sweeps", "time", "msd_x", "msd_y", "msd_z", "autocorr", "jumps"]
        print("# " + " ".join(f"{h:>12}" for h in header[: 2 + avg.shape[1]]))
        for i in range(avg.shape[0]):
            cols = [f"{time[i,0]:12.2f}", f"{time[i,1]:12.2f}"]
            cols += [f"{v:12.4f}" for v in avg[i]]
            if var is not None:
                cols += [f"{v:12.4f}" for v in var[i]]
            print(" ".join(cols))
    elif args.cmd == "slope":
        m, m_err, d, d_err = fit_slope(
            data,
            fit_startpoint=args.msd_fitstart,
            average_first=args.average_first,
            length_unit=args.length_unit,
            time_unit=args.time_unit,
            output_unit=args.output_unit,
        )
        if args.minimal:
            print(d, d_err)
        else:
            print("Slope:")
            print(f"({m} ± {m_err}) {args.output_unit}")
            print("Diffusion coefficient:")
            print(f"({d} ± {d_err}) {args.output_unit}")
        if args.plot:
            plot_msd_slope(
                data, args.plot, fit_startpoint=args.msd_fitstart,
                length_unit=args.length_unit, time_unit=args.time_unit,
            )
            print(f"plot saved to {args.plot}")
    elif args.cmd == "conductivity":
        from cmdlmc_tpu.analysis.units import nernst_einstein_conductivity

        _, _, d, d_err = fit_slope(
            data, fit_startpoint=args.msd_fitstart,
            length_unit=args.length_unit, time_unit=args.time_unit,
            output_unit="cm**2/s",
        )
        n_per_cm3 = args.carriers / (args.volume * 1e-24)
        sigma = nernst_einstein_conductivity(d, n_per_cm3, args.temperature)
        sigma_err = nernst_einstein_conductivity(d_err, n_per_cm3, args.temperature)
        print(f"D = ({d:.6g} ± {d_err:.2g}) cm**2/s")
        print(f"n = {n_per_cm3:.6g} carriers/cm**3, T = {args.temperature} K")
        print(f"sigma = ({sigma:.6g} ± {abs(sigma_err):.2g}) S/cm")
    else:
        m, m_err = bootstrap_slope(
            data,
            n_boot=args.n_boot,
            length_unit=args.length_unit,
            time_unit=args.time_unit,
            output_unit=args.output_unit,
        )
        print(f"bootstrap slope: ({m} ± {m_err}) {args.output_unit}")


if __name__ == "__main__":
    main()
