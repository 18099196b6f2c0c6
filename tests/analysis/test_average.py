"""Analysis-layer tests: interval detection (settings comments and MSD-zero
heuristic), interval averaging, slope fits with unit conversion
(average_MC_out semantics), bootstrap, Nernst-Einstein conductivity."""

import numpy as np
import pytest

from cmdlmc_tpu.analysis.average import (
    average_intervals,
    bootstrap_slope,
    fit_slope,
    load_intervals,
)
from cmdlmc_tpu.analysis.units import nernst_einstein_conductivity, parse_msd_unit


def synth_output(n_intervals=5, rows=20, slope=0.3, dt=10.0, noise=0.0, seed=0,
                 comments=True):
    """Synthetic KMC output: summed MSD grows linearly within each interval."""
    rng = np.random.RandomState(seed)
    lines = []
    if comments:
        lines += [
            f"# sweeps {n_intervals * rows * 1}",
            "# reset_freq 20",
            "# print_freq 1",
        ]
    frame = 0
    for _ in range(n_intervals):
        for r in range(rows):
            t = r * dt
            msd = slope * t / 3 + noise * rng.normal(size=3) * np.sqrt(t + 1) / 10
            msd = np.maximum(msd, 0)
            if r == 0:
                msd = np.zeros(3)
            lines.append(
                f"{frame:8d} {t:10.2f} {msd[0]:10.4f} {msd[1]:10.4f} "
                f"{msd[2]:10.4f} {5.0:6.2f} {float(r):6.2f}"
            )
            frame += 1
    return [l + "\n" for l in lines]


def test_interval_detection_from_comments():
    data = load_intervals(synth_output())
    assert data.shape == (5, 20, 7)


def test_interval_detection_from_msd_zeros():
    data = load_intervals(synth_output(comments=False))
    assert data.shape == (5, 20, 7)


def test_interval_detection_from_averaged_results_footer():
    """Reference-produced files carry an 'Averaged Results' footer
    (average_MC_out.py:58-79); its row count gives the interval length and
    the footer rows are excluded from the body."""
    lines = synth_output(n_intervals=4, rows=25, comments=False)
    # break the msd-zero heuristic deliberately: footer must be what works
    lines = [l if i % 25 or i == 0 else l.replace(" 0.0000", " 0.0001", 3)
             for i, l in enumerate(lines)]
    footer = ["# Averaged Results:\n", "# sweeps time msd autocorr jumps\n"]
    for r in range(25):
        footer.append(f"{r:8d} {r*10.0:10.2f} 1.0 1.0 1.0 5.0 2.0\n")
    footer.append("# Total time: 42 s\n")
    data = load_intervals(lines + footer)
    assert data.shape == (4, 25, 7)
    # the footer's constant rows must not leak into the body data
    assert not np.allclose(data[-1, :, 2], 1.0)


def test_average_intervals():
    data = load_intervals(synth_output(noise=0.1))
    time, avg, var = average_intervals(data, variance=True)
    assert time.shape == (20, 2)
    assert avg.shape == (20, 5)
    assert np.all(var >= 0)


def test_slope_recovers_diffusion_coefficient():
    data = load_intervals(synth_output(slope=0.3, noise=0.0))
    m, m_err, d, d_err = fit_slope(data, output_unit="angstrom**2/fs")
    assert m == pytest.approx(0.3, rel=1e-3)
    assert d == pytest.approx(0.05, rel=1e-3)

    # unit conversion: angstrom^2/ps is 1000x larger in numeric value
    m2, _, _, _ = fit_slope(data, output_unit="angstrom**2/ps")
    assert m2 == pytest.approx(300.0, rel=1e-3)


def test_slope_average_first_with_noise():
    data = load_intervals(synth_output(slope=0.3, noise=1.0, n_intervals=20))
    m, m_err, _, _ = fit_slope(data, average_first=True, fit_startpoint=2,
                               output_unit="angstrom**2/fs")
    assert m == pytest.approx(0.3, rel=0.2)
    assert m_err > 0


def test_bootstrap_slope():
    data = load_intervals(synth_output(slope=0.3, noise=0.5, n_intervals=10))
    m, err = bootstrap_slope(data, n_boot=50, output_unit="angstrom**2/fs")
    assert m == pytest.approx(0.3, rel=0.3)
    assert err >= 0


def test_unit_parse():
    assert parse_msd_unit("angstrom**2/fs") == pytest.approx(1.0)
    assert parse_msd_unit("angstrom**2/ps") == pytest.approx(1e3)
    assert parse_msd_unit("cm**2/s") == pytest.approx(1e15 / 1e16)
    assert parse_msd_unit("nm**2/ns") == pytest.approx(1e6 / 100)


def test_nernst_einstein():
    # D = 1e-5 cm^2/s, n = 1e21 /cm^3, T = 300 K, q = e
    sigma = nernst_einstein_conductivity(1e-5, 1e21, 300.0)
    # sigma = n e^2 D / kT ~ 0.062 S/cm
    want = 1e21 * (1.602176634e-19) ** 2 * 1e-5 / (1.380649e-23 * 300)
    assert sigma == pytest.approx(want, rel=1e-12)
    assert 0.01 < sigma < 1.0


def test_cli_slope_runs(tmp_path, capsys):
    from cmdlmc_tpu.analysis.average import main

    out_file = tmp_path / "kmc.out"
    out_file.write_text("".join(synth_output(slope=0.12)))
    main(["slope", str(out_file), "--minimal", "-u", "angstrom**2/fs"])
    captured = capsys.readouterr().out.split()
    assert float(captured[0]) == pytest.approx(0.02, rel=1e-3)


def test_cli_conductivity_runs(tmp_path, capsys):
    from cmdlmc_tpu.analysis.average import main

    out_file = tmp_path / "kmc.out"
    out_file.write_text("".join(synth_output(slope=0.12)))
    main([
        "conductivity", str(out_file), "--carriers", "96",
        "--volume", "3000", "-T", "500",
    ])
    captured = capsys.readouterr().out
    assert "sigma" in captured and "S/cm" in captured


def test_load_intervals_tolerates_noise_lines():
    from cmdlmc_tpu.analysis.average import load_intervals

    lines = synth_output()
    lines.insert(5, "WARNING: some stderr contamination\n")
    lines.insert(9, "1 2 3\n")  # wrong column count
    data = load_intervals(lines)
    assert data.shape == (5, 20, 7)


def test_cli_slope_plot(tmp_path, capsys):
    from cmdlmc_tpu.analysis.average import main

    out_file = tmp_path / "kmc.out"
    out_file.write_text("".join(synth_output(slope=0.12, noise=0.3)))
    fig = tmp_path / "msd.png"
    main(["slope", str(out_file), "--plot", str(fig)])
    assert fig.exists() and fig.stat().st_size > 1000  # a real PNG
    assert "plot saved" in capsys.readouterr().out
