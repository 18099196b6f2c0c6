"""Keyword config system tests (legacy generation, IO/config_parser.py) and the
kmc_water CLI end to end."""

import io

import numpy as np
import pytest

from cmdlmc_tpu.config.keyword import (
    load_configfile,
    print_config_template,
    print_confighelp,
)


WATER_CONFIG = """
# test config
filename {fname}
pbc 25 25 25
md_timestep_fs 0.5
sweeps 40
print_frequency 10
jumprate_params_fs a=0.06 b=2.4 c=0.2
rescale_function linear
rescale_parameters a=0.5 b=0.5 left_bound=0.0 right_bound=10.0
relaxation_time 5
waiting_time 2
n_atoms 3
seed 3
start_position 0
"""


def test_keyword_parsing_defaults_and_types():
    cfg = load_configfile(
        io.StringIO(WATER_CONFIG.format(fname="x.xyz")), config_name="KMCWater"
    )
    assert cfg.filename == "x.xyz"
    np.testing.assert_array_equal(cfg.pbc, [25, 25, 25])
    assert cfg.jumprate_params_fs == {"a": 0.06, "b": 2.4, "c": 0.2}
    assert cfg.relaxation_time == 5
    assert cfg.keep_last_neighbor_rescaled is False  # default
    assert cfg.d_oh == 0.0  # default


def test_unknown_keyword_raises():
    with pytest.raises(KeyError):
        load_configfile(io.StringIO("nonsense 1\n"), config_name="KMCWater")


def test_missing_required_raises():
    with pytest.raises(ValueError):
        load_configfile(io.StringIO("sweeps 10\n"), config_name="KMCWater")


def test_template_roundtrips_through_parser():
    buf = io.StringIO()
    print_config_template("KMCWater", out=buf)
    template = buf.getvalue()
    # fill in required keys, keep defaults for the rest
    template = template.replace("filename  # REQUIRED", "filename foo.xyz")
    template = template.replace("pbc  # REQUIRED", "pbc 10 10 10")
    template = template.replace("md_timestep_fs  # REQUIRED", "md_timestep_fs 0.5")
    template = template.replace("sweeps  # REQUIRED", "sweeps 100")
    template = template.replace(
        "jumprate_params_fs  # REQUIRED", "jumprate_params_fs a=0.1 b=2 c=0.1"
    )
    cfg = load_configfile(io.StringIO(template), config_name="KMCWater")
    assert cfg.sweeps == 100


def test_confighelp_prints_all_keys(capsys):
    print_confighelp("cMDLMC")
    out = capsys.readouterr().out
    for key in ("jumprate_type", "box_multiplier", "proton_number"):
        assert key in out


def test_kmc_water_cli_end_to_end(tmp_path, capsys):
    from cmdlmc_tpu.cli.kmc_water import kmc_water_main
    from cmdlmc_tpu.io.xyz import write_xyz_frame

    # ring of 10 oxygens, static
    rng = np.random.RandomState(0)
    pos = np.array([[2.5 * i, 0, 0] for i in range(10)], dtype=np.float32)
    xyz_path = tmp_path / "water.xyz"
    with open(xyz_path, "w") as f:
        for _ in range(40):
            write_xyz_frame(f, ["O"] * 10, pos + rng.normal(scale=0.02, size=pos.shape))

    cfg = load_configfile(
        io.StringIO(WATER_CONFIG.format(fname=xyz_path)), config_name="KMCWater"
    )
    out = io.StringIO()
    kmc_water_main(cfg, out=out)
    lines = [l for l in out.getvalue().splitlines() if l and not l.startswith("#")]
    assert len(lines) == 4  # 40 frames / print_frequency 10
    row = lines[0].split()
    assert len(row) == 8
    assert int(row[0]) == 0
