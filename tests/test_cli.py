"""CLI binaries end to end (reference L7: conf files + flags -> run ->
results; SURVEY.md §3 "CLI mains")."""

import numpy as np
import pytest

from detqmc_tpu.cli.main_hubbard import main as hubbard_main
from detqmc_tpu.cli.main_pt_sdw import main as pt_main
from detqmc_tpu.cli.main_sdw import main as sdw_main
from detqmc_tpu.io.series import load_results


def test_hubbard_cli_conf_file(tmp_path, capsys):
    conf = tmp_path / "sim.conf"
    conf.write_text(
        "# 4-site smoke config\n"
        "L = 2\nU = 4.0\nbeta = 2.0\ndtau = 0.1\ns = 4\n"
        "sweeps = 20\nthermalization = 5\nwalkers = 2\n"
        f"outdir = {tmp_path}/run\njkBlocks = 4\ndtype = float64\n")
    rc = hubbard_main(["--conf", str(conf), "--rngSeed", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "occupancy" in out
    res = load_results(str(tmp_path / "run" / "results.values"))
    assert res["occupancy"][0] == pytest.approx(1.0, abs=1e-9)


def test_hubbard_cli_unknown_key():
    assert hubbard_main(["--bogus", "1"]) == 2


def test_hubbard_cli_inconsistent_time_grid():
    assert hubbard_main(["beta=4", "m=10", "dtau=0.3"]) == 2


def test_sdw_cli(tmp_path, capsys):
    rc = sdw_main([
        "L=2", "opdim=2", "r=1.0", "beta=1.0", "m=4", "s=2",
        "sweeps=10", "thermalization=4", "walkers=2", "dtype=float64",
        "turnoffFermions=true",
    ])
    assert rc == 0
    assert "phiSquared" in capsys.readouterr().out


def test_pt_sdw_cli(tmp_path, capsys):
    rc = pt_main([
        "L=2", "opdim=1", "r=0.5", "beta=1.0", "m=4", "s=2",
        "sweeps=8", "thermalization=4", "dtype=float64",
        "turnoffFermions=true", "values=0.0,1.0", "exchangeInterval=2",
        "ptEnsembles=2", f"outdir={tmp_path}/pt",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "parameter 0" in out and "parameter 1" in out
    assert (tmp_path / "pt" / "exchange-rates.dat").exists()


def test_pt_sdw_cli_rejects_walkers(tmp_path, capsys):
    """`walkers` is the single-run driver's knob; PT runs one chain per
    replica and must point the user at ptEnsembles instead of silently
    ignoring it."""
    rc = pt_main([
        "L=2", "opdim=1", "r=0.5", "beta=1.0", "m=4", "s=2",
        "sweeps=4", "thermalization=0", "dtype=float64",
        "turnoffFermions=true", "values=0.0,1.0", "walkers=2",
    ])
    assert rc == 2
    assert "ptEnsembles" in capsys.readouterr().err

def test_mrpt_cli_on_pt_run(tmp_path, capsys):
    """Full pipeline: PT run -> .series files -> mrpt reweighting curves."""
    from detqmc_tpu.cli.main_mrpt import main as mrpt_main

    rc = pt_main([
        "L=2", "opdim=2", "r=0.0", "beta=1.0", "m=4", "s=2",
        "sweeps=120", "thermalization=30", "dtype=float64",
        "turnoffFermions=true", "values=0.2,0.8,1.6",
        f"outdir={tmp_path}/pt", "timeseries=true", "jkBlocks=4",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = mrpt_main([f"{tmp_path}/pt", "--binder", "--grid", "0.2,1.6,15",
                    "--jackknife", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mrpt.values" in out
    data = np.loadtxt(tmp_path / "pt" / "mrpt.values")
    assert data.shape[1] == 4  # r, phiSquared, phiFourth, binder
    phi2 = data[:, 1]
    # <phi^2>(r) must interpolate smoothly and decrease with r
    assert phi2[0] > phi2[-1]
    assert np.all(np.isfinite(data))


def test_example_configs_parse_and_run(tmp_path, capsys):
    """The shipped example job files parse into valid configs; the
    Hubbard one drives a (tiny, overridden) end-to-end run."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ex = os.path.join(root, "examples")
    from detqmc_tpu.config import (_HUBBARD_KEYS, _PT_KEYS, _SDW_KEYS,
                                   build_driver_config, build_hubbard_config,
                                   build_sdw_config, parse_args,
                                   split_params)

    p = parse_args(["--conf", os.path.join(ex, "hubbard_l8_beta8.conf")])
    mp, dp, _ = split_params(p, _HUBBARD_KEYS)
    build_hubbard_config(mp), build_driver_config(dp)
    p = parse_args(["--conf", os.path.join(ex, "sdw_o3_l8.conf")])
    mp, dp, _ = split_params(p, _SDW_KEYS)
    build_sdw_config(mp), build_driver_config(dp)
    p = parse_args(["--conf", os.path.join(ex, "pt_sdw_r_grid.conf")])
    mp, dp, ep = split_params(p, _SDW_KEYS, _PT_KEYS)
    build_sdw_config(mp), build_driver_config(dp)
    assert ep["values"].count(",") == 7
    p = parse_args(["--conf", os.path.join(ex, "hubbard_dynamics.conf")])
    mp, dp, _ = split_params(p, _HUBBARD_KEYS)
    build_hubbard_config(mp)
    dcfg = build_driver_config(dp)
    assert dcfg.current_correlators and dcfg.timedisplaced_slices

    rc = hubbard_main([
        "--conf", os.path.join(ex, "hubbard_l8_beta8.conf"),
        "L=4", "beta=2", "m=20", "walkers=2", "sweeps=4",
        "thermalization=2", "saveInterval=4", "jkBlocks=2",
        "dtype=float64", f"outdir={tmp_path}/ex_smoke"])
    assert rc == 0
    assert "occupancy" in capsys.readouterr().out


def test_pt_hubbard_h_grid_cli(tmp_path, capsys):
    """detqmc-pt model=hubbard: end-to-end stagger_h grid (label-swap
    PT; VERDICT r4 item 7 — the capability exists in the library but was
    unreachable from the binaries)."""
    from detqmc_tpu.cli.main_pt import main as generic_pt_main

    rc = generic_pt_main([
        "model=hubbard", "L=2", "U=4.0", "beta=1.5", "dtau=0.125",
        "s=4", "sweeps=8", "thermalization=4", "dtype=float64",
        "values=0.0,0.3,0.6", "exchangeInterval=1",
        f"outdir={tmp_path}/hpt", "jkBlocks=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "stagger_h = 0.0" in out and "doubleOccupancy" in out
    assert (tmp_path / "hpt" / "p2" / "results.values").exists()
    assert (tmp_path / "hpt" / "exchange-rates.dat").exists()


def test_pt_beta_grid_cli(tmp_path, capsys):
    """detqmc-pt controlParameter=beta: det-coupled config-swap PT over
    a beta grid from the ops surface (VERDICT r4 item 6 example)."""
    from detqmc_tpu.cli.main_pt import main as generic_pt_main

    rc = generic_pt_main([
        "model=hubbard", "L=2", "U=4.0", "m=8", "dtau=0.25", "s=2",
        "sweeps=6", "thermalization=2", "dtype=float64",
        "values=1.6,2.0", "controlParameter=beta",
        f"outdir={tmp_path}/bpt", "jkBlocks=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "beta = 1.6" in out
    assert (tmp_path / "bpt" / "exchange-rates.dat").exists()
