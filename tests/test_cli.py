"""CLI surface tests (subprocess, forced CPU): the reference's driver contract
(`./solverN.out input.txt` -> status + solution keyed by basis index,
src/v4_cub_reduction.cu:425-445) plus the new verify subcommand."""

import os
import subprocess
import sys

SAMPLE = os.path.join(os.path.dirname(__file__), "data", "sample.txt")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "simplex_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )


def test_solve_sample():
    r = run_cli("solve", SAMPLE, "--cpu")
    assert r.returncode == 0, r.stderr
    assert "Optimum found: 9" in r.stdout
    assert "x_0 = 1" in r.stdout
    assert "x_1 = 3" in r.stdout


def test_solve_with_timing_report():
    r = run_cli("solve", SAMPLE, "--cpu", "--time")
    assert r.returncode == 0
    assert "Solve:" in r.stdout and "Read file:" in r.stdout


def test_verify_against_both_oracles():
    for oracle in ("scipy", "native"):
        r = run_cli("verify", SAMPLE, "--cpu", "--oracle", oracle)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "OK" in r.stdout


def test_solve_missing_file_errors():
    r = run_cli("solve", "/nonexistent.txt", "--cpu")
    assert r.returncode != 0


def test_verify_general_mps_route(tmp_path):
    """Regression (round-2 review): GeneralLP is a tuple subclass, so the
    verify subcommand's isinstance(loaded, tuple) check mis-routed general
    MPS inputs into a 4-way unpack crash."""
    mps = """NAME          VG
ROWS
 N  COST
 G  R1
COLUMNS
    X0        COST      1.0   R1        1.0
    X1        COST      2.0   R1        1.0
RHS
    RHS       R1        2.0
ENDATA
"""
    p = tmp_path / "vg.mps"
    p.write_text(mps)
    r = run_cli("verify", str(p), "--cpu")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "rel_gap" in r.stdout


def test_fast_keeps_explicit_zero_flags():
    """Regression (round-2 review): --fast must not clobber an explicit
    --partial-pricing 0 / --update-defer 0 (None-sentinel defaults)."""
    import argparse

    from simplex_tpu.cli import _resolve_flag_defaults

    ns = argparse.Namespace(
        pricing_dtype=None, update_defer=0, partial_pricing=0,
        refactor_every=None, fast=True,
    )
    _resolve_flag_defaults(ns)
    assert ns.update_defer == 0  # explicit zero kept
    assert ns.partial_pricing == 0  # explicit zero kept
    assert ns.pricing_dtype == "bfloat16"  # unset -> fast default
    assert ns.refactor_every == 1024

    ns2 = argparse.Namespace(
        pricing_dtype=None, update_defer=None, partial_pricing=None,
        refactor_every=None, fast=False,
    )
    _resolve_flag_defaults(ns2)
    assert (ns2.pricing_dtype, ns2.update_defer, ns2.partial_pricing,
            ns2.refactor_every) == ("float32", 0, 0, 0)


def test_analyze_subcommand():
    r = run_cli("analyze", "tests/data/sample.txt", "--cpu")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Optimum: 9" in r.stdout
    assert "dual y_i" in r.stdout and "delta-c_j" in r.stdout


def test_solve_general_mps_with_pdhg():
    """--algo pdhg on a general MPS (bounds + mixed rows): equality-form +
    native box bounds route; objective must match the simplex route."""
    mps = os.path.join(os.path.dirname(__file__), "data", "prod_bounded.mps")
    r = run_cli("solve", mps, "--cpu", "--algo", "pdhg")
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if "Optimum found" in l][0]
    assert abs(float(line.split(":")[1]) - 15.25) < 5e-3, line


def test_analyze_reoptimize():
    r = run_cli(
        "analyze", SAMPLE, "--cpu", "--reoptimize", "0=+1,1=-2"
    )
    assert r.returncode == 0, r.stderr
    assert "re-solve optimum: 6" in r.stdout
    assert "warm pivots" in r.stdout


def test_analyze_general_mps_with_reoptimize():
    mps = os.path.join(os.path.dirname(__file__), "data", "prod_bounded.mps")
    r = run_cli("analyze", mps, "--cpu", "--reoptimize", "0=+0.5")
    assert r.returncode == 0, r.stderr
    assert "dual y_i" in r.stdout
    assert "re-solve optimum" in r.stdout
    assert "0 phase-1" in r.stdout


def test_solve_pdhg_crossover_exact():
    """--crossover purifies the first-order answer to the exact vertex."""
    mps = os.path.join(os.path.dirname(__file__), "data", "prod_bounded.mps")
    r = run_cli("solve", mps, "--cpu", "--algo", "pdhg", "--crossover")
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if "Optimum found" in l][0]
    assert abs(float(line.split(":")[1]) - 15.25) < 1e-6, line
