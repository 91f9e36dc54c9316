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
