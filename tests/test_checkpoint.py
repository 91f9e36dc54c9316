"""Checkpoint / resume: interrupted solves continue to the same optimum."""

import numpy as np
import pytest

from simplex_tpu.config import SimplexOptions
from simplex_tpu.core.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    solve_with_checkpoints,
    validate_checkpoint,
)
from simplex_tpu.core.solver import solve
from simplex_tpu.oracle.generator import random_dense_lp
from simplex_tpu.status import SolveStatus


def test_checkpointed_solve_matches_direct(tmp_path):
    A, b, c = random_dense_lp(24, 60, seed=8)
    direct = solve(A, b, c)
    ckpt = tmp_path / "state.npz"
    chunks = []
    res = solve_with_checkpoints(
        A, b, c, path=ckpt,
        options=SimplexOptions(checkpoint_every=5),
        on_chunk=lambda s: chunks.append(int(s.iters)),
    )
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(direct.z, rel=1e-6)
    assert len(chunks) >= 2  # actually chunked
    assert ckpt.exists()


def test_resume_from_partial_checkpoint(tmp_path):
    A, b, c = random_dense_lp(24, 60, seed=9)
    direct = solve(A, b, c)
    ckpt = tmp_path / "state.npz"

    # run only a few pivots, snapshot, then "crash"
    partial = solve_with_checkpoints(
        A, b, c, path=ckpt,
        options=SimplexOptions(checkpoint_every=4, max_iter=4),
    )
    assert partial.status == SolveStatus.MAX_ITER

    # resume to completion
    res = solve_with_checkpoints(
        A, b, c, path=ckpt, options=SimplexOptions(checkpoint_every=50)
    )
    assert res.status == SolveStatus.OPTIMAL
    assert res.z == pytest.approx(direct.z, rel=1e-5)
    assert res.iters >= partial.iters


def test_validate_rejects_corrupt_checkpoint(tmp_path):
    A, b, c = random_dense_lp(8, 20, seed=10)
    ckpt = tmp_path / "state.npz"
    solve_with_checkpoints(
        A, b, c, path=ckpt, options=SimplexOptions(checkpoint_every=2, max_iter=2)
    )
    state = load_checkpoint(ckpt)

    bad = state._replace(basis=state.basis.at[0].set(9999))
    with pytest.raises(ValueError, match="out of range"):
        validate_checkpoint(bad, A, b)

    bad = state._replace(basis=state.basis.at[0].set(int(state.basis[1])))
    with pytest.raises(ValueError, match="duplicate"):
        validate_checkpoint(bad, A, b)

    bad = state._replace(x_b=state.x_b - 1000.0)
    with pytest.raises(ValueError):
        validate_checkpoint(bad, A, b)


def test_checkpoint_roundtrip(tmp_path):
    A, b, c = random_dense_lp(8, 20, seed=11)
    ckpt = tmp_path / "s.npz"
    solve_with_checkpoints(
        A, b, c, path=ckpt, options=SimplexOptions(checkpoint_every=3, max_iter=3)
    )
    state = load_checkpoint(ckpt)
    save_checkpoint(tmp_path / "s2.npz", state)
    state2 = load_checkpoint(tmp_path / "s2.npz")
    for f in state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, f)), np.asarray(getattr(state2, f))
        )


def test_light_checkpoint_roundtrip(tmp_path):
    # light snapshots drop B_inv/U/R; load rebuilds the exact inverse on the
    # host from A + basis (this is what chunked solves use at m >= 2048,
    # where pulling the O(m^2) leaves through the device link dominates).
    import jax.numpy as jnp

    from simplex_tpu.core.solver import _solve_jit
    from simplex_tpu.core.state import Problem

    A, b, c = random_dense_lp(16, 40, seed=12)
    opts = SimplexOptions(max_iter=6, verify_terminal=False, update_defer=4)
    basis0 = np.arange(40 - 16, 40, dtype=np.int32)
    state = _solve_jit(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
        jnp.asarray(basis0), opts, 6, True,
    )
    ckpt = tmp_path / "light.npz"
    save_checkpoint(ckpt, state, light=True)
    with np.load(ckpt) as data:
        assert "B_inv" not in data and "U" not in data

    loaded = load_checkpoint(ckpt, A=A, b=b, c=c)
    validate_checkpoint(loaded, A, b)
    np.testing.assert_array_equal(np.asarray(loaded.basis), np.asarray(state.basis))
    # rebuilt inverse is exact for the basis
    B_exact = np.linalg.inv(np.asarray(A, np.float64)[:, np.asarray(state.basis)])
    np.testing.assert_allclose(
        np.asarray(loaded.B_inv), B_exact.astype(np.float32), rtol=1e-5, atol=1e-6
    )
    assert loaded.U.shape == state.U.shape
    assert int(loaded.npend) == 0

    with pytest.raises(ValueError, match="light checkpoint"):
        load_checkpoint(ckpt)
