"""Micro-bench the multiple-pricing REFILL components on chip (round 5).

The K=32/64 full solves lose time-to-optimal to the flagship because the
near-optimum tail refills per pivot; this times each refill op in isolation
(serialized-scan method of simplex_tpu.bench.kernels) so the tail-latch
design targets the actually-expensive ops.

Usage: python scripts/r5_micro.py [m] [n] [K]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

bench.setup_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ITERS = 16
print(f"devices: {jax.devices()}  m={m} n={n} K={K}", flush=True)

rng = np.random.default_rng(0)
A = jax.device_put(jnp.asarray(rng.standard_normal((m, n)), jnp.float32))
Ab = jax.device_put(jnp.asarray(np.asarray(A), jnp.bfloat16))
B = jax.device_put(jnp.asarray(rng.standard_normal((m, m)) * 0.01, jnp.float32))
U = jax.device_put(jnp.asarray(rng.standard_normal((K, m)) * 0.01, jnp.float32))
R = jax.device_put(jnp.asarray(rng.standard_normal((K, m)) * 0.01, jnp.float32))
y0 = jax.device_put(jnp.asarray(rng.standard_normal(m), jnp.float32))
idx0 = jnp.arange(K, dtype=jnp.int32) * (n // K)
HI = jax.lax.Precision.HIGHEST


def timed(fn, *args):
    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).ravel()[0])

    force(fn(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def report(name, sec, bytes_per):
    print(
        f"{name}: {sec*1e3:.3f} ms  ({bytes_per/sec/1e9:.0f} GB/s)",
        flush=True,
    )


# 1) gather K columns via jnp.take(axis=1)
@jax.jit
def take_loop(Aa, i0):
    def step(i, _):
        cols = jnp.take(Aa, i, axis=1)
        return (i + jnp.int32(cols[0, 0] * 0) + 1) % n, None

    i, _ = jax.lax.scan(step, i0, None, length=ITERS)
    return i


report("gather take(axis=1) Kcols", timed(take_loop, A, idx0), 4 * m * K)


# 2) gather K columns via one-hot matmul (reads all of A)
@jax.jit
def onehot_loop(Aa, i0):
    def step(i, _):
        oh = jax.nn.one_hot(i, n, dtype=jnp.float32)  # (K, n)
        cols = jnp.matmul(Aa, oh.T, precision=HI)
        return (i + jnp.int32(cols[0, 0] * 0) + 1) % n, None

    i, _ = jax.lax.scan(step, i0, None, length=ITERS)
    return i


report("gather onehot-matmul Kcols", timed(onehot_loop, A, idx0), 4 * m * n)


# 3) refill ftran GEMM: B @ (m, K) at HIGHEST
Ac0 = jnp.asarray(rng.standard_normal((m, K)), jnp.float32)


@jax.jit
def ftran_gemm_loop(Bb, C0):
    def step(C, _):
        out = jnp.matmul(Bb, C, precision=HI)
        return out / (jnp.max(jnp.abs(out)) + 1), None

    C, _ = jax.lax.scan(step, C0, None, length=ITERS)
    return C


report("ftran GEMM (m,m)x(m,K) HI", timed(ftran_gemm_loop, B, Ac0), 4 * m * m)


# 4) per-pivot GEMV ftran (flagship): B @ a
@jax.jit
def gemv_loop(Bb, a0):
    def step(a, _):
        out = jnp.matmul(Bb, a, precision=HI)
        return out / (jnp.max(jnp.abs(out)) + 1), None

    a, _ = jax.lax.scan(step, a0, None, length=ITERS)
    return a


report("ftran GEMV (m,m)x(m,) HI", timed(gemv_loop, B, y0), 4 * m * m)


# 5) flush GEMM: B + U.T @ R
@jax.jit
def flush_loop(Bb, Uu, Rr):
    def step(Bc, _):
        out = Bc + jnp.matmul(Uu.T, Rr, precision=HI)
        return out * 0.5, None

    Bc, _ = jax.lax.scan(step, Bb, None, length=ITERS)
    return Bc


report("flush GEMM B+U.T@R rank-K", timed(flush_loop, B, U, R), 12 * m * m)


# 6) segment pricing pass: y @ A_seg (bf16, n/8 cols)
w = n // 8
Aseg = Ab[:, :w]


@jax.jit
def segprice_loop(y, Aa):
    def step(yc, _):
        e = jnp.matmul(
            yc.astype(jnp.bfloat16), Aa,
            preferred_element_type=jnp.float32,
        )
        return yc + jnp.min(e) * 1e-20, None

    yc, _ = jax.lax.scan(step, y, None, length=ITERS)
    return yc


report("seg pricing bf16 (m x n/8)", timed(segprice_loop, y0, Aseg), 2 * m * w)


# 7) full exact pricing: y @ A f32
@jax.jit
def fullprice_loop(y, Aa):
    def step(yc, _):
        e = jnp.matmul(yc, Aa, precision=HI)
        return yc + jnp.min(e) * 1e-20, None

    yc, _ = jax.lax.scan(step, y, None, length=ITERS)
    return yc


report("full pricing f32 (m x n)", timed(fullprice_loop, y0, A), 4 * m * n)


# 8) recheck GEMV: y @ A_c (m x K)
@jax.jit
def recheck_loop(y, C0):
    def step(yc, _):
        e1 = jnp.matmul(yc, C0, precision=HI)
        return yc + jnp.min(e1) * 1e-20, None

    yc, _ = jax.lax.scan(step, y, None, length=ITERS)
    return yc


report("recheck GEMV y@(m,K)", timed(recheck_loop, y0, Ac0), 4 * m * K)
