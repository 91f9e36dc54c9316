"""Block-sparse matrix support — the TPU-native answer to "sparse storage".

The reference's own optimization ladder left sparse storage unchecked
(``/root/reference/README.md:31``); netlib-class instances are >99% sparse
and the dense layout wastes both HBM capacity and the streaming passes'
bandwidth on zeros. Classic CSR is the WRONG format on a TPU: per-element
gather/scatter defeats the MXU and the (8, 128) vector tiling. The
TPU-native shape is **blocked-dense (BSR-like)**: the matrix is cut into
(br x bc) tiles, only the tiles containing nonzeros are stored — densely,
in one (T, br, bc) array — and every op is a batched matmul over that
array plus a segment-sum, i.e. pure MXU work with static shapes:

    matvec   y = A x:   gather x tiles -> (T, bc); batched (T,br,bc)x(T,bc)
             -> segment_sum over tile-row ids -> (m,)
    rmatvec  y^T A: the transpose pass, segment-summed over tile-col ids

Storage: T * br * bc * 4 bytes + 2 T int32 — the *tile-level* density sets
the win (structured instances like transportation/multiperiod cluster their
nonzeros; a tile with ANY nonzero is stored whole).

Consumers: the PDHG first-order mode (its two GEMVs per iteration are the
entire hot loop — ``solve_pdhg`` accepts a BlockSparse or scipy.sparse A
directly), and anything else that needs A only through matvec products.
The simplex core keeps dense A (its explicit m x m inverse dominates
storage anyway, and pricing wants contiguous column segments).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EXACT = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
class BlockSparse:
    """Tiled block-sparse matrix (immutable; a pytree, so jit/vmap-safe).

    ``tiles`` (T, br, bc) holds the nonzero tiles densely; ``rows``/``cols``
    (T,) int32 are each tile's tile-row / tile-col index. The logical shape
    (m, n) is aux data (static under jit); inputs/outputs of matvec ops are
    UNPADDED logical vectors — padding happens inside.
    """

    def __init__(self, tiles, rows, cols, shape: Tuple[int, int]):
        self.tiles = tiles
        self.rows = rows
        self.cols = cols
        self.shape = (int(shape[0]), int(shape[1]))

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.tiles, self.rows, self.cols), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, shape=aux)

    # -- introspection -------------------------------------------------------
    @property
    def dtype(self):
        return self.tiles.dtype

    @property
    def block_shape(self) -> Tuple[int, int]:
        return (int(self.tiles.shape[1]), int(self.tiles.shape[2]))

    @property
    def n_tiles(self) -> int:
        return int(self.tiles.shape[0])

    @property
    def grid(self) -> Tuple[int, int]:
        """Tile grid (rows, cols) of the PADDED matrix."""
        br, bc = self.block_shape
        m, n = self.shape
        return (-(-m // br), -(-n // bc))

    def tile_density(self) -> float:
        """Stored tiles / total grid tiles — the storage & traffic ratio
        vs dense (1.0 means the blocking found no sparsity to exploit)."""
        gr, gc = self.grid
        return self.n_tiles / float(gr * gc)

    def astype(self, dtype) -> "BlockSparse":
        return BlockSparse(
            self.tiles.astype(dtype), self.rows, self.cols, self.shape
        )

    def to_dense(self) -> jnp.ndarray:
        br, bc = self.block_shape
        gr, gc = self.grid
        dense = jnp.zeros((gr, gc, br, bc), self.dtype)
        dense = dense.at[self.rows, self.cols].set(self.tiles)
        m, n = self.shape
        return dense.transpose(0, 2, 1, 3).reshape(gr * br, gc * bc)[:m, :n]


def from_dense(
    A, block_shape: Tuple[int, int] = (128, 128), dtype=jnp.float32
) -> BlockSparse:
    """Tile a dense (host) matrix, dropping all-zero tiles.

    Tile selection runs on the host (one pass over A at build time); at
    least one tile is always kept so downstream segment ops stay well-posed
    even for an all-zero matrix.
    """
    A = np.asarray(A)
    m, n = A.shape
    br, bc = block_shape
    gr, gc = -(-m // br), -(-n // bc)
    pad = np.zeros((gr * br, gc * bc), A.dtype)
    pad[:m, :n] = A
    t4 = pad.reshape(gr, br, gc, bc).transpose(0, 2, 1, 3)  # (gr, gc, br, bc)
    nz = t4.reshape(gr, gc, -1).any(axis=-1)
    if not nz.any():
        nz[0, 0] = True
    rr, cc = np.nonzero(nz)
    return BlockSparse(
        jnp.asarray(t4[rr, cc], dtype),
        jnp.asarray(rr, jnp.int32),
        jnp.asarray(cc, jnp.int32),
        (m, n),
    )


def from_scipy(
    sp, block_shape: Tuple[int, int] = (128, 128), dtype=jnp.float32
) -> BlockSparse:
    """Build from a scipy.sparse matrix without densifying the whole of it:
    tile occupancy comes from the COO coordinates, then only occupied tiles
    are materialized."""
    coo = sp.tocoo()
    m, n = coo.shape
    br, bc = block_shape
    gr, gc = -(-m // br), -(-n // bc)
    tr = coo.row // br
    tc = coo.col // bc
    tile_ids = tr.astype(np.int64) * gc + tc
    uniq, inv = np.unique(tile_ids, return_inverse=True)
    if uniq.size == 0:
        uniq = np.zeros(1, np.int64)
        inv = np.zeros(0, np.int64)
    T = uniq.size
    tiles = np.zeros((T, br, bc), np.asarray(coo.data).dtype)
    tiles[inv, coo.row % br, coo.col % bc] = coo.data
    return BlockSparse(
        jnp.asarray(tiles, dtype),
        jnp.asarray(uniq // gc, jnp.int32),
        jnp.asarray(uniq % gc, jnp.int32),
        (m, n),
    )


def _pad_to(v, length):
    return jnp.pad(v, (0, length - v.shape[0]))


def _acc(dtype):
    """Accumulation dtype: never below f32 (bf16 tiles accumulate in f32,
    mirroring the dense pricing shadow's contract)."""
    return jnp.promote_types(dtype, jnp.float32)


def matvec(M: BlockSparse, x) -> jnp.ndarray:
    """y = M @ x  (x logical (n,), result logical (m,))."""
    br, bc = M.block_shape
    gr, gc = M.grid
    xt = _pad_to(x, gc * bc).reshape(gc, bc)[M.cols]  # (T, bc)
    yt = jnp.einsum(
        "tij,tj->ti", M.tiles, xt.astype(M.dtype), precision=_EXACT,
        preferred_element_type=_acc(M.dtype),
    )
    y = jax.ops.segment_sum(yt, M.rows, num_segments=gr)  # (gr, br)
    return y.reshape(-1)[: M.shape[0]]


def rmatvec(M: BlockSparse, y) -> jnp.ndarray:
    """x = y @ M  (y logical (m,), result logical (n,))."""
    br, bc = M.block_shape
    gr, gc = M.grid
    yt = _pad_to(y, gr * br).reshape(gr, br)[M.rows]  # (T, br)
    xt = jnp.einsum(
        "ti,tij->tj", yt.astype(M.dtype), M.tiles, precision=_EXACT,
        preferred_element_type=_acc(M.dtype),
    )
    x = jax.ops.segment_sum(xt, M.cols, num_segments=gc)  # (gc, bc)
    return x.reshape(-1)[: M.shape[1]]


def gather_column(M: BlockSparse, j) -> jnp.ndarray:
    """``M[:, j]`` as a dense (m,) vector, with ``j`` a traced scalar.

    The simplex core's ftran gathers one column per pivot (the reference's
    ``d_A + p * m`` pointer arithmetic, ``src/v4_cub_reduction.cu:307-308``).
    Here: dynamic-slice the j-th in-tile column out of every stored tile
    ((T, br) read — stored bytes / bc, not O(mn)), mask to the tiles whose
    tile-column matches, and segment-sum by tile-row. Tiles never overlap
    (unique (row, col) pairs by construction), so the sum is exact."""
    br, bc = M.block_shape
    gr, _ = M.grid
    j = jnp.asarray(j, jnp.int32)
    jb = j // bc
    colt = jax.lax.dynamic_index_in_dim(
        M.tiles, j % bc, axis=2, keepdims=False
    )  # (T, br)
    contrib = jnp.where((M.cols == jb)[:, None], colt, 0)
    y = jax.ops.segment_sum(contrib, M.rows, num_segments=gr)  # (gr, br)
    return y.reshape(-1)[: M.shape[0]]


def gather_columns(M: BlockSparse, idx, chunk: int = 256) -> jnp.ndarray:
    """``M[:, idx]`` as a dense (m, k) matrix (k = len(idx), static).

    Used by refactorization (the true basis matrix ``A[:, basis]``) and the
    multiple-pricing refill. vmapping :func:`gather_column` materializes a
    (k, T, br) gather intermediate, so columns are produced in ``chunk``-wide
    batches under ``lax.map`` — peak extra memory T*br*chunk floats instead
    of T*br*k."""
    idx = jnp.asarray(idx, jnp.int32)
    k = idx.shape[0]
    gcol = jax.vmap(lambda j: gather_column(M, j), out_axes=1)
    if k <= chunk:
        return gcol(idx)
    nch = -(-k // chunk)
    pad = nch * chunk - k
    idx_p = jnp.pad(idx, (0, pad)).reshape(nch, chunk)
    out = jax.lax.map(gcol, idx_p)  # (nch, m, chunk)
    return out.transpose(1, 0, 2).reshape(M.shape[0], nch * chunk)[:, :k]


def gather_columns_host(M: BlockSparse, idx) -> np.ndarray:
    """Host-side ``M[:, idx]`` as a dense f64 (m, k) numpy array.

    The f64 polish needs the basis columns on the HOST (core/solver.py
    ``_polish_refine``); for a sparse solve the cheap pull is the stored
    tiles (the whole point of the format), not a dense device A that never
    existed. The tile pull is MEMOIZED on the instance: finalize_result
    can gather three separate column sets per solve (bounded b_eff,
    polish, LU fallback), and re-pulling ~GB tile sets over the tunneled
    device runtime costs tens of seconds each (the dense path's A_host
    caching exists for the same reason)."""
    cache = getattr(M, "_host_cache", None)
    if cache is None:
        cache = (
            np.asarray(M.tiles, np.float64),
            np.asarray(M.rows),
            np.asarray(M.cols),
        )
        M._host_cache = cache
    tiles, rows, cols = cache
    br, bc = M.block_shape
    m = M.shape[0]
    idx = np.asarray(idx, np.int64)
    out = np.zeros((m, len(idx)), np.float64)
    order = np.argsort(cols, kind="stable")
    sorted_cols = cols[order]
    for k, j in enumerate(idx):
        jb, jo = j // bc, j % bc
        lo = np.searchsorted(sorted_cols, jb)
        hi = np.searchsorted(sorted_cols, jb, side="right")
        for t in order[lo:hi]:
            r0 = rows[t] * br
            seg = tiles[t, : min(br, m - r0), jo]
            out[r0 : r0 + len(seg), k] += seg
    return out


def row_absmax(M: BlockSparse) -> jnp.ndarray:
    """max_j |M_ij| per logical row (padding rows excluded by slicing)."""
    gr, _ = M.grid
    per_tile = jnp.max(jnp.abs(M.tiles), axis=2)  # (T, br)
    out = jax.ops.segment_max(per_tile, M.rows, num_segments=gr)
    # segment_max fills empty segments with the dtype min; clamp to 0
    return jnp.maximum(out, 0).reshape(-1)[: M.shape[0]]


def col_absmax(M: BlockSparse) -> jnp.ndarray:
    _, gc = M.grid
    per_tile = jnp.max(jnp.abs(M.tiles), axis=1)  # (T, bc)
    out = jax.ops.segment_max(per_tile, M.cols, num_segments=gc)
    return jnp.maximum(out, 0).reshape(-1)[: M.shape[1]]


def absmax(M: BlockSparse) -> jnp.ndarray:
    return jnp.max(jnp.abs(M.tiles))


def col_sumsq(M: BlockSparse) -> jnp.ndarray:
    """sum_i M_ij^2 per logical column (steepest-edge init at the identity
    slack basis: gamma_j = 1 + ||A_j||^2). Accumulates in f32+."""
    _, gc = M.grid
    t = M.tiles.astype(_acc(M.dtype))
    per_tile = jnp.sum(t * t, axis=1)  # (T, bc)
    out = jax.ops.segment_sum(per_tile, M.cols, num_segments=gc)
    return out.reshape(-1)[: M.shape[1]]


def scale(M: BlockSparse, r, c) -> BlockSparse:
    """Elementwise  diag(r) @ M @ diag(c)  (r logical (m,), c logical (n,));
    padding rows/cols scale by 1."""
    br, bc = M.block_shape
    gr, gc = M.grid
    rp = jnp.pad(r, (0, gr * br - r.shape[0]), constant_values=1)
    cp = jnp.pad(c, (0, gc * bc - c.shape[0]), constant_values=1)
    rt = rp.reshape(gr, br)[M.rows]  # (T, br)
    ct = cp.reshape(gc, bc)[M.cols]  # (T, bc)
    tiles = M.tiles * rt[:, :, None].astype(M.dtype) * ct[:, None, :].astype(M.dtype)
    return BlockSparse(tiles, M.rows, M.cols, M.shape)


def split_columns(M: BlockSparse, n_seg: int):
    """Cut a BlockSparse into ``n_seg`` column-range segments, each its own
    BlockSparse with LOCAL column ids — the static per-segment structures
    that let segmented (partial) pricing run over tiles (lax slices don't
    apply to the tiled format; a lax.switch over these does).

    Host-side, build-time only. Tiles must not straddle segment boundaries
    (n divisible by n_seg; segment width divisible by the tile width);
    callers treat a violation as "segmentation inactive", mirroring the
    dense path's divisibility gate. A segment with no stored tiles gets
    one zero tile so downstream segment ops stay well-posed.
    """
    m, n = M.shape
    br, bc = M.block_shape
    if n % n_seg != 0:
        raise ValueError(f"n={n} not divisible by {n_seg} segments")
    w = n // n_seg
    if w % bc != 0:
        raise ValueError(
            f"segment width {w} not divisible by tile width {bc}"
        )
    tps = w // bc
    cols = np.asarray(M.cols)
    rows = np.asarray(M.rows)
    tiles = np.asarray(M.tiles)
    seg_of = cols // tps
    out = []
    for s in range(n_seg):
        sel = seg_of == s
        if sel.any():
            t, r, c_ = tiles[sel], rows[sel], cols[sel] - s * tps
        else:
            t = np.zeros((1, br, bc), tiles.dtype)
            r = np.zeros(1, np.int32)
            c_ = np.zeros(1, np.int32)
        out.append(
            BlockSparse(
                jnp.asarray(t), jnp.asarray(r, jnp.int32),
                jnp.asarray(c_, jnp.int32), (m, w),
            )
        )
    return tuple(out)


def tile_for_column_shards(A_scipy, n_shards: int, dtype=jnp.float32):
    """scipy.sparse -> BlockSparse whose tile width divides the shard
    width (the `shard_columns` contract: tiles must not straddle shard
    boundaries). One policy for every distributed entry point — 1-D,
    2-D, and the 2-D checkpoint driver all call this, so the tile layout
    cannot silently diverge between them."""
    import math

    n_loc = A_scipy.shape[1] // max(1, n_shards)
    bc = math.gcd(max(1, n_loc), 128)
    return from_scipy(A_scipy.tocsc(), block_shape=(128, bc), dtype=dtype)


def flat_shard_args(M: BlockSparse, n_shards: int):
    """``shard_columns`` flattened for shard_map's leading-axis split:
    (tiles (D*T_max, br, bc), rows (D*T_max,), cols (D*T_max,), n_loc)."""
    t_st, r_st, c_st, n_loc = shard_columns(M, n_shards)
    D, T, br, bc = t_st.shape
    return (
        t_st.reshape(D * T, br, bc), r_st.reshape(-1), c_st.reshape(-1),
        n_loc,
    )


def shard_columns(M: BlockSparse, n_shards: int):
    """Partition a BlockSparse by COLUMN range into ``n_shards`` equal
    shards for ``shard_map`` (the distributed PDHG layout).

    Returns ``(tiles, rows, cols, n_loc)`` where ``tiles`` is
    (D, T_max, br, bc) — each shard's tile list padded with zero tiles to
    the max count (static shapes across shards) — ``rows``/``cols`` are
    (D, T_max) int32 with ``cols`` LOCAL to the shard, and ``n_loc`` the
    logical columns per shard. Tiles must not straddle shard boundaries:
    n must divide by n_shards and the shard width by the tile width.
    """
    m, n = M.shape
    br, bc = M.block_shape
    if n % n_shards != 0:
        raise ValueError(f"n={n} not divisible by {n_shards} shards")
    n_loc = n // n_shards
    if n_loc % bc != 0:
        raise ValueError(
            f"shard width {n_loc} not divisible by tile width {bc}; "
            "rebuild with a block_shape whose bc divides n/D"
        )
    tps = n_loc // bc  # column tiles per shard
    cols = np.asarray(M.cols)
    rows = np.asarray(M.rows)
    tiles = np.asarray(M.tiles)
    shard_of = cols // tps
    T_max = max(1, int(np.bincount(shard_of, minlength=n_shards).max()))
    gr = -(-m // br)
    out_t = np.zeros((n_shards, T_max, br, bc), tiles.dtype)
    out_r = np.zeros((n_shards, T_max), np.int32)
    out_c = np.zeros((n_shards, T_max), np.int32)
    for d in range(n_shards):
        sel = shard_of == d
        k = int(sel.sum())
        out_t[d, :k] = tiles[sel]
        out_r[d, :k] = rows[sel]
        out_c[d, :k] = cols[sel] - d * tps
    return (
        jnp.asarray(out_t),
        jnp.asarray(out_r),
        jnp.asarray(out_c),
        n_loc,
    )
