"""Fused block-sparse flash-GAT Pallas kernel: SDDMM + masked softmax +
aggregation in one pass over nonempty adjacency tiles.

The reference computes dense (N, N) attention per head and materializes the
full coefficient matrix (utils/layers.py:26-34). This kernel never
materializes it: for each row-block it sweeps the *nonempty* column blocks
with an online-softmax accumulator (running max m, running sum l, output
acc) per head — the flash-attention recurrence with the graph adjacency as
mask:

    z_ij  = leaky_relu(ld_i + ls_j)        # SDDMM on the fly
    masked: z_ij = -1e9 off-edges          # == reference bias add
    out_i = sum_j softmax_j(z_ij) * v_j    # MXU per column tile

Numerics match the XLA dense path: masked entries underflow to exactly 0
once any real edge sets the row max; rows with no edges at all finalize to
0 (the sparse spec — tests/test_ops_parity.py).

Performance design (measured on TPU v5e):

- **Block sparsity.** A per-call block map (counts[i], cols[i, :]) lists
  each row-block's nonempty column tiles, scalar-prefetched so the DMA
  index map can follow it (pltpu.PrefetchScalarGridSpec). Skipped steps
  map to the previous tile (no DMA) and predicate away all compute, so
  cost scales with *occupied* tiles — on community-ordered meta-path
  graphs (graph/reorder.py) that is a small fraction of N²/bm·bn. The
  dense XLA softmax path cannot skip anything.
- **Heads fused.** All K heads run inside one invocation (static loop), so
  the O(N²) adjacency tile — the dominant HBM term — is read ONCE per
  tile instead of K times, as int8 (4× less HBM than f32), upcast
  in-register.
- **Natural layouts.** Features keep (N, K, D); rank-3 blocks (bn, K, D)
  have full trailing dims (legal per TPU block rules), so no lane padding
  is materialized in HBM. Per-head m/l/lse live in (K_pad, bm) scratch.

Backward = two more Pallas kernels (row-sweep for d_logit_dst, col-sweep
for d_logit_src/dv, driven by the transposed block map) with the same
layouts, wired through jax.custom_vjp (derivation above _head_dz).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from han_tpu.graph.containers import DenseGraph, MASK_VALUE

DEF_BM = 512
DEF_BN = 2048  # wide column tiles: ~13us fixed cost per active grid step
               # (measured v5e) makes narrow tiles step-overhead-bound
DEF_BN_BWD = 1024  # backward keeps more live temps per strip → narrower tile
_NEG_INIT = -1e9  # same magnitude as the mask (finite on purpose; see above)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_map(bmask: jax.Array):
    """bool (nb_r, nb_c) tile-occupancy → (counts int32 (nb_r,),
    cols int32 (nb_r, nb_c)): active tile indices first (ascending),
    inactive steps repeat the last active tile so their DMA is a no-op."""
    nb_r, nb_c = bmask.shape
    order = jnp.argsort(jnp.logical_not(bmask), axis=1, stable=True)
    order = order.astype(jnp.int32)
    counts = jnp.sum(bmask, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(
        order, jnp.maximum(counts - 1, 0)[:, None], axis=1)
    j_idx = jnp.arange(nb_c, dtype=jnp.int32)[None, :]
    cols = jnp.where(j_idx < counts[:, None], order, last)
    return counts, cols


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _tile_drop_keep(shape, dropout_p: float, seed, i_abs, strip_abs, h: int,
                    interpret: bool):
    """Scaled inverted-dropout keep mask, deterministic per
    (seed, row tile, SUB-wide column strip, head) so forward and both
    backward kernels replay the exact same mask regardless of their own
    tile widths. Hardware path: per-core PRNG (pltpu); interpreter path
    (CPU tests): jax.random with the same key derivation — the two draw
    different bits but each is internally consistent."""
    inv_keep = 1.0 / (1.0 - dropout_p)
    if interpret:
        key = jax.random.fold_in(jax.random.fold_in(jax.random.fold_in(
            jax.random.PRNGKey(seed), i_abs), strip_abs), h)
        keep = jax.random.bernoulli(key, 1.0 - dropout_p, shape)
        return jnp.where(keep, inv_keep, 0.0)
    pltpu.prng_seed(seed + i_abs * 1_000_003 + strip_abs * 7919 + h * 131)
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(int((1.0 - dropout_p) * 4294967295.0))
    keep = pltpu.bitcast(bits, jnp.uint32) < thresh
    return jnp.where(keep, inv_keep, 0.0)


# Wide column tiles amortize the ~13us fixed cost per active grid step, but
# the (BM, BN) f32 temporaries of the softmax math must stay small or the
# kernel overflows scoped VMEM (16 MB). Compute therefore sweeps the tile
# in SUB-wide column strips: DMA stays BN-wide, live temps are (BM, SUB).
SUB = 512


def _fwd_kernel(counts_ref, cols_ref, seed_ref, adj_ref, ld_ref, ls_ref,
                v_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                slope: float, n_j: int, k: int, dropout_p: float,
                interpret: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < counts_ref[i])
    def _compute():
        bn = adj_ref.shape[1]
        # dropout's in-kernel PRNG mask adds (BM, strip)-sized temporaries;
        # with dropout off the whole tile is one strip (fastest — the
        # serial m/l chain across strips costs ~2.7x when not needed)
        sub = bn if dropout_p == 0.0 else min(SUB, bn)
        for c in range(bn // sub):  # static column strips within the tile
            cs = slice(c * sub, (c + 1) * sub)
            on_edge = adj_ref[:, cs] != 0  # int8 compare, no f32 tile

            for h in range(k):  # static unroll; strip reused across heads
                ld = ld_ref[h, :]   # (BM,)
                ls = ls_ref[h, cs]  # (SUB,)
                raw = ld[:, None] + ls[None, :]  # (BM, SUB)
                z = jnp.where(raw >= 0, raw, slope * raw)
                z = jnp.where(on_edge, z, MASK_VALUE)

                m_prev = m_ref[h, :]
                m_new = jnp.maximum(m_prev, jnp.max(z, axis=1))
                scale = jnp.exp(m_prev - m_new)  # flushes pre-edge junk to 0
                p = jnp.exp(z - m_new[:, None])  # masked entries underflow to 0
                l_new = l_ref[h, :] * scale + jnp.sum(p, axis=1)
                if dropout_p > 0.0:
                    # reference order: softmax first, then dropout on the
                    # coefs (layers.py:27-30) — l uses undropped p, acc the
                    # dropped
                    p_agg = p * _tile_drop_keep(
                        p.shape, dropout_p, seed_ref[0], i,
                        cols_ref[i, j] * (bn // sub) + c, h, interpret)
                else:
                    p_agg = p
                pv = jnp.dot(p_agg, v_ref[cs, h, :],
                             preferred_element_type=jnp.float32)  # (BM, D)
                acc_ref[:, h, :] = acc_ref[:, h, :] * scale[:, None] + pv
                m_ref[h, :] = m_new
                l_ref[h, :] = l_new

    @pl.when(j == n_j - 1)
    def _finalize():
        for h in range(k):
            l = l_ref[h, :]
            m = m_ref[h, :]
            has_edge = m > (_NEG_INIT * 0.5)  # any real edge in this row
            inv = jnp.where(has_edge, 1.0 / jnp.maximum(l, 1e-30), 0.0)
            out_ref[:, h, :] = acc_ref[:, h, :] * inv[:, None]
            lse_ref[h, :] = jnp.where(
                has_edge, m + jnp.log(jnp.maximum(l, 1e-30)), _NEG_INIT)


def _flash_fwd(counts, cols, seed, adj_i8, ld, ls, v, *, slope: float,
               bm: int, bn: int, interpret: bool, dropout_p: float = 0.0):
    """adj_i8 (Np, Np) int8; ld/ls (Kp, Np); v (Np, K, D) →
    out (Np, K, D), lse (Kp, Np). counts/cols: forward block map; seed:
    (1,) int32 dropout stream id (ignored when dropout_p == 0)."""
    n, k, d = v.shape
    kp = ld.shape[0]
    n_i, n_j = n // bm, n // bn
    kernel = functools.partial(_fwd_kernel, slope=slope, n_j=n_j, k=k,
                               dropout_p=dropout_p, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, cnt, cols, sd: (i, cols[i, j])),
            pl.BlockSpec((kp, bm), lambda i, j, cnt, cols, sd: (0, i)),
            pl.BlockSpec((kp, bn), lambda i, j, cnt, cols, sd: (0, cols[i, j])),
            pl.BlockSpec((bn, k, d), lambda i, j, cnt, cols, sd: (cols[i, j], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k, d), lambda i, j, cnt, cols, sd: (i, 0, 0)),
            pl.BlockSpec((kp, bm), lambda i, j, cnt, cols, sd: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, k, d), jnp.float32),
            pltpu.VMEM((kp, bm), jnp.float32),
            pltpu.VMEM((kp, bm), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((n, k, d), jnp.float32),
            jax.ShapeDtypeStruct((kp, n), jnp.float32),
        ],
        interpret=interpret,
    )(counts, cols, seed, adj_i8, ld, ls, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------
# With c_ij = exp(z_ij - lse_i) and delta_i = g_i · out_i (per head):
#   dz_ij  = c_ij * ((g_i · v_j) - delta_i)
#   dld_i  = sum_j dz_ij * lrelu'(raw_ij)     (row-sweep kernel)
#   dls_j  = sum_i dz_ij * lrelu'(raw_ij)     (col-sweep kernel)
#   dv_j   = sum_i c_ij * g_i                 (col-sweep kernel)


def _head_dz(on_edge, ld, ls, lse, delta, g_h, v_h, slope,
             drop_mask=None):
    raw = ld[:, None] + ls[None, :]
    z = jnp.where(raw >= 0, raw, slope * raw)
    z = jnp.where(on_edge, z, MASK_VALUE)
    c = jnp.exp(z - lse[:, None])
    c = jnp.where(on_edge, c, 0.0)  # rows with no edges: lse=-1e9 → exp(0)=1
    if drop_mask is not None:
        # replayed forward mask (same per-tile/head seed)
        c_agg = c * drop_mask
    else:
        c_agg = c
    gv = jax.lax.dot_general(
        g_h, v_h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BM, BN)
    # out = (sum_j c·m·v) / l  ⇒  dz = c·(m·(g·v) − delta)·lrelu'
    dz = c_agg * gv - c * delta[:, None]
    dslope = jnp.where(raw >= 0, 1.0, slope)
    return c_agg, dz * dslope


def _bwd_row_kernel(counts_ref, cols_ref, seed_ref, adj_ref, ld_ref,
                    ls_ref, v_ref, g_ref, lse_ref, delta_ref, dld_ref,
                    acc_ref, *, slope: float, n_j: int, k: int,
                    dropout_p: float, interpret: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < counts_ref[i])
    def _compute():
        bn = adj_ref.shape[1]
        sub = bn if dropout_p == 0.0 else min(SUB, bn)
        for c in range(bn // sub):
            cs = slice(c * sub, (c + 1) * sub)
            on_edge = adj_ref[:, cs] != 0
            for h in range(k):
                mask = (_tile_drop_keep(
                            on_edge.shape, dropout_p, seed_ref[0], i,
                            cols_ref[i, j] * (bn // sub) + c, h, interpret)
                        if dropout_p > 0.0 else None)
                _, dzs = _head_dz(on_edge, ld_ref[h, :], ls_ref[h, cs],
                                  lse_ref[h, :], delta_ref[h, :],
                                  g_ref[:, h, :], v_ref[cs, h, :], slope, mask)
                acc_ref[h, :] += jnp.sum(dzs, axis=1)

    @pl.when(j == n_j - 1)
    def _fin():
        dld_ref[:] = acc_ref[:]


def _bwd_col_kernel(counts_ref, rows_ref, seed_ref, adj_ref, ld_ref,
                    ls_ref, v_ref, g_ref, lse_ref, delta_ref, dls_ref,
                    dv_ref, dls_acc, dv_acc, *, slope: float, n_i: int,
                    k: int, dropout_p: float, interpret: bool):
    jb = pl.program_id(0)
    it = pl.program_id(1)  # row sweep is innermost here

    @pl.when(it == 0)
    def _init():
        dls_acc[:] = jnp.zeros_like(dls_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(it < counts_ref[jb])
    def _compute():
        bn = adj_ref.shape[1]
        sub = bn if dropout_p == 0.0 else min(SUB, bn)
        for c in range(bn // sub):
            cs = slice(c * sub, (c + 1) * sub)
            on_edge = adj_ref[:, cs] != 0
            for h in range(k):
                mask = (_tile_drop_keep(
                            on_edge.shape, dropout_p, seed_ref[0],
                            rows_ref[jb, it], jb * (bn // sub) + c, h,
                            interpret)
                        if dropout_p > 0.0 else None)
                c_agg, dzs = _head_dz(on_edge, ld_ref[h, :], ls_ref[h, cs],
                                      lse_ref[h, :], delta_ref[h, :],
                                      g_ref[:, h, :], v_ref[cs, h, :],
                                      slope, mask)
                dls_acc[h, cs] += jnp.sum(dzs, axis=0)
                dv_acc[cs, h, :] += jax.lax.dot_general(  # (c·m)^T · g
                    c_agg, g_ref[:, h, :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    @pl.when(it == n_i - 1)
    def _fin():
        dls_ref[:] = dls_acc[:]
        dv_ref[:] = dv_acc[:]


def _flash_bwd(counts, cols, counts_t, rows_t, seed, adj_i8, ld, ls, v, g,
               lse, delta, *, slope: float, bm: int, bn: int,
               interpret: bool, dropout_p: float = 0.0):
    n, k, d = v.shape
    kp = ld.shape[0]
    n_i, n_j = n // bm, n // bn

    dld = pl.pallas_call(
        functools.partial(_bwd_row_kernel, slope=slope, n_j=n_j, k=k,
                          dropout_p=dropout_p, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j, c, m, sd: (i, m[i, j])),
                pl.BlockSpec((kp, bm), lambda i, j, c, m, sd: (0, i)),
                pl.BlockSpec((kp, bn), lambda i, j, c, m, sd: (0, m[i, j])),
                pl.BlockSpec((bn, k, d), lambda i, j, c, m, sd: (m[i, j], 0, 0)),
                pl.BlockSpec((bm, k, d), lambda i, j, c, m, sd: (i, 0, 0)),
                pl.BlockSpec((kp, bm), lambda i, j, c, m, sd: (0, i)),
                pl.BlockSpec((kp, bm), lambda i, j, c, m, sd: (0, i)),
            ],
            out_specs=pl.BlockSpec((kp, bm), lambda i, j, c, m, sd: (0, i)),
            scratch_shapes=[pltpu.VMEM((kp, bm), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((kp, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(counts, cols, seed, adj_i8, ld, ls, v, g, lse, delta)

    dls, dv = pl.pallas_call(
        functools.partial(_bwd_col_kernel, slope=slope, n_i=n_i, k=k,
                          dropout_p=dropout_p, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_j, n_i),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda jb, it, c, m, sd: (m[jb, it], jb)),
                pl.BlockSpec((kp, bm), lambda jb, it, c, m, sd: (0, m[jb, it])),
                pl.BlockSpec((kp, bn), lambda jb, it, c, m, sd: (0, jb)),
                pl.BlockSpec((bn, k, d), lambda jb, it, c, m, sd: (jb, 0, 0)),
                pl.BlockSpec((bm, k, d), lambda jb, it, c, m, sd: (m[jb, it], 0, 0)),
                pl.BlockSpec((kp, bm), lambda jb, it, c, m, sd: (0, m[jb, it])),
                pl.BlockSpec((kp, bm), lambda jb, it, c, m, sd: (0, m[jb, it])),
            ],
            out_specs=[
                pl.BlockSpec((kp, bn), lambda jb, it, c, m, sd: (0, jb)),
                pl.BlockSpec((bn, k, d), lambda jb, it, c, m, sd: (jb, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((kp, bn), jnp.float32),
                pltpu.VMEM((bn, k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((kp, n), jnp.float32),
            jax.ShapeDtypeStruct((n, k, d), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(counts_t, rows_t, seed, adj_i8, ld, ls, v, g, lse, delta)
    return dld, dls, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_core(adj_i8, ld, ls, v, seed, slope, bm, bn, interpret, dropout_p):
    counts, cols = _fwd_block_map(adj_i8, bm, bn)
    out, _ = _flash_fwd(counts, cols, seed, adj_i8, ld, ls, v, slope=slope,
                        bm=bm, bn=bn, interpret=interpret,
                        dropout_p=dropout_p)
    return out


def _fwd_block_map(adj_i8, bm, bn):
    n = adj_i8.shape[0]
    bmask = (adj_i8.reshape(n // bm, bm, n // bn, bn) != 0).any(axis=(1, 3))
    return _block_map(bmask)


def _bwd_block_map(adj_i8, bm, bn):
    n = adj_i8.shape[0]
    bmask = (adj_i8.reshape(n // bm, bm, n // bn, bn) != 0).any(axis=(1, 3))
    counts, cols = _block_map(bmask)
    counts_t, rows_t = _block_map(bmask.T)
    return counts, cols, counts_t, rows_t


def _flash_core_fwd(adj_i8, ld, ls, v, seed, slope, bm, bn, interpret,
                    dropout_p):
    counts, cols = _fwd_block_map(adj_i8, bm, bn)
    out, lse = _flash_fwd(counts, cols, seed, adj_i8, ld, ls, v, slope=slope,
                          bm=bm, bn=bn, interpret=interpret,
                          dropout_p=dropout_p)
    return out, (adj_i8, ld, ls, v, out, lse, seed)


def _flash_core_bwd(slope, bm, bn, interpret, dropout_p, res, g):
    import numpy as np

    adj_i8, ld, ls, v, out, lse, seed = res
    kp = ld.shape[0]
    n, k, _ = v.shape
    delta = jnp.zeros((kp, n), jnp.float32).at[:k].set(
        jnp.sum(g * out, axis=-1).T)  # per-head delta_i = g_i · out_i
    # the backward kernels keep more temporaries live per strip than the
    # forward (dz, c, gv, and the dv matmul), so they get a narrower tile —
    # narrower still under dropout, whose replayed PRNG masks add another
    # (BM, strip) temp per head (1024-wide bwd tiles measured ~17M scoped
    # VMEM vs the 16M limit). Dropout replay stays exact because strip
    # seeds are global SUB-strip indices (col_tile * (bn // sub) + c),
    # independent of the tile width.
    bn_b = min(bn, SUB if dropout_p > 0.0 else DEF_BN_BWD)
    counts, cols, counts_t, rows_t = _bwd_block_map(adj_i8, bm, bn_b)
    dld, dls, dv = _flash_bwd(counts, cols, counts_t, rows_t, seed, adj_i8,
                              ld, ls, v, g, lse, delta, slope=slope, bm=bm,
                              bn=bn_b, interpret=interpret,
                              dropout_p=dropout_p)
    d_adj = np.zeros(adj_i8.shape, dtype=jax.dtypes.float0)
    d_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return d_adj, dld, dls, dv, d_seed


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def flash_gat_attention(
    graph: DenseGraph | Any,
    fts: jax.Array,       # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    block_m: int = DEF_BM,
    block_n: int = DEF_BN,
    interpret: bool | None = None,
):
    """Drop-in implementation for ops.attention.attention_aggregate.

    Coefficient dropout (reference attn_drop, layers.py:29-30) is fused:
    the per-tile PRNG seed is derived from dropout_rng and replayed in the
    backward kernels, so no mask is ever materialized.
    """
    if coef_dropout > 0.0 and dropout_rng is None:
        raise ValueError("coef_dropout > 0 requires dropout_rng")
    if interpret is None:
        interpret = _default_interpret()
    if not isinstance(graph, DenseGraph):
        raise TypeError("flash impl needs a DenseGraph (dense-block regime)")

    n, k, d = fts.shape
    bm = min(block_m, _round_up(n, 128))
    bn = min(block_n, _round_up(n, 128))
    n_pad = _round_up(n, max(bm, bn))
    kp = _round_up(k, 8)  # sublane padding for per-head vectors

    adj_i8 = jnp.pad(graph.adj.astype(jnp.int8),
                     ((0, n_pad - n), (0, n_pad - n)))
    v = jnp.pad(fts.astype(jnp.float32), ((0, n_pad - n), (0, 0), (0, 0)))
    ld = jnp.pad(logit_dst.astype(jnp.float32).T,
                 ((0, kp - k), (0, n_pad - n)))
    ls = jnp.pad(logit_src.astype(jnp.float32).T,
                 ((0, kp - k), (0, n_pad - n)))

    if coef_dropout > 0.0:
        seed = jax.random.randint(
            dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    out = _flash_core(adj_i8, ld, ls, v, seed, slope, bm, bn, interpret,
                      float(coef_dropout))
    return out[:n].astype(fts.dtype)
