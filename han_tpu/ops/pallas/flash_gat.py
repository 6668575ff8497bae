"""Fused block-sparse flash-GAT Pallas kernel: SDDMM + masked softmax +
aggregation in one pass over the *occupied* adjacency tiles of a BCSRGraph.

The reference computes dense (N, N) attention per head and materializes the
full coefficient matrix (utils/layers.py:26-34). This kernel never
materializes it: for each row-block it sweeps that block's occupied column
tiles with an online-softmax accumulator (running max m, running sum l,
output acc) per head — the flash-attention recurrence with the graph
adjacency as mask:

    z_ij  = leaky_relu(ld_i + ls_j)        # SDDMM on the fly
    masked: z_ij = -1e9 off-edges          # == reference bias add
    out_i = sum_j softmax_j(z_ij) * v_j    # MXU per column tile

Numerics match the XLA dense path: masked entries underflow to exactly 0
once any real edge sets the row max; rows with no edges at all finalize to
0 (the sparse spec — tests/test_ops_parity.py).

Performance design (measured on TPU v5e):

- **True block sparsity.** The graph arrives as a BCSRGraph
  (graph/bcsr.py): only occupied (bm × bn) tiles are stored, and the
  forward/backward block maps are PRECOMPUTED on the host — no dense N²
  adjacency in HBM and no per-step O(N²) map reduction (both were round-1
  weaknesses). The grid's inner dimension is c_max (the max occupied tiles
  per row block), not N/bn, so grid steps scale with occupancy too.
- **Heads fused.** All K heads run inside one invocation (static loop), so
  each adjacency tile — the dominant HBM term — is read ONCE per tile
  instead of K times, as int8 (4× less HBM than f32), upcast in-register.
- **Flat (rows, K·D) VMEM layout.** Feature/output/gradient blocks enter
  the kernels flattened to rank-2: a rank-3 (·, K, D) VMEM block tiles its
  last TWO dims as (8 sublanes × 128 lanes), i.e. 16× lane padding at D=8
  (measured r3: the fused backward's scoped VMEM dropped from 51 MB to
  under 30 MB — which also lets it run under vmapped meta-path towers —
  and the bench fwd+bwd went 10.1 → 8.5 ms, fwd 3.2 → 2.7 ms). Heads
  address static lane slices [h·D:(h+1)·D]. Per-head m/l/lse live in
  (K_pad, bm) scratch.

Backward = two more Pallas kernels (row-sweep for d_logit_dst, col-sweep
for d_logit_src/dv, driven by the precomputed transposed map) with the same
layouts and the SAME tile width (tile geometry is fixed at container build
time — the round-1 fwd/bwd width mismatch and its padding-divisibility bug
class are gone), wired through jax.custom_vjp (derivation above _head_dz).

Sharding: ``row_block_offset`` globalizes the dropout PRNG stream per row
block, so an edge-partitioned multi-chip run (parallel/flash_shard.py)
replays exactly the masks of the single-chip run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from han_tpu.graph.containers import MASK_VALUE
from han_tpu.graph.bcsr import BCSRGraph

_NEG_INIT = -1e9  # same magnitude as the mask (finite on purpose; see above)

# Compute strips: the (BM, BN) f32 temporaries of the softmax math must stay
# small or the kernel overflows scoped VMEM, so compute sweeps each tile in
# SUB-wide column strips (DMA stays BN-wide). graph/bcsr.pick_tiles
# guarantees bn <= SUB or bn % SUB == 0.
SUB = 512


def _tile_drop_keep(shape, dropout_p: float, seed, i_abs, strip_abs, h: int,
                    interpret: bool):
    """Scaled inverted-dropout keep mask, deterministic per
    (seed, GLOBAL row tile, GLOBAL SUB-wide column strip, head) so forward
    and both backward kernels — and every shard of a partitioned run —
    replay the exact same mask. Hardware path: per-core PRNG (pltpu);
    interpreter path (CPU tests): jax.random with the same key derivation —
    the two draw different bits but each is internally consistent."""
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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(counts_ref, cols_ref, tiles_ref, meta_ref, adj_ref, ld_ref,
                ls_ref, v_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                slope: float, n_j: int, k: int, d: int, dropout_p: float,
                interpret: bool):
    # v/out/acc are FLAT (rows, K*D): rank-3 (·, K, D) VMEM blocks tile the
    # last two dims as (8 sublanes, 128 lanes) — 16x lane padding at D=8.
    # Flat blocks put K*D on the lane axis (64+ lanes), ~no padding; heads
    # address static lane slices [h*d:(h+1)*d].
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < counts_ref[i])
    def _compute():
        _fwd_tile_compute(adj_ref, ld_ref, ls_ref, v_ref, acc_ref, m_ref,
                          l_ref, meta_ref, i + meta_ref[1],
                          cols_ref[i, j] + meta_ref[3], slope=slope, k=k,
                          d=d, dropout_p=dropout_p, interpret=interpret)

    @pl.when(j == n_j - 1)
    def _finalize():
        _fwd_finalize(out_ref, lse_ref, acc_ref, m_ref, l_ref, k=k, d=d)


def _fwd_tile_compute(adj_ref, ld_ref, ls_ref, v_ref, acc_ref, m_ref, l_ref,
                      meta_ref, i_abs, col_abs, *, slope: float, k: int,
                      d: int, dropout_p: float, interpret: bool):
    """One occupied tile's online-softmax update (shared by the
    rectangular and flat-grid forward kernels; the dropout PRNG stream is
    keyed by the GLOBAL (row block, column block, head), so both grids —
    and every shard of a partitioned run — replay identical masks)."""
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
            # leaky_relu == max(x, slope*x) for 0 <= slope <= 1, folded
            # into the mask select: one select pass instead of two
            z = jnp.where(on_edge, jnp.maximum(raw, slope * raw),
                          MASK_VALUE)

            m_prev = m_ref[h, :]
            m_new = jnp.maximum(m_prev, jnp.max(z, axis=1))
            scale = jnp.exp(m_prev - m_new)  # flushes pre-edge junk to 0
            p = jnp.exp(z - m_new[:, None])  # masked entries underflow to 0
            l_new = l_ref[h, :] * scale + jnp.sum(p, axis=1)
            if dropout_p > 0.0:
                # reference order: softmax first, then dropout on the
                # coefs (layers.py:27-30) — l uses undropped p, acc the
                # dropped. col_abs globalizes the column-block index for
                # column-sharded (ring) execution.
                p_agg = p * _tile_drop_keep(
                    p.shape, dropout_p, meta_ref[0], i_abs,
                    col_abs * (bn // sub) + c,
                    meta_ref[2] + h, interpret)
            else:
                p_agg = p
            hd = slice(h * d, (h + 1) * d)
            pv = jnp.dot(p_agg, v_ref[cs, hd].astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # (BM, D)
            acc_ref[:, hd] = acc_ref[:, hd] * scale[:, None] + pv
            m_ref[h, :] = m_new
            l_ref[h, :] = l_new


def _fwd_finalize(out_ref, lse_ref, acc_ref, m_ref, l_ref, *, k: int, d: int):
    for h in range(k):
        hd = slice(h * d, (h + 1) * d)
        l = l_ref[h, :]
        m = m_ref[h, :]
        has_edge = m > (_NEG_INIT * 0.5)  # any real edge in this row
        inv = jnp.where(has_edge, 1.0 / jnp.maximum(l, 1e-30), 0.0)
        out_ref[:, hd] = acc_ref[:, hd] * inv[:, None]
        lse_ref[h, :] = jnp.where(
            has_edge, m + jnp.log(jnp.maximum(l, 1e-30)), _NEG_INIT)


def _fwd_kernel_flat(frow_ref, fcol_ref, ftile_ref, fact_ref, meta_ref,
                     adj_ref, ld_ref, ls_ref, v_ref, out_ref, lse_ref,
                     acc_ref, m_ref, l_ref, *, slope: float, n_steps: int,
                     k: int, d: int, dropout_p: float, interpret: bool):
    """Flat active-tile forward grid (results/ROOFLINE.md r5): one grid
    step per OCCUPIED tile in row-block-major order (graph/bcsr.py
    flat_fwd_map) instead of a rectangular (nb_r, c_max) grid - skewed
    tile distributions pay no masked steps and no masked-step block DMA.
    Row boundaries are detected from the prefetched row list; inactive
    steps (empty row blocks) run only init+finalize, producing the
    edgeless-row zeros. (A paired two-tiles-per-step variant measured
    SLOWER on-chip: doubling the DMA windows per step cost more than the
    amortized fixed step cost.)"""
    t = pl.program_id(0)
    rb = frow_ref[t]

    @pl.when((t == 0) | (rb != frow_ref[jnp.maximum(t - 1, 0)]))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INIT)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(fact_ref[t] == 1)
    def _compute():
        _fwd_tile_compute(adj_ref, ld_ref, ls_ref, v_ref, acc_ref, m_ref,
                          l_ref, meta_ref, rb + meta_ref[1],
                          fcol_ref[t] + meta_ref[3], slope=slope, k=k, d=d,
                          dropout_p=dropout_p, interpret=interpret)

    @pl.when((t == n_steps - 1)
             | (rb != frow_ref[jnp.minimum(t + 1, n_steps - 1)]))
    def _finalize():
        _fwd_finalize(out_ref, lse_ref, acc_ref, m_ref, l_ref, k=k, d=d)


def _flash_fwd(fcnt, fcol, ftile, meta, tiles2d, ld, ls, v, *, slope: float,
               bm: int, bn: int, interpret: bool, dropout_p: float = 0.0):
    """tiles2d (T*bm, bn) int8; ld (Kp, N_rows); ls (Kp, N_cols);
    v (N_cols, K, D) → out (N_rows, K, D), lse (Kp, N_rows). The row and
    column domains may differ (edge-partitioned shards own a row strip of
    the global column space). fcnt/fcol/ftile: precomputed forward block
    map (graph/bcsr.py); meta: (4,) int32 [dropout seed, row-block offset,
    global-head offset, column-block offset] — the offsets globalize the
    dropout PRNG streams for graph-, head- and column-(ring-)sharded
    execution."""
    n_cols, k, d = v.shape
    kp, n_rows = ld.shape
    n_i = n_rows // bm
    n_j = fcol.shape[1]  # c_max: max occupied tiles per row block
    kd = k * d
    v2 = v.reshape(n_cols, kd)  # flat layout (see _fwd_kernel note)
    kernel = functools.partial(_fwd_kernel, slope=slope, n_j=n_j, k=k, d=d,
                               dropout_p=dropout_p, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, cnt, col, td, mt: (td[i, j], 0)),
            pl.BlockSpec((kp, bm), lambda i, j, cnt, col, td, mt: (0, i)),
            pl.BlockSpec((kp, bn), lambda i, j, cnt, col, td, mt: (0, col[i, j])),
            pl.BlockSpec((bn, kd), lambda i, j, cnt, col, td, mt: (col[i, j], 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, kd), lambda i, j, cnt, col, td, mt: (i, 0)),
            pl.BlockSpec((kp, bm), lambda i, j, cnt, col, td, mt: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, kd), jnp.float32),
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
            jax.ShapeDtypeStruct((n_rows, kd), jnp.float32),
            jax.ShapeDtypeStruct((kp, n_rows), jnp.float32),
        ],
        interpret=interpret,
    )(fcnt, fcol, ftile, meta, tiles2d, ld, ls, v2)
    return out.reshape(n_rows, k, d), lse


def _flash_fwd_flat(flat, meta, tiles2d, ld, ls, v, *,
                    slope: float, bm: int, bn: int, interpret: bool,
                    dropout_p: float = 0.0):
    """Forward over the flat active-tile step list (see _fwd_kernel_flat).
    ``flat`` = the (row, col, tile, active) tuple from
    graph/bcsr.flat_fwd_map."""
    frow, fcolf, ftilef, fact = flat
    n_cols, k, d = v.shape
    kp, n_rows = ld.shape
    n_steps = int(frow.shape[0])
    kd = k * d
    v2 = v.reshape(n_cols, kd)
    kernel = functools.partial(_fwd_kernel_flat, slope=slope,
                               n_steps=n_steps, k=k, d=d,
                               dropout_p=dropout_p, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda t, fr, fc, ft, fa, mt: (ft[t], 0)),
            pl.BlockSpec((kp, bm), lambda t, fr, fc, ft, fa, mt: (0, fr[t])),
            pl.BlockSpec((kp, bn), lambda t, fr, fc, ft, fa, mt: (0, fc[t])),
            pl.BlockSpec((bn, kd), lambda t, fr, fc, ft, fa, mt: (fc[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, kd), lambda t, fr, fc, ft, fa, mt: (fr[t], 0)),
            pl.BlockSpec((kp, bm), lambda t, fr, fc, ft, fa, mt: (0, fr[t])),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, kd), jnp.float32),
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
            jax.ShapeDtypeStruct((n_rows, kd), jnp.float32),
            jax.ShapeDtypeStruct((kp, n_rows), jnp.float32),
        ],
        interpret=interpret,
    )(frow, fcolf, ftilef, fact, meta, tiles2d, ld, ls, v2)
    return out.reshape(n_rows, k, d), lse


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
    z = jnp.maximum(raw, slope * raw)  # leaky_relu for 0 <= slope <= 1
    # no separate z mask: off-edge exp may overflow to +inf (edgeless rows
    # have lse = -1e9) but the select zeroes it before any multiply — one
    # fewer VPU pass over the (bm, sub) strip
    c = jnp.where(on_edge, jnp.exp(z - lse[:, None]), 0.0)
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
    # lrelu' fold: dz * where(raw>=0, 1, slope) as a single select of the
    # two precomputed products — one fewer (bm, sub) materialize+mul pass
    return c_agg, jnp.where(raw >= 0, dz, slope * dz)


def _bwd_row_kernel(counts_ref, cols_ref, tiles_ref, meta_ref, adj_ref,
                    ld_ref, ls_ref, v_ref, g_ref, lse_ref, delta_ref,
                    dld_ref, acc_ref, *, slope: float, n_j: int, k: int,
                    d: int, dropout_p: float, interpret: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < counts_ref[i])
    def _compute():
        bn = adj_ref.shape[1]
        # dropout replay needs SUB-aligned strips; without it the widest
        # strip that fits scoped VMEM (the backward keeps ~7 (bm, sub) f32
        # temps live per head: 2048-wide blew the 128M v5e VMEM; 1024 fits)
        sub = min(bn, 2 * SUB) if dropout_p == 0.0 else min(SUB, bn)
        for c in range(bn // sub):
            cs = slice(c * sub, (c + 1) * sub)
            on_edge = adj_ref[:, cs] != 0
            for h in range(k):
                mask = (_tile_drop_keep(
                            on_edge.shape, dropout_p, meta_ref[0],
                            i + meta_ref[1],
                            (cols_ref[i, j] + meta_ref[3]) * (bn // sub) + c,
                            meta_ref[2] + h, interpret)
                        if dropout_p > 0.0 else None)
                hd = slice(h * d, (h + 1) * d)
                _, dzs = _head_dz(on_edge, ld_ref[h, :], ls_ref[h, cs],
                                  lse_ref[h, :], delta_ref[h, :],
                                  g_ref[:, hd],
                                  v_ref[cs, hd].astype(jnp.float32),
                                  slope, mask)
                acc_ref[h, :] += jnp.sum(dzs, axis=1)

    @pl.when(j == n_j - 1)
    def _fin():
        dld_ref[:] = acc_ref[:]


def _bwd_col_kernel(counts_ref, rows_ref, tiles_ref, meta_ref, adj_ref,
                    ld_ref, ls_ref, v_ref, g_ref, lse_ref, delta_ref,
                    dls_ref, dv_ref, *rest, slope: float, n_i: int, k: int,
                    d: int, bm: int, dropout_p: float, interpret: bool,
                    fuse_dld: bool = True):
    """Single-sweep backward: per occupied tile (column-major) compute dz
    once and scatter all three gradients — dls/dv into per-column-block
    accumulators, dld into a persistent full-width VMEM output window
    (constant block index) at the tile's row offset. Eliminates the
    separate row-sweep pass (the tiles are read ONCE in the backward).
    ``fuse_dld=False`` (huge-N fallback): no dld output — the separate
    row-sweep kernel produces it instead."""
    if fuse_dld:
        dld_ref, dls_acc, dv_acc, dld_tile = rest
    else:
        dld_ref, (dls_acc, dv_acc) = None, rest
    jb = pl.program_id(0)
    it = pl.program_id(1)  # row sweep is innermost here

    if fuse_dld:
        @pl.when((jb == 0) & (it == 0))
        def _init_dld():
            dld_ref[:] = jnp.zeros_like(dld_ref)

    @pl.when(it == 0)
    def _init():
        dls_acc[:] = jnp.zeros_like(dls_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(it < counts_ref[jb])
    def _compute():
        bn = adj_ref.shape[1]
        # full-width strips with dropout off: the flat layout brought the
        # per-strip f32 temps down enough that one 2048-wide pass fits
        # scoped VMEM (r2's rank-3 layout could not go past 1024)
        sub = min(bn, 4 * SUB) if dropout_p == 0.0 else min(SUB, bn)
        rb = rows_ref[jb, it]
        if fuse_dld:
            dld_tile[:] = jnp.zeros_like(dld_tile)
        for c in range(bn // sub):
            cs = slice(c * sub, (c + 1) * sub)
            on_edge = adj_ref[:, cs] != 0
            for h in range(k):
                mask = (_tile_drop_keep(
                            on_edge.shape, dropout_p, meta_ref[0],
                            rb + meta_ref[1],
                            (jb + meta_ref[3]) * (bn // sub) + c,
                            meta_ref[2] + h, interpret)
                        if dropout_p > 0.0 else None)
                hd = slice(h * d, (h + 1) * d)
                c_agg, dzs = _head_dz(on_edge, ld_ref[h, :], ls_ref[h, cs],
                                      lse_ref[h, :], delta_ref[h, :],
                                      g_ref[:, hd],
                                      v_ref[cs, hd].astype(jnp.float32),
                                      slope, mask)
                dls_acc[h, cs] += jnp.sum(dzs, axis=0)
                dv_acc[cs, hd] += jax.lax.dot_general(  # (c·m)^T · g
                    c_agg, g_ref[:, hd],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if fuse_dld:
                    # accumulate per tile in scratch; ONE dynamic-slice
                    # read-modify-write of the resident dld window per grid
                    # step instead of k * (bn // sub) of them
                    dld_tile[h, :] += jnp.sum(dzs, axis=1)
        if fuse_dld:
            cur = dld_ref[:, pl.ds(rb * bm, bm)]
            dld_ref[:, pl.ds(rb * bm, bm)] = cur + dld_tile[:]

    @pl.when(it == n_i - 1)
    def _fin():
        dls_ref[:] = dls_acc[:]
        dv_ref[:] = dv_acc[:]


# the fused backward keeps the full (kp, n_rows) dld window resident in
# VMEM across the whole grid; beyond this, fall back to a separate
# row-sweep kernel for dld
_FUSED_DLD_BYTES = 12 * 1024 * 1024


def _bwd_vmem_limit(bm: int, bn: int, kp: int, kd: int, n_rows: int,
                    dropout_p: float) -> int:
    """Scoped-VMEM ceiling for the fused backward, derived from the actual
    block shapes (×2 double buffering on streamed blocks) plus the resident
    dld window, scratch, and the per-strip f32 compute temporaries — a flat
    30 MB constant (r3) broke configs larger than the one it was measured
    on (ADVICE r3)."""
    sub = min(bn, 4 * SUB) if dropout_p == 0.0 else min(SUB, bn)
    f = 4
    streamed = (bm * bn                       # adj tile, int8
                + 3 * kp * bm * f             # ld, lse, delta
                + kp * bn * f                 # ls
                + bn * kd * f                 # v2
                + bm * kd * f                 # g2
                + kp * bn * f + bn * kd * f)  # dls, dv outputs
    scratch = kp * bn * f + bn * kd * f + kp * bm * f
    resident = kp * n_rows * f                # dld window
    # Mosaic keeps ~8 (bm, sub) f32 temporaries live on the kernel stack
    # (raw/z/c/c_agg/gv/dz/dzs + spill): measured 49.3 MB demand at
    # bn=4096/sub=2048 — a 6-pass estimate under-allocated there
    temps = 8 * bm * sub * f
    need = 2 * streamed + scratch + resident + temps
    return min(max(int(need * 1.6), 48 * 1024 * 1024), 110 * 1024 * 1024)


def _flash_bwd(fcnt, fcol, ftile, bcnt, brow, btile, meta, tiles2d, ld, ls,
               v, g, lse, delta, *, slope: float, bm: int, bn: int,
               interpret: bool, dropout_p: float = 0.0):
    n_cols, k, d = v.shape
    kp, n_rows = ld.shape
    n_i = n_rows // bm
    c_max = fcol.shape[1]
    r_max = brow.shape[1]
    n_jb = n_cols // bn
    kd = k * d
    v2 = v.reshape(n_cols, kd)    # flat layout (see _fwd_kernel note)
    g2 = g.reshape(n_rows, kd)

    if kp * n_rows * 4 <= _FUSED_DLD_BYTES:
        dls, dv, dld = pl.pallas_call(
            functools.partial(_bwd_col_kernel, slope=slope, n_i=r_max, k=k,
                              d=d, bm=bm, dropout_p=dropout_p,
                              interpret=interpret),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(n_jb, r_max),
                in_specs=[
                    pl.BlockSpec((bm, bn), lambda jb, it, c, m, td, mt: (td[jb, it], 0)),
                    pl.BlockSpec((kp, bm), lambda jb, it, c, m, td, mt: (0, m[jb, it])),
                    pl.BlockSpec((kp, bn), lambda jb, it, c, m, td, mt: (0, jb)),
                    pl.BlockSpec((bn, kd), lambda jb, it, c, m, td, mt: (jb, 0)),
                    pl.BlockSpec((bm, kd), lambda jb, it, c, m, td, mt: (m[jb, it], 0)),
                    pl.BlockSpec((kp, bm), lambda jb, it, c, m, td, mt: (0, m[jb, it])),
                    pl.BlockSpec((kp, bm), lambda jb, it, c, m, td, mt: (0, m[jb, it])),
                ],
                out_specs=[
                    pl.BlockSpec((kp, bn), lambda jb, it, c, m, td, mt: (0, jb)),
                    pl.BlockSpec((bn, kd), lambda jb, it, c, m, td, mt: (jb, 0)),
                    # dld: ONE full-width window, resident across the grid
                    pl.BlockSpec((kp, n_rows), lambda jb, it, c, m, td, mt: (0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((kp, bn), jnp.float32),
                    pltpu.VMEM((bn, kd), jnp.float32),
                    pltpu.VMEM((kp, bm), jnp.float32),  # per-tile dld
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((kp, n_cols), jnp.float32),
                jax.ShapeDtypeStruct((n_cols, kd), jnp.float32),
                jax.ShapeDtypeStruct((kp, n_rows), jnp.float32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_bwd_vmem_limit(bm, bn, kp, kd, n_rows,
                                                 dropout_p)),
            interpret=interpret,
        )(bcnt, brow, btile, meta, tiles2d, ld, ls, v2, g2, lse, delta)
        return dld, dls, dv.reshape(n_cols, k, d)

    dld = pl.pallas_call(
        functools.partial(_bwd_row_kernel, slope=slope, n_j=c_max, k=k, d=d,
                          dropout_p=dropout_p, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_i, c_max),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j, c, m, td, mt: (td[i, j], 0)),
                pl.BlockSpec((kp, bm), lambda i, j, c, m, td, mt: (0, i)),
                pl.BlockSpec((kp, bn), lambda i, j, c, m, td, mt: (0, m[i, j])),
                pl.BlockSpec((bn, kd), lambda i, j, c, m, td, mt: (m[i, j], 0)),
                pl.BlockSpec((bm, kd), lambda i, j, c, m, td, mt: (i, 0)),
                pl.BlockSpec((kp, bm), lambda i, j, c, m, td, mt: (0, i)),
                pl.BlockSpec((kp, bm), lambda i, j, c, m, td, mt: (0, i)),
            ],
            out_specs=pl.BlockSpec((kp, bm), lambda i, j, c, m, td, mt: (0, i)),
            scratch_shapes=[pltpu.VMEM((kp, bm), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((kp, n_rows), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(fcnt, fcol, ftile, meta, tiles2d, ld, ls, v2, g2, lse, delta)

    dls, dv = pl.pallas_call(
        functools.partial(_bwd_col_kernel, slope=slope, n_i=r_max, k=k, d=d,
                          bm=bm, dropout_p=dropout_p, interpret=interpret,
                          fuse_dld=False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_jb, r_max),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda jb, it, c, m, td, mt: (td[jb, it], 0)),
                pl.BlockSpec((kp, bm), lambda jb, it, c, m, td, mt: (0, m[jb, it])),
                pl.BlockSpec((kp, bn), lambda jb, it, c, m, td, mt: (0, jb)),
                pl.BlockSpec((bn, kd), lambda jb, it, c, m, td, mt: (jb, 0)),
                pl.BlockSpec((bm, kd), lambda jb, it, c, m, td, mt: (m[jb, it], 0)),
                pl.BlockSpec((kp, bm), lambda jb, it, c, m, td, mt: (0, m[jb, it])),
                pl.BlockSpec((kp, bm), lambda jb, it, c, m, td, mt: (0, m[jb, it])),
            ],
            out_specs=[
                pl.BlockSpec((kp, bn), lambda jb, it, c, m, td, mt: (0, jb)),
                pl.BlockSpec((bn, kd), lambda jb, it, c, m, td, mt: (jb, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((kp, bn), jnp.float32),
                pltpu.VMEM((bn, kd), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((kp, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((n_cols, kd), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(bcnt, brow, btile, meta, tiles2d, ld, ls, v2, g2, lse, delta)
    return dld, dls, dv.reshape(n_cols, k, d)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _flash_core(tiles2d, fcnt, fcol, ftile, bcnt, brow, btile, meta,
                ld, ls, v, slope, bm, bn, interpret, dropout_p):
    out, _ = _flash_fwd(fcnt, fcol, ftile, meta, tiles2d, ld, ls, v,
                        slope=slope, bm=bm, bn=bn, interpret=interpret,
                        dropout_p=dropout_p)
    return out


def _flash_core_fwd(tiles2d, fcnt, fcol, ftile, bcnt, brow, btile, meta,
                    ld, ls, v, slope, bm, bn, interpret, dropout_p):
    out, lse = _flash_fwd(fcnt, fcol, ftile, meta, tiles2d, ld, ls, v,
                          slope=slope, bm=bm, bn=bn, interpret=interpret,
                          dropout_p=dropout_p)
    return out, (tiles2d, fcnt, fcol, ftile, bcnt, brow, btile, meta,
                 ld, ls, v, out, lse)


def _flash_core_bwd(slope, bm, bn, interpret, dropout_p, res, g):
    import numpy as np

    (tiles2d, fcnt, fcol, ftile, bcnt, brow, btile, meta,
     ld, ls, v, out, lse) = res
    kp = ld.shape[0]
    k = v.shape[1]
    n_rows = g.shape[0]
    delta = jnp.zeros((kp, n_rows), jnp.float32).at[:k].set(
        jnp.sum(g * out, axis=-1).T)  # per-head delta_i = g_i · out_i
    dld, dls, dv = _flash_bwd(fcnt, fcol, ftile, bcnt, brow, btile, meta,
                              tiles2d, ld, ls, v, g, lse, delta, slope=slope,
                              bm=bm, bn=bn, interpret=interpret,
                              dropout_p=dropout_p)
    z = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (z(tiles2d), z(fcnt), z(fcol), z(ftile), z(bcnt), z(brow),
            z(btile), z(meta), dld, dls, dv.astype(v.dtype))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16))
def _flash_core_flat(tiles2d, flat, fcnt, fcol, ftile,
                     bcnt, brow, btile, meta, ld, ls, v, slope, bm, bn,
                     interpret, dropout_p):
    """Single-chip forward over the flat paired-tile grid; the backward is
    the shared fused column-sweep (_flash_bwd, unchanged — its dropout
    replay keys on global (row block, column block, head), which the flat
    forward preserves)."""
    out, _ = _flash_fwd_flat(flat, meta, tiles2d, ld, ls, v, slope=slope,
                             bm=bm, bn=bn, interpret=interpret,
                             dropout_p=dropout_p)
    return out


def _flash_core_flat_fwd(tiles2d, flat, fcnt, fcol,
                         ftile, bcnt, brow, btile, meta, ld, ls, v, slope,
                         bm, bn, interpret, dropout_p):
    out, lse = _flash_fwd_flat(flat, meta, tiles2d, ld, ls, v, slope=slope,
                               bm=bm, bn=bn, interpret=interpret,
                               dropout_p=dropout_p)
    return out, (tiles2d, flat, fcnt, fcol, ftile,
                 bcnt, brow, btile, meta, ld, ls, v, out, lse)


def _flash_core_flat_bwd(slope, bm, bn, interpret, dropout_p, res, g):
    import numpy as np

    (tiles2d, flat, fcnt, fcol, ftile, bcnt, brow,
     btile, meta, ld, ls, v, out, lse) = res
    kp = ld.shape[0]
    k = v.shape[1]
    n_rows = g.shape[0]
    delta = jnp.zeros((kp, n_rows), jnp.float32).at[:k].set(
        jnp.sum(g.astype(jnp.float32) * out, axis=-1).T)
    dld, dls, dv = _flash_bwd(fcnt, fcol, ftile, bcnt, brow, btile, meta,
                              tiles2d, ld, ls, v, g, lse, delta, slope=slope,
                              bm=bm, bn=bn, interpret=interpret,
                              dropout_p=dropout_p)
    z = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (z(tiles2d), tuple(z(a) for a in flat), z(fcnt),
            z(fcol), z(ftile), z(bcnt), z(brow), z(btile), z(meta),
            dld, dls, dv.astype(v.dtype))


_flash_core_flat.defvjp(_flash_core_flat_fwd, _flash_core_flat_bwd)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def flash_gat_attention(
    graph: BCSRGraph,
    fts: jax.Array,       # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    interpret: bool | None = None,
    row_block_offset: jax.Array | int = 0,
    head_offset: jax.Array | int = 0,
):
    """Drop-in implementation for ops.attention.attention_aggregate.

    Coefficient dropout (reference attn_drop, layers.py:29-30) is fused:
    the per-tile PRNG seed is derived from dropout_rng and replayed in the
    backward kernels, so no mask is ever materialized. ``row_block_offset``
    (in row-block units) globalizes the dropout stream for edge-partitioned
    execution — shard s passes its first global row block index so the
    sharded run replays the single-chip masks exactly.
    """
    if coef_dropout > 0.0 and dropout_rng is None:
        raise ValueError("coef_dropout > 0 requires dropout_rng")
    if not 0.0 <= slope <= 1.0:
        # kernels compute leaky_relu as max(x, slope*x)
        raise ValueError(f"slope must be in [0, 1], got {slope}")
    if interpret is None:
        interpret = _default_interpret()
    if not isinstance(graph, BCSRGraph):
        raise TypeError(
            "flash impl needs a BCSRGraph (graph/bcsr.py builders; "
            "graph_format='bcsr' in the trainer)")

    n, k, d = fts.shape
    bm, bn, n_pad = graph.bm, graph.bn, graph.n_pad
    kp = max(((k + 7) // 8) * 8, 8)  # sublane padding for per-head vectors

    # bf16 features stream to the kernels AS bf16 (the v block is the
    # largest per-tile DMA after the adjacency; halving it measurably
    # helps the backward — results/BF16_r5.md) and upcast in-register;
    # everything else computes/accumulates f32
    v_dt = jnp.bfloat16 if fts.dtype == jnp.bfloat16 else jnp.float32
    v = jnp.pad(fts.astype(v_dt), ((0, n_pad - n), (0, 0), (0, 0)))
    ld = jnp.pad(logit_dst.astype(jnp.float32).T,
                 ((0, kp - k), (0, n_pad - n)))
    ls = jnp.pad(logit_src.astype(jnp.float32).T,
                 ((0, kp - k), (0, n_pad - n)))

    if coef_dropout > 0.0:
        seed = jax.random.randint(
            dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.int32(0)
    meta = jnp.stack([seed, jnp.asarray(row_block_offset, jnp.int32),
                      jnp.asarray(head_offset, jnp.int32),
                      jnp.zeros((), jnp.int32)])

    tiles2d = graph.tiles.reshape(-1, bn)
    if graph.fwd_flat is not None:
        # flat PAIRED active-tile forward grid (no masked steps, fixed
        # per-step cost amortized over two tiles — results/ROOFLINE.md
        # r5); backward shared with the 2D path
        out = _flash_core_flat(
            tiles2d, tuple(graph.fwd_flat), graph.fwd_count,
            graph.fwd_col, graph.fwd_tile, graph.bwd_count, graph.bwd_row,
            graph.bwd_tile, meta, ld, ls, v, slope, bm, bn, interpret,
            float(coef_dropout))
    else:
        out = _flash_core(tiles2d, graph.fwd_count, graph.fwd_col,
                          graph.fwd_tile, graph.bwd_count, graph.bwd_row,
                          graph.bwd_tile, meta, ld, ls, v, slope, bm, bn,
                          interpret, float(coef_dropout))
    return out[:n].astype(fts.dtype)
