"""Fused ELL (fixed-fanout) attention kernel: in-VMEM neighbor gather +
SDDMM + segment softmax + weighted aggregation per row block.

Edge-domain regime (memory ∝ nnz): each row's neighbor list is padded to
fanout F (han_tpu.graph.containers.EllGraph). The whole feature table lives
in VMEM (fits for N·Dp ≤ ~4M floats; larger graphs take the neighbor-sampled
path that bounds N per shard), so the gather is VMEM-local instead of an HBM
round-trip per layer — the XLA ell path materializes the gathered
(N, F, K, D) tensor in HBM; this kernel never does.

Status: relies on Mosaic's dynamic-gather lowering for ``jnp.take`` along
the sublane axis; validated in interpreter mode everywhere, but Mosaic
(as of this jax) lowers ``lax.gather`` ONLY in take_along_axis form
(indices shaped like the operand; _gather_lowering_rule), and its
sublane-axis dynamic_gather compiles only within one 8-row tile — so this
kernel does NOT compile on TPU at production shapes (measured r5: the
8704-row sampled block fails in Mosaic; results/SCALE_r5.md). The sampled
trainer therefore defaults to the XLA ``ell`` backend, whose flat-(K·D)
gather layout measured 2.85x faster than its rank-4 form and runs the
100M-edge config device-bound. This kernel remains the interpreter-mode
reference for a future Mosaic with general gather support. Reachable
through ``attention_aggregate(..., impl="ell_fused")``.

Backward: a custom VJP in the edge/segment domain (XLA segment ops — the
gradients need scatter-adds into source rows, which TPU Pallas has no
efficient primitive for; the fused kernel is the inference/forward hot
path, the backward shares the csr path's well-fused XLA scatter lowering).
Derivation mirrors flash_gat: with c = softmax(masked lrelu(ld_i + ls_j)),
dz = c·(g·v − Σ_f c·(g·v)); dld row-sum, dls/dv scatter over ELL slots.

Coefficient dropout (reference attn_drop, layers.py:29-30) is fused into
the kernel; the keep mask is drawn ONCE in XLA — (N, F, K) uint8, far
smaller than the (N, F, K, D) gather the unfused ell path materializes —
because the segment-op backward must replay the exact mask the hardware
kernel applied (the in-kernel pltpu PRNG is not reproducible from XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from han_tpu.graph.containers import EllGraph, MASK_VALUE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(nbr_ref, ld_ref, ls_ref, fts_ref, *rest, slope: float,
            n_nodes: int, dropout_p: float):
    # blocks: nbr (BM, F); ld (BM, K); ls (N+pad, K) full; fts (N+pad, K*Dp)
    # full; with dropout also keep_ref (BM, F*K) uint8 (the mask is drawn
    # in XLA so the segment-op backward replays it exactly)
    if dropout_p > 0.0:
        keep_ref, out_ref = rest
    else:
        out_ref, = rest
    nbr = nbr_ref[:]  # (BM, F) int32, sentinel >= n_nodes
    valid = nbr < n_nodes
    safe = jnp.where(valid, nbr, 0)

    ls_g = jnp.take(ls_ref[:], safe.reshape(-1), axis=0)  # (BM*F, K)
    bm, f = nbr.shape
    k = ld_ref.shape[1]
    ls_g = ls_g.reshape(bm, f, k)
    raw = ld_ref[:][:, None, :] + ls_g  # (BM, F, K)
    z = jnp.where(valid[:, :, None], jnp.maximum(raw, slope * raw),
                  MASK_VALUE)

    m = jnp.max(z, axis=1, keepdims=True)  # (BM, 1, K)
    e = jnp.where(valid[:, :, None], jnp.exp(z - m), 0.0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    coefs = e / jnp.maximum(denom, 1e-30)  # (BM, F, K)
    if dropout_p > 0.0:
        # reference order: softmax first, then dropout on the coefficients
        # (layers.py:27-30)
        keep = keep_ref[:].reshape(bm, f, k) != 0
        coefs = jnp.where(keep, coefs / (1.0 - dropout_p), 0.0)

    fts_g = jnp.take(fts_ref[:], safe.reshape(-1), axis=0)  # (BM*F, K*Dp)
    dp = fts_g.shape[-1] // k
    fts_g = fts_g.reshape(bm, f, k, dp)
    out = jnp.sum(coefs[..., None] * fts_g, axis=1)  # (BM, K, Dp)
    out_ref[:] = out.reshape(bm, k * dp)


def _ell_coefs(nbr, valid, logit_dst, logit_src, slope):
    """(N, F, K) softmax coefficients + raw logits (shared fwd/bwd math)."""
    k = logit_dst.shape[1]
    ls_pad = jnp.concatenate([logit_src, jnp.zeros((1, k), logit_src.dtype)],
                             axis=0)
    raw = logit_dst[:, None, :] + ls_pad[nbr]          # (N, F, K)
    z = jnp.where(raw >= 0, raw, slope * raw)
    z = jnp.where(valid[:, :, None], z, MASK_VALUE)
    m = jnp.max(z, axis=1, keepdims=True)
    e = jnp.where(valid[:, :, None], jnp.exp(z - m), 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    return e / denom, raw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ell_fused_core(nbr, keep, fts, logit_dst, logit_src, slope, block_m,
                    interpret, dropout_p):
    return _ell_fused_fwd_call(nbr, keep, fts, logit_dst, logit_src,
                               slope=slope, block_m=block_m,
                               interpret=interpret, dropout_p=dropout_p)


def _ell_fused_core_fwd(nbr, keep, fts, logit_dst, logit_src, slope, block_m,
                        interpret, dropout_p):
    out = _ell_fused_fwd_call(nbr, keep, fts, logit_dst, logit_src,
                              slope=slope, block_m=block_m,
                              interpret=interpret, dropout_p=dropout_p)
    return out, (nbr, keep, fts, logit_dst, logit_src)


def _ell_fused_core_bwd(slope, block_m, interpret, dropout_p, res, g):
    import numpy as np

    nbr, keep, fts, logit_dst, logit_src = res
    n, k, d = fts.shape
    f = nbr.shape[1]
    valid = nbr < n
    safe = jnp.where(valid, nbr, n)
    coefs, raw = _ell_coefs(nbr, valid, logit_dst, logit_src, slope)
    if dropout_p > 0.0:
        # replay the forward's XLA-drawn mask: c̃ = c·mk with
        # mk = keep/(1-p); out = Σ_f c̃ v ⇒ dz_j = c_j(mk_j·(g·v_j) −
        # Σ_f mk_f c_f (g·v_f)); dv_j = c̃_j ᵀ g
        mk = jnp.where(keep != 0, 1.0 / (1.0 - dropout_p), 0.0)  # (N, F, K)
    else:
        mk = None
    c_agg = coefs * mk if mk is not None else coefs

    fts_pad = jnp.concatenate([fts, jnp.zeros((1, k, d), fts.dtype)], axis=0)
    gv = jnp.einsum("nkd,nfkd->nfk", g, fts_pad[safe])      # g_i · v_j
    gv_agg = gv * mk if mk is not None else gv
    dz = coefs * (gv_agg - jnp.sum(c_agg * gv, axis=1, keepdims=True))
    dz = jnp.where(raw >= 0, dz, slope * dz)
    dz = jnp.where(valid[:, :, None], dz, 0.0)

    dld = jnp.sum(dz, axis=1)                               # (N, K)
    flat = safe.reshape(-1)                                 # (N*F,)
    dls = jax.ops.segment_sum(dz.reshape(n * f, k), flat,
                              num_segments=n + 1)[:n]
    dv = jax.ops.segment_sum(
        (c_agg[..., None] * g[:, None, :, :]).reshape(n * f, k, d),
        flat, num_segments=n + 1)[:n]
    z0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return z0(nbr), z0(keep), dv.astype(fts.dtype), \
        dld.astype(logit_dst.dtype), dls.astype(logit_src.dtype)


_ell_fused_core.defvjp(_ell_fused_core_fwd, _ell_fused_core_bwd)


def ell_fused_attention(
    graph: EllGraph,
    fts: jax.Array,       # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    block_m: int = 128,
    interpret: bool | None = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if coef_dropout > 0.0:
        if dropout_rng is None:
            raise ValueError("coef_dropout > 0 requires dropout_rng")
        n, k, _ = fts.shape
        # drawn ONCE in XLA so the segment-op backward replays the exact
        # mask the kernel applied; (N, F, K) uint8 ≪ the (N, F, K, D)
        # gather the unfused path materializes
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - coef_dropout,
            (n, graph.nbr.shape[1], k)).astype(jnp.uint8)
    else:
        keep = jnp.zeros((1, 1, 1), jnp.uint8)
    return _ell_fused_core(graph.nbr, keep, fts, logit_dst, logit_src,
                           slope, block_m, interpret, float(coef_dropout))


def _ell_fused_fwd_call(
    nbr_arr: jax.Array,
    keep_arr: jax.Array,   # (N, F, K) uint8, or (1, 1, 1) when dropout off
    fts: jax.Array,       # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    block_m: int = 128,
    interpret: bool = False,
    dropout_p: float = 0.0,
):
    n, k, d = fts.shape
    f = int(nbr_arr.shape[1])
    n_pad = _round_up(n, block_m)
    dp = d  # lane padding handled by the flattened K*D axis

    nbr = jnp.pad(nbr_arr, ((0, n_pad - n), (0, 0)), constant_values=n)
    ld = jnp.pad(logit_dst.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    ls = jnp.pad(logit_src.astype(jnp.float32), ((0, 1), (0, 0)))  # +sentinel row
    fts_flat = jnp.pad(
        fts.astype(jnp.float32).reshape(n, k * d), ((0, 1), (0, 0)))

    in_specs = [
        pl.BlockSpec((block_m, f), lambda i: (i, 0)),
        pl.BlockSpec((block_m, k), lambda i: (i, 0)),
        pl.BlockSpec((n + 1, k), lambda i: (0, 0)),
        pl.BlockSpec((n + 1, k * dp), lambda i: (0, 0)),
    ]
    args = [nbr, ld, ls, fts_flat]
    if dropout_p > 0.0:
        keep_flat = jnp.pad(keep_arr.reshape(n, f * k),
                            ((0, n_pad - n), (0, 0)))
        in_specs.append(pl.BlockSpec((block_m, f * k), lambda i: (i, 0)))
        args.append(keep_flat)

    out = pl.pallas_call(
        functools.partial(_kernel, slope=slope, n_nodes=n,
                          dropout_p=dropout_p),
        grid=(n_pad // block_m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, k * dp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, k * dp), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:n].reshape(n, k, d).astype(fts.dtype)
