"""Fused ELL (fixed-fanout) attention kernel: in-VMEM neighbor gather +
SDDMM + segment softmax + weighted aggregation per row block.

Edge-domain regime (memory ∝ nnz): each row's neighbor list is padded to
fanout F (han_tpu.graph.containers.EllGraph). The whole feature table lives
in VMEM (fits for N·Dp ≤ ~4M floats; larger graphs take the neighbor-sampled
path that bounds N per shard), so the gather is VMEM-local instead of an HBM
round-trip per layer — the XLA ell path materializes the gathered
(N, F, K, D) tensor in HBM; this kernel never does.

Status: relies on Mosaic's dynamic-gather lowering for ``jnp.take`` along
the sublane axis; validated in interpreter mode everywhere and compiled on
TPU where supported (ops/attention dispatch falls back to the XLA ell path
if compilation is unavailable).
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


def _kernel(nbr_ref, ld_ref, ls_ref, fts_ref, out_ref, *, slope: float,
            n_nodes: int):
    # blocks: nbr (BM, F); ld (BM, K); ls (N+pad, K) full; fts (N+pad, K*Dp) full
    nbr = nbr_ref[:]  # (BM, F) int32, sentinel >= n_nodes
    valid = nbr < n_nodes
    safe = jnp.where(valid, nbr, 0)

    ls_g = jnp.take(ls_ref[:], safe.reshape(-1), axis=0)  # (BM*F, K)
    bm, f = nbr.shape
    k = ld_ref.shape[1]
    ls_g = ls_g.reshape(bm, f, k)
    raw = ld_ref[:][:, None, :] + ls_g  # (BM, F, K)
    z = jnp.where(raw >= 0, raw, slope * raw)
    z = jnp.where(valid[:, :, None], z, MASK_VALUE)

    m = jnp.max(z, axis=1, keepdims=True)  # (BM, 1, K)
    e = jnp.where(valid[:, :, None], jnp.exp(z - m), 0.0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    coefs = e / jnp.maximum(denom, 1e-30)  # (BM, F, K)

    fts_g = jnp.take(fts_ref[:], safe.reshape(-1), axis=0)  # (BM*F, K*Dp)
    dp = fts_g.shape[-1] // k
    fts_g = fts_g.reshape(bm, f, k, dp)
    out = jnp.sum(coefs[..., None] * fts_g, axis=1)  # (BM, K, Dp)
    out_ref[:] = out.reshape(bm, k * dp)


def ell_fused_attention(
    graph: EllGraph,
    fts: jax.Array,       # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    block_m: int = 128,
    interpret: bool | None = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, k, d = fts.shape
    f = graph.fanout
    n_pad = _round_up(n, block_m)
    dp = d  # lane padding handled by the flattened K*D axis

    nbr = jnp.pad(graph.nbr, ((0, n_pad - n), (0, 0)), constant_values=n)
    ld = jnp.pad(logit_dst.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    ls = jnp.pad(logit_src.astype(jnp.float32), ((0, 1), (0, 0)))  # +sentinel row
    fts_flat = jnp.pad(
        fts.astype(jnp.float32).reshape(n, k * d), ((0, 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, slope=slope, n_nodes=n),
        grid=(n_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, f), lambda i: (i, 0)),
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((n + 1, k), lambda i: (0, 0)),
            pl.BlockSpec((n + 1, k * dp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, k * dp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, k * dp), jnp.float32),
        interpret=interpret,
    )(nbr, ld, ls, fts_flat)
    return out[:n].reshape(n, k, d).astype(fts.dtype)
