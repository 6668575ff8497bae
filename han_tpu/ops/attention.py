"""Graph attention aggregation ops — the framework's compute core.

One mathematical spec, several executions:

    logits[i, j, k] = leaky_relu(logit_dst[i, k] + logit_src[j, k])
    coefs[i, :, k]  = softmax over in-neighbors j of node i
    out[i, k, :]    = sum_j coefs[i, j, k] * fts[j, k, :]

This is the reference attention head factored into edge-domain form
(reference utils/layers.py:26-34 dense; utils/layers.py:93-115 sparse —
the two are numerically identical because exp(-1e9 + x) underflows to 0 in
fp32; see tests/test_ops_parity.py).

Implementations:

- ``dense``  — materialized (K, N, N) masked softmax; the oracle; O(N²) memory.
- ``ell``    — gather over fixed-fanout ELLPACK neighbor lists; O(N·F) memory;
               XLA lowers the gathers + the fused softmax natively.
- ``csr``    — COO/segment-domain: SDDMM → segment-softmax → SpMM via XLA
               segment ops; O(E) memory; the behavioral spec for the Pallas
               kernels.
- ``ell_fused`` — Pallas in-VMEM-gather forward over ELLPACK lists with a
               segment-op custom-VJP backward (ops/pallas/ell_fused.py).
- ``flash``  — fused block-sparse Pallas flash-GAT kernel over the occupied
               tiles of a BCSRGraph (ops/pallas/flash_gat.py).

Distributed containers dispatch directly on type: PartitionedBCSR →
per-shard flash under shard_map, PartitionedCSR → sharded segment ops,
PartitionedCSR2D → ring halo exchange (parallel/).

All take features in head-major layout ``fts: (N, K, D)`` and per-head node
logit terms ``logit_dst, logit_src: (N, K)`` and return ``(N, K, D)``.
"""

from __future__ import annotations

from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp

from han_tpu.graph.containers import CSRGraph, DenseGraph, EllGraph, MASK_VALUE

Impl = Literal["auto", "dense", "ell", "ell_fused", "csr", "flash"]

# flash-vs-csr crossover for ``impl="auto"`` on BCSR inputs, measured on
# the real v5e at N=65536 / E≈2M across tile densities, PER TILE GEOMETRY
# (VERDICT r4 #4 — a threshold in swept-elems/edge is not
# geometry-invariant because flash's per-element cost falls with tile
# width, which amortizes the ~13 µs fixed per-grid-step cost):
#
# - (512, 512), results/CROSSOVER_r4.md: flash cost ≈ linear in swept
#   elems (29 ms at occ 0.038 → 749 ms at occ 1.0) vs csr's flat
#   707–753 ms — tie band at 2076–2207 elems/edge → threshold 2000.
# - (512, 2048) [the shipped default tiles],
#   results/CROSSOVER_r5_bn2048.json: flash ≈ 16 + 0.126·(elems/edge) ms
#   at this E — 301 ms even at FULL occupancy (2260 elems/edge) vs csr's
#   713–754 ms; the fitted crossing sits at ≈5500 elems/edge, beyond any
#   achievable density on this sweep, so flash wins everywhere measured.
#
# Unlisted geometries fall back to the conservative (512, 512) figure.
FLASH_MAX_ELEMS_PER_EDGE_BY_TILE = {
    (512, 512): 2000.0,
    (512, 2048): 5500.0,
}
FLASH_MAX_ELEMS_PER_EDGE = 2000.0  # conservative default (bn=512 figure)


def flash_csr_threshold(bm: int, bn: int) -> float:
    """Measured flash→csr dispatch crossover (swept elems per real edge)
    for a tile geometry; conservative default for unmeasured shapes."""
    return FLASH_MAX_ELEMS_PER_EDGE_BY_TILE.get(
        (int(bm), int(bn)), FLASH_MAX_ELEMS_PER_EDGE)


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# dense — O(N^2) oracle (reference utils/layers.py:26-34 semantics)
# ---------------------------------------------------------------------------


def dense_attention(
    graph: DenseGraph,
    fts: jax.Array,  # (N, K, D) features used for aggregation (post-dropout)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    return_coefs: bool = False,
):
    bias = graph.bias  # (N, N)
    # (K, N, N) logits: row i attends over columns j
    logits = logit_dst.T[:, :, None] + logit_src.T[:, None, :]
    coefs = jax.nn.softmax(leaky_relu(logits, slope) + bias[None, :, :], axis=-1)
    raw_coefs = coefs
    if coef_dropout > 0.0:
        keep = 1.0 - coef_dropout
        mask = jax.random.bernoulli(dropout_rng, keep, coefs.shape)
        coefs = jnp.where(mask, coefs / keep, 0.0)
    out = jnp.einsum(
        "knm,mkd->nkd", coefs, fts, preferred_element_type=jnp.float32
    ).astype(fts.dtype)
    if return_coefs:
        return out, raw_coefs
    return out


# ---------------------------------------------------------------------------
# ell — gather over fixed-fanout neighbor lists, O(N*F)
# ---------------------------------------------------------------------------


def ell_attention(
    graph: EllGraph,
    fts: jax.Array,  # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
):
    n, k, d = fts.shape
    f = graph.nbr.shape[1]
    nbr = graph.nbr  # (N, F) with sentinel n
    valid = graph.nbr_mask  # (N, F)
    # pad a zero row at sentinel index n. The feature table is gathered in
    # FLAT (N, K*D) layout: a rank-4 (N, F, K, D) gather pads its trailing
    # dim to the 128-lane tile — 16x memory traffic at D=8 — and its
    # BACKWARD pays the same expansion on the scatter-add. Flat K*D lanes
    # measured 2.85x faster fwd+bwd at the sampled-block shapes
    # (results/SCALE_r5.md).
    fts_pad = jnp.concatenate(
        [fts.reshape(n, k * d), jnp.zeros((1, k * d), fts.dtype)], axis=0)
    ls_pad = jnp.concatenate([logit_src, jnp.zeros((1, k), logit_src.dtype)], axis=0)

    g_ls = ls_pad[nbr]  # (N, F, K)
    logits = leaky_relu(logit_dst[:, None, :] + g_ls, slope)
    logits = jnp.where(valid[:, :, None], logits, MASK_VALUE)
    # stable softmax over F; fully-padded rows produce exactly 0 output
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.where(valid[:, :, None], jnp.exp(logits - m), 0.0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    coefs = e / jnp.maximum(denom, 1e-30)  # (N, F, K)
    if coef_dropout > 0.0:
        keep = 1.0 - coef_dropout
        mask = jax.random.bernoulli(dropout_rng, keep, coefs.shape)
        coefs = jnp.where(mask, coefs / keep, 0.0)
    g_fts = fts_pad[nbr]  # (N, F, K*D) — 2x lane pad, not 16x
    out = jnp.einsum(
        "nfk,nfkd->nkd", coefs, g_fts.reshape(n, f, k, d),
        preferred_element_type=jnp.float32
    ).astype(fts.dtype)
    return out


# ---------------------------------------------------------------------------
# csr — edge/segment domain (SDDMM → segment softmax → SpMM), O(E)
# ---------------------------------------------------------------------------


def sddmm_edge_logits(
    graph: CSRGraph, logit_dst: jax.Array, logit_src: jax.Array, *, slope: float = 0.2
) -> jax.Array:
    """Edge logits l_e = leaky_relu(logit_dst[row_e] + logit_src[col_e]).

    Returns (E_pad, K); padding edges get MASK_VALUE.
    """
    k = logit_dst.shape[1]
    ld_pad = jnp.concatenate([logit_dst, jnp.zeros((1, k), logit_dst.dtype)], axis=0)
    ls_pad = jnp.concatenate([logit_src, jnp.zeros((1, k), logit_src.dtype)], axis=0)
    le = leaky_relu(ld_pad[graph.row_idx] + ls_pad[graph.col_idx], slope)
    return jnp.where(graph.edge_mask[:, None], le, MASK_VALUE)


def segment_softmax(graph: CSRGraph, edge_logits: jax.Array) -> jax.Array:
    """Numerically-stable softmax over each destination row's edges.

    edge_logits: (E_pad, K) → coefs (E_pad, K); padded edges → 0; rows with
    no edges produce no contribution anywhere.
    """
    n_seg = graph.n_nodes + 1  # sentinel row collects padding
    rows = graph.row_idx
    seg_max = jax.ops.segment_max(
        edge_logits, rows, num_segments=n_seg, indices_are_sorted=True
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    e = jnp.exp(edge_logits - seg_max[rows])
    e = jnp.where(graph.edge_mask[:, None], e, 0.0)
    seg_sum = jax.ops.segment_sum(e, rows, num_segments=n_seg, indices_are_sorted=True)
    return e / jnp.maximum(seg_sum[rows], 1e-30)


def spmm_aggregate(graph: CSRGraph, coefs: jax.Array, fts: jax.Array) -> jax.Array:
    """out[i] = sum over edges e with row_e == i of coefs[e] * fts[col_e].

    coefs: (E_pad, K); fts: (N, K, D) → out (N, K, D).

    Flat (K·D)-lane layout throughout: a rank-3 (E, K, D) edge tensor pads
    its trailing dim to the 128-lane tile — 16× memory at D=8, which OOMs
    the 5M-edge DBLP meta-path at 20 GB — while (E, K·D) pads ≤2×.
    """
    n, k, d = fts.shape
    fts_pad = jnp.concatenate(
        [fts.reshape(n, k * d), jnp.zeros((1, k * d), fts.dtype)], axis=0)
    cexp = jnp.repeat(coefs, d, axis=1)                # (E_pad, K·D)
    vals = cexp * fts_pad[graph.col_idx]               # (E_pad, K·D)
    out = jax.ops.segment_sum(
        vals, graph.row_idx, num_segments=n + 1, indices_are_sorted=True
    )
    return out[:n].reshape(n, k, d).astype(fts.dtype)


def edge_attention_coefs(graph: CSRGraph, logit_dst: jax.Array,
                         logit_src: jax.Array, *,
                         slope: float = 0.2) -> jax.Array:
    """Per-edge attention coefficients (E_pad, K) for analysis, computed
    HEAD-AT-A-TIME over 1-D edge arrays.

    The generic csr path's (E, K) edge tensors pad K=8 to the 128-lane
    tile — 16× memory, which exhausts HBM on multi-million-edge
    meta-paths (DBLP APCPA, 5.0M edges: >15 GB peak). 1-D (E,) arrays lay
    out along lanes with no such padding, so the per-head peak is O(E)
    bytes; the static head loop trades VPU width for 8× less memory —
    the right trade for an analysis surface (reference coef output,
    gat.py:148-173)."""
    k = logit_dst.shape[1]
    ld_pad = jnp.concatenate([logit_dst, jnp.zeros((1, k), logit_dst.dtype)])
    ls_pad = jnp.concatenate([logit_src, jnp.zeros((1, k), logit_src.dtype)])
    rows = graph.row_idx
    n_seg = graph.n_nodes + 1
    outs = []
    for h in range(k):
        le = leaky_relu(ld_pad[graph.row_idx, h] + ls_pad[graph.col_idx, h],
                        slope)
        le = jnp.where(graph.edge_mask, le, MASK_VALUE)
        seg_max = jax.ops.segment_max(le, rows, num_segments=n_seg,
                                      indices_are_sorted=True)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        e = jnp.where(graph.edge_mask, jnp.exp(le - seg_max[rows]), 0.0)
        seg_sum = jax.ops.segment_sum(e, rows, num_segments=n_seg,
                                      indices_are_sorted=True)
        outs.append(e / jnp.maximum(seg_sum[rows], 1e-30))
    return jnp.stack(outs, axis=1)


def csr_attention(
    graph: CSRGraph,
    fts: jax.Array,
    logit_dst: jax.Array,
    logit_src: jax.Array,
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    return_coefs: bool = False,
):
    le = sddmm_edge_logits(graph, logit_dst, logit_src, slope=slope)
    coefs = segment_softmax(graph, le)
    # pre-dropout coefs, matching the dense oracle's return (the reference
    # returns the softmax output, gat.py:148-173); (E_pad, K) aligned with
    # graph.row_idx/col_idx, padding edges exactly 0
    raw_coefs = coefs
    if coef_dropout > 0.0:
        keep = 1.0 - coef_dropout
        mask = jax.random.bernoulli(dropout_rng, keep, coefs.shape)
        coefs = jnp.where(mask, coefs / keep, 0.0)
    out = spmm_aggregate(graph, coefs, fts)
    if return_coefs:
        return out, raw_coefs
    return out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def attention_aggregate(
    graph,
    fts: jax.Array,
    logit_dst: jax.Array,
    logit_src: jax.Array,
    *,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    impl: Impl = "auto",
    return_coefs: bool = False,
):
    """Dispatch on graph container type / requested implementation."""
    if type(graph).__name__ == "TreeEllGraph":
        # device-sampled tree blocks: scatter-free backward through the
        # parent maps (ops/tree_ell.py)
        from han_tpu.ops.tree_ell import tree_ell_attention

        if return_coefs:
            raise NotImplementedError("return_coefs unsupported on TreeEllGraph")
        return tree_ell_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if type(graph).__name__ == "PartitionedCSR":
        from han_tpu.parallel.shard_attn import partitioned_attention

        if return_coefs:
            raise NotImplementedError("return_coefs unsupported on PartitionedCSR")
        return partitioned_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if type(graph).__name__ == "PartitionedBCSR":
        from han_tpu.parallel.flash_shard import sharded_flash_attention

        if return_coefs:
            raise NotImplementedError("return_coefs unsupported on PartitionedBCSR")
        return sharded_flash_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if type(graph).__name__ == "PartitionedCSR2D":
        from han_tpu.parallel.ring_attn import ring_attention

        if return_coefs:
            raise NotImplementedError("return_coefs unsupported on PartitionedCSR2D")
        return ring_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if type(graph).__name__ == "RingBCSR":
        from han_tpu.parallel.ring_bcsr import ring_flash_attention

        if return_coefs:
            raise NotImplementedError("return_coefs unsupported on RingBCSR")
        return ring_flash_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if impl == "auto":
        if isinstance(graph, DenseGraph):
            impl = "dense"
        elif isinstance(graph, EllGraph):
            impl = "ell"
        elif isinstance(graph, CSRGraph):
            impl = "csr"
        elif type(graph).__name__ == "BCSRGraph":
            # occupancy-aware dispatch (results/CROSSOVER_r4.md +
            # CROSSOVER_r5_bn2048.json): flash while the per-edge swept
            # tile area stays under the crossover MEASURED AT THIS TILE
            # GEOMETRY; beyond it the edge-domain csr backend wins, and
            # the container carries its own edge view (bcsr.as_csr)
            if (graph.edge_col is not None
                    and graph.elems_per_edge()
                    > flash_csr_threshold(graph.bm, graph.bn)):
                graph = graph.as_csr()
                impl = "csr"
            else:
                impl = "flash"
        else:
            raise TypeError(f"unknown graph container {type(graph)}")
    if impl == "dense":
        return dense_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
            return_coefs=return_coefs,
        )
    if impl == "csr":
        return csr_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
            return_coefs=return_coefs,
        )
    if return_coefs:
        # edge-domain coef output lives on the csr backend (convert BCSR
        # via graph.as_csr() / EllGraph via its edge view); the fused
        # kernels never materialize per-edge coefficients
        raise NotImplementedError(
            "return_coefs is supported by the dense and csr impls only")
    if impl == "ell":
        return ell_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if impl == "ell_fused":
        from han_tpu.ops.pallas.ell_fused import ell_fused_attention

        return ell_fused_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    if impl == "flash":
        from han_tpu.ops.pallas.flash_gat import flash_gat_attention

        return flash_gat_attention(
            graph, fts, logit_dst, logit_src, slope=slope,
            coef_dropout=coef_dropout, dropout_rng=dropout_rng,
        )
    raise ValueError(f"unknown impl {impl!r}")
