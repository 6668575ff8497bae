"""Neural layers: multi-head graph attention and semantic attention.

Flax linen modules holding the parameters; the math runs through
``han_tpu.ops.attention`` so one layer definition serves every backend
(dense oracle / ELL / CSR segment ops / Pallas flash-GAT).

Parity notes (reference = CG-Labs/HAN):

- ``GATConv`` reproduces ``attn_head`` (utils/layers.py:7-46) with K heads
  batched into single einsums: per-head feature transform W_k (no bias,
  glorot-uniform — tf.layers.conv1d default), per-head scalar projections
  f_1/f_2 (with bias), LeakyReLU(0.2) → mask → row-softmax → per-head output
  bias → activation. Input dropout is applied independently per head, exactly
  as the reference's per-head ``tf.nn.dropout`` calls.
- ``ConstAttention`` reproduces ``attn_head_const_1`` (utils/layers.py:49-81):
  attention logits replaced by the 0/1 adjacency (the paper's HAN_nd
  ablation).
- ``SemanticAttention`` reproduces ``SimpleAttLayer`` (utils/layers.py:132-164)
  including the *per-node* softmax over meta-paths (the code's behavior, not
  the paper's node-averaged variant) and normal(0.1) initialization.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from han_tpu.graph.containers import DenseGraph
from han_tpu.ops.attention import Impl, attention_aggregate, leaky_relu

glorot = nn.initializers.glorot_uniform()
zeros = nn.initializers.zeros_init()
normal01 = nn.initializers.normal(stddev=0.1)


class GATConv(nn.Module):
    """Multi-head graph attention convolution (reference attn_head × K heads).

    Output is the concatenation over heads: (N, K * out_dim) when
    ``concat_heads`` else the head-mean (N, out_dim).
    """

    out_dim: int
    num_heads: int
    activation: Callable[[jax.Array], jax.Array] = nn.elu
    slope: float = 0.2
    attn_drop: float = 0.0
    ffd_drop: float = 0.0
    residual: bool = False
    concat_heads: bool = True
    impl: Impl = "auto"
    # compute dtype for features and MXU transforms (params stay f32, all
    # matmuls accumulate f32 via preferred_element_type; attention logits
    # are promoted to f32 before the softmax). bfloat16 halves feature HBM
    # and doubles MXU throughput; the VPU-bound softmax phase measures
    # NEUTRAL-to-slower in bf16 on v5e (results/CALIBRATION.json), which is
    # why logits stay f32.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, graph, x: jax.Array, *, deterministic: bool = True,
                 return_coefs: bool = False):
        n, f = x.shape
        k, d = self.num_heads, self.out_dim
        x = x.astype(self.dtype)

        w = self.param("kernel", glorot, (f, k, d)).astype(self.dtype)
        w1 = self.param("attn_dst_kernel", glorot, (k, d))
        b1 = self.param("attn_dst_bias", zeros, (k,))
        w2 = self.param("attn_src_kernel", glorot, (k, d))
        b2 = self.param("attn_src_bias", zeros, (k,))
        b_out = self.param("bias", zeros, (k, d))

        drop_in = self.ffd_drop if not deterministic else 0.0
        drop_coef = self.attn_drop if not deterministic else 0.0

        if drop_in > 0.0:
            # independent input dropout per head (reference drops `seq` inside
            # each attn_head call, layers.py:18-19)
            rng = self.make_rng("dropout")
            keep = 1.0 - drop_in
            mask = jax.random.bernoulli(rng, keep, (k, n, f))
            xk = jnp.where(mask, x[None] / keep, 0.0)  # (K, N, F)
            fts = jnp.einsum("knf,fkd->nkd", xk, w,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        else:
            fts = jnp.einsum("nf,fkd->nkd", x, w,
                             preferred_element_type=jnp.float32).astype(x.dtype)

        # per-head scalar attention terms (reference f_1 / f_2, layers.py:
        # 23-24) — f32 regardless of compute dtype: the softmax phase gains
        # nothing from bf16 on v5e and exp() wants the mantissa
        logit_dst = (jnp.einsum("nkd,kd->nk", fts, w1,
                                preferred_element_type=jnp.float32) + b1
                     ).astype(jnp.float32)
        logit_src = (jnp.einsum("nkd,kd->nk", fts, w2,
                                preferred_element_type=jnp.float32) + b2
                     ).astype(jnp.float32)

        # feature dropout before aggregation (reference layers.py:31-32)
        fts_agg = fts
        if drop_in > 0.0:
            rng = self.make_rng("dropout")
            keep = 1.0 - drop_in
            mask = jax.random.bernoulli(rng, keep, fts.shape)
            fts_agg = jnp.where(mask, fts / keep, 0.0)

        coef_rng = self.make_rng("dropout") if drop_coef > 0.0 else None
        agg = attention_aggregate(
            graph, fts_agg, logit_dst, logit_src,
            slope=self.slope, coef_dropout=drop_coef, dropout_rng=coef_rng,
            impl=self.impl, return_coefs=return_coefs,
        )
        if return_coefs:
            agg, coefs = agg

        ret = agg.astype(jnp.float32) + b_out[None]  # (N, K, D), f32 out

        if self.residual:
            if f != d:
                w_res = self.param("res_kernel", glorot, (f, k, d))
                ret = ret + jnp.einsum("nf,fkd->nkd", x, w_res,
                                       preferred_element_type=jnp.float32)
            else:
                ret = ret + x[:, None, :].astype(jnp.float32)

        out = self.activation(ret)
        out = out.reshape(n, k * d) if self.concat_heads else out.mean(axis=1)
        if return_coefs:
            return out, coefs
        return out


class ConstAttention(nn.Module):
    """Uniform-over-neighbors ablation head (reference attn_head_const_1,
    utils/layers.py:49-81): logits = adjacency (1 on edges, 0 off) rather than
    learned, then the same masked softmax / aggregation path."""

    out_dim: int
    num_heads: int
    activation: Callable[[jax.Array], jax.Array] = nn.elu
    slope: float = 0.2
    attn_drop: float = 0.0
    ffd_drop: float = 0.0
    concat_heads: bool = True

    @nn.compact
    def __call__(self, graph: DenseGraph, x: jax.Array, *, deterministic: bool = True):
        if not isinstance(graph, DenseGraph):
            raise TypeError("ConstAttention requires a DenseGraph")
        n, f = x.shape
        k, d = self.num_heads, self.out_dim
        w = self.param("kernel", glorot, (f, k, d))
        b_out = self.param("bias", zeros, (k, d))

        drop_in = self.ffd_drop if not deterministic else 0.0
        drop_coef = self.attn_drop if not deterministic else 0.0

        xs = x
        if drop_in > 0.0:
            rng = self.make_rng("dropout")
            keep = 1.0 - drop_in
            xs = jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)
        fts = jnp.einsum("nf,fkd->nkd", xs, w,
                         preferred_element_type=jnp.float32).astype(x.dtype)

        adj01 = graph.adj.astype(jnp.float32)  # reference: 1 - bias/-1e9
        logits = leaky_relu(adj01, self.slope)
        coefs = jax.nn.softmax(logits + graph.bias, axis=-1)  # (N, N)
        if drop_coef > 0.0:
            rng = self.make_rng("dropout")
            keep = 1.0 - drop_coef
            coefs = jnp.where(jax.random.bernoulli(rng, keep, coefs.shape),
                              coefs / keep, 0.0)
        if drop_in > 0.0:
            rng = self.make_rng("dropout")
            keep = 1.0 - drop_in
            fts = jnp.where(jax.random.bernoulli(rng, keep, fts.shape),
                            fts / keep, 0.0)
        agg = jnp.einsum("nm,mkd->nkd", coefs, fts,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = self.activation(agg + b_out[None])
        return out.reshape(n, k * d) if self.concat_heads else out.mean(axis=1)


class SemanticAttention(nn.Module):
    """Fuse P per-meta-path embeddings into one (reference SimpleAttLayer).

    Input (N, P, D) → (output (N, D), alphas (N, P)); alphas are per-node
    (softmax over the meta-path axis, utils/layers.py:155-156).
    """

    attention_dim: int = 128

    @nn.compact
    def __call__(self, inputs: jax.Array):
        d = inputs.shape[-1]
        a = self.attention_dim
        w_omega = self.param("w_omega", normal01, (d, a))
        b_omega = self.param("b_omega", normal01, (a,))
        u_omega = self.param("u_omega", normal01, (a,))
        v = jnp.tanh(jnp.einsum("npd,da->npa", inputs, w_omega) + b_omega)
        vu = jnp.einsum("npa,a->np", v, u_omega)
        alphas = jax.nn.softmax(vu, axis=-1)  # (N, P)
        output = jnp.sum(inputs * alphas[:, :, None], axis=1)  # (N, D)
        return output, alphas
