"""Pallas flash-GAT kernel vs the dense XLA oracle (interpreter mode on CPU;
compiled on TPU — SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from han_tpu.graph.bcsr import bcsr_from_dense
from han_tpu.graph.containers import dense_from_numpy
from han_tpu.ops.attention import dense_attention
from han_tpu.ops.pallas.flash_gat import flash_gat_attention


def make_case(n, k, d, seed, density=0.1, empty_row=None, bm=128, bn=128):
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(a, 1.0)
    if empty_row is not None:
        a[empty_row, :] = 0.0
    dense = dense_from_numpy(a, add_self_loops=False)
    graph = bcsr_from_dense(a, bm=bm, bn=bn)  # flash consumes the tile list
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    return dense, graph, fts, ld, ls


@pytest.mark.parametrize("n,k,d", [(96, 2, 8), (200, 4, 8), (130, 3, 16)])
def test_flash_matches_dense(n, k, d):
    dense, graph, fts, ld, ls = make_case(n, k, d, seed=n)
    ref = dense_attention(dense, fts, ld, ls)
    out = flash_gat_attention(graph, fts, ld, ls)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_empty_row_is_zero():
    dense, graph, fts, ld, ls = make_case(64, 2, 8, seed=5, empty_row=7)
    out = np.asarray(flash_gat_attention(graph, fts, ld, ls))
    np.testing.assert_array_equal(out[7], np.zeros_like(out[7]))
    ref = np.asarray(dense_attention(dense, fts, ld, ls))
    mask = np.ones(64, bool); mask[7] = False
    np.testing.assert_allclose(out[mask], ref[mask], atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_dense():
    dense, graph, fts, ld, ls = make_case(96, 2, 8, seed=9)

    def loss_flash(f, a, b):
        return jnp.sum(flash_gat_attention(graph, f, a, b) ** 2)

    def loss_dense(f, a, b):
        return jnp.sum(dense_attention(dense, f, a, b) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(fts, ld, ls)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(fts, ld, ls)
    for gf, gd in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   atol=5e-4, rtol=5e-4)


def test_flash_bf16_vstream_matches_f32():
    """bf16 feature streaming (results/BF16_r5.md): bf16 inputs flow to the
    kernel AS bf16 and upcast in-register; outputs and the dv cotangent
    come back in bf16, matching the f32 path within bf16 rounding."""
    dense, graph, fts, ld, ls = make_case(96, 2, 8, seed=13)
    out32 = flash_gat_attention(graph, fts, ld, ls)
    fts16 = fts.astype(jnp.bfloat16)
    out16 = flash_gat_attention(graph, fts16, ld, ls)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(out32), atol=3e-2, rtol=3e-2)

    def loss16(f):
        return flash_gat_attention(graph, f, ld, ls).astype(jnp.float32).sum()

    def loss32(f):
        return flash_gat_attention(graph, f, ld, ls).sum()

    g16 = jax.grad(loss16)(fts16)
    g32 = jax.grad(loss32)(fts)
    assert g16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(g16, np.float32), np.asarray(g32),
                               atol=3e-2, rtol=3e-2)
