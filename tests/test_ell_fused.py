"""Fused ELL Pallas kernel vs the XLA ELL gather path (interpreter mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from han_tpu.graph.containers import csr_from_dense, dense_from_numpy, ell_from_csr
from han_tpu.ops.attention import ell_attention
from han_tpu.ops.pallas.ell_fused import ell_fused_attention


def make_case(n, k, d, seed, density=0.12):
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(a, 1.0)
    dense = dense_from_numpy(a, add_self_loops=False)
    ell = ell_from_csr(csr_from_dense(dense, edge_pad_to=32))
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    return ell, fts, ld, ls


@pytest.mark.parametrize("n,k,d", [(96, 2, 8), (150, 4, 4)])
def test_ell_fused_matches_xla(n, k, d):
    ell, fts, ld, ls = make_case(n, k, d, seed=n)
    ref = ell_attention(ell, fts, ld, ls)
    out = ell_fused_attention(ell, fts, ld, ls)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
