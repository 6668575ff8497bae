"""Ring × BCSR memory-scalable distributed flash (r2 VERDICT item 2), on
the 8-virtual-device CPU mesh: partition equivalence vs the single-chip
flash kernel (forward + gradients), exact dropout-mask replay, and HAN
training with graph_format='ring_bcsr' matching the single-device loss
trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from han_tpu.graph.bcsr import bcsr_from_scipy
from han_tpu.ops.pallas.flash_gat import flash_gat_attention
from han_tpu.parallel.mesh import make_mesh
from han_tpu.parallel.ring_bcsr import RingBCSR, ring_flash_attention, ring_partition_bcsr


def make_case(n=700, k=4, d=8, seed=0, density=0.03, bm=128, bn=128):
    rng = np.random.default_rng(seed)
    p_row = 0.5 * density + density * (np.arange(n) < n // 8) * 8
    a = (rng.random((n, n)) < p_row[:, None]).astype(np.float32)
    np.fill_diagonal(a, 1.0)
    a[5, :] = 0.0  # an edgeless row (sparse spec: output exactly 0)
    adj = sp.csr_matrix(a)
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    return adj, fts, ld, ls, bm, bn


@pytest.mark.parametrize("shards,heads", [(2, 1), (4, 1), (2, 2)])
def test_ring_equivalence_forward(shards, heads):
    adj, fts, ld, ls, bm, bn = make_case()
    ref = flash_gat_attention(bcsr_from_scipy(adj, bm=bm, bn=bn), fts, ld, ls)
    g = ring_partition_bcsr(adj, shards, bm=bm, bn=bn)
    mesh = make_mesh(graph=shards, heads=heads)
    out = jax.jit(lambda *a: ring_flash_attention(*a, mesh=mesh))(
        g, fts, ld, ls)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(out)[5], 0.0)


def test_ring_equivalence_gradients():
    adj, fts, ld, ls, bm, bn = make_case(n=400, seed=3)
    single = bcsr_from_scipy(adj, bm=bm, bn=bn)
    g = ring_partition_bcsr(adj, 4, bm=bm, bn=bn)
    mesh = make_mesh(graph=4, heads=1)

    def loss_single(f, a, b):
        return jnp.sum(flash_gat_attention(single, f, a, b) ** 2)

    def loss_ring(f, a, b):
        return jnp.sum(ring_flash_attention(g, f, a, b, mesh=mesh) ** 2)

    gs = jax.grad(loss_single, argnums=(0, 1, 2))(fts, ld, ls)
    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(fts, ld, ls)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_ring_dropout_replays_single_chip_masks():
    """meta[3] (global column-block offset) keys the kernel PRNG streams by
    GLOBAL column strip, so the ring run replays the 1-chip masks exactly."""
    adj, fts, ld, ls, bm, bn = make_case(n=500, seed=9)
    key = jax.random.PRNGKey(11)
    ref = flash_gat_attention(bcsr_from_scipy(adj, bm=bm, bn=bn), fts, ld, ls,
                              coef_dropout=0.4, dropout_rng=key)
    g = ring_partition_bcsr(adj, 4, bm=bm, bn=bn)
    mesh = make_mesh(graph=4, heads=1)
    out = jax.jit(lambda *a: ring_flash_attention(
        *a, mesh=mesh, coef_dropout=0.4, dropout_rng=key))(g, fts, ld, ls)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_ring_dropout_gradients_match():
    """Backward replays the same masks through the ring schedule."""
    adj, fts, ld, ls, bm, bn = make_case(n=400, seed=4)
    single = bcsr_from_scipy(adj, bm=bm, bn=bn)
    g = ring_partition_bcsr(adj, 2, bm=bm, bn=bn)
    mesh = make_mesh(graph=2, heads=1)
    key = jax.random.PRNGKey(7)

    def loss_single(f, a, b):
        return jnp.sum(flash_gat_attention(
            single, f, a, b, coef_dropout=0.3, dropout_rng=key) ** 2)

    def loss_ring(f, a, b):
        return jnp.sum(ring_flash_attention(
            g, f, a, b, mesh=mesh, coef_dropout=0.3, dropout_rng=key) ** 2)

    gs = jax.grad(loss_single, argnums=(0, 1, 2))(fts, ld, ls)
    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(fts, ld, ls)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_ring_partitioner_shapes():
    adj, *_ = make_case(n=900)
    g = ring_partition_bcsr(adj, 3, bm=128, bn=128)
    assert isinstance(g, RingBCSR)
    assert g.n_loc % g.bm == 0 and g.n_loc % g.bn == 0
    assert g.n_pad == 3 * g.n_loc and g.n_pad >= g.n_nodes
    # pre-rolled cell schedule: [s, t] holds column strip (s - t) mod S
    cs = np.asarray(g.cs_of_step)
    for s in range(3):
        for t in range(3):
            assert cs[s, t] == (s - t) % 3
    # every edge is in exactly one cell: total tile population == E
    assert int(np.asarray(g.tiles).sum()) == g.n_edges


def test_ring_trainer_matches_single_device(tmp_path):
    """HAN trains with graph_format='ring_bcsr'; loss trajectory matches
    the single-device flash run (exact dropout replay + LSE merge)."""
    from han_tpu.graph.synthetic import planted_hetero
    from han_tpu.train.config import preset
    from han_tpu.train.trainer import MetricLogger, Trainer

    class Capture(MetricLogger):
        def __init__(self):
            super().__init__("", echo=False)
            self.rows = []

        def log(self, rec):
            self.rows.append(rec)

    ds = planted_hetero(n_nodes=300, n_feats=24, n_classes=3, n_metapaths=2,
                        avg_degree=8.0, train_per_class=20, n_val=30, seed=11)

    def run(graph_axis, fmt):
        cfg = preset("acm")
        cfg.data.graph_format = fmt
        # small tiles so 300 nodes actually split into >1 ring strip (and
        # the single-device run uses the SAME tile grid → mask replay)
        cfg.data.tile_bm = 64
        cfg.data.tile_bn = 128
        cfg.model.impl = "flash" if fmt == "bcsr" else "auto"
        cfg.model.hid_units = (8,)
        cfg.model.n_heads = (4, 1)
        cfg.model.attn_drop = 0.4
        cfg.model.ffd_drop = 0.4
        cfg.train.epochs = 4
        cfg.train.patience = 100
        cfg.train.checkpoint_dir = str(tmp_path / f"ck{graph_axis}{fmt}")
        cfg.mesh.graph_axis = graph_axis
        cap = Capture()
        Trainer(ds, cfg, logger=cap).fit()
        return [(r["train_loss"], r["val_loss"]) for r in cap.rows
                if "train_loss" in r]

    ref = run(1, "bcsr")
    got = run(4, "ring_bcsr")
    assert len(got) == len(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
