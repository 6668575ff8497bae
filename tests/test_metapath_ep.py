"""Meta-path (expert) parallelism — VERDICT round-1 item 3 / SURVEY §2.3 EP
row: vmapped tower stack over stacked graph containers, P axis pinned to a
'mp' mesh axis; parity vs the sequential HAN on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from han_tpu.graph.build import metapath_to_bcsr, metapath_to_csr, metapath_to_dense
from han_tpu.graph.stack import stack_graphs
from han_tpu.graph.synthetic import planted_hetero
from han_tpu.nn.models import HAN
from han_tpu.parallel.mesh import make_mesh
from han_tpu.train.config import preset
from han_tpu.train.trainer import MetricLogger, Trainer


@pytest.fixture(scope="module")
def ds():
    # P=4 meta-paths so the mp axis can take 2 or 4 shards
    return planted_hetero(n_nodes=150, n_feats=20, n_classes=3, n_metapaths=4,
                          avg_degree=7.0, train_per_class=12, n_val=20, seed=13)


def _stacked_to_sequential_params(params):
    """towers (P, ...) leaves → {tower_p: ...} trees matching the
    sequential HAN's parameter structure."""
    towers = params["params"]["towers"]
    p = jax.tree_util.tree_leaves(towers)[0].shape[0]
    out = {k: v for k, v in params["params"].items() if k != "towers"}
    for i in range(p):
        out[f"tower_{i}"] = jax.tree_util.tree_map(lambda a: a[i], towers)
    return {"params": out}


@pytest.mark.parametrize("builder", [metapath_to_csr, metapath_to_dense,
                                     metapath_to_bcsr])
def test_vmap_towers_matches_sequential(ds, builder):
    graphs = [builder(a) for a in ds.metapath_adjs]
    stacked = stack_graphs(graphs)
    x = jnp.asarray(ds.features)
    xs = [x] * len(graphs)
    xs_stacked = jnp.stack(xs)

    m_seq = HAN(n_classes=3, hid_units=(8,), n_heads=(2, 1))
    m_ep = HAN(n_classes=3, hid_units=(8,), n_heads=(2, 1), vmap_towers=True)
    params_ep = m_ep.init(jax.random.PRNGKey(0), stacked, xs_stacked)
    params_seq = _stacked_to_sequential_params(params_ep)

    o_ep = m_ep.apply(params_ep, stacked, xs_stacked)
    o_seq = m_seq.apply(params_seq, graphs, xs)
    for a, b in zip(o_ep, o_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_ep_on_mp_mesh_axis(ds):
    """The vmapped tower stack executes under an (mp=4, graph=1, heads=2)
    mesh with the embeds constrained to P('mp') — numerics unchanged."""
    graphs = [metapath_to_csr(a) for a in ds.metapath_adjs]
    stacked = stack_graphs(graphs)
    x = jnp.asarray(ds.features)
    xs_stacked = jnp.stack([x] * len(graphs))
    m_ep = HAN(n_classes=3, hid_units=(8,), n_heads=(2, 1), vmap_towers=True)
    params = m_ep.init(jax.random.PRNGKey(0), stacked, xs_stacked)
    ref = m_ep.apply(params, stacked, xs_stacked)

    mesh = make_mesh(graph=1, heads=2, mp=4)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, g, x: m_ep.apply(p, g, x))(
            params, stacked, xs_stacked)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_ep_times_graph_forward_parity(ds):
    """EP x graph composition (r2 VERDICT item 4): stacked PartitionedBCSR
    (P, S, ...) leaves + vmapped towers whose shard_maps extend over 'mp'
    via spmd_axis_name — forward matches the sequential single-device
    flash run with shared params."""
    from han_tpu.graph.stack import stack_graphs as stack
    from han_tpu.parallel.flash_shard import partition_bcsr

    adjs = ds.metapath_adjs
    graphs_seq = [metapath_to_bcsr(a, bm=64, bn=128) for a in adjs]
    from han_tpu.graph.build import with_self_loops

    parts = [partition_bcsr(with_self_loops(a), 2, bm=64, bn=128)
             for a in adjs]
    stacked = stack(parts)
    assert type(stacked).__name__ == "PartitionedBCSR"
    assert stacked.tiles.ndim == 5  # (P, S, T, bm, bn)

    x = jnp.asarray(ds.features)
    xs_stacked = jnp.stack([x] * len(adjs))
    m_ep = HAN(n_classes=3, hid_units=(8,), n_heads=(2, 1), vmap_towers=True)
    m_seq = HAN(n_classes=3, hid_units=(8,), n_heads=(2, 1))

    mesh = make_mesh(graph=2, heads=1, mp=2)
    with jax.set_mesh(mesh):
        params = m_ep.init(jax.random.PRNGKey(0), stacked, xs_stacked)
        out = jax.jit(lambda p, g, x: m_ep.apply(p, g, x))(
            params, stacked, xs_stacked)
    params_seq = _stacked_to_sequential_params(params)
    ref = m_seq.apply(params_seq, graphs_seq, [x] * len(adjs))
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_trainer_ep_times_graph_matches_ep_single_device(ds, tmp_path):
    """Trainer on an (mp=4, graph=2) mesh with graph_format='bcsr' emits
    the same loss trajectory as the single-device vmap_towers run (the
    flash dropout streams are keyed globally, so masks replay exactly)."""
    def run(mp, ga):
        cfg = preset("acm")
        cfg.data.graph_format = "bcsr"
        cfg.data.tile_bm = 64
        cfg.data.tile_bn = 128
        cfg.model.impl = "flash"
        cfg.model.vmap_towers = True
        cfg.model.hid_units = (8,)
        cfg.model.n_heads = (2, 1)
        cfg.model.attn_drop = 0.4
        cfg.model.ffd_drop = 0.4
        cfg.train.epochs = 3
        cfg.train.checkpoint_dir = str(tmp_path / f"epg{mp}{ga}")
        cfg.mesh.mp_axis = mp
        cfg.mesh.graph_axis = ga

        class Cap(MetricLogger):
            def __init__(self):
                super().__init__("", echo=False)
                self.rows = []

            def log(self, rec):
                self.rows.append(rec)

        cap = Cap()
        Trainer(ds, cfg, logger=cap).fit()
        return [(r["train_loss"], r["val_loss"]) for r in cap.rows
                if "train_loss" in r]

    # single-device EP needs stacked plain BCSR — graph_axis=1 path
    ref = run(4, 1)
    got = run(4, 2)
    assert len(got) == len(ref) == 3
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_trainer_ep_trajectory_matches_sequential(ds, tmp_path):
    """cfg.mesh.mp_axis=4 → Trainer stacks graphs + runs the EP model; the
    eval-mode losses match the sequential trainer given identical params —
    here checked end-to-end via deterministic training with dropout OFF."""
    def run(mp):
        cfg = preset("acm")
        cfg.model.hid_units = (8,)
        cfg.model.n_heads = (2, 1)
        cfg.model.attn_drop = 0.0
        cfg.model.ffd_drop = 0.0
        cfg.train.epochs = 3
        cfg.train.checkpoint_dir = str(tmp_path / f"mp{mp}")
        cfg.mesh.mp_axis = mp

        class Cap(MetricLogger):
            def __init__(self):
                super().__init__("", echo=False)
                self.rows = []

            def log(self, rec):
                self.rows.append(rec)

        cap = Cap()
        Trainer(ds, cfg, logger=cap).fit()
        return [r["val_loss"] for r in cap.rows if "val_loss" in r]

    seq, ep = run(1), run(4)
    # params init differs between sequential (per-tower RNG fold) and the
    # vmapped stack, so trajectories are not bitwise; both must simply
    # train (finite, decreasing-ish) — the numeric parity is covered by
    # test_vmap_towers_matches_sequential with shared params
    assert len(seq) == len(ep) == 3
    assert all(np.isfinite(v) for v in seq + ep)


def test_vmap_towers_dropout_fires(ds):
    """flax's lifted nn.vmap silently DROPS kwargs — passing
    ``deterministic`` by keyword left the vmapped towers permanently in
    eval mode (no attn/ffd dropout; caught as an overfitting full DBLP EP
    run in r4). deterministic is now positional; training mode must
    change the output, and eval mode must equal the sequential eval."""
    graphs = [metapath_to_csr(a) for a in ds.metapath_adjs]
    stacked = stack_graphs(graphs)
    x = jnp.asarray(ds.features)
    xs_stacked = jnp.stack([x] * len(graphs))
    m_ep = HAN(n_classes=3, hid_units=(8,), n_heads=(2, 1),
               vmap_towers=True, attn_drop=0.5, ffd_drop=0.5)
    params = m_ep.init(jax.random.PRNGKey(0), stacked, xs_stacked)
    eval_out = m_ep.apply(params, stacked, xs_stacked, deterministic=True)
    train_out = m_ep.apply(params, stacked, xs_stacked, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(7)})
    dev = float(jnp.abs(train_out[0] - eval_out[0]).max())
    assert dev > 1e-3, f"tower dropout did not fire under nn.vmap (dev={dev})"
