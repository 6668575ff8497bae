"""Measure the single-chip full train-step time (t1) on the real TPU —
the measured input to scripts/scaling_model.py's efficiency projection
(results/SCALING.md; VERDICT r3 next-round item 2).

Builds exactly the model/optimizer/loss of scaling_model.py (HAN hid=8,
heads=(8,1), dropout 0.6, adam 5e-3 + L2) on single-chip BCSR graphs with
the flash backend, and times the jitted train step with the in-jit
fori_loop amortization (bench.py pattern).

    python scripts/t1_step.py --dataset dblp
    python scripts/t1_step.py --dataset synth65k
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def load(dataset: str):
    if dataset == "synth65k":
        from han_tpu.graph.synthetic import HeteroDataset
        from scripts.flash_scale_demo import community_powerlaw

        n = 65536
        rng = np.random.default_rng(0)
        adjs = [community_powerlaw(n, 2_000_000, seed=7)]
        labels = np.zeros((n, 4), np.float32)
        labels[np.arange(n), rng.integers(0, 4, n)] = 1.0
        masks = np.zeros((3, n), bool)
        masks[0, :1024] = masks[1, 1024:1536] = masks[2, 1536:] = True
        return HeteroDataset(adjs, rng.standard_normal(
            (n, 64)).astype(np.float32), labels, *masks, name="synth65k")
    from han_tpu.datasets.registry import load_dataset

    return load_dataset(dataset)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="dblp")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.graph.bcsr import bcsr_from_scipy
    from han_tpu.graph.build import with_self_loops
    from han_tpu.nn.losses import l2_regularizer, masked_softmax_cross_entropy
    from han_tpu.nn.models import HAN

    ds = load(args.dataset)
    graphs = [bcsr_from_scipy(with_self_loops(a)) for a in ds.metapath_adjs]
    x = jnp.asarray(ds.features)
    xs = [x for _ in graphs]
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    model = HAN(n_classes=ds.n_classes, hid_units=(8,), n_heads=(8, 1),
                attn_drop=0.6, ffd_drop=0.6)
    tx = optax.adam(5e-3)
    params = model.init(jax.random.PRNGKey(0), graphs, xs)
    opt_state = tx.init(params)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def steps(r, params, opt_state, rng, graphs, xs):
        def one(carry, _):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                logits, _, _ = model.apply(p, graphs, xs, deterministic=False,
                                           rngs={"dropout": sub})
                return (masked_softmax_cross_entropy(logits, labels, mask)
                        + l2_regularizer(p, 1e-3))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state, rng), loss

        (params, opt_state, _), losses = jax.lax.scan(
            one, (params, opt_state, rng), None, length=r)
        return losses[-1]

    rng = jax.random.PRNGKey(1)
    # scan length is static → TWO programs (r=1 and r=reps); warm up BOTH
    # before timing, or the r=reps compile lands inside the timed region
    float(steps(1, params, opt_state, rng, graphs, xs))
    float(steps(args.reps, params, opt_state, rng, graphs, xs))
    t1 = time.perf_counter()
    float(steps(1, params, opt_state, rng, graphs, xs))
    t1 = time.perf_counter() - t1
    tr = time.perf_counter()
    float(steps(args.reps, params, opt_state, rng, graphs, xs))
    tr = time.perf_counter() - tr
    step_s = max((tr - t1) / (args.reps - 1), 1e-9)
    print(json.dumps({
        "dataset": args.dataset, "device": str(jax.devices()[0]),
        "metapaths": len(graphs),
        "edges": int(sum(g.n_edges for g in graphs)),
        "t1_step_s": round(step_s, 6), "t1_step_ms": round(step_s * 1e3, 3),
    }))
    return step_s


if __name__ == "__main__":
    main()
