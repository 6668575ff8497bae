"""Scale benchmark: sampled HAN training on graphs too big for dense forms.

The BASELINE.json scaling config — "synthetic 100M-edge heterogeneous
graph, meta-path neighbor sampling" — exercised end to end: a large CSR
heterogeneous graph is generated directly (no dense N×N anything), and
training runs over seed-node batches with L-hop bounded-fanout sampled
blocks (train/sampled.py) with one-ahead host prefetch.

Prints one JSON line: sampled-edge throughput (edges aggregated per second
per chip, forward+backward) plus the host-sampling / device-compute split.

    python scripts/bench_scale.py                        # 10M edges (quick)
    python scripts/bench_scale.py --nodes 1000000 --avg-degree 100  # 100M
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def big_csr(n: int, avg_degree: int, *, n_comm: int = 64, seed: int = 0) -> sp.csr_matrix:
    """Community-clustered fixed-degree CSR built directly from index arrays
    (never materializes COO duplicates or dense forms)."""
    rng = np.random.default_rng(seed)
    deg = avg_degree
    row_ptr = (np.arange(n + 1, dtype=np.int64) * deg)
    comm_of = (np.arange(n, dtype=np.int64) * n_comm) // n
    comm_size = n // n_comm
    # 80% of neighbors inside the node's community, rest uniform
    local = rng.integers(0, max(comm_size, 1), size=(n, deg), dtype=np.int64)
    base = (comm_of * comm_size)[:, None]
    cols = base + local
    far = rng.random((n, deg)) > 0.8
    cols[far] = rng.integers(0, n, size=int(far.sum()), dtype=np.int64)
    cols = np.minimum(cols, n - 1).astype(np.int32).reshape(-1)
    data = np.ones(cols.shape[0], dtype=np.float32)
    return sp.csr_matrix((data, cols, row_ptr), shape=(n, n))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=500_000)
    p.add_argument("--avg-degree", type=int, default=20)
    p.add_argument("--metapaths", type=int, default=2)
    p.add_argument("--feats", type=int, default=64)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--fanout", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--impl", default="ell", choices=["ell", "ell_fused"])
    p.add_argument("--sampler", default="host", choices=["host", "device"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="device mode: scan C steps per jit dispatch")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.graph.synthetic import HeteroDataset
    from han_tpu.train.config import preset
    from han_tpu.train.sampled import SampledTrainer

    rng = np.random.default_rng(args.seed)
    n = args.nodes
    t0 = time.perf_counter()
    adjs = [big_csr(n, args.avg_degree, seed=args.seed + 31 * p_)
            for p_ in range(args.metapaths)]
    feats = rng.standard_normal((n, args.feats)).astype(np.float32)
    y = rng.integers(0, args.classes, size=n)
    labels = np.zeros((n, args.classes), np.float32)
    labels[np.arange(n), y] = 1.0
    train_mask = np.zeros(n, bool)
    train_mask[: args.batch_size * args.steps] = True
    val_mask = np.zeros(n, bool)
    val_mask[-args.batch_size:] = True
    ds = HeteroDataset(adjs, feats, labels, train_mask, val_mask,
                       ~(train_mask | val_mask), name="scale")
    total_edges = sum(int(a.nnz) for a in adjs)
    print(f"# graph: {n} nodes, {total_edges} edges, built in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    cfg = preset("acm")
    cfg.model.impl = args.impl
    cfg.model.dtype = args.dtype
    cfg.train.log_file = ""
    trainer = SampledTrainer(ds, cfg, batch_size=args.batch_size,
                             fanout=args.fanout, eval_batches=1,
                             sampler=args.sampler,
                             steps_per_call=args.steps_per_call)

    train_idx = np.where(ds.train_mask)[0]
    params = None
    # timed loop: one epoch over --steps batches with prefetch, exactly as fit()
    batches = trainer._prefetched_indexed(
        enumerate(trainer._seed_batches(train_idx, shuffle=True, epoch=0)),
        lambda bi: bi)
    if trainer.steps_per_call > 1:
        batches = trainer._chunked(batches)
    _, first = next(batches)
    graphs, xs, lbl, mask = first
    params = trainer._init_params_from(jax.random.PRNGKey(0), graphs, xs)
    opt_state = trainer.tx.init(params)
    step_rng = jax.random.PRNGKey(1)
    # warmup / compile on the first batch
    out = trainer._train_step(params, opt_state, step_rng, graphs, xs, lbl, mask)
    params, opt_state, step_rng = out[0], out[1], out[2]
    float(np.asarray(out[3]).ravel()[-1])  # force (axon block is enqueue-only)
    if trainer.steps_per_call > 1:
        # warm the per-step program too (the chunker's tail uses it)
        wb = trainer._make_batch(np.asarray(graphs)[0][:args.batch_size]
                                 .astype(np.int32),
                                 np.ones(args.batch_size, bool), 999)
        wout = trainer._train_step(params, opt_state, step_rng, *wb)
        float(np.asarray(wout[3]).ravel()[-1])
    print("# compiled; timing", file=sys.stderr, flush=True)

    edges0 = trainer.flush_sampled_edges()
    t_loop0 = time.perf_counter()
    n_steps = 0
    loss = out[3]
    step_times = []
    for _, (graphs, xs, lbl, mask) in batches:
        ts = time.perf_counter()
        params, opt_state, step_rng, loss, acc = trainer._train_step(
            params, opt_state, step_rng, graphs, xs, lbl, mask)
        step_times.append(time.perf_counter() - ts)
        n_steps += int(np.shape(loss)[0]) if np.ndim(loss) else 1
    final_loss = float(np.asarray(loss).ravel()[-1])  # forces the chain
    sampled_edges = trainer.flush_sampled_edges() - edges0
    t_total = time.perf_counter() - t_loop0

    # -- step-time breakdown (r2 VERDICT item 5): where does the time go? --
    # host block assembly (C++ sampler + feature gather + device enqueue)
    t_host = []
    for i in range(5):
        th = time.perf_counter()
        gb, xb, lb, mb = trainer._make_batch(
            *next(trainer._seed_batches(train_idx, shuffle=True, epoch=7 + i)),
            sample_seed=900 + i)
        probe = xb[0] if xb is not None else gb  # device mode: packed desc
        import jax.numpy as _jnp
        float(_jnp.asarray(probe).sum())  # force the H2D to complete
        t_host.append(time.perf_counter() - th)
    # pure device compute: chained steps on ONE resident batch (no host
    # work, no transfers); marginal time per extra step
    def run_k(k_steps):
        pp, oo, rr = params, opt_state, step_rng
        tl = None
        for _ in range(k_steps):
            pp, oo, rr, tl, _ = trainer._train_step(pp, oo, rr, gb, xb, lb, mb)
        return float(tl)

    run_k(1)
    t1 = min(_t(run_k, 1) for _ in range(3))
    t8 = min(_t(run_k, 8) for _ in range(3))
    t_dev = max((t8 - t1) / 7, 1e-9)

    heads = cfg.model.n_heads[0]
    step_ms = t_total / max(n_steps, 1) * 1e3
    result = {
        "metric": (f"sampled-edges/s/chip (train fwd+bwd, impl={args.impl}, "
                   f"sampler={args.sampler}, dtype={args.dtype}, spc={args.steps_per_call}, "
                   f"N={n}, E={total_edges}, "
                   f"B={args.batch_size}, f={args.fanout})"),
        "value": round(sampled_edges * heads / t_total, 1),
        "unit": "edges/s/chip",
        "vs_baseline": None,
        "detail": {
            "steps": n_steps, "step_time_ms": round(step_ms, 2),
            "dispatch_ms_median": round(
                float(np.median(step_times)) * 1e3, 2) if step_times else None,
            # breakdown: pipelined step ≈ max(host, device) when the
            # one-ahead prefetch overlaps them
            "host_block_ms_median": round(float(np.median(t_host)) * 1e3, 2),
            "device_compute_ms": round(t_dev * 1e3, 2),
            "device_fraction_of_step": round(t_dev * 1e3 / step_ms, 3),
            "graph_edges": total_edges, "sampled_edges_per_step":
                sampled_edges // max(n_steps, 1),
            "final_loss": round(final_loss, 4),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))
    return result


def _t(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
