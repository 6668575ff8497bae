"""Benchmark: fused graph-attention aggregate (SDDMM + masked softmax + SpMM),
forward AND backward — the cost training actually pays.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": "edges/s/chip",
"vs_baseline": ...}.

- value: real-edge throughput of the Pallas flash-GAT fused kernel on the
  HAN workload (P meta-paths × K heads), one forward + backward
  (value_and_grad wrt features and both logit terms).
- vs_baseline: speedup over the XLA dense masked-softmax path — a direct
  port of the reference's dense attention math (utils/layers.py:26-34) to
  XLA on the same chip, also fwd+bwd. >1.0 beats the ported reference.
- detail.roofline: achieved fraction of two speed-of-light models
  (documented in results/ROOFLINE.md):
  * tile-domain — what THIS kernel design can reach: compute/HBM time over
    the occupied (bm×bn) tile area it actually sweeps;
  * edge-domain — the absolute floor: work ∝ E edges only.

Usage: python bench.py [--impl flash|dense|csr|ell] [--n N] [--heads K]
                       [--fwd-only] [--bm B] [--bn B]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# v5e per-chip capability assumptions for the speed-of-light models
# (jax-ml.github.io/scaling-book numbers for TPU v5e)
HBM_BW = 819e9          # bytes/s
MXU_F32 = 49e12         # FLOP/s (fp32 accum path)
# Compute-side SoL: MEASURED per-(head, strip) times of the kernel's exact
# inner-loop math on a resident VMEM strip (scripts/cal_vpu.py writes
# results/CALIBRATION.json; r2's assumed 8/14 ops @ 4e12 ops/s model was
# ~2.5x too optimistic — the v5e VPU sustains ~0.5e12 fused f32
# elementwise passes/s on (512, 2048) strips, see results/ROOFLINE.md).
_CAL_FALLBACK = {  # measured 2026-08-20 on TPU v5 lite (axon), bm=512 sub=2048
    "elems_per_strip": 512 * 2048,
    "fwd_strip_s_mxu": 4.72e-6,
    "bwd_strip_s_mxu": 7.30e-6,
}


def load_calibration():
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "CALIBRATION.json")
    try:
        with open(path) as f:
            cal = json.load(f)
        if {"elems_per_strip", "fwd_strip_s_mxu",
                "bwd_strip_s_mxu"} <= set(cal):
            return cal
    except (OSError, ValueError):
        pass
    return dict(_CAL_FALLBACK)


def median_time(fn_many, *args, warmup=2, reps=20, outer=5):
    """Time fn_many(*args, reps) which runs `reps` dependency-chained
    iterations in ONE jit program and returns a scalar.

    The scalar fetch forces completion — on remote-attached backends
    (axon tunnel) `block_until_ready` returns at enqueue, and the
    device→host round trip costs ~28 ms, so per-op latency must be
    measured as the marginal cost of extra in-graph iterations.
    """
    # first call compiles: Pallas kernels go through the remote Mosaic
    # compile service in this environment, which can take tens of seconds
    # per program — keep stderr alive so a long compile isn't read as a hang
    print("#   compiling + warmup (first Pallas compile can take ~30-60s "
          "per program)...", file=sys.stderr, flush=True)
    for _ in range(warmup):
        float(fn_many(*args, 1))
        float(fn_many(*args, reps))
    print("#   compiled; timing", file=sys.stderr, flush=True)
    t1 = min(_timed(fn_many, *args, 1) for _ in range(outer))
    tr = min(_timed(fn_many, *args, reps) for _ in range(outer))
    return max((tr - t1) / (reps - 1), 1e-9)


def _timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--avg-degree", type=float, default=128.0)
    p.add_argument("--metapaths", type=int, default=2)
    p.add_argument("--impl", default="flash")
    p.add_argument("--bm", type=int, default=0, help="BCSR row-tile (0=default)")
    p.add_argument("--bn", type=int, default=0, help="BCSR col-tile (0=default)")
    p.add_argument("--reorder", default="bfs",
                   help="node ordering for tile locality: bfs|labels|degree|none")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--no-dense", action="store_true",
                   help="skip the XLA dense baseline (OOMs at large N); "
                        "vs_baseline is null")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="feature dtype fed to the backends (accumulators "
                        "stay f32)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.graph.build import metapath_to_bcsr, metapath_to_csr, metapath_to_dense
    from han_tpu.graph.synthetic import planted_hetero
    from han_tpu.ops.attention import attention_aggregate

    ds = planted_hetero(
        n_nodes=args.n, n_feats=64, n_classes=3, n_metapaths=args.metapaths,
        avg_degree=args.avg_degree, train_per_class=100, n_val=100, seed=0)
    if args.reorder != "none":
        from han_tpu.graph.reorder import reorder

        ds = reorder(ds, args.reorder)

    csr_graphs = [metapath_to_csr(a) for a in ds.metapath_adjs]
    total_edges = sum(g.n_edges for g in csr_graphs)

    rng = np.random.default_rng(0)
    k, d = args.heads, args.dim
    fdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    fts = jnp.asarray(rng.standard_normal((args.n, k, d)).astype(np.float32),
                      dtype=fdt)
    ld = jnp.asarray(rng.standard_normal((args.n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((args.n, k)).astype(np.float32))

    bcsr_graphs = None

    def graphs_for(impl):
        nonlocal bcsr_graphs
        if impl == "flash":
            if bcsr_graphs is None:
                bcsr_graphs = [
                    metapath_to_bcsr(a, bm=args.bm or None, bn=args.bn or None)
                    for a in ds.metapath_adjs]
                occ = [round(g.occupancy(), 3) for g in bcsr_graphs]
                print(f"# bcsr tiles bm={bcsr_graphs[0].bm} "
                      f"bn={bcsr_graphs[0].bn} occupancy={occ}",
                      file=sys.stderr, flush=True)
            return bcsr_graphs
        if impl == "dense":
            return [metapath_to_dense(a) for a in ds.metapath_adjs]
        if impl == "ell":
            from han_tpu.graph.containers import ell_from_csr

            return [ell_from_csr(g) for g in csr_graphs]
        return csr_graphs

    # graphs passed as jit ARGUMENTS: closure-captured device arrays are
    # re-uploaded per call on remote-attached TPU backends (~35 ms/37 MB).
    # `reps` dependency-chained iterations run inside one program; the tiny
    # carry feedback prevents XLA from hoisting the loop body.
    def make_fwd(impl):
        graphs = graphs_for(impl)

        @jax.jit
        def fwd_many(graphs, fts, ld, ls, reps):
            def body(_, carry):
                f = fts + carry * 1e-30
                outs = [attention_aggregate(g, f, ld, ls, impl=impl)
                        for g in graphs]
                return sum(o.sum() for o in outs)

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return lambda fts, ld, ls, reps: fwd_many(
            graphs, fts, ld, ls, jnp.int32(reps))

    def make_fwdbwd(impl):
        graphs = graphs_for(impl)

        @jax.jit
        def step_many(graphs, fts, ld, ls, reps):
            def loss(f, a, b):
                outs = [attention_aggregate(g, f, a, b, impl=impl)
                        for g in graphs]
                return sum(o.sum() for o in outs)

            def body(_, carry):
                l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    fts + carry * 1e-30, ld, ls)
                return l + sum(g.sum() for g in grads) * 1e-30

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return lambda fts, ld, ls, reps: step_many(
            graphs, fts, ld, ls, jnp.int32(reps))

    make_main = make_fwd if args.fwd_only else make_fwdbwd
    phase = "fwd" if args.fwd_only else "fwd+bwd"
    print(f"# timing impl={args.impl} ({phase})", file=sys.stderr, flush=True)
    t_main = median_time(make_main(args.impl), fts, ld, ls, reps=args.iters)
    if args.no_dense:
        t_base = None
    else:
        print(f"# t_main={t_main*1e3:.3f} ms; timing dense baseline",
              file=sys.stderr, flush=True)
        t_base = median_time(make_main("dense"), fts, ld, ls, reps=args.iters)
    t_fwd = (t_main if args.fwd_only else
             median_time(make_fwd(args.impl), fts, ld, ls, reps=args.iters))

    detail = {
        "t_main_ms": round(t_main * 1e3, 3),
        "t_xla_dense_ms": round(t_base * 1e3, 3) if t_base else None,
        "t_fwd_ms": round(t_fwd * 1e3, 3),
        "total_edges": int(total_edges),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    if args.impl == "flash" and bcsr_graphs is not None:
        # speed-of-light models (see module docstring / results/ROOFLINE.md)
        cal = load_calibration()
        tile_area = sum(g.n_tiles * g.bm * g.bn for g in bcsr_graphs)
        n_strips = tile_area / cal["elems_per_strip"]  # calibrated strip units
        # measured irreducible inner-loop time; strip time is D-independent
        # for D <= 128 (the MXU writes 128 output lanes per pass regardless)
        t_strip = (cal["fwd_strip_s_mxu"] if args.fwd_only else
                   cal["fwd_strip_s_mxu"] + cal["bwd_strip_s_mxu"])
        t_tile_compute = n_strips * k * t_strip
        passes = 1 if args.fwd_only else 2     # fwd sweep; fused bwd sweep
        hbm_bytes = passes * (
            tile_area                            # int8 adjacency tiles
            + sum(g.n_tiles * g.bn * k * d * 4 for g in bcsr_graphs))  # v reads
        t_tile_hbm = hbm_bytes / HBM_BW
        t_tile_sol = max(t_tile_compute, t_tile_hbm)
        # edge-domain floor: the same measured strip rate applied to real
        # edges only (a perfect-occupancy kernel), vs HBM for edge data
        t_edge_sol = max(
            total_edges / cal["elems_per_strip"] * k * t_strip,
            passes * (total_edges * (1 + k * 4) + args.n * k * d * 4) / HBM_BW)
        detail["roofline"] = {
            "occupancy": round(float(np.mean(
                [g.occupancy() for g in bcsr_graphs])), 4),
            "tile_sol_ms": round(t_tile_sol * 1e3, 3),
            "tile_sol_frac": round(t_tile_sol / t_main, 4),
            "edge_sol_ms": round(t_edge_sol * 1e3, 3),
            "edge_sol_frac": round(t_edge_sol / t_main, 4),
            "tile_compute_bound": bool(t_tile_compute >= t_tile_hbm),
            "calibrated": True,
        }

    dt_tag = "" if args.dtype == "float32" else f", {args.dtype}"
    result = {
        "metric": f"edges/s/chip ({args.impl} fused attention aggregate "
                  f"{phase}, N={args.n}, P={args.metapaths}, K={k}, "
                  f"D={d}{dt_tag})",
        "value": round(total_edges * k / t_main, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(t_base / t_main, 4) if t_base else None,
        "detail": detail,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
