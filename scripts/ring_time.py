"""Per-shard kernel-time comparison: ring_bcsr vs flash_shard (VERDICT r3
next-round item 3, the timing half — the memory half is
results/RING_MEMORY_r4.txt).

Real multi-chip hardware is unreachable here (one v5e behind a tunnel), so
the measurement isolates exactly the part a single chip CAN measure — the
per-shard kernel critical path — and leaves collectives to the counted-HLO
model (scripts/scaling_model.py / utils/comm.py):

- flash_shard shard s: ONE fused-kernel sweep over the shard's row-strip
  tiles (parallel/flash_shard.py body) — timed fwd+bwd per shard via the
  same custom-VJP core the production path uses;
- ring_bcsr shard s: the S-step lax.fori_loop over the shard's
  (row strip × column strip) cells with the LSE merge — the production
  _ring_core with the ppermute rotation no-op'd (the rotated operands are
  shape-invariant, so per-step kernel work and loop overhead are exactly
  those of the real ring; only the ICI transfer is removed, and that is
  what the model adds back).

Per-step time = max over shards (critical path) + modeled collective time.

    python scripts/ring_time.py [--n 16384] [--d 64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--avg-degree", type=float, default=64.0)
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--bn", type=int, default=512)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--shards", default="2,4,8")
    p.add_argument("--out", default="results/RING_TIME_r4.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.graph.synthetic import planted_hetero
    from han_tpu.ops.pallas import flash_gat
    from han_tpu.parallel import ring_bcsr as rb
    from han_tpu.parallel.flash_shard import partition_bcsr

    # timing-only: make the ring rotation a no-op (shape-invariant, so the
    # kernel work and fori_loop structure are untouched; ICI time is modeled
    # separately from counted HLO — module docstring). Restored on exit so
    # importing + calling main() never leaves ring_bcsr patched.
    _orig_rotate = rb._rotate
    rb._rotate = lambda xs, n_shards: xs
    try:
        return _run(args, jax, jnp, planted_hetero, flash_gat, rb,
                    partition_bcsr)
    finally:
        rb._rotate = _orig_rotate


def _run(args, jax, jnp, planted_hetero, flash_gat, rb, partition_bcsr):
    n, k, d = args.n, args.k, args.d
    ds = planted_hetero(n_nodes=n, n_feats=16, n_classes=3, n_metapaths=1,
                        avg_degree=args.avg_degree, train_per_class=10,
                        n_val=10, seed=0)
    adj = ds.metapath_adjs[0]
    rng = np.random.default_rng(0)
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    kp = max(((k + 7) // 8) * 8, 8)

    def bench(fn, *xs, reps=args.reps):
        """fwd+bwd wall time via the in-jit fori_loop amortization
        (bench.py pattern; axon block_until_ready is enqueue-only)."""
        @jax.jit
        def loop(r, *ys):
            def body(_, c):
                l, gr = jax.value_and_grad(fn, argnums=tuple(range(len(ys))))(
                    *[y + c * 1e-30 for y in ys])
                return l + sum(g.sum() for g in gr) * 1e-30
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

        float(loop(jnp.int32(1), *xs))
        t1 = time.perf_counter()
        float(loop(jnp.int32(1), *xs))
        t1 = time.perf_counter() - t1
        tr = time.perf_counter()
        float(loop(jnp.int32(reps), *xs))
        tr = time.perf_counter() - tr
        return max((tr - t1) / (reps - 1), 1e-9)

    rows = []
    for s_n in [int(v) for v in args.shards.split(",")]:
        # ---- flash_shard: one sweep over the shard's row-strip tiles ----
        pg = partition_bcsr(adj, s_n, bm=args.bm, bn=args.bn)
        n_loc, bm, bn = pg.n_loc, pg.bm, pg.bn
        fts_p = jnp.pad(fts, ((0, pg.n_pad - n), (0, 0), (0, 0)))
        ls_t = jnp.pad(ls.T, ((0, kp - k), (0, pg.n_pad - n)))
        ld_pad = jnp.zeros((s_n * n_loc, k)).at[pg.perm].set(ld)
        fs_ms = []
        for s in range(s_n):
            ld_t = jnp.pad(ld_pad[s * n_loc:(s + 1) * n_loc].T,
                           ((0, kp - k), (0, 0)))
            meta = jnp.stack([jnp.int32(0), pg.row_block_off[s],
                              jnp.int32(0), jnp.int32(0)])

            def f(ld_t_, ls_t_, v_, s=s, meta=meta):
                return flash_gat._flash_core(
                    pg.tiles[s].reshape(-1, bn), pg.fwd_count[s],
                    pg.fwd_col[s], pg.fwd_tile[s], pg.bwd_count[s],
                    pg.bwd_row[s], pg.bwd_tile[s], meta, ld_t_, ls_t_, v_,
                    0.2, bm, bn, False, 0.0).sum()

            fs_ms.append(bench(f, ld_t, ls_t, fts_p) * 1e3)

        # ---- ring_bcsr: S-step fori_loop over the shard's cells ----
        rg = rb.ring_partition_bcsr(adj, s_n, bm=args.bm, bn=args.bn)
        n_loc_r = rg.n_loc
        fts_r = jnp.pad(fts, ((0, rg.n_pad - n), (0, 0), (0, 0)))
        ld_r = jnp.pad(ld, ((0, rg.n_pad - n), (0, 0)))
        ls_r = jnp.pad(ls, ((0, rg.n_pad - n), (0, 0)))
        rs_ms = []
        for s in range(s_n):
            sl = slice(s * n_loc_r, (s + 1) * n_loc_r)
            ld_t = jnp.pad(ld_r[sl].T, ((0, kp - k), (0, 0)))
            meta_base = jnp.stack([jnp.int32(0), jnp.int32(s * rg.nb_r_loc),
                                   jnp.int32(0), jnp.int32(0)])

            def f(ld_t_, ls_b, v_b, s=s, meta_base=meta_base):
                return rb._ring_core(
                    rg.tiles[s].reshape(-1, rg.bn), rg.fwd_count[s],
                    rg.fwd_col[s], rg.fwd_tile[s], rg.bwd_count[s],
                    rg.bwd_row[s], rg.bwd_tile[s], rg.cs_of_step[s],
                    meta_base, ld_t_, ls_b, v_b, 0.2, rg.bm, rg.bn, False,
                    0.0, s_n, rg.nb_c_loc).sum()

            rs_ms.append(bench(f, ld_t, ls_r[sl], fts_r[sl]) * 1e3)

        rows.append({
            "shards": s_n,
            "flash_shard_ms": [round(v, 3) for v in fs_ms],
            "flash_shard_max_ms": round(max(fs_ms), 3),
            "ring_bcsr_ms": [round(v, 3) for v in rs_ms],
            "ring_bcsr_max_ms": round(max(rs_ms), 3),
            "ring_over_flash": round(max(rs_ms) / max(fs_ms), 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    # single-chip whole-graph reference for the same shape
    from han_tpu.graph.bcsr import bcsr_from_scipy
    from han_tpu.ops.attention import attention_aggregate

    g1 = bcsr_from_scipy(adj, bm=args.bm, bn=args.bn)
    t1 = bench(lambda a, b, v: attention_aggregate(
        g1, v, a, b, impl="flash").sum(), ld, ls, fts)
    out = {"device": str(jax.devices()[0]), "n": n, "k": k, "d": d,
           "edges": int(adj.nnz), "bm": args.bm, "bn": args.bn,
           "single_chip_ms": round(t1 * 1e3, 3), "rows": rows}
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# single-chip flash {t1*1e3:.3f} ms; wrote {args.out}",
          file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
