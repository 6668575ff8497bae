"""Flash-GAT at N=65k: the tile-list (BCSR) container runs a graph whose
dense forms cannot coexist with training state (VERDICT round-1 item 2).

Graph: community-structured power-law — zipf-ish degrees, each of the 128
communities mixes with ~4 partner communities (real social/citation graphs
have exactly this block structure; a uniformly-random sparse graph has no
tile structure and takes the ELL/sampled path instead — results/ROOFLINE.md).

Memory accounting printed:
- BCSR tiles (what flash reads)           ~0.2 GB int8
- dense int8 adjacency (round-1 flash)     4.3 GB
- dense (K, N, N) coefficients (reference) 137 GB  ← cannot exist
Runs one forward and one fwd+bwd step on the real chip and prints timings.

Usage: python scripts/flash_scale_demo.py [--n 65536] [--edges 2000000]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import scipy.sparse as sp


def community_powerlaw(n: int, e: int, *, n_comm: int = 128,
                       partners: int = 4, seed: int = 0) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    csize = n // n_comm
    # each community mixes with itself + `partners` random partners
    part = np.stack([np.full(n_comm, np.arange(n_comm)[i]) for i in range(1)])
    partner_tbl = np.concatenate(
        [np.arange(n_comm)[:, None],
         rng.integers(0, n_comm, (n_comm, partners))], axis=1)
    dst = rng.integers(0, n, e)
    dc = dst // csize
    pick = partner_tbl[dc, rng.integers(0, partners + 1, e)]
    # zipf-ish in-community position → power-law in-degree
    pos = (csize * rng.random(e) ** 3).astype(np.int64)
    src = pick * csize + pos
    a = sp.coo_matrix((np.ones(e, np.float32), (dst, src)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dim", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.graph.bcsr import bcsr_from_scipy
    from han_tpu.ops.pallas.flash_gat import flash_gat_attention

    adj = community_powerlaw(args.n, args.edges)
    g = bcsr_from_scipy(adj, bm=512, bn=512)
    tile_gb = g.tiles.size / 1e9
    dense_i8_gb = args.n ** 2 / 1e9
    dense_coef_gb = args.heads * args.n ** 2 * 4 / 1e9
    print(f"# N={args.n} E={adj.nnz} tiles={g.n_tiles} "
          f"occupancy={g.occupancy():.4f}", file=sys.stderr)
    print(f"# HBM: bcsr tiles {tile_gb:.2f} GB | dense int8 {dense_i8_gb:.1f} GB"
          f" | dense (K,N,N) coefs {dense_coef_gb:.0f} GB", file=sys.stderr)

    rng = np.random.default_rng(0)
    k, d = args.heads, args.dim
    fts = jnp.asarray(rng.standard_normal((args.n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((args.n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((args.n, k)).astype(np.float32))

    @jax.jit
    def fwd(g, f, a, b, reps):
        def body(_, carry):
            return flash_gat_attention(g, f + carry * 1e-30, a, b).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    @jax.jit
    def fwdbwd(g, f, a, b, reps):
        def loss(f_, a_, b_):
            return flash_gat_attention(g, f_, a_, b_).sum()

        def body(_, carry):
            l, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                f + carry * 1e-30, a, b)
            return l + sum(x.sum() for x in gr) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    def t(fn, reps=5):
        float(fn(g, fts, ld, ls, jnp.int32(1)))
        float(fn(g, fts, ld, ls, jnp.int32(reps)))
        t1 = time.perf_counter(); float(fn(g, fts, ld, ls, jnp.int32(1)))
        t1 = time.perf_counter() - t1
        tr = time.perf_counter(); float(fn(g, fts, ld, ls, jnp.int32(reps)))
        tr = time.perf_counter() - tr
        return max((tr - t1) / (reps - 1), 1e-9)

    t_f = t(fwd)
    t_fb = t(fwdbwd)
    print(json.dumps({
        "n": args.n, "edges": int(adj.nnz), "occupancy": round(g.occupancy(), 4),
        "bcsr_gb": round(tile_gb, 3), "dense_int8_gb": round(dense_i8_gb, 1),
        "fwd_ms": round(t_f * 1e3, 2), "fwdbwd_ms": round(t_fb * 1e3, 2),
        "fwd_edges_per_s": round(adj.nnz * k / t_f, 0),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
