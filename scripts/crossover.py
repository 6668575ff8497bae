"""Occupancy/density crossover bench: flash vs csr vs ell on IDENTICAL
graphs, swept from community-structured (dense tiles) to uniform scatter
(every tile occupied but nearly empty) — the measurement behind the
``impl="auto"`` dispatch heuristic (ops/attention.FLASH_MAX_ELEMS_PER_EDGE)
and results/CROSSOVER_r4.md. VERDICT r3 missing #1 / next-round item 1.

Each graph is timed fwd+bwd per backend with the in-jit fori_loop
amortization (bench.py pattern — axon's block_until_ready is enqueue-only).
The sweep axis is ``elems_per_edge`` = occupied-tile elements the flash
kernel sweeps per real edge (= occupancy · n_pad² / E): flash's cost
scales with swept area, csr's with E, ell's with N·max_degree.

    python scripts/crossover.py [--n 65536] [--edges 2000000]
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

from scripts.flash_scale_demo import community_powerlaw  # noqa: E402


def uniform_scatter(n: int, e: int, seed: int = 0) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    a = sp.coo_matrix((np.ones(e, np.float32),
                       (rng.integers(0, n, e), rng.integers(0, n, e))),
                      shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


def mixed(n: int, e: int, frac_scatter: float, *, n_comm: int = 128,
          partners: int = 4, seed: int = 0) -> sp.csr_matrix:
    """Community graph with a fraction of edges rewired uniformly — tunes
    tile occupancy between the two extremes."""
    e_s = int(e * frac_scatter)
    a = community_powerlaw(n, e - e_s, n_comm=n_comm, partners=partners,
                          seed=seed)
    b = uniform_scatter(n, e_s, seed=seed + 1)
    m = (a + b).tocsr()
    m.sum_duplicates()
    m.data[:] = 1.0
    return m


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=65536)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--bn", type=int, default=512)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--ell-cap-gb", type=float, default=8.0,
                   help="skip ell when the (N,F,K,D) gather temp exceeds this")
    p.add_argument("--out", default="results/CROSSOVER_r4.json")
    p.add_argument("--skip", type=int, default=0,
                   help="skip the first N cases (resume an interrupted sweep)")
    p.add_argument("--append", action="store_true",
                   help="merge rows into an existing --out file")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.graph.bcsr import bcsr_from_scipy
    from han_tpu.graph.containers import CSRGraph, EllGraph
    from han_tpu.ops.attention import attention_aggregate

    n, k, d = args.n, args.heads, args.dim
    rng = np.random.default_rng(0)
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    def csr_from_scipy(m):
        c = m.tocsr()
        rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(c.indptr))
        return CSRGraph(row_ptr=jnp.asarray(c.indptr.astype(np.int32)),
                        col_idx=jnp.asarray(c.indices.astype(np.int32)),
                        row_idx=jnp.asarray(rows),
                        n_nodes=n, n_edges=int(c.nnz))

    def ell_from_scipy(m):
        c = m.tocsr()
        deg = np.diff(c.indptr).astype(np.int32)
        f = int(deg.max())
        # padded bytes of the gathered (n, f, K·D) block — ell_attention
        # gathers in FLAT (K·D)-lane layout since r5 (ops/attention.py), so
        # the trailing dim pads to one 128-lane tile instead of the rank-4
        # form's 16x expansion (which OOM'd: 13.75 GB for 65536x55x8x8)
        gather_gb = (n * ((f + 7) // 8 * 8)
                     * ((k * d + 127) // 128 * 128) * 4 / 1e9)
        if gather_gb > args.ell_cap_gb:
            return None, f, gather_gb
        nbr = np.full((n, f), n, np.int32)
        for i in range(n):  # host build; fine at bench scale
            lo, hi = c.indptr[i], c.indptr[i + 1]
            nbr[i, : hi - lo] = c.indices[lo:hi]
        return (EllGraph(nbr=jnp.asarray(nbr), deg=jnp.asarray(deg),
                         n_nodes=n, n_edges=int(c.nnz)), f, gather_gb)

    def timed(graph, impl, reps):
        @jax.jit
        def fwdbwd(g, f, a, b, r):
            def loss(f_, a_, b_):
                return attention_aggregate(g, f_, a_, b_, impl=impl).sum()

            def body(_, carry):
                l, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    f + carry * 1e-30, a, b)
                return l + sum(x.sum() for x in gr) * 1e-30
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

        float(fwdbwd(graph, fts, ld, ls, jnp.int32(1)))
        t1 = time.perf_counter()
        float(fwdbwd(graph, fts, ld, ls, jnp.int32(1)))
        t1 = time.perf_counter() - t1
        tr = time.perf_counter()
        float(fwdbwd(graph, fts, ld, ls, jnp.int32(reps)))
        tr = time.perf_counter() - tr
        return max((tr - t1) / (reps - 1), 1e-9)

    # NOTE the sweep axis: with (512, 512) tiles on a 65k grid, even a few
    # percent of uniform rewiring saturates tile occupancy (200k uniform
    # edges over 16k tiles ≈ 12/tile) — the informative intermediate points
    # live at SUB-percent scatter fractions
    cases = [
        ("community(p=4)", lambda: community_powerlaw(n, args.edges)),
        ("mixed(0.2% scatter)", lambda: mixed(n, args.edges, 0.002)),
        ("mixed(0.5% scatter)", lambda: mixed(n, args.edges, 0.005)),
        ("mixed(1% scatter)", lambda: mixed(n, args.edges, 0.01)),
        ("mixed(2% scatter)", lambda: mixed(n, args.edges, 0.02)),
        ("mixed(10% scatter)", lambda: mixed(n, args.edges, 0.10)),
        ("mixed(30% scatter)", lambda: mixed(n, args.edges, 0.30)),
        ("mixed(60% scatter)", lambda: mixed(n, args.edges, 0.60)),
        ("uniform scatter", lambda: uniform_scatter(n, args.edges)),
    ]

    rows = []
    if args.append and pathlib.Path(args.out).exists():
        with open(args.out) as f:
            rows = json.load(f)["rows"]
    for name, build in cases[args.skip:]:
        adj = build()
        g = bcsr_from_scipy(adj, bm=args.bm, bn=args.bn)
        row = {"graph": name, "n": n, "edges": int(adj.nnz),
               "occupancy": round(g.occupancy(), 4),
               "elems_per_edge": round(g.elems_per_edge(), 1)}
        print(f"# {name}: E={adj.nnz} occ={g.occupancy():.4f} "
              f"elems/edge={g.elems_per_edge():.0f}",
              file=sys.stderr, flush=True)
        row["flash_ms"] = round(timed(g, "flash", args.reps) * 1e3, 2)
        print(f"#   flash {row['flash_ms']} ms", file=sys.stderr, flush=True)
        row["csr_ms"] = round(timed(csr_from_scipy(adj), "csr",
                                    args.reps) * 1e3, 2)
        print(f"#   csr {row['csr_ms']} ms", file=sys.stderr, flush=True)
        eg, fan, ggb = ell_from_scipy(adj)
        row["ell_fanout"] = fan
        if eg is None:
            row["ell_ms"] = None
            row["ell_skipped"] = f"padded gather temp {ggb:.1f} GB > cap"
        else:
            row["ell_ms"] = round(timed(eg, "ell", args.reps) * 1e3, 2)
        print(f"#   ell {row['ell_ms']} ms (fanout {fan})",
              file=sys.stderr, flush=True)
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"device": str(jax.devices()[0]), "k": k, "d": d,
           "bm": args.bm, "bn": args.bn, "rows": rows}
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {args.out}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
