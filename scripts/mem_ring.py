"""Measure per-shard memory of the two distributed flash backends.

Compares the compiled fwd+bwd attention step's memory (XLA
CompiledMemoryStats, no execution needed) on an S-device CPU mesh:

- flash_shard (PartitionedBCSR): features/logit_src replicated over the
  graph axis → per-device feature residency O(N·K·D);
- ring_bcsr (RingBCSR): features sharded, blocks rotate via ppermute →
  per-device residency O(N/S·K·D) (+ one rotation buffer).

Usage: HAN_TPU_PLATFORM not needed — forces CPU itself.
    python scripts/mem_ring.py [--n 16384] [--k 8] [--d 64]
"""

from __future__ import annotations

import argparse
import json
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--avg-degree", type=float, default=64.0)
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--bn", type=int, default=512)
    args = p.parse_args(argv)

    from han_tpu.graph.synthetic import planted_hetero
    from han_tpu.parallel.flash_shard import partition_bcsr, sharded_flash_attention
    from han_tpu.parallel.mesh import make_mesh
    from han_tpu.parallel.ring_bcsr import ring_partition_bcsr, ring_flash_attention

    ds = planted_hetero(n_nodes=args.n, n_feats=16, n_classes=3,
                        n_metapaths=1, avg_degree=args.avg_degree,
                        train_per_class=10, n_val=10, seed=0)
    adj = ds.metapath_adjs[0]
    rng = np.random.default_rng(0)
    fts = jnp.asarray(rng.standard_normal((args.n, args.k, args.d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((args.n, args.k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((args.n, args.k)).astype(np.float32))
    feat_bytes = args.n * args.k * args.d * 4

    rows = []
    for s in (2, 4, 8):
        mesh = make_mesh(graph=s, heads=1)
        for name, build, op in (
            ("flash_shard", partition_bcsr, sharded_flash_attention),
            ("ring_bcsr", ring_partition_bcsr, ring_flash_attention),
        ):
            g = build(adj, s, bm=args.bm, bn=args.bn)

            def loss(gr, f, a, b):
                return jnp.sum(op(gr, f, a, b, mesh=mesh) ** 2)

            compiled = (jax.jit(jax.grad(loss, argnums=(1, 2, 3)))
                        .lower(g, fts, ld, ls).compile())
            ma = compiled.memory_analysis()
            rows.append({
                "backend": name, "shards": s,
                "arg_mb": round(ma.argument_size_in_bytes / 2**20, 2),
                "temp_mb": round(ma.temp_size_in_bytes / 2**20, 2),
                "out_mb": round(ma.output_size_in_bytes / 2**20, 2),
            })
            print(json.dumps(rows[-1]), flush=True)

    print(f"\nfeature array (N,K,D) = {feat_bytes / 2**20:.1f} MiB; "
          f"N={args.n} K={args.k} D={args.d}")
    print("\n| backend | S | args MiB | temps MiB |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['backend']} | {r['shards']} | {r['arg_mb']} "
              f"| {r['temp_mb']} |")


if __name__ == "__main__":
    main()
