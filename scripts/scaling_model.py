"""Scaling-efficiency accounting (r2 VERDICT item 6): measured collective
bytes + an ICI model → projected 1→S-chip efficiency per distributed
backend, against the BASELINE.md ≥80% north star.

Real multi-chip hardware is not reachable in this environment (one v5e
chip behind a tunnel), so the projection combines:

- per-step collective bytes COUNTED from the optimized HLO of the full
  jitted train step compiled on an S-device CPU mesh (utils/comm.py —
  what XLA actually emitted, not hand math);
- the single-chip step time MEASURED on the real v5e (passed in);
- the v5e ICI link model (45 GB/s per direction, stated assumption).

Writes a table to stdout; redirect into results/SCALING.md material.

    python scripts/scaling_model.py --dataset dblp --t1 <measured seconds>
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="dblp",
                   help="registry dataset, or 'synth65k' for the 65k-node "
                        "community-power-law crossover graph")
    p.add_argument("--t1", type=float, required=True,
                   help="measured single-chip train-step seconds (real TPU)")
    p.add_argument("--shards", default="2,4,8")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from han_tpu.graph.build import with_self_loops
    from han_tpu.nn.losses import l2_regularizer, masked_softmax_cross_entropy
    from han_tpu.nn.models import HAN
    from han_tpu.parallel.flash_shard import partition_bcsr
    from han_tpu.parallel.mesh import make_mesh
    from han_tpu.parallel.ring_bcsr import ring_partition_bcsr
    from han_tpu.utils.comm import (ICI_BW, collective_stats,
                                    projected_efficiency,
                                    projected_efficiency_overlapped)

    if args.dataset == "synth65k":
        import pathlib
        import sys as _sys

        _sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
        from han_tpu.graph.synthetic import HeteroDataset
        from scripts.flash_scale_demo import community_powerlaw

        n = 65536
        rng = np.random.default_rng(0)
        adjs = [community_powerlaw(n, 2_000_000, seed=7)]
        labels = np.zeros((n, 4), np.float32)
        labels[np.arange(n), rng.integers(0, 4, n)] = 1.0
        masks = np.zeros((3, n), bool)
        masks[0, :1024] = masks[1, 1024:1536] = masks[2, 1536:] = True
        ds = HeteroDataset(adjs, rng.standard_normal(
            (n, 64)).astype(np.float32), labels, *masks, name="synth65k")
    else:
        from han_tpu.datasets.registry import load_dataset

        ds = load_dataset(args.dataset)
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    model = HAN(n_classes=ds.n_classes, hid_units=(8,), n_heads=(8, 1),
                attn_drop=0.6, ffd_drop=0.6)
    tx = optax.adam(5e-3)

    # init params on TINY single-device graphs: param shapes depend only on
    # feature/model dims, not graph size, and executing model.init on the
    # 8-virtual-device mesh starves a device thread past XLA's 40 s CPU
    # collective rendezvous on this 2-CPU host (only lower+compile below —
    # the mesh never executes)
    import scipy.sparse as _sp

    from han_tpu.graph.bcsr import bcsr_from_scipy

    tiny_adj = _sp.eye(64, format="csr")
    tiny_gs = [bcsr_from_scipy(tiny_adj) for _ in ds.metapath_adjs]
    tiny_xs = [jnp.zeros((64, ds.features.shape[1]), jnp.float32)
               for _ in ds.metapath_adjs]
    params = model.init(jax.random.PRNGKey(0), tiny_gs, tiny_xs)
    opt_state = tx.init(params)

    rows = []
    for s in [int(v) for v in args.shards.split(",")]:
        mesh = make_mesh(graph=s, heads=1)
        for name, build in (
            ("flash_shard", lambda a, s=s: partition_bcsr(
                with_self_loops(a), s)),
            ("ring_bcsr", lambda a, s=s: ring_partition_bcsr(
                with_self_loops(a), s)),
        ):
            graphs = [build(a) for a in ds.metapath_adjs]
            xs = [x for _ in graphs]
            with jax.set_mesh(mesh):

                def train_step(params, opt_state, rng, graphs, xs):
                    def loss_fn(p):
                        logits, _, _ = model.apply(
                            p, graphs, xs, deterministic=False,
                            rngs={"dropout": rng})
                        return (masked_softmax_cross_entropy(
                            logits, labels, mask)
                            + l2_regularizer(p, 1e-3))

                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt_state = tx.update(grads, opt_state)
                    return optax.apply_updates(params, updates), opt_state, loss

                compiled = jax.jit(train_step).lower(
                    params, opt_state, jax.random.PRNGKey(1), graphs, xs
                ).compile()
            # ring rotations live in a lax.fori_loop body: one HLO
            # instruction, S executions (utils/comm.py while_trip_count)
            st = collective_stats(compiled, s,
                                  while_trip_count=s if name == "ring_bcsr"
                                  else 1)
            eff = projected_efficiency(args.t1, st.wire_bytes_per_device, s)
            # implemented + HLO-verified overlap (scripts/overlap_check.py,
            # results/OVERLAP_r5.json): the ring's in-loop rotations are
            # scheduled under the loop kernels — hidden up to the shard's
            # compute time; outside-loop collectives stay exposed
            eff_ov = projected_efficiency_overlapped(
                args.t1, st.wire_bytes_in_loop, st.wire_bytes_outside, s)
            rows.append({
                "backend": name, "shards": s,
                "collectives": st.counts,
                "wire_mb_per_device": round(
                    st.wire_bytes_per_device / 2**20, 2),
                "wire_mb_in_loop": round(st.wire_bytes_in_loop / 2**20, 2),
                "wire_mb_outside": round(st.wire_bytes_outside / 2**20, 2),
                "t_ici_ms": round(st.ici_seconds() * 1e3, 3),
                "t_compute_ms": round(args.t1 / s * 1e3, 3),
                "projected_eff": round(eff, 3),
                "projected_eff_verified_overlap": round(eff_ov, 3),
            })
            print(json.dumps(rows[-1]), flush=True)

    print(f"\nmodel: t1={args.t1*1e3:.1f} ms measured on v5e; "
          f"ICI {ICI_BW/1e9:.0f} GB/s per direction (assumption)")
    print("\n| backend | S | wire MiB/dev (loop+out) | t_ici ms | t_comp ms "
          "| eff (no overlap) | eff (verified overlap) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['backend']} | {r['shards']} | {r['wire_mb_per_device']}"
              f" ({r['wire_mb_in_loop']}+{r['wire_mb_outside']})"
              f" | {r['t_ici_ms']} | {r['t_compute_ms']} |"
              f" {r['projected_eff']} | {r['projected_eff_verified_overlap']} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"dataset": args.dataset, "t1_s": args.t1,
                       "ici_gbps": ICI_BW / 1e9, "rows": rows}, f, indent=1)
        print(f"wrote {args.out}")
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
