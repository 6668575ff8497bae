"""Verify communication/compute overlap in the ring backend from REAL
v5e-compiled HLO (VERDICT r4 #2).

One chip cannot execute an 8-chip program, but XLA's compile-only client
CAN compile one: jax.experimental.topologies AOT-compiles the full
ring_bcsr training-step module for a v5e:2x4 topology, producing the
final SCHEDULED HLO (instruction order = execution order, async passes
and the latency-hiding scheduler applied). utils/comm.permute_overlap_report
then checks, inside each ring fori_loop body, that the
``collective-permute-start`` of the next block rotation is issued BEFORE
the Mosaic kernel custom-call and its ``-done`` lands AFTER it — the
rotation is on the wire while the kernel computes.

Host platform is forced to CPU so this never touches the axon tunnel.

    python scripts/overlap_check.py [--out results/OVERLAP_r5.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--topology", default="v5e:2x4")
    p.add_argument("--out", default="results/OVERLAP_r5.json")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # arrays on CPU; TPU = AOT only

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from han_tpu.graph.synthetic import planted_hetero
    from han_tpu.parallel.mesh import GRAPH_AXIS, HEAD_AXIS
    from han_tpu.parallel.ring_bcsr import ring_flash_attention, ring_partition_bcsr
    from han_tpu.utils.comm import permute_overlap_report

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devs = np.array(topo.devices).reshape(args.shards, -1)
    mesh = Mesh(devs, (GRAPH_AXIS, HEAD_AXIS))

    ds = planted_hetero(n_nodes=args.n, n_feats=8, n_classes=3,
                        n_metapaths=1, avg_degree=16.0, train_per_class=8,
                        n_val=8, seed=0)
    g = ring_partition_bcsr(ds.metapath_adjs[0], args.shards, bm=128, bn=128)
    n, k, d = args.n, args.k, args.d
    fts = jax.ShapeDtypeStruct((n, k, d), jnp.float32)
    ld = jax.ShapeDtypeStruct((n, k), jnp.float32)
    ls = jax.ShapeDtypeStruct((n, k), jnp.float32)

    def fwd_bwd(v, a, b):
        # full fwd+bwd so BOTH ring loops (fwd fori_loop + custom-VJP bwd
        # fori_loop) appear in the compiled module
        loss, grads = jax.value_and_grad(
            lambda vv, aa, bb: ring_flash_attention(
                g, vv, aa, bb, interpret=False).sum(), argnums=(0, 1, 2))(
                    v, a, b)
        return loss, grads

    with jax.set_mesh(mesh):
        compiled = jax.jit(fwd_bwd).lower(fts, ld, ls).compile()
    txt = compiled.as_text()
    report = permute_overlap_report(txt)
    # the contract: every permute in a computation that CONTAINS a kernel
    # (the ring loop bodies) must straddle it. Permutes in kernel-free
    # computations (the one final post-loop gradient hop home, by design
    # issued after the last kernel) have nothing to hide under.
    bodies = {k: v for k, v in report.items()
              if k != "_total" and v["kernels"] > 0}
    in_loop_pairs = sum(v["pairs"] for v in bodies.values())
    in_loop_strad = sum(v["straddling"] for v in bodies.values())
    out = {
        "topology": args.topology,
        "shards": args.shards,
        "scheduled": "is_scheduled=true" in txt,
        "report": report,
        "in_loop_pairs": in_loop_pairs,
        "in_loop_straddling": in_loop_strad,
        "verdict": ("OVERLAPPED" if in_loop_pairs
                    and in_loop_strad == in_loop_pairs else "PARTIAL"
                    if in_loop_strad else "NOT_OVERLAPPED"),
    }
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
