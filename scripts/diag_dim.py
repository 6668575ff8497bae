"""Diagnose the flash kernel D>=32 stall: compile time vs run time per dim."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from han_tpu.graph.build import metapath_to_bcsr
from han_tpu.graph.synthetic import planted_hetero
from han_tpu.ops.pallas.flash_gat import flash_gat_attention

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
dims = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [8, 16, 32]
k = 8

ds = planted_hetero(n_nodes=n, n_feats=64, n_classes=3, n_metapaths=1,
                    avg_degree=128.0, train_per_class=100, n_val=100, seed=0)
g = metapath_to_bcsr(ds.metapath_adjs[0])
print(f"bm={g.bm} bn={g.bn} n_tiles={g.n_tiles} occ={g.occupancy():.3f}",
      flush=True)

rng = np.random.default_rng(0)
for d in dims:
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    f = jax.jit(lambda g, fts, ld, ls: flash_gat_attention(g, fts, ld, ls))
    t0 = time.perf_counter()
    lowered = f.lower(g, fts, ld, ls)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    out = compiled(g, fts, ld, ls)
    s = float(out.sum())
    t3 = time.perf_counter()
    # timed runs
    for _ in range(2):
        float(compiled(g, fts, ld, ls).sum())
    t4 = time.perf_counter()
    reps = 5
    t5 = time.perf_counter()
    for _ in range(reps):
        float(compiled(g, fts, ld, ls).sum())
    t6 = time.perf_counter()
    print(f"D={d:3d}: lower={t1-t0:.2f}s compile={t2-t1:.2f}s "
          f"first_run={t3-t2:.2f}s per_run={(t6-t5)/reps*1e3:.2f}ms sum={s:.3e}",
          flush=True)
