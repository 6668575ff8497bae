"""Edge-partitioned flash-GAT over the ('graph', 'heads') mesh.

Round 1's only distributed attention used XLA segment ops
(parallel/shard_attn.py) — measured 52× slower than the fused Pallas flash
kernel (results/PARITY.md). This module runs the **flash kernel itself
per-shard under shard_map**, so multi-chip training keeps the fast path:

- destination rows are split into contiguous **row-block-aligned** strips
  (boundaries are multiples of the kernel's bm so every shard's tiles are
  exactly a subset of the single-chip tile grid);
- each shard owns its rows' incoming edge tiles as a local BCSR strip
  (rows local, columns global) and sweeps them with the same
  online-softmax kernel (ops/pallas/flash_gat.py);
- source features / logits are replicated along the graph axis (XLA
  all-gathers them at shard_map entry; AD generates the psum of their
  cotangents back — the halo-exchange transpose);
- attention heads shard on the 'heads' axis (independent per head,
  reference gat.py:42-46).

Dropout parity: the kernel's PRNG streams are keyed by GLOBAL row-block
index (``row_block_off``) and global column strip, so an S-shard run
replays exactly the masks of the single-chip run — sharded training is
bitwise-comparable (up to float reduction order) to single-chip
(tests/test_flash_shard.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from han_tpu.graph.bcsr import DEF_BM, DEF_BN, build_tile_arrays, pick_tiles
from han_tpu.parallel.mesh import GRAPH_AXIS, HEAD_AXIS


@dataclasses.dataclass(frozen=True)
class PartitionedBCSR:
    """Per-shard BCSR row strips with common static shapes.

    tiles:     int8[S, T_max, bm, bn] — shard-local occupied tiles
    fwd_*:     per-shard forward map over (nb_r_loc) local row blocks
    bwd_*:     per-shard backward map over (nb_c) GLOBAL column blocks
    row_block_off: int32[S] — global row-block index of each shard's start
    perm:      int32[n_nodes] — global row → padded slot (s·n_loc + local)
    """

    tiles: jax.Array
    fwd_count: jax.Array
    fwd_col: jax.Array
    fwd_tile: jax.Array
    bwd_count: jax.Array
    bwd_row: jax.Array
    bwd_tile: jax.Array
    row_block_off: jax.Array
    perm: jax.Array
    n_nodes: int
    n_pad: int   # global column padding (multiple of bm and bn)
    n_loc: int   # rows per shard (multiple of bm)
    bm: int
    bn: int
    n_edges: int
    n_shards: int


jax.tree_util.register_pytree_node(
    PartitionedBCSR,
    lambda g: ((g.tiles, g.fwd_count, g.fwd_col, g.fwd_tile, g.bwd_count,
                g.bwd_row, g.bwd_tile, g.row_block_off, g.perm),
               (g.n_nodes, g.n_pad, g.n_loc, g.bm, g.bn, g.n_edges,
                g.n_shards)),
    lambda meta, data: PartitionedBCSR(*data, *meta),
)


def partition_bcsr(adj, n_shards: int, *, bm: int = DEF_BM, bn: int = DEF_BN,
                   balance_edges: bool = True) -> PartitionedBCSR:
    """Host-side partitioner: scipy adjacency → S row-strip BCSR shards.

    Strip boundaries are chosen on row-block (bm) granularity, balancing
    edge counts across shards (degree skew, SURVEY.md §7), and every
    shard's row blocks keep their GLOBAL block indices via row_block_off —
    the single-chip tile grid is partitioned, never re-tiled.
    """
    m = adj.tocoo().astype(bool)
    m.sum_duplicates()
    rows = np.asarray(m.row, np.int64)
    cols = np.asarray(m.col, np.int64)
    n = m.shape[0]
    nnz = int(rows.shape[0])

    bm, bn, n_pad = pick_tiles(n, bm, bn)
    nb_r = n_pad // bm
    nb_c = n_pad // bn

    # edge-balanced boundaries in row-block units
    blk_edges = np.bincount(rows // bm, minlength=nb_r).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(blk_edges)])
    if balance_edges and nnz > 0:
        targets = (np.arange(1, n_shards) * nnz) / n_shards
        bounds = np.searchsorted(cum, targets, side="left")
    else:
        per = -(-nb_r // n_shards)
        bounds = np.minimum(np.arange(1, n_shards) * per, nb_r)
    starts = np.concatenate([[0], np.clip(bounds, 0, nb_r), [nb_r]])
    starts = np.maximum.accumulate(starts)

    nb_r_loc = int(max((starts[1:] - starts[:-1]).max(), 1))
    n_loc = nb_r_loc * bm

    order = np.argsort(rows, kind="stable")
    rows_s, cols_s = rows[order], cols[order]
    row_bounds = np.searchsorted(rows_s, starts * bm)

    parts = []
    for s in range(n_shards):
        lo, hi = row_bounds[s], row_bounds[s + 1]
        local_rows = rows_s[lo:hi] - starts[s] * bm
        parts.append(build_tile_arrays(local_rows, cols_s[lo:hi],
                                       nb_r_loc, nb_c, bm, bn))

    t_max = max(max(p[0].shape[0] for p in parts), 1)
    c_max = max(p[2].shape[1] for p in parts)
    r_max = max(p[5].shape[1] for p in parts)

    def pad_tiles(t):
        return np.pad(t, ((0, t_max - t.shape[0]), (0, 0), (0, 0)))

    def pad_map(a, w):
        # repeat the last column (the DMA-skip convention) out to width w
        return np.concatenate(
            [a] + [a[:, -1:]] * (w - a.shape[1]), axis=1) if a.shape[1] < w else a

    perm = np.zeros(n, np.int32)
    for s in range(n_shards):
        r0 = int(starts[s]) * bm
        r1 = min(int(starts[s + 1]) * bm, n)
        if r1 > r0:
            perm[r0:r1] = s * n_loc + np.arange(r1 - r0, dtype=np.int32)

    return PartitionedBCSR(
        tiles=jnp.asarray(np.stack([pad_tiles(p[0]) for p in parts])),
        fwd_count=jnp.asarray(np.stack([p[1] for p in parts])),
        fwd_col=jnp.asarray(np.stack([pad_map(p[2], c_max) for p in parts])),
        fwd_tile=jnp.asarray(np.stack([pad_map(p[3], c_max) for p in parts])),
        bwd_count=jnp.asarray(np.stack([p[4] for p in parts])),
        bwd_row=jnp.asarray(np.stack([pad_map(p[5], r_max) for p in parts])),
        bwd_tile=jnp.asarray(np.stack([pad_map(p[6], r_max) for p in parts])),
        row_block_off=jnp.asarray(starts[:-1].astype(np.int32)),
        perm=jnp.asarray(perm),
        n_nodes=n, n_pad=n_pad, n_loc=n_loc, bm=bm, bn=bn,
        n_edges=nnz, n_shards=n_shards,
    )


def sharded_flash_attention(
    graph: PartitionedBCSR,
    fts: jax.Array,        # (N, K, D)
    logit_dst: jax.Array,  # (N, K)
    logit_src: jax.Array,  # (N, K)
    *,
    mesh=None,
    slope: float = 0.2,
    coef_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Distributed sibling of flash_gat_attention — same math, same kernel,
    executed per row-strip under shard_map."""
    from han_tpu.ops.pallas.flash_gat import _default_interpret, _flash_core

    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty:
            raise ValueError("sharded_flash_attention needs a mesh (pass mesh=...)")
    if coef_dropout > 0.0 and dropout_rng is None:
        raise ValueError("coef_dropout > 0 requires dropout_rng")
    if interpret is None:
        interpret = _default_interpret()

    n, k, d = fts.shape
    n_pad, n_loc = graph.n_pad, graph.n_loc
    bm, bn = graph.bm, graph.bn

    fts_p = jnp.pad(fts.astype(jnp.float32), ((0, n_pad - n), (0, 0), (0, 0)))
    ls_p = jnp.pad(logit_src.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    ld_padded = jnp.zeros((graph.n_shards * n_loc, k), jnp.float32
                          ).at[graph.perm].set(logit_dst.astype(jnp.float32))

    if coef_dropout > 0.0:
        # same derivation as the single-chip wrapper → same masks
        seed = jax.random.randint(
            dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    def body(tiles, fc, fcol, ftl, bc, brow, btl, off, v, ldb, ls, sd):
        k_loc = v.shape[1]
        kp = max(((k_loc + 7) // 8) * 8, 8)
        ld_t = jnp.pad(ldb.T, ((0, kp - k_loc), (0, 0)))   # (kp, n_loc)
        ls_t = jnp.pad(ls.T, ((0, kp - k_loc), (0, 0)))    # (kp, n_pad)
        # globalize the dropout streams: this shard's first global head
        h_off = jax.lax.axis_index(HEAD_AXIS) * k_loc
        meta = jnp.stack([sd[0], off[0], h_off.astype(jnp.int32),
                          jnp.zeros((), jnp.int32)])
        out = _flash_core(tiles[0].reshape(-1, bn), fc[0], fcol[0], ftl[0],
                          bc[0], brow[0], btl[0], meta, ld_t, ls_t, v,
                          slope, bm, bn, interpret, float(coef_dropout))
        return out  # (n_loc, k_loc, d)

    out_padded = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(GRAPH_AXIS, None, None, None),  # tiles
            P(GRAPH_AXIS, None),              # fwd_count
            P(GRAPH_AXIS, None, None),        # fwd_col
            P(GRAPH_AXIS, None, None),        # fwd_tile
            P(GRAPH_AXIS, None),              # bwd_count
            P(GRAPH_AXIS, None, None),        # bwd_row
            P(GRAPH_AXIS, None, None),        # bwd_tile
            P(GRAPH_AXIS),                    # row_block_off
            P(None, HEAD_AXIS, None),         # fts (replicated over graph)
            P(GRAPH_AXIS, HEAD_AXIS),         # logit_dst (padded layout)
            P(None, HEAD_AXIS),               # logit_src (replicated)
            P(None),                          # seed
        ),
        out_specs=P(GRAPH_AXIS, HEAD_AXIS, None),
        # pallas_call out_shapes carry no varying-mesh-axes annotation, so
        # shard_map's vma check cannot see through the kernel — disable it
        check_vma=False,
    )(graph.tiles, graph.fwd_count, graph.fwd_col, graph.fwd_tile,
      graph.bwd_count, graph.bwd_row, graph.bwd_tile, graph.row_block_off,
      fts_p, ld_padded, ls_p, seed)

    # padded shard layout → global row order
    return out_padded[graph.perm].astype(fts.dtype)
