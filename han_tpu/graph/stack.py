"""Stack P per-meta-path graph containers into ONE container with a
leading P axis on every data leaf — the input format for meta-path
(expert-parallel) execution of HAN's towers (SURVEY.md §2.3 EP row:
the P towers are independent until semantic fusion, reference
models/gat.py:39-58, so they vmap/shard over a 'mp' mesh axis).

Containers of one graph family share static metadata after padding:
per-graph true counts that must survive live in DATA arrays (BCSR map
counts, ELL degrees), so padding extra all-zero tiles / sentinel edges
never changes results.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from han_tpu.graph.bcsr import BCSRGraph
from han_tpu.graph.containers import CSRGraph, DenseGraph, EllGraph


def _stack(leaves):
    return jnp.stack([jnp.asarray(l) for l in leaves])


def _pad_axis(a, width, axis, fill):
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, width - a.shape[axis])
    return jnp.pad(a, pad, constant_values=fill)


def _pad_map(a, width):
    """Widen a block map by repeating its last column (DMA-skip convention)."""
    if a.shape[-1] >= width:
        return jnp.asarray(a)
    reps = jnp.repeat(a[..., -1:], width - a.shape[-1], axis=-1)
    return jnp.concatenate([jnp.asarray(a), reps], axis=-1)


def stack_graphs(graphs: Sequence):
    """[container, ...] (same type, same node set) → one container whose
    data leaves carry a leading P axis; static metadata unified."""
    kinds = {type(g) for g in graphs}
    if len(kinds) != 1:
        raise TypeError(f"cannot stack mixed container types {kinds}")
    g0 = graphs[0]
    if any(g.n_nodes != g0.n_nodes for g in graphs):
        raise ValueError("stacked meta-path graphs must share the node set")

    if isinstance(g0, DenseGraph):
        return DenseGraph(adj=_stack([g.adj for g in graphs]),
                          n_nodes=g0.n_nodes)

    if isinstance(g0, BCSRGraph):
        if any((g.bm, g.bn, g.n_pad) != (g0.bm, g0.bn, g0.n_pad) for g in graphs):
            raise ValueError("stacked BCSR graphs must share tile geometry")
        t_max = max(max(g.tiles.shape[0] for g in graphs), 1)
        c_max = max(g.c_max for g in graphs)
        r_max = max(g.r_max for g in graphs)
        return BCSRGraph(
            tiles=_stack([_pad_axis(g.tiles, t_max, 0, 0) for g in graphs]),
            fwd_count=_stack([g.fwd_count for g in graphs]),
            fwd_col=_stack([_pad_map(g.fwd_col, c_max) for g in graphs]),
            fwd_tile=_stack([_pad_map(g.fwd_tile, c_max) for g in graphs]),
            bwd_count=_stack([g.bwd_count for g in graphs]),
            bwd_row=_stack([_pad_map(g.bwd_row, r_max) for g in graphs]),
            bwd_tile=_stack([_pad_map(g.bwd_tile, r_max) for g in graphs]),
            n_nodes=g0.n_nodes, n_pad=g0.n_pad, bm=g0.bm, bn=g0.bn,
            n_edges=max(g.n_edges for g in graphs), n_tiles=t_max,
        )

    if type(g0).__name__ == "PartitionedBCSR":
        # EP x graph composition: per-shard leaves gain a leading P axis →
        # (P, S, ...). Strip boundaries are edge-balanced PER meta-path, so
        # n_loc (rows per shard) differs across graphs: unify to the max,
        # padding each graph's local row blocks with zero-count entries
        # and remapping perm into the widened shard slots.
        from han_tpu.parallel.flash_shard import PartitionedBCSR

        if any((g.bm, g.bn, g.n_pad, g.n_shards) !=
               (g0.bm, g0.bn, g0.n_pad, g0.n_shards) for g in graphs):
            raise ValueError("stacked PartitionedBCSR graphs must share "
                             "tile geometry and shard count")
        n_loc = max(g.n_loc for g in graphs)
        nb_r_loc = n_loc // g0.bm
        t_max = max(g.tiles.shape[1] for g in graphs)
        c_max = max(g.fwd_col.shape[2] for g in graphs)
        r_max = max(g.bwd_row.shape[2] for g in graphs)

        def widen_rows(a, g):
            # (S, nb_r_old[, w]) → (S, nb_r_loc[, w]); padding repeats the
            # last row block (count 0 ⇒ compute predicated off anyway)
            pad = nb_r_loc - a.shape[1]
            if pad == 0:
                return jnp.asarray(a)
            return jnp.concatenate(
                [jnp.asarray(a)] + [jnp.asarray(a[:, -1:])] * pad, axis=1)

        def fixed_perm(g):
            shard = jnp.asarray(g.perm) // g.n_loc
            return jnp.asarray(g.perm) + shard * (n_loc - g.n_loc)

        return PartitionedBCSR(
            tiles=_stack([_pad_axis(g.tiles, t_max, 1, 0) for g in graphs]),
            fwd_count=_stack([jnp.concatenate(
                [jnp.asarray(g.fwd_count),
                 jnp.zeros((g.n_shards, nb_r_loc - g.fwd_count.shape[1]),
                           np.int32)], axis=1) for g in graphs]),
            fwd_col=_stack([widen_rows(_pad_map(g.fwd_col, c_max), g)
                            for g in graphs]),
            fwd_tile=_stack([widen_rows(_pad_map(g.fwd_tile, c_max), g)
                             for g in graphs]),
            bwd_count=_stack([g.bwd_count for g in graphs]),
            bwd_row=_stack([_pad_map(g.bwd_row, r_max) for g in graphs]),
            bwd_tile=_stack([_pad_map(g.bwd_tile, r_max) for g in graphs]),
            row_block_off=_stack([g.row_block_off for g in graphs]),
            perm=_stack([fixed_perm(g) for g in graphs]),
            n_nodes=g0.n_nodes, n_pad=g0.n_pad, n_loc=n_loc,
            bm=g0.bm, bn=g0.bn, n_edges=max(g.n_edges for g in graphs),
            n_shards=g0.n_shards,
        )

    if isinstance(g0, CSRGraph):
        # pad edge arrays to a common length; pads keep the sentinel row
        # n_nodes, which every consumer drops, so the unified static
        # n_edges (= max) over-counting is harmless
        e_pad = max(g.e_pad for g in graphs)
        n = g0.n_nodes
        return CSRGraph(
            row_ptr=_stack([g.row_ptr for g in graphs]),
            col_idx=_stack([_pad_axis(g.col_idx, e_pad, 0, n) for g in graphs]),
            row_idx=_stack([_pad_axis(g.row_idx, e_pad, 0, n) for g in graphs]),
            n_nodes=n, n_edges=max(g.n_edges for g in graphs),
        )

    if isinstance(g0, EllGraph):
        f = max(g.fanout for g in graphs)
        n = g0.n_nodes
        return EllGraph(
            nbr=_stack([_pad_axis(g.nbr, f, 1, n) for g in graphs]),
            deg=_stack([g.deg for g in graphs]),
            n_nodes=n, n_edges=max(g.n_edges for g in graphs),
        )

    raise TypeError(f"unsupported container {type(g0)}")
