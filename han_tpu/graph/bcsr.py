"""Block-sparse (BCSR / tile-list) graph container for the flash-GAT kernel.

The round-1 flash kernel consumed a fully materialized dense (N, N) int8
adjacency and recomputed its tile-occupancy block map inside jit on every
forward AND backward call — an O(N²) reduce + argsort per step, and O(N²)
HBM for the adjacency itself (10 GB at N=10⁵). This container stores only
the **occupied (bm × bn) tiles** plus both traversal maps, precomputed once
on the host:

- ``tiles``  int8[T, bm, bn] — bitmap of each occupied tile, in row-major
  (row-block, col-block) order. HBM cost ∝ occupied tiles, not N².
- forward map (row-block → its occupied column tiles): drives the forward
  and the d_logit_dst backward sweep.
- backward map (col-block → its occupied row tiles): drives the
  d_logit_src / d_values backward sweep (the transpose traversal).

Map padding convention (same trick as the round-1 in-jit map): steps past a
block's count repeat the LAST active entry, so the Pallas pipeline sees an
unchanged block index and skips the DMA; compute is predicated off.

Tile-size rules (enforced here so the kernel never sees an illegal config;
round-1 advisor finding: widening tiles broke padding divisibility):

- ``n_pad`` is a common multiple of bm and bn (both sweeps tile exactly);
- ``bn ≤ 512`` or ``bn % 512 == 0`` — the kernel's in-register column
  strips are 512 wide, so a tile is always a whole number of strips.

Reference spec being accelerated: the masked dense attention math of
utils/layers.py:26-34 (see ops/pallas/flash_gat.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from han_tpu.graph.containers import CSRGraph, DenseGraph

# kernel strip width (flash_gat.SUB); bn must be <= or a multiple of it
_SUB = 512

DEF_BM = 512
# wide column tiles amortize the fixed per-grid-step cost (v5e sweep,
# N=8192/deg128: bn=2048 → 3.42 ms vs bn=1024 → 4.28 ms vs bn=512 → slower
# still); pass a narrower bn to the builders when tile storage dominates
# (very sparse, poorly-ordered graphs)
DEF_BN = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_tiles(n: int, bm: int = DEF_BM, bn: int = DEF_BN) -> tuple[int, int, int]:
    """Clamp requested tile sizes to legal values for an n-node graph and
    return (bm, bn, n_pad) with n_pad divisible by both."""
    cap = _round_up(max(n, 1), 128)
    bm = max(min(bm, cap), 8)
    bn = max(min(bn, cap), 128)
    if bm % 8 or bn % 128:
        raise ValueError(f"bm must be a multiple of 8, bn of 128; got {bm}x{bn}")
    if bn > _SUB:
        bn = (bn // _SUB) * _SUB  # whole number of 512-wide strips
    n_pad = _round_up(n, math.lcm(bm, bn))
    return bm, bn, n_pad


@dataclasses.dataclass(frozen=True)
class BCSRGraph:
    """Occupied-tile adjacency + precomputed forward/backward block maps."""

    tiles: jax.Array      # int8[T_pad, bm, bn]
    fwd_count: jax.Array  # int32[nb_r] occupied tiles in each row block
    fwd_col: jax.Array    # int32[nb_r, c_max] column-block id per step
    fwd_tile: jax.Array   # int32[nb_r, c_max] tile id per step
    bwd_count: jax.Array  # int32[nb_c]
    bwd_row: jax.Array    # int32[nb_c, r_max] row-block id per step
    bwd_tile: jax.Array   # int32[nb_c, r_max]
    n_nodes: int
    n_pad: int
    bm: int
    bn: int
    n_edges: int
    n_tiles: int  # true occupied tile count (T_pad >= n_tiles >= 1)
    # optional edge-domain (sorted COO + row_ptr) view of the same graph:
    # lets ``impl="auto"`` dispatch a low-density BCSR to the csr segment-op
    # backend (results/CROSSOVER_r4.md) without rebuilding the container.
    # Cost: 12 bytes/edge next to the tile bitmaps.
    edge_row_ptr: jax.Array | None = None  # int32[N + 1]
    edge_col: jax.Array | None = None      # int32[E]
    edge_row: jax.Array | None = None      # int32[E]
    # flat active-tile forward map (flat_fwd_map): the single-chip
    # forward grid visits exactly the occupied tiles (row-block-major)
    # instead of a rectangular (nb_r, c_max) grid with masked steps
    # (results/ROOFLINE.md r5). Tuple of 4 int32[T_steps] arrays:
    # (row, col, tile, active)
    fwd_flat: tuple | None = None

    @property
    def nb_r(self) -> int:
        return self.n_pad // self.bm

    @property
    def nb_c(self) -> int:
        return self.n_pad // self.bn

    @property
    def c_max(self) -> int:
        return int(self.fwd_col.shape[1])

    @property
    def r_max(self) -> int:
        return int(self.bwd_row.shape[1])

    def occupancy(self) -> float:
        """Fraction of the padded dense tile grid that is occupied."""
        return self.n_tiles / (self.nb_r * self.nb_c)

    def elems_per_edge(self) -> float:
        """Tile elements the flash kernel sweeps per real edge
        (= occupancy() · n_pad² / E). The dispatch quantity for
        flash-vs-csr: flash's work scales with swept tile area, csr's with
        E — see results/CROSSOVER_r4.md for the measured crossover."""
        return self.n_tiles * self.bm * self.bn / max(self.n_edges, 1)

    def as_csr(self) -> CSRGraph:
        """Edge-domain view for the csr segment-op backend (requires the
        builder's ``keep_edges=True``, the default)."""
        if self.edge_col is None:
            raise ValueError(
                "this BCSRGraph was built with keep_edges=False; rebuild "
                "with keep_edges=True for csr dispatch")
        return CSRGraph(row_ptr=self.edge_row_ptr, col_idx=self.edge_col,
                        row_idx=self.edge_row, n_nodes=self.n_nodes,
                        n_edges=self.n_edges)


jax.tree_util.register_pytree_node(
    BCSRGraph,
    lambda g: ((g.tiles, g.fwd_count, g.fwd_col, g.fwd_tile,
                g.bwd_count, g.bwd_row, g.bwd_tile,
                g.edge_row_ptr, g.edge_col, g.edge_row, g.fwd_flat),
               (g.n_nodes, g.n_pad, g.bm, g.bn, g.n_edges, g.n_tiles)),
    lambda meta, data: BCSRGraph(*data[:7], *meta, *data[7:]),
)


def _group_map(block_of_step: np.ndarray, other_of_step: np.ndarray,
               tile_of_step: np.ndarray, n_blocks: int):
    """Group (block → [(other_block, tile_id)]) into padded count/idx/tile
    arrays; padding repeats the last active entry (index 0 for empty rows)."""
    counts = np.bincount(block_of_step, minlength=n_blocks).astype(np.int32)
    width = max(int(counts.max()) if counts.size else 1, 1)
    other = np.zeros((n_blocks, width), np.int32)
    tile = np.zeros((n_blocks, width), np.int32)
    start = np.zeros(n_blocks + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    for b in range(n_blocks):
        lo, hi = start[b], start[b + 1]
        c = hi - lo
        if c:
            other[b, :c] = other_of_step[lo:hi]
            tile[b, :c] = tile_of_step[lo:hi]
            other[b, c:] = other[b, c - 1]
            tile[b, c:] = tile[b, c - 1]
    return counts, other, tile


def build_tile_arrays(rows: np.ndarray, cols: np.ndarray, nb_r: int,
                      nb_c: int, bm: int, bn: int):
    """Rectangular tile-list build (host, O(E)): COO edges over an
    (nb_r·bm × nb_c·bn) grid → (tiles, fwd_count, fwd_col, fwd_tile,
    bwd_count, bwd_row, bwd_tile, n_tiles) numpy arrays. Shared by the
    square single-chip builder and the per-shard row-strip builder."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    if rows.size == 0:
        return (np.zeros((1, bm, bn), np.int8),
                np.zeros(nb_r, np.int32), np.zeros((nb_r, 1), np.int32),
                np.zeros((nb_r, 1), np.int32),
                np.zeros(nb_c, np.int32), np.zeros((nb_c, 1), np.int32),
                np.zeros((nb_c, 1), np.int32), 0)

    rb = rows // bm
    cb = cols // bn
    key = rb * nb_c + cb
    # tile ids in row-major (rb, cb) order
    uniq, tid_of_edge = np.unique(key, return_inverse=True)
    n_tiles = int(uniq.shape[0])

    tiles = np.zeros((n_tiles, bm, bn), np.int8)
    tiles[tid_of_edge, rows % bm, cols % bn] = 1

    tile_rb = (uniq // nb_c).astype(np.int64)
    tile_cb = (uniq % nb_c).astype(np.int64)
    tids = np.arange(n_tiles, dtype=np.int32)

    # forward: uniq is already sorted row-major → per-rb tiles are grouped
    # with ascending cb
    fwd_count, fwd_col, fwd_tile = _group_map(tile_rb, tile_cb.astype(np.int32),
                                              tids, nb_r)
    # backward: sort tiles col-major
    order = np.lexsort((tile_rb, tile_cb))
    bwd_count, bwd_row, bwd_tile = _group_map(
        tile_cb[order], tile_rb[order].astype(np.int32), tids[order], nb_c)
    return (tiles, fwd_count, fwd_col, fwd_tile,
            bwd_count, bwd_row, bwd_tile, n_tiles)


def flat_fwd_map(fwd_count: np.ndarray, fwd_col: np.ndarray,
                 fwd_tile: np.ndarray):
    """Flatten the grouped forward map into one ACTIVE-TILE step list
    (row-block-major): 4 int32[T_steps] arrays (row, col, tile, active).

    The rectangular (nb_r x c_max) grid pays a full pipeline step - block
    DMAs included - for every masked (j >= count) slot; on skewed graphs
    that is up to (1 - mean/max tiles-per-row-block) wasted steps. The
    flat list visits exactly the occupied tiles, plus one INACTIVE step
    per empty row block so its output block still gets finalized to the
    edgeless-row zeros. (A paired two-tiles-per-step variant was measured
    SLOWER on-chip - 3.20 vs 2.68 ms fwd at the bench shape: doubling the
    DMA windows per step costs more than the amortized fixed step cost -
    results/ROOFLINE.md r5.) Column order within each row block is
    preserved, so the online-softmax update order and the dropout PRNG
    streams match the rectangular grid exactly."""
    rows_l, cols_l, tiles_l, act_l = [], [], [], []
    for rb, c in enumerate(np.asarray(fwd_count)):
        c = int(c)
        if c:
            rows_l += [rb] * c
            cols_l += list(np.asarray(fwd_col[rb, :c]))
            tiles_l += list(np.asarray(fwd_tile[rb, :c]))
            act_l += [1] * c
        else:
            rows_l.append(rb)
            cols_l.append(0)
            tiles_l.append(0)
            act_l.append(0)
    mk = lambda x: np.asarray(x, np.int32)
    return (mk(rows_l), mk(cols_l), mk(tiles_l), mk(act_l))


def bcsr_from_coo(rows: np.ndarray, cols: np.ndarray, n: int, *,
                  bm: int = DEF_BM, bn: int = DEF_BN,
                  n_edges: int | None = None,
                  keep_edges: bool = True) -> BCSRGraph:
    """Build a BCSRGraph from COO edge lists (host-side, O(E)).

    ``keep_edges`` also stores the row-sorted edge list (+12 B/edge) so
    ``impl="auto"`` can dispatch low-tile-density graphs to the csr
    backend (as_csr / results/CROSSOVER_r4.md)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    bm, bn, n_pad = pick_tiles(n, bm, bn)
    nb_r, nb_c = n_pad // bm, n_pad // bn
    (tiles, fwd_count, fwd_col, fwd_tile, bwd_count, bwd_row, bwd_tile,
     n_tiles) = build_tile_arrays(rows, cols, nb_r, nb_c, bm, bn)
    edge_row_ptr = edge_col = edge_row = None
    if keep_edges:
        order = np.lexsort((cols, rows))  # row-major (segment ops expect
        # indices_are_sorted; ops/attention.segment_softmax)
        edge_row = jnp.asarray(rows[order].astype(np.int32))
        edge_col = jnp.asarray(cols[order].astype(np.int32))
        counts = np.bincount(rows, minlength=n).astype(np.int64)
        edge_row_ptr = jnp.asarray(
            np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    flat = tuple(jnp.asarray(a) for a in
                 flat_fwd_map(fwd_count, fwd_col, fwd_tile))
    return BCSRGraph(
        tiles=jnp.asarray(tiles),
        fwd_count=jnp.asarray(fwd_count),
        fwd_col=jnp.asarray(fwd_col),
        fwd_tile=jnp.asarray(fwd_tile),
        bwd_count=jnp.asarray(bwd_count),
        bwd_row=jnp.asarray(bwd_row),
        bwd_tile=jnp.asarray(bwd_tile),
        n_nodes=n, n_pad=n_pad, bm=bm, bn=bn,
        n_edges=int(rows.shape[0]) if n_edges is None else int(n_edges),
        n_tiles=n_tiles,
        edge_row_ptr=edge_row_ptr, edge_col=edge_col, edge_row=edge_row,
        fwd_flat=flat,
    )


def bcsr_from_scipy(sp_mat: Any, *, bm: int = DEF_BM, bn: int = DEF_BN) -> BCSRGraph:
    m = sp_mat.tocoo().astype(bool)
    m.sum_duplicates()
    return bcsr_from_coo(m.row, m.col, m.shape[0], bm=bm, bn=bn)


def bcsr_from_dense(graph: DenseGraph | np.ndarray, *, bm: int = DEF_BM,
                    bn: int = DEF_BN) -> BCSRGraph:
    a = np.asarray(jax.device_get(graph.adj if isinstance(graph, DenseGraph)
                                  else graph)) != 0
    rows, cols = np.nonzero(a)
    return bcsr_from_coo(rows, cols, a.shape[0], bm=bm, bn=bn)


def bcsr_from_csr(csr: CSRGraph, *, bm: int = DEF_BM, bn: int = DEF_BN) -> BCSRGraph:
    rows = np.asarray(jax.device_get(csr.row_idx))[: csr.n_edges]
    cols = np.asarray(jax.device_get(csr.col_idx))[: csr.n_edges]
    return bcsr_from_coo(rows, cols, csr.n_nodes, bm=bm, bn=bn)
