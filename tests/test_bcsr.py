"""BCSRGraph (tile-list) container: builder roundtrip, block-map padding
conventions, tile-geometry legality, and flash parity on it across tile
shapes (SURVEY.md §4.1; VERDICT round-1 item 2 — no dense N² dependence)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from han_tpu.graph.bcsr import BCSRGraph, bcsr_from_coo, bcsr_from_scipy, pick_tiles
from han_tpu.graph.containers import dense_from_numpy
from han_tpu.ops.attention import dense_attention
from han_tpu.ops.pallas.flash_gat import flash_gat_attention


def random_adj(n, density, seed, empty_rows=()):
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < density).astype(np.float32)
    np.fill_diagonal(a, 1.0)
    for r in empty_rows:
        a[r, :] = 0.0
    return a


def bcsr_to_dense(g: BCSRGraph) -> np.ndarray:
    """Reassemble the adjacency from the tile list via the forward map."""
    tiles = np.asarray(g.tiles)
    out = np.zeros((g.n_pad, g.n_pad), np.int8)
    fc = np.asarray(g.fwd_count)
    col = np.asarray(g.fwd_col)
    tid = np.asarray(g.fwd_tile)
    for rb in range(g.nb_r):
        for j in range(int(fc[rb])):
            out[rb * g.bm:(rb + 1) * g.bm,
                col[rb, j] * g.bn:(col[rb, j] + 1) * g.bn] = tiles[tid[rb, j]]
    return out


@pytest.mark.parametrize("n,bm,bn", [(200, 128, 128), (600, 128, 256),
                                     (300, 256, 128)])
def test_roundtrip_and_maps(n, bm, bn):
    a = random_adj(n, 0.05, seed=n, empty_rows=(3, n - 1))
    g = bcsr_from_scipy(sp.csr_matrix(a), bm=bm, bn=bn)
    assert g.n_pad % g.bm == 0 and g.n_pad % g.bn == 0
    re = bcsr_to_dense(g)
    np.testing.assert_array_equal(re[:n, :n], a.astype(np.int8))
    assert re[n:, :].sum() == 0 and re[:, n:].sum() == 0
    # backward map covers exactly the same tiles
    seen = set()
    bc, br, bt = (np.asarray(g.bwd_count), np.asarray(g.bwd_row),
                  np.asarray(g.bwd_tile))
    for cb in range(g.nb_c):
        rows = br[cb, : bc[cb]]
        assert (np.diff(rows) > 0).all()  # ascending row blocks
        seen.update((int(r), cb) for r in rows)
    fc, fcol = np.asarray(g.fwd_count), np.asarray(g.fwd_col)
    fwd_seen = {(rb, int(c)) for rb in range(g.nb_r)
                for c in fcol[rb, : fc[rb]]}
    assert seen == fwd_seen and len(seen) == g.n_tiles
    # map padding repeats the last active entry (DMA-skip convention)
    for rb in range(g.nb_r):
        c = int(fc[rb])
        if 0 < c < g.c_max:
            assert (fcol[rb, c:] == fcol[rb, c - 1]).all()


def test_empty_graph_and_empty_blocks():
    g = bcsr_from_coo(np.array([], np.int64), np.array([], np.int64), 150)
    assert g.n_tiles == 0 and g.n_edges == 0
    assert int(np.asarray(g.fwd_count).sum()) == 0
    # one edge in the last tile only
    g2 = bcsr_from_coo(np.array([149]), np.array([149]), 150, bm=128, bn=128)
    assert g2.n_tiles == 1
    assert int(np.asarray(g2.fwd_count)[0]) == 0  # first row block empty


def test_pick_tiles_rules():
    # bn must be <= 512 or a multiple of 512 (kernel strip width)
    for n in (100, 600, 1500, 3025, 8192):
        bm, bn, n_pad = pick_tiles(n)
        assert n_pad % bm == 0 and n_pad % bn == 0 and n_pad >= n
        assert bn <= 512 or bn % 512 == 0
    # the round-1 advisor crash sizes must now be legal
    assert pick_tiles(600)[2] % pick_tiles(600)[0] == 0
    assert pick_tiles(1500)[2] % pick_tiles(1500)[1] == 0


@pytest.mark.parametrize("n,bm,bn", [(600, 128, 256), (300, 256, 128),
                                     (200, 128, 128)])
def test_flash_on_bcsr_matches_dense(n, bm, bn):
    """Advisor-high regression: these mixed tile/padding geometries crashed
    the round-1 dense-map kernel; the BCSR kernel must be exact on them."""
    a = random_adj(n, 0.04, seed=7 * n, empty_rows=(0,))
    rng = np.random.default_rng(1)
    k, d = 3, 8
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ref = dense_attention(dense_from_numpy(a, add_self_loops=False), fts, ld, ls)
    g = bcsr_from_scipy(sp.csr_matrix(a), bm=bm, bn=bn)
    out = flash_gat_attention(g, fts, ld, ls)
    # edgeless rows: flash yields the sparse-spec 0, the dense oracle a
    # uniform softmax over -1e9 — compare only rows with edges
    has_edge = a.sum(axis=1) > 0
    np.testing.assert_array_equal(np.asarray(out)[0], 0.0)
    np.testing.assert_allclose(np.asarray(out)[has_edge],
                               np.asarray(ref)[has_edge],
                               atol=2e-5, rtol=2e-5)


def test_occupancy_scales_storage():
    """Block-diagonal community graph: storage ∝ occupied tiles, far below
    the dense tile grid."""
    n, b = 1024, 128
    blocks = [np.ones((b, b), np.float32) for _ in range(n // b)]
    a = sp.block_diag(blocks).tocsr()
    g = bcsr_from_scipy(a, bm=128, bn=128)
    assert g.n_tiles == n // b            # diagonal tiles only
    assert g.occupancy() == (n // b) / (8 * 8)
    assert g.tiles.shape[0] == g.n_tiles  # no dense N² array anywhere


def test_edge_view_roundtrip():
    """keep_edges=True stores a row-sorted edge view whose as_csr() is the
    same graph in CSR form (drives the auto-dispatch csr path)."""
    a = random_adj(300, 0.04, seed=9, empty_rows=(0, 17))
    g = bcsr_from_scipy(sp.csr_matrix(a), bm=128, bn=128)
    csr = g.as_csr()
    rows, cols = np.asarray(csr.row_idx), np.asarray(csr.col_idx)
    re = np.zeros_like(a)
    re[rows, cols] = 1.0
    np.testing.assert_array_equal(re, a)
    rp = np.asarray(csr.row_ptr)
    np.testing.assert_array_equal(np.diff(rp), a.sum(axis=1).astype(np.int64))
    assert (np.diff(rows) >= 0).all()  # row-sorted (segment-op precondition)


def test_auto_dispatch_by_tile_density(monkeypatch):
    """impl='auto' on BCSR picks flash while swept tile elements per edge
    stay under the measured crossover, and the csr edge view beyond it
    (results/CROSSOVER_r4.md; VERDICT r3 missing #1)."""
    import han_tpu.ops.attention as A
    import han_tpu.ops.pallas.flash_gat as FG

    calls = []
    real_csr, real_flash = A.csr_attention, FG.flash_gat_attention
    monkeypatch.setattr(
        A, "csr_attention",
        lambda *a, **k: (calls.append("csr"), real_csr(*a, **k))[1])
    monkeypatch.setattr(
        FG, "flash_gat_attention",
        lambda *a, **k: (calls.append("flash"), real_flash(*a, **k))[1])

    rng = np.random.default_rng(0)
    n, k, d = 256, 2, 4
    fts = jnp.asarray(rng.standard_normal((n, k, d)).astype(np.float32))
    ld = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    # dense block in one tile: elems_per_edge = 16384/800 ≈ 20 → flash
    a = np.zeros((n, n), np.float32)
    a[:128, :128] = (rng.random((128, 128)) < 0.05)
    np.fill_diagonal(a, 1.0)
    g_dense = bcsr_from_scipy(sp.csr_matrix(a), bm=128, bn=128)
    assert g_dense.elems_per_edge() < A.FLASH_MAX_ELEMS_PER_EDGE
    out_dense_tiles = A.attention_aggregate(g_dense, fts, ld, ls, impl="auto")
    assert calls == ["flash"]

    # scattered: every edge its own tile → elems_per_edge = 16384 → csr
    scat = np.zeros((n, n), np.float32)
    er = np.repeat(np.arange(2), 2) * 128 + 5   # 4 edges, 4 distinct tiles
    ec = np.tile(np.arange(2), 2) * 128 + 7
    scat[er, ec] = 1.0
    g_scat = bcsr_from_scipy(sp.csr_matrix(scat), bm=128, bn=128)
    assert g_scat.elems_per_edge() > A.FLASH_MAX_ELEMS_PER_EDGE
    calls.clear()
    out_scat = A.attention_aggregate(g_scat, fts, ld, ls, impl="auto")
    assert calls == ["csr"]

    # keep_edges=False: no edge view → flash regardless of density
    g_noedges = bcsr_from_coo(er, ec, n, bm=128, bn=128,
                              keep_edges=False)
    calls.clear()
    A.attention_aggregate(g_noedges, fts, ld, ls, impl="auto")
    assert calls == ["flash"]

    # geometry-aware threshold (VERDICT r4 #4): the SAME graph at
    # ~3000 swept elems/edge dispatches to csr at (512, 512) tiles
    # (threshold 2000, CROSSOVER_r4) but to flash at the default
    # (512, 2048) tiles (threshold 5500, CROSSOVER_r5_bn2048 — wide
    # tiles amortize the per-grid-step cost)
    n2 = 2048
    rng2 = np.random.default_rng(1)
    sc = sp.coo_matrix(
        (np.ones(1400, np.float32),
         (rng2.integers(0, n2, 1400), rng2.integers(0, n2, 1400))),
        shape=(n2, n2)).tocsr()
    fts2 = jnp.asarray(rng2.standard_normal((n2, k, d)).astype(np.float32))
    ld2 = jnp.asarray(rng2.standard_normal((n2, k)).astype(np.float32))
    ls2 = jnp.asarray(rng2.standard_normal((n2, k)).astype(np.float32))
    g_narrow = bcsr_from_scipy(sc, bm=512, bn=512)
    g_wide = bcsr_from_scipy(sc, bm=512, bn=2048)
    assert (A.flash_csr_threshold(512, 512)
            < g_narrow.elems_per_edge() < A.flash_csr_threshold(512, 2048))
    assert (A.flash_csr_threshold(512, 512)
            < g_wide.elems_per_edge() < A.flash_csr_threshold(512, 2048))
    calls.clear()
    A.attention_aggregate(g_narrow, fts2, ld2, ls2, impl="auto")
    assert calls == ["csr"]
    calls.clear()
    A.attention_aggregate(g_wide, fts2, ld2, ls2, impl="auto")
    assert calls == ["flash"]

    # flash dispatch agrees with the dense oracle (no empty rows there)...
    ref_dense = dense_attention(dense_from_numpy(a), fts, ld, ls)
    np.testing.assert_allclose(np.asarray(out_dense_tiles),
                               np.asarray(ref_dense), rtol=1e-5, atol=1e-5)
    # ...and the csr dispatch equals flash on the SAME container (the
    # sparse spec: edgeless rows produce exactly 0, unlike the dense
    # oracle's uniform softmax)
    ref_scat = A.attention_aggregate(g_scat, fts, ld, ls, impl="flash")
    np.testing.assert_allclose(np.asarray(out_scat), np.asarray(ref_scat),
                               rtol=1e-5, atol=1e-5)
