"""Seeded synthetic heterogeneous graph generators.

Two roles:

1. **Fixture graphs** standing in for the missing ACM3025 ``.mat`` blob
   (reference ``.MISSING_LARGE_BLOBS``): same shapes/splits as the real
   dataset, with planted community structure so the semi-supervised task is
   learnable and accuracy targets are meaningful.
2. **Scale benchmarks**: power-law heterogeneous graphs up to the
   BASELINE.json synthetic 100M-edge config, generated shard-by-shard so the
   host never materializes more than one partition.

Everything is deterministic in the given seed (no wall-clock entropy).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from han_tpu.graph.build import symmetric_metapath


@dataclasses.dataclass
class HeteroDataset:
    """In-memory heterogeneous node-classification dataset (host arrays)."""

    metapath_adjs: list[sp.csr_matrix]  # P square N×N meta-path graphs (no self-loops implied)
    features: np.ndarray  # float32[N, F]
    labels: np.ndarray  # float32[N, C] one-hot
    train_mask: np.ndarray  # bool[N]
    val_mask: np.ndarray
    test_mask: np.ndarray
    name: str = "synthetic"
    metapath_names: tuple[str, ...] = ()

    @property
    def n_nodes(self) -> int:
        return int(self.features.shape[0])

    @property
    def n_classes(self) -> int:
        return int(self.labels.shape[1])


def planted_hetero(
    *,
    n_nodes: int = 3025,
    n_feats: int = 1870,
    n_classes: int = 3,
    n_metapaths: int = 2,
    avg_degree: float = 10.0,
    homophily: float = 0.85,
    feat_signal: float = 1.5,
    train_per_class: int = 200,
    n_val: int = 300,
    seed: int = 0,
    name: str = "synthetic",
) -> HeteroDataset:
    """Planted-partition heterogeneous graph: each meta-path is an SBM whose
    in-community edge probability dominates, features are a noisy bag-of-words
    with class-specific active dimensions.

    Defaults mirror the ACM3025 shape (3025 nodes / 1870 feats / 3 classes /
    2 meta-paths / 600-300-2125 split — han.pdf Table 2).
    """
    rng = np.random.default_rng(seed)
    y = rng.integers(0, n_classes, size=n_nodes)

    adjs = []
    for p in range(n_metapaths):
        # per-metapath homophily varies a bit so semantic attention has signal
        h = homophily if p == 0 else max(0.55, homophily - 0.2 * p)
        p_in = avg_degree * h / (n_nodes / n_classes)
        p_out = avg_degree * (1 - h) / (n_nodes * (n_classes - 1) / n_classes)
        # sample edges blockwise
        rows, cols = [], []
        n_try = int(n_nodes * avg_degree * 2.5)
        src = rng.integers(0, n_nodes, size=n_try)
        dst = rng.integers(0, n_nodes, size=n_try)
        same = y[src] == y[dst]
        keep_prob = np.where(same, p_in * n_nodes / avg_degree / 2.5, p_out * n_nodes / avg_degree / 2.5)
        keep = rng.random(n_try) < np.clip(keep_prob, 0, 1)
        rows.append(src[keep])
        cols.append(dst[keep])
        r = np.concatenate(rows)
        c = np.concatenate(cols)
        a = sp.coo_matrix((np.ones_like(r, dtype=np.float32), (r, c)), shape=(n_nodes, n_nodes))
        a = ((a + a.T) > 0).astype(np.float32).tocsr()
        a.setdiag(0)
        a.eliminate_zeros()
        adjs.append(a)

    # class-structured sparse features
    feats = (rng.random((n_nodes, n_feats)) < 0.02).astype(np.float32)
    block = n_feats // n_classes
    for cidx in range(n_classes):
        members = np.where(y == cidx)[0]
        lo, hi = cidx * block, (cidx + 1) * block
        boost = (rng.random((members.shape[0], hi - lo)) < 0.02 * feat_signal).astype(np.float32)
        feats[members[:, None], np.arange(lo, hi)[None, :]] += boost
    feats = np.minimum(feats, 1.0)

    labels = np.zeros((n_nodes, n_classes), dtype=np.float32)
    labels[np.arange(n_nodes), y] = 1.0

    train_mask = np.zeros(n_nodes, dtype=bool)
    for cidx in range(n_classes):
        members = np.where(y == cidx)[0]
        pick = rng.permutation(members)[:train_per_class]
        train_mask[pick] = True
    rest = np.where(~train_mask)[0]
    rest = rng.permutation(rest)
    val_mask = np.zeros(n_nodes, dtype=bool)
    val_mask[rest[:n_val]] = True
    test_mask = np.zeros(n_nodes, dtype=bool)
    test_mask[rest[n_val:]] = True

    return HeteroDataset(
        metapath_adjs=adjs,
        features=feats,
        labels=labels,
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
        name=name,
        metapath_names=tuple(f"MP{p}" for p in range(n_metapaths)),
    )


def powerlaw_bipartite(
    n_left: int,
    n_right: int,
    n_edges: int,
    *,
    alpha: float = 1.5,
    seed: int = 0,
) -> sp.csr_matrix:
    """Power-law bipartite incidence (e.g. paper→author) for scale tests.

    Right-node popularity follows a Zipf-like distribution with exponent
    ``alpha`` — models the degree skew called out in SURVEY.md §7 (conference
    nodes with ~14k papers in DBLP APCPA).
    """
    rng = np.random.default_rng(seed)
    popularity = 1.0 / np.arange(1, n_right + 1, dtype=np.float64) ** alpha
    popularity /= popularity.sum()
    src = rng.integers(0, n_left, size=n_edges)
    dst = rng.choice(n_right, size=n_edges, p=popularity)
    m = sp.coo_matrix(
        (np.ones(n_edges, dtype=np.float32), (src, dst)), shape=(n_left, n_right)
    ).tocsr()
    m.sum_duplicates()
    m.data = np.ones_like(m.data)
    return m


def powerlaw_hetero(
    *,
    n_nodes: int = 100_000,
    n_feats: int = 128,
    n_classes: int = 8,
    edges_per_metapath: int = 2_000_000,
    n_metapaths: int = 2,
    seed: int = 0,
) -> HeteroDataset:
    """Large synthetic heterogeneous graph via meta-path composition over
    power-law bipartite incidences (the BASELINE.json 100M-edge config scaled
    by arguments)."""
    rng = np.random.default_rng(seed)
    adjs = []
    for p in range(n_metapaths):
        n_mid = max(64, n_nodes // (8 * (p + 1)))
        inc = powerlaw_bipartite(
            n_nodes, n_mid, edges_per_metapath // 4, alpha=1.2 + 0.2 * p, seed=seed + 13 * p
        )
        a = symmetric_metapath(inc)
        a.setdiag(0)
        a.eliminate_zeros()
        adjs.append(a)
    y = rng.integers(0, n_classes, size=n_nodes)
    feats = rng.standard_normal((n_nodes, n_feats)).astype(np.float32)
    labels = np.zeros((n_nodes, n_classes), dtype=np.float32)
    labels[np.arange(n_nodes), y] = 1.0
    train_mask = rng.random(n_nodes) < 0.1
    val_mask = (~train_mask) & (rng.random(n_nodes) < 0.1)
    test_mask = ~(train_mask | val_mask)
    return HeteroDataset(
        metapath_adjs=adjs,
        features=feats,
        labels=labels,
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
        name="powerlaw",
        metapath_names=tuple(f"PL{p}" for p in range(n_metapaths)),
    )
