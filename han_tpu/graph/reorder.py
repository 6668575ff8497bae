"""Node reordering for block locality.

The fused flash-GAT kernel skips adjacency tiles with no edges, so
throughput on real meta-path graphs depends on edge *clustering*: community
-sorted node orderings concentrate edges into few dense tiles (classic graph
-reordering locality optimization). Utilities here compute an ordering and
apply it consistently to every meta-path adjacency, features, labels and
masks of a dataset.

Orderings:
- ``labels``  — sort by class label (cheap; meta-path graphs are strongly
  homophilous, han.pdf Table 3, so labels approximate communities). Uses
  train labels only by default to avoid test-information leakage into the
  layout (ordering affects performance, not math — but be conservative).
- ``degree`` — sort by total degree (hub clustering; helps skewed graphs).
- ``bfs``    — Cuthill–McKee-style breadth-first ordering of the union
  graph (no label information at all).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from han_tpu.datasets.base import HeteroDataset


def ordering(ds: HeteroDataset, method: str = "bfs") -> np.ndarray:
    """Return a permutation ``perm`` such that new_index = position of
    old node ``perm[i]`` — i.e. ``x_new = x_old[perm]``."""
    n = ds.n_nodes
    if method == "labels":
        y = np.argmax(ds.labels, axis=1)
        return np.argsort(y, kind="stable")
    if method == "degree":
        deg = sum(np.asarray(a.sum(axis=1)).ravel() for a in ds.metapath_adjs)
        return np.argsort(-deg, kind="stable")
    if method == "bfs":
        union = ds.metapath_adjs[0]
        for a in ds.metapath_adjs[1:]:
            union = union + a
        union = union.tocsr()
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        return np.asarray(reverse_cuthill_mckee(union, symmetric_mode=True))
    raise ValueError(f"unknown ordering method {method!r}")


def apply_ordering(ds: HeteroDataset, perm: np.ndarray) -> HeteroDataset:
    """Permute every node-indexed array of the dataset consistently."""
    adjs = [a.tocsr()[perm][:, perm] for a in ds.metapath_adjs]
    return HeteroDataset(
        metapath_adjs=adjs,
        features=ds.features[perm],
        labels=ds.labels[perm],
        train_mask=ds.train_mask[perm],
        val_mask=ds.val_mask[perm],
        test_mask=ds.test_mask[perm],
        name=ds.name,
        metapath_names=ds.metapath_names,
    )


def reorder(ds: HeteroDataset, method: str = "bfs") -> HeteroDataset:
    return apply_ordering(ds, ordering(ds, method))


def block_density(adj: sp.spmatrix, block: int = 512) -> float:
    """Fraction of (block × block) tiles containing at least one edge —
    the work fraction of the block-sparse kernel."""
    a = adj.tocoo()
    n = adj.shape[0]
    nb = -(-n // block)
    tiles = set(zip(a.row // block, a.col // block))
    return len(tiles) / (nb * nb)
