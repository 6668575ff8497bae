"""Downstream embedding evaluation: KNN classification + KMeans clustering.

Reference: jhyexp.py:20-52 (``my_KNN``) and :54-86 (``my_Kmeans``). Fixed
here (SURVEY.md §7 defect list): cluster count defaults to the true number
of classes instead of the hard-coded 4, and the broken ``jhyexps`` import
(ex_acm3025.py:288) does not exist — this module is the real import path.
"""

from __future__ import annotations

import numpy as np
from sklearn.cluster import KMeans
from sklearn.metrics import (
    adjusted_rand_score,
    f1_score,
    normalized_mutual_info_score,
    silhouette_score,
)
from sklearn.neighbors import KNeighborsClassifier


def knn_eval(
    x: np.ndarray,
    y: np.ndarray,
    *,
    k: int = 5,
    split_list=(0.2, 0.4, 0.6, 0.8),
    repeats: int = 10,
    seed: int = 0,
) -> dict[str, float]:
    """k-NN classification over the frozen embedding at several train
    fractions, averaged over shuffled repeats; returns
    {'macro_f1@0.2': ..., 'micro_f1@0.2': ..., ...}."""
    x = np.asarray(x)
    y = np.asarray(y)
    if y.ndim > 1:
        y = np.argmax(y, axis=1)
    rng = np.random.default_rng(seed)
    out: dict[str, float] = {}
    for frac in split_list:
        split = int(x.shape[0] * frac)
        macro, micro = [], []
        for _ in range(repeats):
            perm = rng.permutation(x.shape[0])
            xp, yp = x[perm], y[perm]
            est = KNeighborsClassifier(n_neighbors=k)
            est.fit(xp[:split], yp[:split])
            pred = est.predict(xp[split:])
            macro.append(f1_score(yp[split:], pred, average="macro"))
            micro.append(f1_score(yp[split:], pred, average="micro"))
        out[f"macro_f1@{frac}"] = float(np.mean(macro))
        out[f"micro_f1@{frac}"] = float(np.mean(micro))
    return out


def kmeans_eval(
    x: np.ndarray,
    y: np.ndarray,
    *,
    n_clusters: int | None = None,
    repeats: int = 10,
    seed: int = 0,
    with_silhouette: bool = False,
) -> dict[str, float]:
    """KMeans clustering of the embedding; NMI + ARI averaged over repeats.
    ``n_clusters`` defaults to the number of distinct labels.
    ``with_silhouette`` adds the euclidean silhouette score of the cluster
    assignment (the data/exp.py:25-63 ``my_Kmeans`` variant)."""
    x = np.asarray(x)
    y = np.asarray(y)
    if y.ndim > 1:
        y = np.argmax(y, axis=1)
    k = int(n_clusters or len(np.unique(y)))
    nmi, ari, sil = [], [], []
    for r in range(repeats):
        est = KMeans(n_clusters=k, n_init=10, random_state=seed + r)
        pred = est.fit_predict(x)
        nmi.append(normalized_mutual_info_score(y, pred))
        ari.append(adjusted_rand_score(y, pred))
        if with_silhouette:
            sil.append(silhouette_score(x, pred, metric="euclidean"))
    out = {"nmi": float(np.mean(nmi)), "ari": float(np.mean(ari))}
    if with_silhouette:
        out["silhouette"] = float(np.mean(sil))
    return out
