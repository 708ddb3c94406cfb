"""Gaussian clustering for gated evaluation (`aku/gcluster.cc`).

Produces the .gcl clustering file (first line: cluster count; then
``gauss_index cluster_index`` pairs, `aku/Distributions.cc:3114-3147`
read_clustering) used to evaluate only the Gaussians of the top-scoring
clusters (`decode-stream.cc:113-117`, eval-ming).

The reference clusters agglomeratively with KL criteria; here a weighted
k-means over pool means (occupancy-weighted, KL-insensitive init) gives
the same artifact at a fraction of the cost — on TPU the clustering only
gates work, it does not change results.
"""

from __future__ import annotations

import numpy as np


def cluster_gaussians(means: np.ndarray, num_clusters: int,
                      weights: np.ndarray | None = None,
                      iters: int = 25, seed: int = 0) -> np.ndarray:
    """[G] cluster assignment via weighted k-means++-style clustering."""
    G = means.shape[0]
    C = min(num_clusters, G)
    rng = np.random.default_rng(seed)
    w = np.ones(G) if weights is None else np.maximum(weights, 1e-8)

    # k-means++ init
    centers = [means[rng.integers(G)]]
    d2 = np.sum((means - centers[0]) ** 2, axis=1)
    for _ in range(1, C):
        p = d2 * w
        p = p / p.sum() if p.sum() > 0 else np.full(G, 1.0 / G)
        centers.append(means[rng.choice(G, p=p)])
        d2 = np.minimum(d2, np.sum((means - centers[-1]) ** 2, axis=1))
    centers = np.stack(centers)

    assign = np.zeros(G, dtype=np.int32)
    for _ in range(iters):
        d = ((means[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        new_assign = np.argmin(d, axis=1).astype(np.int32)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for c in range(C):
            m = assign == c
            if m.any():
                ww = w[m] / w[m].sum()
                centers[c] = ww @ means[m]
    return assign


def write_gcl(path, assign: np.ndarray, num_clusters: int) -> None:
    with open(path, "w") as f:
        f.write(f"{num_clusters}\n")
        for g, c in enumerate(assign):
            f.write(f"{g} {int(c)}\n")


def read_gcl(path) -> tuple[np.ndarray, int]:
    with open(path) as f:
        tokens = f.read().split()
    num_clusters = int(tokens[0])
    pairs = np.asarray(tokens[1:], dtype=np.int64).reshape(-1, 2)
    G = int(pairs[:, 0].max()) + 1 if len(pairs) else 0
    assign = np.zeros(G, dtype=np.int32)
    assign[pairs[:, 0]] = pairs[:, 1]
    return assign, num_clusters
