"""LDA transform estimation (`aku/lda.cc`).

Class-discriminant linear transform over (usually context-spliced)
features: classes are tied states from alignments; solve the generalized
eigenproblem of between-class vs within-class scatter and keep the top
``out_dim`` directions as a lin_transform matrix.
"""

from __future__ import annotations

import numpy as np


class LdaAccumulator:
    def __init__(self, num_classes: int, dim: int):
        self.counts = np.zeros(num_classes)
        self.sums = np.zeros((num_classes, dim))
        self.total_sq = np.zeros((dim, dim))
        self.total = np.zeros(dim)
        self.n = 0.0

    def add(self, cls: int, feats: np.ndarray) -> None:
        feats = np.atleast_2d(feats)
        self.counts[cls] += feats.shape[0]
        self.sums[cls] += feats.sum(0)
        self.total_sq += feats.T @ feats
        self.total += feats.sum(0)
        self.n += feats.shape[0]

    def solve(self, out_dim: int) -> np.ndarray:
        """[out_dim, D] LDA matrix (rows = discriminant directions)."""
        D = self.total.shape[0]
        gmean = self.total / max(self.n, 1e-10)
        St = self.total_sq / max(self.n, 1e-10) - np.outer(gmean, gmean)
        Sb = np.zeros((D, D))
        for c in range(len(self.counts)):
            if self.counts[c] <= 0:
                continue
            mc = self.sums[c] / self.counts[c] - gmean
            Sb += (self.counts[c] / self.n) * np.outer(mc, mc)
        Sw = St - Sb + 1e-6 * np.eye(D)
        # generalized eig: Sw^-1 Sb
        vals, vecs = np.linalg.eig(np.linalg.solve(Sw, Sb))
        order = np.argsort(-vals.real)
        W = vecs[:, order[:out_dim]].real.T
        # normalize rows to unit within-class variance
        for r in range(W.shape[0]):
            v = W[r] @ Sw @ W[r]
            if v > 0:
                W[r] /= np.sqrt(v)
        return W
