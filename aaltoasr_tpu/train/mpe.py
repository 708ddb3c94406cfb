"""MPE/MPFE discriminative statistics (minimum phone/frame error).

Reference: `aku/SegErrorEvaluator.{hh,cc}` custom path scores over
segmented lattices + `aku/HmmNetBaumWelch.hh:294` compute_custom_path_
scores, feeding MPE_NUM/MPE_DEN accumulators (`aku/stats.cc --mpe`).

This implements the frame-synchronous MPFE_PDF error mode (local
accuracy c[t, p] = 1 when position p's pdf equals the reference
alignment's pdf at frame t — SegErrorEvaluator::MPFE_PDF), which maps
exactly onto our arc-synchronous lattices: every position consumes one
frame.  Expected accuracies propagate with a first-order expectation
semiring alongside the standard forward-backward:

    A[t,p] = sum_f u_f A[t-1,src_f] + c[t,p]   (u = arrival posteriors)
    B[t,p] = sum_f v_f (B[t+1,tgt_f] + c[t+1,tgt_f])
    gamma_mpe[t,p] = gamma[t,p] * (A[t,p] + B[t,p] - C_avg)

Positive parts accumulate into the MPE numerator buffer, negative parts
into the denominator; the EBW M-step (train.ebw, mode='mpe') consumes
them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aaltoasr_tpu.ops.logsemiring import LOG_ZERO, logsumexp
from aaltoasr_tpu.train import estep

_F32 = jax.lax.Precision.HIGHEST


def mpe_forward_backward(obs_pos, graph, n_frames, accuracy):
    """FB with expected-accuracy propagation.

    accuracy: [T, P] local accuracies c[t, p].
    Returns (gamma, gamma_mpe [T, P], total_ll, avg_accuracy).
    """
    T, P = obs_pos.shape
    in_src, in_logp = graph["in_src"], graph["in_logp"]
    out_tgt, out_logp = graph["out_tgt"], graph["out_logp"]

    valid = jnp.arange(T) < n_frames
    entry = estep._entry(graph, P)
    final = estep._final(graph, P)

    alpha0 = jnp.maximum(obs_pos[0] + entry, LOG_ZERO)
    A0 = accuracy[0]

    def fwd(carry, xs):
        alpha, A = carry
        obs_t, acc_t, v = xs
        contrib = alpha[in_src] + in_logp                 # [P, F]
        new_alpha = logsumexp(contrib, axis=1) + obs_t
        new_alpha = jnp.maximum(new_alpha, LOG_ZERO)
        # arrival posteriors per in-arc
        u = jnp.exp(jnp.maximum(
            contrib - (new_alpha - obs_t)[:, None], -80.0))
        new_A = jnp.sum(u * A[in_src], axis=1) + acc_t
        new_alpha = jnp.where(v, new_alpha, alpha)
        new_A = jnp.where(v, new_A, A)
        return (new_alpha, new_A), (alpha, A)

    (alpha_T, A_T), (alphas_prev, As_prev) = jax.lax.scan(
        fwd, (alpha0, A0), (obs_pos[1:], accuracy[1:], valid[1:]))
    alphas = jnp.concatenate([alphas_prev, alpha_T[None]], axis=0)
    As = jnp.concatenate([As_prev, A_T[None]], axis=0)

    total = logsumexp(alpha_T + final, axis=0)
    gamma_last = jnp.exp(jnp.maximum(alpha_T + final - total, -80.0))
    avg_acc = jnp.sum(gamma_last * A_T)

    beta_last = final
    B_last = jnp.zeros((P,), jnp.float32)

    def bwd(carry, xs):
        beta, B = carry
        obs_next, acc_next, v = xs
        contrib = out_logp + obs_next[out_tgt] + beta[out_tgt]  # [P, F]
        new_beta = jnp.maximum(logsumexp(contrib, axis=1), LOG_ZERO)
        w = jnp.exp(jnp.maximum(contrib - new_beta[:, None], -80.0))
        new_B = jnp.sum(w * (B[out_tgt] + acc_next[out_tgt]), axis=1)
        new_beta = jnp.where(v, new_beta, beta)
        new_B = jnp.where(v, new_B, B)
        return (new_beta, new_B), (new_beta, new_B)

    (_, _), (betas_head, Bs_head) = jax.lax.scan(
        bwd, (beta_last, B_last),
        (obs_pos[1:], accuracy[1:], valid[1:]), reverse=True)
    betas = jnp.concatenate([betas_head, beta_last[None]], axis=0)
    Bs = jnp.concatenate([Bs_head, B_last[None]], axis=0)

    gamma = jnp.exp(jnp.maximum(alphas + betas - total, -80.0))
    gamma = gamma * valid[:, None]
    gamma_mpe = gamma * (As + Bs - avg_acc)
    return gamma, gamma_mpe, total, avg_acc


def gamma_to_stats(scorer, features, graph, gamma):
    """Sufficient statistics from an arbitrary [T, P] occupancy matrix
    (the accumulation half of estep.chain_stats, reusable for MPE)."""
    pdf = graph["pdf"]
    T = features.shape[0]
    P = pdf.shape[0]
    K = scorer.comp_idx.shape[1]
    Gp = scorer.score_matrix.shape[1]
    Sp = scorer.comp_idx.shape[0]

    gll = scorer.gaussian_log_likelihoods(features)
    sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw, axis=-1)
    state_obs = sll[:, pdf]
    cidx = scorer.comp_idx[pdf]
    clogw = scorer.comp_logw[pdf]
    log_resp = clogw[None] + gll[:, cidx] - state_obs[:, :, None]
    R = gamma[:, :, None] * jnp.exp(jnp.maximum(log_resp, -80.0))
    R_flat = R.reshape(T, P * K)
    g_flat = cidx.reshape(-1)
    c = jnp.sum(R_flat, axis=0)
    return {
        "gamma": jax.ops.segment_sum(c, g_flat, num_segments=Gp),
        "mean_acc": jax.ops.segment_sum(
            jnp.dot(R_flat.T, features, precision=_F32), g_flat,
            num_segments=Gp),
        "sec_acc": jax.ops.segment_sum(
            jnp.dot(R_flat.T, features * features, precision=_F32),
            g_flat, num_segments=Gp),
        "feacount": jax.ops.segment_sum(
            jnp.sum((R_flat > 1e-10).astype(jnp.int32), axis=0),
            g_flat, num_segments=Gp),
        "mix_gamma": jax.ops.segment_sum(
            c.reshape(P, K), pdf, num_segments=Sp),
    }


def mpe_stats(scorer, features, num_graph, den_graph, n_frames,
              num_trans_slots: int):
    """Full MPFE_PDF E-step for one utterance.

    1. Viterbi over the numerator graph -> reference pdf per frame.
    2. Accuracy-augmented FB over the denominator graph.
    3. Positive/negative MPE occupancies -> num/den statistics.

    Returns dict(num=..., den=..., log_likelihood, avg_accuracy).
    """
    T = features.shape[0]
    gll = scorer.gaussian_log_likelihoods(features)
    sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw, axis=-1)

    num_obs = sll[:, num_graph["pdf"]]
    if "obs_const" in num_graph:
        num_obs = num_obs + num_graph["obs_const"][None, :]
    path, _ = estep.masked_viterbi(num_obs, num_graph, n_frames)
    ref_pdf = num_graph["pdf"][path]                       # [T]

    den_obs = sll[:, den_graph["pdf"]]
    if "obs_const" in den_graph:
        den_obs = den_obs + den_graph["obs_const"][None, :]
    accuracy = (den_graph["pdf"][None, :]
                == ref_pdf[:, None]).astype(jnp.float32)
    valid = (jnp.arange(T) < n_frames).astype(jnp.float32)
    accuracy = accuracy * valid[:, None]

    gamma, gamma_mpe, total, avg_acc = mpe_forward_backward(
        den_obs, den_graph, n_frames, accuracy)
    num = gamma_to_stats(scorer, features, den_graph,
                         jnp.maximum(gamma_mpe, 0.0))
    den = gamma_to_stats(scorer, features, den_graph,
                         jnp.maximum(-gamma_mpe, 0.0))
    return {"num": num, "den": den, "log_likelihood": total,
            "avg_accuracy": avg_acc}
