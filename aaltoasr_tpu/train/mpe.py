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
              num_trans_slots: int, mode: str = "mpfe-pdf",
              membership=None):
    """Frame-error E-step for one utterance (modes mpfe-pdf /
    mpfe-cps / mpfe; SegErrorEvaluator.cc:180-214).

    1. Viterbi over the numerator graph -> reference pdf/phone per frame.
    2. Accuracy-augmented FB over the denominator graph.
    3. Positive/negative MPE occupancies -> num/den statistics.

    For mpfe-cps / mpfe the graphs must carry a "phone" array (model
    phone index per position) and `membership` the [n_phones, n_states]
    table from phone_membership().

    Returns dict(num=..., den=..., log_likelihood, avg_accuracy).
    """
    T = features.shape[0]
    gll = scorer.gaussian_log_likelihoods(features)
    sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw, axis=-1)

    num_obs = sll[:, num_graph["pdf"]]
    if "obs_const" in num_graph:
        num_obs = num_obs + num_graph["obs_const"][None, :]
    vit = (estep.masked_viterbi_shift if "sh_logp" in num_graph
           else estep.masked_viterbi)
    path, _ = vit(num_obs, num_graph, n_frames)
    ref_pdf = num_graph["pdf"][path]                       # [T]

    den_obs = sll[:, den_graph["pdf"]]
    if "obs_const" in den_graph:
        den_obs = den_obs + den_graph["obs_const"][None, :]
    if mode == "mpfe-pdf":
        accuracy = (den_graph["pdf"][None, :]
                    == ref_pdf[:, None]).astype(jnp.float32)
    else:
        ref_phone = num_graph["phone"][path]
        accuracy = frame_accuracy(mode, den_graph["pdf"],
                                  den_graph["phone"], ref_pdf,
                                  ref_phone, membership)
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


# ---------------------------------------------------------------------------
# Error modes (SegErrorEvaluator, aku/SegErrorEvaluator.{hh,cc})
#
# The reference implements 6 of its 9 enum modes (custom_score throws
# "not implemented" for MPFE_MONOPHONE_LABEL/STATE and
# MPFE_CONTEXT_LABEL, SegErrorEvaluator.cc:226-227):
#   frame-level:   mpfe-pdf, mpfe-cps, mpfe (= MPFE_HYP_CONTEXT_PHONE_
#                  STATE)  — local accuracy per (frame, position)
#   segment-level: mpe, mwe, snfe — accuracy per phone/word segment,
#                  computed here with a duration-augmented expectation
#                  semiring (state = (position, time-in-segment)).
# ---------------------------------------------------------------------------

def extract_center_phone(label: str) -> str:
    """Center phone of a context label (SegErrorEvaluator.cc:42-60)."""
    pos1 = label.rfind("-")
    pos2 = label.find("+")
    if pos2 < 0:
        pos2 = label.find(";", max(pos1, 0))
    if pos1 >= 0 and pos2 > pos1 + 1:
        temp = label[pos1 + 1:pos2]
    elif pos2 >= 0:
        temp = label[:pos2]
    elif pos1 >= 0:
        temp = label[pos1 + 1:]
    else:
        temp = label
    return temp if temp else label


def phone_membership(model) -> "np.ndarray":
    """[n_phones, n_states] bool: state s belongs to phone q."""
    import numpy as np
    S = model.num_states
    M = np.zeros((len(model.phones), S), dtype=bool)
    for q, phone in enumerate(model.phones):
        for s in phone.states:
            M[q, s] = True
    return M


def frame_accuracy(mode: str, hyp_pdf, hyp_phone, ref_pdf, ref_phone,
                   membership):
    """[T, P] local accuracies for the frame-level modes.

    mpfe-pdf: hyp pdf equals the reference pdf (MPFE_PDF).
    mpfe-cps: hyp pdf is A state of the reference's context phone
              (MPFE_CONTEXT_PHONE_STATE, SegErrorEvaluator.cc:189-200).
    mpfe:     reference pdf is a state of the hyp position's phone
              (MPFE_HYP_CONTEXT_PHONE_STATE, .cc:201-214).
    """
    if mode == "mpfe-pdf":
        return (hyp_pdf[None, :] == ref_pdf[:, None]).astype(jnp.float32)
    M = jnp.asarray(membership)
    if mode == "mpfe-cps":
        return M[ref_phone[:, None], hyp_pdf[None, :]].astype(jnp.float32)
    if mode == "mpfe":
        return M[hyp_phone[None, :], ref_pdf[:, None]].astype(jnp.float32)
    raise ValueError(f"unknown frame error mode {mode!r}")


def segment_accuracy_table(mode: str, ref_segs, n_frames: int,
                           max_dur: int, num_classes: int,
                           pad_frames: int | None = None):
    """ACC[t1, dur, c]: accuracy of a hypothesis segment of class c
    covering frames [t1-dur, t1).  Host NumPy (per utterance).

    ref_segs: list of (start, end, class) with end exclusive.
    mpe/mwe: max over overlapping refs of -1 + (1+same)*e/len_ref
    (SegErrorEvaluator.cc:154-177); snfe: sum over overlapping refs of
    -e/min(dur, len_ref) for mismatches (.cc:215-231).

    Rows past n_frames replicate row n_frames so frozen padded scan
    steps see the utterance-final accuracies.
    """
    import numpy as np
    Tp = (pad_frames if pad_frames is not None else n_frames)
    D = max_dur
    t1 = np.arange(Tp + 1)[:, None]           # [T+1, 1]
    dur = np.arange(D + 1)[None, :]           # [1, D+1] (index = dur)
    t0 = t1 - dur
    if mode in ("mpe", "mwe"):
        acc = np.full((Tp + 1, D + 1, num_classes), -1.0, np.float64)
    else:
        acc = np.zeros((Tp + 1, D + 1, num_classes), np.float64)
    for (rs, re, rc) in ref_segs:
        e = np.minimum(t1, re) - np.maximum(t0, rs)       # [T+1, D+1]
        e = np.maximum(e, 0).astype(np.float64)
        if mode in ("mpe", "mwe"):
            rlen = max(re - rs, 1)
            other = -1.0 + e / rlen
            same = -1.0 + 2.0 * e / rlen
            upd = np.where(e > 0, other, -np.inf)
            acc = np.maximum(acc, upd[:, :, None])
            upd_same = np.where(e > 0, same, -np.inf)
            acc[:, :, rc] = np.maximum(acc[:, :, rc], upd_same)
        else:  # snfe
            n = np.minimum(np.maximum(dur, 1), max(re - rs, 1))
            err = -e / n
            acc[:, :, :] += err[:, :, None]
            acc[:, :, rc] -= err                    # no error when same
    # dur = 0 is never a real segment
    acc[:, 0, :] = 0.0
    if n_frames < Tp:
        acc[n_frames + 1:] = acc[n_frames]
    return acc.astype(np.float32)


def mpe_forward_backward_seg(obs_pos, graph, n_frames, acc_table, cls,
                             max_dur: int):
    """Segment-accuracy FB: expectation semiring over the duration-
    augmented state (position, time-in-segment).

    obs_pos: [T, P]; acc_table: [T+1, D+1, C]; cls: [P] class per
    position; segments = maximal runs of graph["inst"].
    Returns (gamma [T, P], gamma_mpe [T, P], total, avg_accuracy).
    """
    T, P = obs_pos.shape
    D = max_dur
    in_src, in_logp = graph["in_src"], graph["in_logp"]
    out_tgt, out_logp = graph["out_tgt"], graph["out_logp"]
    inst = graph["inst"]
    pidx = jnp.arange(P)
    same_in = (inst[in_src] == inst[pidx][:, None]) \
        & (in_logp > LOG_ZERO / 2)                      # [P, F]
    cross_in = (inst[in_src] != inst[pidx][:, None]) \
        & (in_logp > LOG_ZERO / 2)
    same_out = (inst[out_tgt] == inst[pidx][:, None]) \
        & (out_logp > LOG_ZERO / 2)
    cross_out = (inst[out_tgt] != inst[pidx][:, None]) \
        & (out_logp > LOG_ZERO / 2)
    cls_src = cls[in_src]                                # [P, F]
    d_idx = jnp.arange(D)

    valid = jnp.arange(T) < n_frames
    entry = estep._entry(graph, P)
    alpha0 = jnp.full((P, D), LOG_ZERO, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(
        jnp.maximum(obs_pos[0] + entry, LOG_ZERO))
    A0 = jnp.zeros((P, D), jnp.float32)

    def exp_w(v, ref):
        return jnp.exp(jnp.maximum(v - ref, -80.0))

    def fwd(carry, xs):
        alpha, A = carry                       # [P, D]
        obs_t, acc_t, v = xs                   # acc_t: [D+1, C]
        a_src = alpha[in_src]                  # [P, F, D]
        A_src = A[in_src]
        w = in_logp[:, :, None]
        # same-instance: d -> d+1 (saturating at D-1)
        sv = jnp.where(same_in[:, :, None], a_src + w, LOG_ZERO)
        tv = jnp.concatenate(
            [jnp.full(sv.shape[:2] + (1,), LOG_ZERO), sv[:, :, :-1]],
            axis=2)                            # target slot d <- d-1
        tc = jnp.concatenate(
            [jnp.zeros(sv.shape[:2] + (1,)), A_src[:, :, :-1]], axis=2)
        ov_v = sv[:, :, D - 1]                 # overflow -> slot D-1
        ov_c = A_src[:, :, D - 1]
        # cross-instance: commit the source segment, land at d = 0
        cv = jnp.where(cross_in[:, :, None], a_src + w, LOG_ZERO)
        commit = acc_t[jnp.minimum(d_idx + 1, D)[None, None, :],
                       cls_src[:, :, None]]    # [P, F, D]
        cc = A_src + commit

        lse_same = logsumexp(tv, axis=1)       # [P, D]
        lse_ov = logsumexp(ov_v, axis=1)       # [P]
        slotD = jnp.logaddexp(lse_same[:, D - 1], lse_ov)
        lse0 = logsumexp(cv.reshape(P, -1), axis=1)
        pre = lse_same.at[:, D - 1].set(slotD).at[:, 0].set(lse0)
        new_alpha = jnp.maximum(pre + obs_t[:, None], LOG_ZERO)

        u_same = exp_w(tv, pre[:, None, :])
        u_ov = exp_w(ov_v, pre[:, None, D - 1])
        u0 = exp_w(cv, pre[:, None, 0:1])
        new_A = jnp.sum(u_same * tc, axis=1)
        new_A = new_A.at[:, D - 1].add(jnp.sum(u_ov * ov_c, axis=1))
        new_A = new_A.at[:, 0].set(
            jnp.sum((u0 * cc).reshape(P, -1), axis=1))

        new_alpha = jnp.where(v, new_alpha, alpha)
        new_A = jnp.where(v, new_A, A)
        return (new_alpha, new_A), (alpha, A)

    acc_steps = acc_table[1:T]                          # ACC[t] at step t
    (alpha_T, A_T), (al_prev, A_prev) = jax.lax.scan(
        fwd, (alpha0, A0),
        (obs_pos[1:], acc_steps, valid[1:]))
    alphas = jnp.concatenate([al_prev, alpha_T[None]], axis=0)
    As = jnp.concatenate([A_prev, A_T[None]], axis=0)

    final = estep._final(graph, P)
    final_commit = acc_table[T, jnp.minimum(d_idx + 1, D)[None, :],
                             cls[:, None]]               # [P, D]
    fin = alpha_T + final[:, None]
    total = logsumexp(fin.reshape(-1), axis=0)
    gamma_last = exp_w(fin, total)
    avg_acc = jnp.sum(gamma_last * (A_T + final_commit))

    beta_last = jnp.broadcast_to(final[:, None], (P, D))
    B_last = final_commit

    def bwd(carry, xs):
        beta, B = carry
        obs_next, acc_next, v = xs
        b_tgt = beta[out_tgt]                  # [P, F, D]
        B_tgt = B[out_tgt]
        w = (out_logp + obs_next[out_tgt])[:, :, None]
        # same: (p, d) -> (q, min(d+1, D-1))
        nxt_d = jnp.minimum(d_idx + 1, D - 1)
        sv = jnp.where(same_out[:, :, None],
                       w + b_tgt[:, :, nxt_d], LOG_ZERO)
        sc = B_tgt[:, :, nxt_d]
        # cross: commit p's segment (duration d+1 ending at t+1);
        # the value is d-independent (destination slot 0) but carries a
        # d-dependent committed accuracy
        cv = jnp.broadcast_to(
            jnp.where(cross_out[:, :, None], w + b_tgt[:, :, 0:1],
                      LOG_ZERO), sv.shape)
        commit = acc_next[jnp.minimum(d_idx + 1, D)[None, :],
                          cls[:, None]]        # [P, D]
        cc = B_tgt[:, :, 0:1] + commit[:, None, :]

        both = jnp.concatenate([sv, cv], axis=1)
        pre = logsumexp(both, axis=1)
        new_beta = jnp.maximum(pre, LOG_ZERO)
        u_s = exp_w(sv, pre[:, None, :])
        u_c = exp_w(cv, pre[:, None, :])
        new_B = jnp.sum(u_s * sc + u_c * cc, axis=1)
        new_beta = jnp.where(v, new_beta, beta)
        new_B = jnp.where(v, new_B, B)
        return (new_beta, new_B), (new_beta, new_B)

    _, (betas_head, Bs_head) = jax.lax.scan(
        bwd, (beta_last, B_last),
        (obs_pos[1:], acc_steps, valid[1:]), reverse=True)
    betas = jnp.concatenate([betas_head, beta_last[None]], axis=0)
    Bs = jnp.concatenate([Bs_head, B_last[None]], axis=0)

    g3 = exp_w(alphas + betas, total) * valid[:, None, None]
    gamma = jnp.sum(g3, axis=2)
    gamma_mpe = jnp.sum(g3 * (As + Bs - avg_acc), axis=2)
    return gamma, gamma_mpe, total, avg_acc


def mpe_stats_seg(scorer, features, num_graph, den_graph, n_frames,
                  num_trans_slots: int, acc_table, cls, max_dur: int):
    """Segment-mode MPE/MWE/SNFE E-step for one utterance: accuracy-
    augmented FB over the denominator graph with a precomputed segment
    accuracy table (host-built from the numerator alignment)."""
    T = features.shape[0]
    gll = scorer.gaussian_log_likelihoods(features)
    sll = logsumexp(gll[:, scorer.comp_idx] + scorer.comp_logw, axis=-1)
    den_obs = sll[:, den_graph["pdf"]]
    if "obs_const" in den_graph:
        den_obs = den_obs + den_graph["obs_const"][None, :]
    gamma, gamma_mpe, total, avg_acc = mpe_forward_backward_seg(
        den_obs, den_graph, n_frames, acc_table, cls, max_dur)
    num = gamma_to_stats(scorer, features, den_graph,
                         jnp.maximum(gamma_mpe, 0.0))
    den = gamma_to_stats(scorer, features, den_graph,
                         jnp.maximum(-gamma_mpe, 0.0))
    return {"num": num, "den": den, "log_likelihood": total,
            "avg_accuracy": avg_acc}


def ref_segments_from_path(path, inst, cls, n_frames: int):
    """Host: (start, end, class) runs of the numerator Viterbi path."""
    import numpy as np
    path = np.asarray(path)[:n_frames]
    pinst = np.asarray(inst)[path]
    pcls = np.asarray(cls)[path]
    segs = []
    start = 0
    for t in range(1, len(path)):
        if pinst[t] != pinst[t - 1]:
            segs.append((start, t, int(pcls[t - 1])))
            start = t
    if len(path):
        segs.append((start, len(path), int(pcls[-1])))
    return segs
