"""Ablation: which part of the dense decode step costs 32 ms?

Runs stripped scan bodies on the live chip:
  A. full step (baseline)
  B. in-arc relaxation only (shifts + irregular scatter-max + payloads)
  C. relaxation without the irregular scatters (shifts only)
  D. word-end block only (LM walk + top_k + re-entry scatters)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_decode import synth_task  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from aaltoasr_tpu.decoder.search import SearchConfig
    from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
    from aaltoasr_tpu.ops.logsemiring import LOG_ZERO

    np.asarray(jnp.zeros((128, 128)))  # relay warm-up

    model, tree, fsa = synth_task(num_words=1000)
    cfg = SearchConfig(lm_scale=30.0, duration_scale=0.0)
    search = DenseBeamSearch(tree, fsa, model, cfg)
    t = search.tables
    B, T = 64, 200
    N = tree.num_nodes
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.normal(-5, 2, (B, T, model.num_states)),
                      jnp.float32)

    def run(name, step_fn, carry0):
        def scan_one(carry, obs_t):
            return step_fn(carry, obs_t), None

        def full(obs_b, carry0):
            obs_pos = jnp.take(obs_b, t["pdf"], axis=1)
            carry, _ = jax.lax.scan(scan_one, carry0, obs_pos)
            return carry

        fn = jax.jit(jax.vmap(full, in_axes=(0, None)))
        out = fn(obs, carry0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(obs, carry0)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": name,
                          "per_step_ms": round(1000 * dt / T, 3)}),
              flush=True)

    am0 = jnp.full((N,), -1.0, jnp.float32)
    lms0 = jnp.zeros((N,), jnp.float32)
    lm0 = jnp.zeros((N,), jnp.int32)

    # C: shifts only
    def step_shifts(carry, obs_t):
        am, lms = carry
        ts = cfg.transition_scale

        def sh(x, k, fill):
            return jnp.concatenate(
                [jnp.full((k,), fill, x.dtype), x[:-k]]) if k else x

        cand0 = am + ts * t["self_logp"]
        cand1 = sh(am, 1, LOG_ZERO) + ts * t["prev_logp"]
        cand2 = sh(am, 2, LOG_ZERO) + ts * t["skip_logp"]
        stacked = jnp.stack([cand0, cand1, cand2])
        choice = jnp.argmax(stacked, axis=0)
        best = jnp.max(stacked, axis=0)
        new_lms = jnp.where(choice == 0, lms,
                            jnp.where(choice == 1, sh(lms, 1, 0.0),
                                      sh(lms, 2, 0.0)))
        return (best + obs_t, new_lms)

    run("C_shifts_only", step_shifts, (am0, lms0))

    # B: relaxation incl. irregular scatter
    isrc, itgt, ilp = t["irr_src"], t["irr_tgt"], t["irr_logp"]

    def step_relax(carry, obs_t):
        am, lms = carry
        ts = cfg.transition_scale

        def sh(x, k, fill):
            return jnp.concatenate(
                [jnp.full((k,), fill, x.dtype), x[:-k]]) if k else x

        cand0 = am + ts * t["self_logp"]
        cand1 = sh(am, 1, LOG_ZERO) + ts * t["prev_logp"]
        cand2 = sh(am, 2, LOG_ZERO) + ts * t["skip_logp"]
        i_sc = am[isrc] + ts * ilp
        cand3 = jnp.full((N,), LOG_ZERO, jnp.float32).at[itgt].max(i_sc)
        aidx = jnp.arange(isrc.shape[0], dtype=jnp.int32)
        win = jnp.full((N,), -1, jnp.int32).at[itgt].max(
            jnp.where(i_sc >= cand3[itgt], aidx, -1))
        is_win = aidx == win[itgt]

        def irr_pay(vals, fill=0):
            z = jnp.full((N,), fill, vals.dtype)
            return z.at[itgt].add(jnp.where(is_win, vals,
                                            jnp.zeros_like(vals)))

        stacked = jnp.stack([cand0, cand1, cand2, cand3])
        choice = jnp.argmax(stacked, axis=0)
        best = jnp.max(stacked, axis=0)
        new_lms = jnp.where(
            choice == 0, lms,
            jnp.where(choice == 1, sh(lms, 1, 0.0),
                      jnp.where(choice == 2, sh(lms, 2, 0.0),
                                irr_pay(lms[isrc]))))
        return (best + obs_t, new_lms)

    run("B_relax_with_scatter", step_relax, (am0, lms0))

    # D: word ends + LM walk + re-entry scatters
    from aaltoasr_tpu.decoder.ngram import lm_walk_device
    E = cfg.num_records
    C = search.reentry_width
    wn = t["we_node"]

    def step_we(carry, obs_t):
        am, lms, lm = carry
        w_word = t["we_word"]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
        skip = t["we_skip"] | (w_word < 0)
        lm_next, lm_score = lm_walk_device(
            t, search.lm.num_words, search.lm.order, lm[wn],
            jnp.maximum(w_lmid, 0))
        we_am = am[wn] + t["we_exit"]
        we_lms = lms[wn] + lm_score + t["we_pron"]
        we_total = we_am + cfg.lm_scale * we_lms
        _, order = jax.lax.top_k(we_total, E)
        c_am = jnp.take(we_am, order[:C])
        c_lms = jnp.take(we_lms, order[:C])
        c_lm = jnp.take(lm_next, order[:C])
        r_tgt = t["root_tgt"]
        enter = c_am[:, None] + t["root_logp"][None, :]
        cbest = jnp.argmax(enter, axis=0)
        enter_best = jnp.max(enter, axis=0)
        take = enter_best > am[r_tgt]
        am = am.at[r_tgt].set(jnp.where(take, enter_best, am[r_tgt]))
        lms = lms.at[r_tgt].set(jnp.where(take, c_lms[cbest],
                                          lms[r_tgt]))
        lm = lm.at[r_tgt].set(jnp.where(take, c_lm[cbest], lm[r_tgt]))
        return (am + obs_t, lms, lm)

    run("D_wordend_lm_reentry", step_we, (am0, lms0, lm0))

    # A: the real full step
    state0 = (am0, lms0, lm0, jnp.zeros((N,), jnp.int32),
              jnp.full((N,), -1, jnp.int32), jnp.ones((N,), bool))

    def step_full(carry, obs_t):
        new_state, recs = search._step(carry, obs_t, jnp.int32(0))
        return new_state, None

    def full_a(obs_b):
        obs_pos = jnp.take(obs_b, t["pdf"], axis=1)

        def scan_one(carry, obs_t):
            return step_full(carry, obs_t)

        carry, _ = jax.lax.scan(scan_one, state0, obs_pos)
        return carry

    fn = jax.jit(jax.vmap(full_a))
    out = fn(obs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(obs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": "A_full_step",
                      "per_step_ms": round(1000 * dt / T, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
