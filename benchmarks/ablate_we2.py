"""Round 2: loop-varying variants (no loop-invariant hoisting).

1. lm_walk_fb    — LM walk whose state feeds back (structurally varying)
2. d_without_walk — the full word-end block minus the LM walk
3. walk_hops      — LM walk feedback with 1 vs 2 backoff hops
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
    from aaltoasr_tpu.decoder.ngram import lm_walk_device

    np.asarray(jnp.zeros((128, 128)))  # relay warm-up

    model, tree, fsa = synth_task(num_words=1000)
    cfg = SearchConfig(lm_scale=30.0, duration_scale=0.0)
    search = DenseBeamSearch(tree, fsa, model, cfg)
    t = search.tables
    B, T = 64, 200
    N = tree.num_nodes
    wn = t["we_node"]
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.normal(-5, 2, (B, T, N)), jnp.float32)

    def run(name, step_fn, carry0):
        def full(obs_b, carry0):
            carry, _ = jax.lax.scan(
                lambda c, o: (step_fn(c, o), None), carry0, obs_b)
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
    lm0 = jnp.zeros((N,), jnp.int32)
    E = cfg.num_records
    C = search.reentry_width
    r_tgt = t["root_tgt"]

    # 1. LM walk with feedback into the carry
    def step_lm_fb(carry, obs_t):
        am, lm = carry
        w_word = t["we_word"]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
        lm_next, lm_score = lm_walk_device(
            t, search.lm.num_words, search.lm.order, lm[wn],
            jnp.maximum(w_lmid, 0))
        lm = lm.at[wn].max(lm_next)           # structurally loop-varying
        return (am + obs_t + jnp.sum(lm_score) * 1e-30, lm)

    run("lm_walk_feedback", step_lm_fb, (am0, lm0))

    # 2. full word-end block minus the walk
    def step_d_nowalk(carry, obs_t):
        am, lms, lm = carry
        lm_next = lm[wn]
        lm_score = jnp.zeros(wn.shape, jnp.float32)
        we_am = am[wn] + t["we_exit"]
        we_lms = lms[wn] + lm_score + t["we_pron"]
        we_total = we_am + cfg.lm_scale * we_lms
        _, order = jax.lax.top_k(we_total, E)
        c_am = jnp.take(we_am, order[:C])
        c_lms = jnp.take(we_lms, order[:C])
        c_lm = jnp.take(lm_next, order[:C])
        enter = c_am[:, None] + t["root_logp"][None, :]
        cbest = jnp.argmax(enter, axis=0)
        enter_best = jnp.max(enter, axis=0)
        take = enter_best > am[r_tgt]
        am = am.at[r_tgt].set(jnp.where(take, enter_best, am[r_tgt]))
        lms = lms.at[r_tgt].set(jnp.where(take, c_lms[cbest],
                                          lms[r_tgt]))
        lm = lm.at[r_tgt].set(jnp.where(take, c_lm[cbest], lm[r_tgt]))
        return (am + obs_t, lms, lm)

    run("d_without_walk", step_d_nowalk,
        (am0, jnp.zeros((N,), jnp.float32), lm0))


if __name__ == "__main__":
    main()
