"""Finer ablation inside the word-end block: LM walk vs top_k vs
re-entry scatters."""

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
    print(f"N={N} Nw={wn.shape[0]} E={cfg.num_records}", flush=True)
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

    # 1. LM walk only
    def step_lm(carry, obs_t):
        am, lm = carry
        w_word = t["we_word"]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
        lm_next, lm_score = lm_walk_device(
            t, search.lm.num_words, search.lm.order, lm[wn],
            jnp.maximum(w_lmid, 0))
        upd = jnp.sum(lm_score) + jnp.sum(lm_next.astype(jnp.float32))
        return (am + obs_t + upd * 1e-30, lm)

    run("lm_walk_only", step_lm, (am0, lm0))

    # 2. top_k only
    def step_topk(carry, obs_t):
        am, lm = carry
        we_total = am[wn]
        v, order = jax.lax.top_k(we_total, E)
        return (am + obs_t + jnp.sum(v) * 1e-30, lm)

    run("topk_only", step_topk, (am0, lm0))

    # 3. re-entry scatters only
    r_tgt = t["root_tgt"]

    def step_reentry(carry, obs_t):
        am, lm = carry
        c_am = am[wn[:C]]
        enter = c_am[:, None] + t["root_logp"][None, :]
        cbest = jnp.argmax(enter, axis=0)
        enter_best = jnp.max(enter, axis=0)
        take = enter_best > am[r_tgt]
        am = am.at[r_tgt].set(jnp.where(take, enter_best, am[r_tgt]))
        lm = lm.at[r_tgt].set(jnp.where(take, cbest, lm[r_tgt]))
        return (am + obs_t, lm)

    run("reentry_scatter_only", step_reentry, (am0, lm0))

    # 4. gathers at we nodes only
    def step_gather(carry, obs_t):
        am, lm = carry
        x = am[wn] + t["we_exit"] + t["we_pron"]
        return (am + obs_t + jnp.sum(x) * 1e-30, lm)

    run("we_gather_only", step_gather, (am0, lm0))


if __name__ == "__main__":
    main()
