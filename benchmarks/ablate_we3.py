"""Round 3: find which coupling in the word-end block costs 30 ms.

A. reproduce the full word-end block (expected ~32 ms)
B. walk output NOT in the ranking (top_k on am only)
C. re-entry writes lm from a plain gather, not the walk output
D. no top_k (first C word-end slots re-enter)
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
    lms0 = jnp.zeros((N,), jnp.float32)
    lm0 = jnp.zeros((N,), jnp.int32)
    E = cfg.num_records
    C = search.reentry_width
    r_tgt = t["root_tgt"]

    def make_step(rank_with_lm=True, lm_from_walk=True, use_topk=True):
        def step(carry, obs_t):
            am, lms, lm = carry
            w_word = t["we_word"]
            w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
            lm_next, lm_score = lm_walk_device(
                t, search.lm.num_words, search.lm.order, lm[wn],
                jnp.maximum(w_lmid, 0))
            we_am = am[wn] + t["we_exit"]
            we_lms = lms[wn] + (lm_score if rank_with_lm else 0.0) \
                + t["we_pron"]
            we_total = we_am + cfg.lm_scale * we_lms
            if use_topk:
                _, order = jax.lax.top_k(we_total, E)
            else:
                order = jnp.arange(E, dtype=jnp.int32)
            c_am = jnp.take(we_am, order[:C])
            c_lms = jnp.take(we_lms, order[:C])
            src_lm = lm_next if lm_from_walk else lm[wn]
            c_lm = jnp.take(src_lm, order[:C])
            enter = c_am[:, None] + t["root_logp"][None, :]
            cbest = jnp.argmax(enter, axis=0)
            enter_best = jnp.max(enter, axis=0)
            take = enter_best > am[r_tgt]
            am = am.at[r_tgt].set(jnp.where(take, enter_best,
                                            am[r_tgt]))
            lms = lms.at[r_tgt].set(jnp.where(take, c_lms[cbest],
                                              lms[r_tgt]))
            lm = lm.at[r_tgt].set(jnp.where(take, c_lm[cbest],
                                            lm[r_tgt]))
            return (am + obs_t, lms, lm)
        return step

    carry0 = (am0, lms0, lm0)
    run("A_full_we_block", make_step(), carry0)
    run("B_rank_without_lmscore", make_step(rank_with_lm=False), carry0)
    run("C_lm_not_from_walk", make_step(lm_from_walk=False), carry0)
    run("D_no_topk", make_step(use_topk=False), carry0)


if __name__ == "__main__":
    main()
