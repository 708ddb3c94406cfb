"""Dump optimized HLO for the slow combined word-end block and for the
two fast halves; diff the while-body op mix to find the pathology."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_decode import synth_task  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from aaltoasr_tpu.decoder.search import SearchConfig
    from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch
    from aaltoasr_tpu.decoder.ngram import lm_walk_device

    model, tree, fsa = synth_task(num_words=1000)
    cfg = SearchConfig(lm_scale=30.0, duration_scale=0.0)
    search = DenseBeamSearch(tree, fsa, model, cfg)
    t = search.tables
    B, T = 64, 200
    N = tree.num_nodes
    wn = t["we_node"]
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.normal(-5, 2, (B, T, N)), jnp.float32)

    am0 = jnp.full((N,), -1.0, jnp.float32)
    lms0 = jnp.zeros((N,), jnp.float32)
    lm0 = jnp.zeros((N,), jnp.int32)
    E = cfg.num_records
    C = search.reentry_width
    r_tgt = t["root_tgt"]

    def step_slow(carry, obs_t):
        am, lms, lm = carry
        w_word = t["we_word"]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
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
        enter = c_am[:, None] + t["root_logp"][None, :]
        cbest = jnp.argmax(enter, axis=0)
        enter_best = jnp.max(enter, axis=0)
        take = enter_best > am[r_tgt]
        am = am.at[r_tgt].set(jnp.where(take, enter_best, am[r_tgt]))
        lms = lms.at[r_tgt].set(jnp.where(take, c_lms[cbest],
                                          lms[r_tgt]))
        lm = lm.at[r_tgt].set(jnp.where(take, c_lm[cbest], lm[r_tgt]))
        return (am + obs_t, lms, lm)

    def step_fast(carry, obs_t):
        am, lm = carry
        w_word = t["we_word"]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
        lm_next, lm_score = lm_walk_device(
            t, search.lm.num_words, search.lm.order, lm[wn],
            jnp.maximum(w_lmid, 0))
        lm = lm.at[wn].max(lm_next)
        return (am + obs_t + jnp.sum(lm_score) * 1e-30, lm)

    def make_full(step, carry0):
        def full(obs_b):
            carry, _ = jax.lax.scan(
                lambda c, o: (step(c, o), None), carry0, obs_b)
            return carry
        return full

    for name, step, carry0 in (
            ("slow", step_slow, (am0, lms0, lm0)),
            ("fast", step_fast, (am0, lm0))):
        fn = jax.jit(jax.vmap(make_full(step, carry0)))
        lowered = fn.lower(obs)
        compiled = lowered.compile()
        text = compiled.as_text()
        with open(f"/tmp/hlo_{name}.txt", "w") as f:
            f.write(text)
        # summarize while-body fusions and big ops
        ops = Counter()
        for m in re.finditer(r"= (\w+)\(", text):
            ops[m.group(1)] += 1
        print(name, "total ops:", sum(ops.values()), flush=True)
        print(sorted(ops.items(), key=lambda kv: -kv[1])[:15],
              flush=True)


if __name__ == "__main__":
    main()
