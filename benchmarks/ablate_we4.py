"""Round 4: node-major state [N, B] instead of vmap over [B, N].

Shared static-index gathers (am[wn]) become row gathers of a row-major
array — contiguous, no layout conflict.  If this kills the 32 ms, the
dense searcher gets rewritten node-major.
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

    np.asarray(jnp.zeros((128, 128)))  # relay warm-up

    model, tree, fsa = synth_task(num_words=1000)
    cfg = SearchConfig(lm_scale=30.0, duration_scale=0.0)
    search = DenseBeamSearch(tree, fsa, model, cfg)
    t = search.tables
    lm_t = t
    B, T = 64, 200
    N = tree.num_nodes
    wn = t["we_node"]
    Nw = int(wn.shape[0])
    rng = np.random.default_rng(1)
    # node-major obs: [T, N, B]
    obs = jnp.asarray(
        rng.normal(-5, 2, (T, N, B)), jnp.float32)

    E = cfg.num_records
    C = search.reentry_width
    r_tgt = t["root_tgt"]
    order_lm = search.lm.order
    V = search.lm.num_words

    def lm_walk_nm(state, word):
        """lm_walk_device specialized for [Nw, B] node-major operands."""
        tw = lm_t["trans_word"]
        sf = lm_t["state_first"]
        iters16 = lm_t["lookup_iters16"]
        M = tw.shape[0]
        NEG_INF = -1e30

        def lookup(state, word):
            lo = sf[state].astype(jnp.int32)
            hi = sf[state + 1].astype(jnp.int32)
            for _ in range(iters16):
                span = hi - lo
                frac = (jnp.arange(1, 16, dtype=jnp.int32)[None, None, :]
                        * span[..., None]) // 16
                piv_idx = jnp.minimum(lo[..., None] + frac, M - 1)
                piv = tw[piv_idx]
                cnt = jnp.sum((piv <= word[..., None]) & (frac > 0),
                              axis=-1).astype(jnp.int32)
                new_lo = lo + (span * cnt) // 16
                new_hi = lo + jnp.where(cnt < 15,
                                        (span * (cnt + 1)) // 16, span)
                keep = span > 16
                lo = jnp.where(keep, new_lo, lo)
                hi = jnp.where(keep, new_hi, hi)
            offs = jnp.arange(16, dtype=jnp.int32)[None, None, :]
            idx16 = jnp.minimum(lo[..., None] + offs, M - 1)
            valid = lo[..., None] + offs < hi[..., None]
            eq = valid & (tw[idx16] == word[..., None])
            hit = jnp.any(eq, axis=-1)
            pos = jnp.argmax(eq, axis=-1)
            idx = jnp.minimum(lo + pos, M - 1)
            return hit, idx

        score = jnp.zeros(state.shape, jnp.float32)
        next_state = jnp.zeros(state.shape, jnp.int32)
        done = jnp.zeros(state.shape, bool)
        for hop in range(order_lm):
            is_uni = state == 0
            up = lm_t["uni_prob"][word]
            un = lm_t["uni_next"][word]
            uni_hit = is_uni & (up > NEG_INF / 2)
            hit, idx = lookup(state, word)
            hit = jnp.where(is_uni, uni_hit, hit)
            nxt = jnp.where(is_uni, un, lm_t["trans_next"][idx])
            sc = jnp.where(is_uni, up, lm_t["trans_prob"][idx])
            take = hit & ~done
            next_state = jnp.where(take, nxt, next_state)
            score = jnp.where(take, score + sc, score)
            done = done | hit
            bo_w = lm_t["bo_weight"][state]
            bo_n = lm_t["bo_next"][state]
            score = jnp.where(done, score, score + bo_w)
            state = jnp.where(done, state, bo_n)
        score = jnp.where(done, score, NEG_INF)
        return next_state, score

    def step(carry, obs_t):
        am, lms, lm = carry          # each [N, B]
        w_word = t["we_word"]        # [Nw]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
        lm_next, lm_score = lm_walk_nm(
            lm[wn], jnp.broadcast_to(
                jnp.maximum(w_lmid, 0)[:, None], (Nw, B)))
        we_am = am[wn] + t["we_exit"][:, None]
        we_lms = lms[wn] + lm_score + t["we_pron"][:, None]
        we_total = we_am + cfg.lm_scale * we_lms
        _, order = jax.lax.top_k(we_total.T, E)   # [B, E]
        ordC = order[:, :C]                        # [B, C]
        c_am = jnp.take_along_axis(we_am.T, ordC, axis=1).T    # [C, B]
        c_lms = jnp.take_along_axis(we_lms.T, ordC, axis=1).T
        c_lm = jnp.take_along_axis(lm_next.T, ordC, axis=1).T
        enter = c_am[:, None, :] + t["root_logp"][None, :, None]
        cbest = jnp.argmax(enter, axis=0)          # [R, B]
        enter_best = jnp.max(enter, axis=0)        # [R, B]
        take = enter_best > am[r_tgt]
        am = am.at[r_tgt].set(jnp.where(take, enter_best, am[r_tgt]))
        lms = lms.at[r_tgt].set(jnp.where(
            take, jnp.take_along_axis(c_lms, cbest, axis=0),
            lms[r_tgt]))
        lm = lm.at[r_tgt].set(jnp.where(
            take, jnp.take_along_axis(c_lm, cbest, axis=0),
            lm[r_tgt]))
        return (am + obs_t, lms, lm)

    am0 = jnp.full((N, B), -1.0, jnp.float32)
    lms0 = jnp.zeros((N, B), jnp.float32)
    lm0 = jnp.zeros((N, B), jnp.int32)

    def full(obs_seq, carry0):
        carry, _ = jax.lax.scan(
            lambda c, o: (step(c, o), None), carry0, obs_seq)
        return carry

    fn = jax.jit(full)
    out = fn(obs, (am0, lms0, lm0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(obs, (am0, lms0, lm0))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": "node_major_full_we",
                      "per_step_ms": round(1000 * dt / T, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
