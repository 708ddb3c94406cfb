"""Dense-node beam search: the TPU-native fast decode mode.

The exact searcher (`decoder.search`) keeps a sparse token list and pays
for per-frame multi-key sorts.  This mode keeps ONE hypothesis per tree
node in dense arrays over all N nodes — the Viterbi approximation at the
node level — which turns every step into fan-in gathers + small-axis
argmax over the static in-arc tables: no sorts in the hot path, pure
VPU work.  Accuracy trade-off: hypotheses with different LM histories
recombine at tree nodes (the reference keeps several per node,
TokenPassSearch.cc:1312); re-entry after word ends carries the top-C
distinct word-end histories per frame to soften the approximation.

Step per frame:
1. in-arc relaxation: score[n] = max_f score[src] + trans + duration
   (dense [N, F] gather/argmax; payload follows the argmax)
2. add observation log-likelihoods (one gather of sll[pdf])
3. word ends (static node list): FSA LM walk + pronunciation +
   insertion penalty; top-E into traceback records, top-C re-entered
   through the root arcs, competing with in-tree arrivals.

Same tables, config, records, and traceback/lattice machinery as the
exact searcher.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from aaltoasr_tpu.decoder.lexicon import PrefixTree, duration_table
from aaltoasr_tpu.decoder.ngram import NGramFsa, lm_walk_device
from aaltoasr_tpu.decoder.search import DecodeResult, SearchConfig
from aaltoasr_tpu.ops.logsemiring import LOG_ZERO


def _invert_arcs(tree: PrefixTree):
    """Dense in-arc tables [N, Fin] from the out-arc table."""
    N, A = tree.arc_tgt.shape
    in_lists = [[] for _ in range(N)]
    for n in range(N):
        for a in range(A):
            t = int(tree.arc_tgt[n, a])
            lp = float(tree.arc_logp[n, a])
            if lp > LOG_ZERO / 2:
                in_lists[t].append((n, lp))
    F = max((len(l) for l in in_lists), default=1)
    in_src = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, F))
    in_logp = np.full((N, F), LOG_ZERO, dtype=np.float32)
    for n, lst in enumerate(in_lists):
        for f, (s, lp) in enumerate(lst):
            in_src[n, f] = s
            in_logp[n, f] = lp
    return in_src, in_logp


class DenseBeamSearch:
    """Compiled dense-mode batched decoder."""

    def __init__(self, tree: PrefixTree, lm: NGramFsa, model,
                 config: SearchConfig = SearchConfig(),
                 reentry_width: int = 4, word_classes=None):
        self.tree = tree
        self.lm = lm
        self.config = config
        self.reentry_width = reentry_width
        if word_classes is not None:
            word_classes.apply_to_tree(tree, lm)
        lm_names = (word_classes.lm_word_names(tree.vocab)
                    if word_classes is not None else tree.vocab)
        in_src, in_logp = _invert_arcs(tree)
        # word-end slots as a flat static list (padded to >= num_records
        # so per-frame record buffers have a fixed shape)
        we_n, we_h = np.nonzero(tree.we_exit_logp > LOG_ZERO / 2)
        pad = max(config.num_records, reentry_width) - len(we_n)
        if pad > 0:
            we_n = np.concatenate([we_n, np.zeros(pad, dtype=we_n.dtype)])
            we_h = np.concatenate([we_h, np.zeros(pad, dtype=we_h.dtype)])
            # mark padding rows dead via the exit score below
        self._we_pad = max(pad, 0)
        self.tables = {
            "in_src": jnp.asarray(in_src),
            "in_logp": jnp.asarray(in_logp),
            "pdf": jnp.asarray(tree.pdf),
            "dur_state": jnp.asarray(tree.dur_state),
            "we_node": jnp.asarray(we_n.astype(np.int32)),
            "we_word": jnp.asarray(tree.we_word[we_n, we_h]),
            "we_exit": jnp.asarray(np.where(
                np.arange(len(we_n)) < len(we_n) - self._we_pad,
                tree.we_exit_logp[we_n, we_h], LOG_ZERO)),
            "we_pron": jnp.asarray(tree.we_pron_logp[we_n, we_h]),
            "we_skip": jnp.asarray(tree.we_skip_lm[we_n, we_h]),
            "root_tgt": jnp.asarray(tree.root_tgt),
            "root_logp": jnp.asarray(tree.root_logp),
            "dur_tab": jnp.asarray(duration_table(
                model, config.max_dur, config.duration_scale)),
            "lm_id": jnp.asarray(np.asarray(
                [lm.word_index.get(w, -1) for w in lm_names]
                or [-1], dtype=np.int32)),
            **lm.device_tables(),
        }
        self._decode_jit = jax.jit(self._decode)

    def _dur_bonus(self, node, dur):
        t = self.tables
        d = jnp.clip(dur + 1, 1, self.config.max_dur)
        return t["dur_tab"][t["dur_state"][node], d - 1]

    def _step(self, state, obs_t, step_idx):
        cfg = self.config
        t = self.tables
        am, lms, lm, dur, rec, alive = state
        N = am.shape[0]
        E = cfg.num_records
        C = self.reentry_width
        total = jnp.where(alive, am + cfg.lm_scale * lms, LOG_ZERO)

        # ---- 1. in-arc relaxation
        src = t["in_src"]                                  # [N, F]
        cross = src != jnp.arange(N, dtype=jnp.int32)[:, None]
        durb = jnp.where(cross, self._dur_bonus(src, dur[src]), 0.0)
        cand = total[src] + cfg.transition_scale * t["in_logp"] + durb
        f = jnp.argmax(cand, axis=1)
        best = jnp.take_along_axis(cand, f[:, None], axis=1)[:, 0]
        sel = jnp.take_along_axis(src, f[:, None], axis=1)[:, 0]
        selc = jnp.take_along_axis(cross, f[:, None], axis=1)[:, 0]
        new_am = (am[sel] + cfg.transition_scale
                  * jnp.take_along_axis(t["in_logp"], f[:, None],
                                        axis=1)[:, 0]
                  + jnp.take_along_axis(durb, f[:, None], axis=1)[:, 0])
        new_lms = lms[sel]
        new_lm = lm[sel]
        new_dur = jnp.where(selc, 0, dur[sel] + 1)
        new_rec = rec[sel]
        new_alive = alive[sel] & (best > LOG_ZERO / 2)

        # ---- 2. word ends (from the PREVIOUS frame's state)
        wn = t["we_node"]                                  # [Nw]
        w_word = t["we_word"]
        w_lmid = t["lm_id"][jnp.maximum(w_word, 0)]
        skip = t["we_skip"] | (w_word < 0)
        lm_next, lm_score = lm_walk_device(
            t, self.lm.num_words, self.lm.order, lm[wn],
            jnp.maximum(w_lmid, 0))
        lm_next = jnp.where(skip, lm[wn], lm_next)
        lm_score = jnp.where(skip, 0.0, lm_score)
        we_am = (am[wn] + cfg.transition_scale * t["we_exit"]
                 + self._dur_bonus(wn, dur[wn]))
        we_lms = (lms[wn] + lm_score + t["we_pron"]
                  + jnp.where(skip, 0.0, cfg.insertion_penalty))
        we_alive = (alive[wn] & (lm_score > LOG_ZERO / 2)
                    & (skip | (w_lmid >= 0))
                    & (t["we_exit"] > LOG_ZERO / 2))
        we_total = jnp.where(we_alive, we_am + cfg.lm_scale * we_lms,
                             -jnp.inf)

        # records: top-E word ends
        order = jnp.argsort(-we_total)[:E]
        e_alive = jnp.take(we_alive, order)
        e_word = jnp.take(w_word, order)
        e_prev = jnp.take(rec[wn], order)
        is_word = e_alive & (e_word >= 0)
        rec_word = jnp.where(e_alive, e_word, -1)
        rec_prev = jnp.where(is_word, e_prev, -1)
        rec_am = jnp.where(is_word, jnp.take(we_am, order), 0.0)
        rec_lms = jnp.where(is_word, jnp.take(we_lms, order), 0.0)
        slot_ptr = step_idx * E + jnp.arange(E, dtype=jnp.int32)
        e_rec = jnp.where(is_word, slot_ptr, e_prev)

        # ---- 3. re-entry: top-C word ends through the root arcs
        c_am = jnp.take(we_am, order[:C])
        c_lms = jnp.take(we_lms, order[:C])
        c_lm = jnp.take(lm_next, order[:C])
        c_rec = e_rec[:C]
        c_alive = e_alive[:C]
        c_total = jnp.where(c_alive, c_am + cfg.lm_scale * c_lms,
                            LOG_ZERO)
        r_tgt = t["root_tgt"]                              # [R]
        enter = c_total[:, None] + t["root_logp"][None, :]  # [C, R]
        cbest = jnp.argmax(enter, axis=0)                  # [R]
        enter_best = jnp.max(enter, axis=0)
        # compete with in-tree arrivals at the entry nodes
        cur_best = jnp.where(new_alive[r_tgt], best[r_tgt], LOG_ZERO)
        take = (enter_best > cur_best) & c_alive[cbest]
        new_am = new_am.at[r_tgt].set(
            jnp.where(take, c_am[cbest] + t["root_logp"],
                      new_am[r_tgt]))
        new_lms = new_lms.at[r_tgt].set(
            jnp.where(take, c_lms[cbest], new_lms[r_tgt]))
        new_lm = new_lm.at[r_tgt].set(
            jnp.where(take, c_lm[cbest], new_lm[r_tgt]))
        new_dur = new_dur.at[r_tgt].set(
            jnp.where(take, 0, new_dur[r_tgt]))
        new_rec = new_rec.at[r_tgt].set(
            jnp.where(take, c_rec[cbest], new_rec[r_tgt]))
        new_alive = new_alive.at[r_tgt].set(new_alive[r_tgt] | take)

        # ---- 4. observation + beam
        new_am = new_am + obs_t[t["pdf"]]
        new_total = jnp.where(new_alive,
                              new_am + cfg.lm_scale * new_lms, LOG_ZERO)
        mx = jnp.max(new_total)
        new_alive = new_alive & (new_total >= mx - cfg.beam)

        return ((new_am, new_lms, new_lm, new_dur, new_rec, new_alive),
                (rec_word, rec_prev, rec_am, rec_lms))

    def _decode(self, obs, n_frames, lm_init):
        cfg = self.config
        t = self.tables
        N = self.tree.num_nodes
        r_tgt = t["root_tgt"]

        am0 = jnp.full((N,), LOG_ZERO, jnp.float32)
        am0 = am0.at[r_tgt].set(obs[0][t["pdf"][r_tgt]])
        alive0 = jnp.zeros((N,), bool).at[r_tgt].set(True)
        state = (am0, jnp.zeros((N,), jnp.float32),
                 jnp.full((N,), lm_init, jnp.int32),
                 jnp.zeros((N,), jnp.int32),
                 jnp.full((N,), -1, jnp.int32), alive0)

        T = obs.shape[0]
        valid = jnp.arange(1, T) < n_frames
        steps = jnp.arange(T - 1, dtype=jnp.int32)

        def step(state, xs):
            obs_t, v, i = xs
            new_state, recs = self._step(state, obs_t, i)
            out = tuple(jnp.where(v, n, o)
                        for n, o in zip(new_state, state))
            recs = jax.tree.map(
                lambda r: jnp.where(v, r, jnp.full_like(
                    r, -1 if r.dtype == jnp.int32 else 0)), recs)
            return out, recs

        state, recs = jax.lax.scan(step, state, (obs[1:], valid, steps))
        return state, recs

    # -- public API (mirrors BeamSearch) ----------------------------------
    def decode(self, obs, n_frames=None, sentence_start="<s>"):
        obs = jnp.asarray(obs, dtype=jnp.float32)
        if n_frames is None:
            n_frames = obs.shape[0]
        lm_init = self.lm.initial_state(sentence_start)
        state, recs = self._decode_jit(
            obs, jnp.int32(n_frames), jnp.int32(lm_init))
        return self._result(state, recs)

    def decode_batch(self, obs, n_frames, sentence_start="<s>"):
        lm_init = self.lm.initial_state(sentence_start)
        fn = jax.jit(jax.vmap(
            lambda o, n: self._decode(o, n, jnp.int32(lm_init))))
        state, recs = fn(jnp.asarray(obs, jnp.float32),
                         jnp.asarray(n_frames, jnp.int32))
        out = []
        for b in range(obs.shape[0]):
            st = tuple(np.asarray(x[b]) for x in state)
            rc = tuple(np.asarray(r[b]) for r in recs)
            out.append(self._result(st, rc))
        return out

    def _result(self, state, recs):
        am, lms, lm, dur, rec, alive = (np.asarray(x) for x in state)
        total = np.where(alive, am + self.config.lm_scale * lms, -np.inf)
        best = int(np.argmax(total))
        return DecodeResult(
            search=self, final_ptr=int(rec[best]),
            log_prob=float(total[best]),
            final_am=float(am[best]), final_lms=float(lms[best]),
            rec_words=np.asarray(recs[0]), rec_prevs=np.asarray(recs[1]),
            rec_ams=np.asarray(recs[2]), rec_lmss=np.asarray(recs[3]))
