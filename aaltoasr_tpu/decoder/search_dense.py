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


def _shift_structure(tree: PrefixTree):
    """Split in-arcs into index-shift classes and irregular leftovers.

    TPU gathers are the cost of dense relaxation; but the tree builder
    numbers each phone instance's states consecutively, so almost every
    arc has target - source in {0, 1, 2} (self / next / skip) — those
    relax as array SHIFTS (free vector ops).  Only trie branch arcs and
    multi-exit fan-ins stay as a compact (src, tgt, logp) list handled
    by 3k-element gathers + scatter-max instead of [N, F] gathers.
    """
    N, A = tree.arc_tgt.shape
    shifts = {0: np.full(N, LOG_ZERO, np.float32),
              1: np.full(N, LOG_ZERO, np.float32),
              2: np.full(N, LOG_ZERO, np.float32)}
    irr_src, irr_tgt, irr_logp = [], [], []
    for n in range(N):
        for a in range(A):
            t = int(tree.arc_tgt[n, a])
            lp = float(tree.arc_logp[n, a])
            if lp <= LOG_ZERO / 2:
                continue
            d = t - n
            if d in (0, 1, 2) and shifts[d][t] <= LOG_ZERO / 2:
                shifts[d][t] = lp
            else:
                irr_src.append(n)
                irr_tgt.append(t)
                irr_logp.append(lp)
    return (shifts,
            np.asarray(irr_src, dtype=np.int32),
            np.asarray(irr_tgt, dtype=np.int32),
            np.asarray(irr_logp, dtype=np.float32))


def _node_duration_params(tree, model, scale):
    """Per-node gamma duration params so the dense relaxation computes
    bonus = scale*((a-1) ln d - d/b - a ln b - lgamma(a)) elementwise
    (identical values to duration_table, no gather)."""
    import math
    N = tree.num_nodes
    valid = np.zeros(N, np.float32)
    lncoef = np.zeros(N, np.float32)
    invb = np.zeros(N, np.float32)
    const = np.zeros(N, np.float32)
    if model.durations is not None:
        da = model.durations[:, 0]
        db = model.durations[:, 1]
        for n in range(N):
            s_ = int(tree.dur_state[n])
            if s_ < len(da) and da[s_] > 0 and db[s_] > 0:
                valid[n] = 1.0
                lncoef[n] = scale * (da[s_] - 1.0)
                invb[n] = scale / db[s_]
                const[n] = scale * (-da[s_] * math.log(db[s_])
                                    - math.lgamma(da[s_]))
    return {"dur_valid": jnp.asarray(valid),
            "dur_lncoef": jnp.asarray(lncoef),
            "dur_invb": jnp.asarray(invb),
            "dur_const": jnp.asarray(const)}


class DenseBeamSearch:
    """Compiled dense-mode batched decoder."""

    def __init__(self, tree: PrefixTree, lm: NGramFsa, model,
                 config: SearchConfig = SearchConfig(),
                 reentry_width: int = 4, word_classes=None):
        if tree.root_pair_tgt.shape[0] > 1:
            raise ValueError(
                "DenseBeamSearch does not support cross-word triphone "
                "trees; use the exact BeamSearch, or build the tree "
                "with cross_word=False")
        self.tree = tree
        self.lm = lm
        self.config = config
        self.reentry_width = reentry_width
        if word_classes is not None:
            word_classes.apply_to_tree(tree, lm)
        lm_names = (word_classes.lm_word_names(tree.vocab)
                    if word_classes is not None else tree.vocab)
        shifts, irr_src, irr_tgt, irr_logp = _shift_structure(tree)
        if len(irr_src) == 0:
            irr_src = np.zeros(1, np.int32)
            irr_tgt = np.zeros(1, np.int32)
            irr_logp = np.full(1, LOG_ZERO, np.float32)
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
            "self_logp": jnp.asarray(shifts[0]),
            "prev_logp": jnp.asarray(shifts[1]),
            "skip_logp": jnp.asarray(shifts[2]),
            "irr_src": jnp.asarray(irr_src),
            "irr_tgt": jnp.asarray(irr_tgt),
            "irr_logp": jnp.asarray(irr_logp),
            "pdf": jnp.asarray(tree.pdf),
            "dur_state": jnp.asarray(tree.dur_state),
            "we_node": jnp.asarray(we_n.astype(np.int32)),
            "we_word": jnp.asarray(tree.we_word[we_n, we_h]),
            "we_exit": jnp.asarray(np.where(
                np.arange(len(we_n)) < len(we_n) - self._we_pad,
                tree.we_exit_logp[we_n, we_h], LOG_ZERO)),
            "we_pron": jnp.asarray(tree.we_pron_logp[we_n, we_h]),
            "we_skip": jnp.asarray(tree.we_skip_lm[we_n, we_h]),
            # static per-we-slot duration constants (no dur_state gather)
            "we_dur_valid": None, "we_dur_lncoef": None,
            "we_dur_invb": None, "we_dur_const": None,
            "root_tgt": jnp.asarray(tree.root_tgt),
            "root_logp": jnp.asarray(tree.root_logp),
            "dur_tab": jnp.asarray(duration_table(
                model, config.max_dur, config.duration_scale)),
            # per-node gamma params for gather-free duration bonuses:
            # log p(d) = (a-1) ln d - d/b + const (decoder/src/Hmm.cc)
            **_node_duration_params(tree, model, config.duration_scale),
            "lm_id": jnp.asarray(np.asarray(
                [lm.word_index.get(w, -1) for w in lm_names]
                or [-1], dtype=np.int32)),
            **lm.device_tables(),
        }
        self._has_durations = bool(
            np.any(np.asarray(self.tables["dur_tab"]) != 0))
        for key in ("valid", "lncoef", "invb", "const"):
            self.tables[f"we_dur_{key}"] = jnp.asarray(
                np.asarray(self.tables[f"dur_{key}"])[we_n])
        self._precompute_obs = True
        self._obs_budget_bytes = 4_000_000_000
        self._decode_jit = jax.jit(self._decode)

    def _dur_bonus(self, node, dur):
        """Table path (used for gathered word-end nodes)."""
        t = self.tables
        d = jnp.clip(dur + 1, 1, self.config.max_dur)
        return t["dur_tab"][t["dur_state"][node], d - 1]

    def _dur_bonus_dense(self, dur):
        """Gather-free duration bonus for ALL nodes: the gamma formula
        evaluated elementwise with static per-node parameters."""
        t = self.tables
        d = jnp.clip(dur + 1, 1, self.config.max_dur).astype(jnp.float32)
        return t["dur_valid"] * (
            t["dur_lncoef"] * jnp.log(d) - d * t["dur_invb"]
            + t["dur_const"])

    def _step(self, state, obs_t, step_idx):
        # obs_t is ALREADY per-node (gathered once outside the scan)
        cfg = self.config
        t = self.tables
        am, lms, lm, dur, rec, alive = state
        N = am.shape[0]
        E = cfg.num_records
        C = self.reentry_width
        total = jnp.where(alive, am + cfg.lm_scale * lms, LOG_ZERO)

        # ---- 1. in-arc relaxation: shifts + compact irregular arcs.
        # Node numbering makes nearly all arcs target-source deltas of
        # 0/1/2, so relaxation is elementwise over shifted arrays; only
        # the few irregular arcs pay gather/scatter cost.
        ts = cfg.transition_scale
        if self._has_durations:
            durb_all = self._dur_bonus_dense(dur)
        else:
            durb_all = jnp.zeros((N,), jnp.float32)
        cross_score = total + durb_all          # leaving the state

        def sh(x, k, fill):
            return jnp.concatenate(
                [jnp.full((k,), fill, x.dtype), x[:-k]]) if k else x

        cand0 = total + ts * t["self_logp"]
        cand1 = sh(cross_score, 1, LOG_ZERO) + ts * t["prev_logp"]
        cand2 = sh(cross_score, 2, LOG_ZERO) + ts * t["skip_logp"]

        isrc, itgt, ilp = t["irr_src"], t["irr_tgt"], t["irr_logp"]
        i_am = am[isrc] + durb_all[isrc] + ts * ilp      # [Ei]
        i_sc = total[isrc] + durb_all[isrc] + ts * ilp
        cand3 = jnp.full((N,), LOG_ZERO, jnp.float32).at[itgt].max(i_sc)
        # winner arc per irregular target (ties -> larger arc index)
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

        def pick(v_self, v1, v2, v3):
            return jnp.where(
                choice == 0, v_self,
                jnp.where(choice == 1, v1,
                          jnp.where(choice == 2, v2, v3)))

        am_s = am + ts * t["self_logp"]
        am_1 = sh(am + durb_all, 1, LOG_ZERO) + ts * t["prev_logp"]
        am_2 = sh(am + durb_all, 2, LOG_ZERO) + ts * t["skip_logp"]
        new_am = pick(am_s, am_1, am_2, irr_pay(i_am))
        new_lms = pick(lms, sh(lms, 1, 0.0), sh(lms, 2, 0.0),
                       irr_pay(lms[isrc]))
        new_lm = pick(lm, sh(lm, 1, 0), sh(lm, 2, 0),
                      irr_pay(lm[isrc]))
        new_rec = pick(rec, sh(rec, 1, -1), sh(rec, 2, -1),
                       irr_pay(rec[isrc]))
        new_dur = jnp.where(choice == 0, dur + 1, 0)
        new_alive = best > LOG_ZERO / 2

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
        d_we = jnp.clip(dur[wn] + 1, 1,
                        cfg.max_dur).astype(jnp.float32)
        we_durb = t["we_dur_valid"] * (
            t["we_dur_lncoef"] * jnp.log(d_we)
            - d_we * t["we_dur_invb"] + t["we_dur_const"])
        we_am = (am[wn] + cfg.transition_scale * t["we_exit"] + we_durb)
        we_lms = (lms[wn] + lm_score + t["we_pron"]
                  + jnp.where(skip, 0.0, cfg.insertion_penalty))
        we_alive = (alive[wn] & (lm_score > LOG_ZERO / 2)
                    & (skip | (w_lmid >= 0))
                    & (t["we_exit"] > LOG_ZERO / 2))
        we_total = jnp.where(we_alive, we_am + cfg.lm_scale * we_lms,
                             -jnp.inf)

        # records: top-E word ends (top_k: cheaper than full argsort)
        _, order = jax.lax.top_k(we_total, E)
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
        new_am = new_am + obs_t
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

        if self._precompute_obs:
            # one [T, N] gather outside the scan (HBM permitting)
            obs_pos = jnp.take(obs, t["pdf"], axis=1)
        else:
            obs_pos = None
        first = obs[0][t["pdf"][r_tgt]] if obs_pos is None \
            else obs_pos[0][r_tgt]
        am0 = jnp.full((N,), LOG_ZERO, jnp.float32)
        am0 = am0.at[r_tgt].set(first)
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
            if obs_pos is None:
                obs_t = obs_t[t["pdf"]]
            new_state, recs = self._step(state, obs_t, i)
            out = tuple(jnp.where(v, n, o)
                        for n, o in zip(new_state, state))
            recs = jax.tree.map(
                lambda r: jnp.where(v, r, jnp.full_like(
                    r, -1 if r.dtype == jnp.int32 else 0)), recs)
            return out, recs

        xs_obs = obs[1:] if obs_pos is None else obs_pos[1:]
        state, recs = jax.lax.scan(step, state, (xs_obs, valid, steps))
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
        B, T = obs.shape[0], obs.shape[1]
        # HBM budget covers the [B,T,N] obs precompute AND the
        # per-frame record stacks ([B,T,E] x 4 + vmap temporaries);
        # past it, fall back to per-step gathers and chunk the batch.
        need = 4 * B * T * self.tree.num_nodes
        self._precompute_obs = need <= self._obs_budget_bytes
        chunk = B
        while chunk > 1 and (4 * chunk * T
                             * (self.tree.num_nodes + 64)
                             > self._obs_budget_bytes):
            chunk = (chunk + 1) // 2
        self._precompute_obs = (4 * chunk * T * self.tree.num_nodes
                                <= self._obs_budget_bytes)
        key = ("batch", chunk, T, self._precompute_obs)
        if not hasattr(self, "_batch_jit"):
            self._batch_jit = {}
        if key not in self._batch_jit:
            self._batch_jit[key] = jax.jit(jax.vmap(
                self._decode, in_axes=(0, 0, None)))
        fn = self._batch_jit[key]
        parts = []
        for i in range(0, B, chunk):
            parts.append(fn(jnp.asarray(obs[i:i + chunk], jnp.float32),
                            jnp.asarray(n_frames[i:i + chunk],
                                        jnp.int32),
                            jnp.int32(lm_init)))
        if len(parts) == 1:
            state, recs = parts[0]
        else:
            state = tuple(jnp.concatenate([p[0][j] for p in parts])
                          for j in range(len(parts[0][0])))
            recs = tuple(jnp.concatenate([p[1][j] for p in parts])
                         for j in range(len(parts[0][1])))
        # ONE device->host fetch per array (per-utterance slicing
        # would issue B separate transfers — dominant on remote links)
        state_h = tuple(np.asarray(x) for x in state)
        recs_h = tuple(np.asarray(r) for r in recs)
        out = []
        for b in range(obs.shape[0]):
            st = tuple(x[b] for x in state_h)
            rc = tuple(r[b] for r in recs_h)
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
