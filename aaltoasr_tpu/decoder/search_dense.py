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
from aaltoasr_tpu.decoder.ngram import (
    InterNGramFsa, NGramFsa, lm_walk_device, lm_walk_device_multi)
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
        # static unigram log-prob per slot's LM word: the cheap LM
        # estimate (bo_weight[state] + uni_w) ranks word ends so the
        # exact FSA walk only runs on the top-E candidates (the walk's
        # per-element gathers dominate the step otherwise)
        lm_ids = np.asarray(
            [lm.word_index.get(w, -1) for w in lm_names] or [-1],
            dtype=np.int32)
        slot_lmid = lm_ids[np.maximum(tree.we_word[we_n, we_h], 0)]
        # interpolated LMs (InterTreeGram decode): every member walked,
        # scores mixed in the probability domain
        members = lm.members if isinstance(lm, InterNGramFsa) else [lm]
        log_coeffs = (lm.log_coeffs if isinstance(lm, InterNGramFsa)
                      else [0.0])
        self._K = len(members)
        self._lm_tables = [m.device_tables() for m in members]
        self._log_coeffs = log_coeffs
        # interpolated zero-context unigram as the static rank estimate
        uni_mix = np.full((len(we_n),), -np.inf, np.float64)
        for m, lw in zip(members, log_coeffs):
            row = np.full(m.num_words, LOG_ZERO, np.float32)
            lo0, hi0 = int(m.state_first[0]), int(m.state_first[1])
            row[m.trans_word[lo0:hi0]] = m.trans_prob[lo0:hi0]
            uni_mix = np.logaddexp(
                uni_mix, lw + row[np.maximum(slot_lmid, 0)])
        uni_w = np.maximum(uni_mix, LOG_ZERO).astype(np.float32)
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
            "we_lmid": jnp.asarray(slot_lmid),
            "we_uni": jnp.asarray(uni_w),
            "we_pair": jnp.asarray(tree.we_pair[we_n, we_h]),
            "we_exit": jnp.asarray(np.where(
                np.arange(len(we_n)) < len(we_n) - self._we_pad,
                tree.we_exit_logp[we_n, we_h], LOG_ZERO)),
            "we_pron": jnp.asarray(tree.we_pron_logp[we_n, we_h]),
            "we_skip": jnp.asarray(tree.we_skip_lm[we_n, we_h]),
            "pair_tgt": jnp.asarray(tree.root_pair_tgt),
            "pair_logp": jnp.asarray(tree.root_pair_logp),
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
        }
        self._has_durations = bool(
            np.any(np.asarray(self.tables["dur_tab"]) != 0))
        for key in ("valid", "lncoef", "invb", "const"):
            self.tables[f"we_dur_{key}"] = jnp.asarray(
                np.asarray(self.tables[f"dur_{key}"])[we_n])
        self._precompute_obs = True
        self._obs_budget_bytes = 4_000_000_000
        self._decode_jit = jax.jit(self._decode)

    def _walk(self, states, word):
        """(states [..., K], word [...]) -> (next [..., K], score)."""
        if self._K > 1:
            return lm_walk_device_multi(self, self._lm_tables,
                                        states, word)
        m = self.lm
        nxt, sc = lm_walk_device(self._lm_tables[0], m.num_words,
                                 m.order, states[..., 0], word)
        return nxt[..., None], sc

    @property
    def members(self):
        return (self.lm.members if isinstance(self.lm, InterNGramFsa)
                else [self.lm])

    @property
    def log_coeffs(self):
        return self._log_coeffs

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
            if not k:
                return x
            pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([pad, x[:-k]])

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
            shape = (N,) + vals.shape[1:]
            z = jnp.full(shape, fill, vals.dtype)
            mask = is_win.reshape((-1,) + (1,) * (vals.ndim - 1))
            return z.at[itgt].add(jnp.where(mask, vals,
                                            jnp.zeros_like(vals)))

        stacked = jnp.stack([cand0, cand1, cand2, cand3])
        choice = jnp.argmax(stacked, axis=0)
        best = jnp.max(stacked, axis=0)

        def pick(v_self, v1, v2, v3):
            c = choice.reshape((-1,) + (1,) * (v_self.ndim - 1))
            return jnp.where(
                c == 0, v_self,
                jnp.where(c == 1, v1, jnp.where(c == 2, v2, v3)))

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
        # Two-stage: a cheap static LM estimate (state backoff weight +
        # word unigram) ranks ALL slots; the exact FSA walk runs only on
        # the top-E candidates.  The walk's per-element gathers dominate
        # the step otherwise (the reference likewise only scores LM for
        # surviving word-end tokens, TokenPassSearch.cc:1885).
        wn = t["we_node"]                                  # [Nw]
        Nw = wn.shape[0]
        w_word = t["we_word"]
        w_lmid = t["we_lmid"]
        skip = t["we_skip"] | (w_word < 0)
        am_wn = am[wn]
        lms_wn = lms[wn]
        lm_wn = lm[wn]
        d_we = jnp.clip(dur[wn] + 1, 1,
                        cfg.max_dur).astype(jnp.float32)
        we_durb = t["we_dur_valid"] * (
            t["we_dur_lncoef"] * jnp.log(d_we)
            - d_we * t["we_dur_invb"] + t["we_dur_const"])
        we_am = am_wn + cfg.transition_scale * t["we_exit"] + we_durb
        base_lms = lms_wn + t["we_pron"]
        bo_est = jnp.full(lm_wn.shape[:-1], -jnp.inf, jnp.float32)
        for k, tab in enumerate(self._lm_tables):
            bo_est = jnp.maximum(
                bo_est, self._log_coeffs[k]
                + jnp.minimum(tab["bo_weight"][lm_wn[..., k]], 0.0))
        appr_lm = jnp.where(
            skip, 0.0, bo_est + t["we_uni"] + cfg.insertion_penalty)
        # dead nodes hold am == LOG_ZERO (invariant set after the beam)
        slot_ok = ((am_wn > LOG_ZERO / 2)
                   & (t["we_exit"] > LOG_ZERO / 2)
                   & (skip | (w_lmid >= 0)))
        rank0 = jnp.where(slot_ok,
                          we_am + cfg.lm_scale * (base_lms + appr_lm),
                          -jnp.inf)

        k = min(E, int(Nw))
        _, cand = jax.lax.top_k(rank0, k)                  # [k]
        if k < E:
            cand = jnp.concatenate(
                [cand, jnp.zeros((E - k,), cand.dtype)])
        c_ok = jnp.take(slot_ok, cand)
        if k < E:
            c_ok = c_ok & (jnp.arange(E) < k)
        c_word = jnp.take(w_word, cand)
        c_skip = jnp.take(skip, cand)
        c_state = jnp.take(lm_wn, cand, axis=0)
        lm_next, lm_score = self._walk(
            c_state, jnp.maximum(jnp.take(w_lmid, cand), 0))
        lm_next = jnp.where(c_skip[:, None], c_state, lm_next)
        lm_score = jnp.where(c_skip, 0.0, lm_score)
        c_am = jnp.take(we_am, cand)
        c_lms = (jnp.take(base_lms, cand) + lm_score
                 + jnp.where(c_skip, 0.0, cfg.insertion_penalty))
        c_alive = c_ok & (lm_score > LOG_ZERO / 2)
        c_total = jnp.where(c_alive, c_am + cfg.lm_scale * c_lms,
                            -jnp.inf)

        # records: the E candidates with exact scores
        c_prev = rec[jnp.take(wn, cand)]
        is_word = c_alive & (c_word >= 0)
        rec_word = jnp.where(c_alive, c_word, -1)
        rec_prev = jnp.where(is_word, c_prev, -1)
        rec_am = jnp.where(is_word, c_am, 0.0)
        rec_lms = jnp.where(is_word, c_lms, 0.0)
        slot_ptr = step_idx * E + jnp.arange(E, dtype=jnp.int32)
        e_rec = jnp.where(is_word, slot_ptr, c_prev)

        # ---- 3. re-entry: top-C candidates through their context-pair
        # rows (cross-word fan-in, TPLexPrefixTree.hh:172-240; monophone
        # trees have one row)
        _, top_c = jax.lax.top_k(c_total, C)
        r_am = jnp.take(c_am, top_c)
        r_lms = jnp.take(c_lms, top_c)
        r_lm = jnp.take(lm_next, top_c, axis=0)
        r_rec = jnp.take(e_rec, top_c)
        r_alive = jnp.take(c_alive, top_c)
        r_pair = jnp.take(jnp.take(t["we_pair"], cand), top_c)
        rows_tgt = t["pair_tgt"][r_pair]                   # [C, R]
        rows_lp = t["pair_logp"][r_pair]
        r_total = jnp.where(r_alive, r_am + cfg.lm_scale * r_lms,
                            LOG_ZERO)
        enter = jnp.where(r_alive[:, None] & (rows_lp > LOG_ZERO / 2),
                          r_total[:, None] + rows_lp, LOG_ZERO)
        # merge via small scatters over the C*R entry slots only ([N]-
        # sized dynamic gathers lower to ~5 ms custom fusions on TPU)
        R = rows_tgt.shape[1]
        flat_tgt = rows_tgt.reshape(-1)                    # [C*R]
        flat_score = enter.reshape(-1)
        cur = jnp.where(new_alive, best, LOG_ZERO)
        best_in = cur.at[flat_tgt].max(flat_score)
        take_tgt = best_in > cur                           # [N]
        fidx = jnp.arange(flat_tgt.shape[0], dtype=jnp.int32)
        win = jnp.full((N,), -1, jnp.int32).at[flat_tgt].max(
            jnp.where(flat_score >= best_in[flat_tgt], fidx, -1))
        is_win = fidx == win[flat_tgt]                     # [C*R]
        cflat = fidx // R

        def pay(vals, dtype=jnp.float32):
            v = jnp.take(vals, cflat, axis=0).astype(dtype)
            z = jnp.zeros((N,) + v.shape[1:], dtype)
            mask = is_win.reshape((-1,) + (1,) * (v.ndim - 1))
            return z.at[flat_tgt].add(jnp.where(mask, v,
                                                jnp.zeros_like(v)))

        pay_am = pay(r_am) + jnp.zeros((N,), jnp.float32).at[
            flat_tgt].add(jnp.where(is_win, rows_lp.reshape(-1), 0.0))
        new_am = jnp.where(take_tgt, pay_am, new_am)
        new_lms = jnp.where(take_tgt, pay(r_lms), new_lms)
        new_lm = jnp.where(take_tgt[:, None], pay(r_lm, jnp.int32),
                           new_lm)
        new_dur = jnp.where(take_tgt, 0, new_dur)
        new_rec = jnp.where(take_tgt, pay(r_rec, jnp.int32), new_rec)
        new_alive = new_alive | take_tgt

        # ---- 4. observation + beam
        new_am = new_am + obs_t
        new_total = jnp.where(new_alive,
                              new_am + cfg.lm_scale * new_lms, LOG_ZERO)
        mx = jnp.max(new_total)
        new_alive = new_alive & (new_total >= mx - cfg.beam)
        # dead nodes pinned at LOG_ZERO (the word-end ranking and
        # `_result` read aliveness off am directly)
        new_am = jnp.where(new_alive, new_am, LOG_ZERO)

        return ((new_am, new_lms, new_lm, new_dur, new_rec, new_alive),
                (rec_word, rec_prev, rec_am, rec_lms))

    def _decode(self, obs, n_frames, lm_init):
        cfg = self.config
        t = self.tables
        N = self.tree.num_nodes
        # utterance-initial entries: the boundary-context pair row
        # (TPLexPrefixTree fan-in; union row for monophone trees)
        init_row = np.asarray(self.tree.root_pair_tgt[self.tree.init_pair])
        init_lp = np.asarray(self.tree.root_pair_logp[self.tree.init_pair])
        r_tgt = jnp.asarray(init_row[init_lp > LOG_ZERO / 2])
        r_lp = jnp.asarray(init_lp[init_lp > LOG_ZERO / 2])

        if self._precompute_obs:
            # one [T, N] gather outside the scan (HBM permitting)
            obs_pos = jnp.take(obs, t["pdf"], axis=1)
        else:
            obs_pos = None
        first = obs[0][t["pdf"][r_tgt]] if obs_pos is None \
            else obs_pos[0][r_tgt]
        am0 = jnp.full((N,), LOG_ZERO, jnp.float32)
        am0 = am0.at[r_tgt].max(first + r_lp)
        alive0 = jnp.zeros((N,), bool).at[r_tgt].set(True)
        state = (am0, jnp.zeros((N,), jnp.float32),
                 jnp.broadcast_to(lm_init[None, :],
                                  (N, self._K)).astype(jnp.int32),
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

        # finalize ON DEVICE: only scalars + the packed per-frame record
        # stacks cross the wire (a [B, N] state fetch costs seconds on a
        # relay-mediated link)
        am, lms, lm, dur, rec, alive = state
        if cfg.require_sentence_end:
            end_id = self.lm.word_index.get(cfg.sentence_end)
            if end_id is not None:
                _, end_sc = self._walk(
                    lm, jnp.full((N,), end_id, jnp.int32))
                lms = lms + jnp.where(alive, end_sc, 0.0)
        total = jnp.where(alive, am + cfg.lm_scale * lms, -jnp.inf)
        bestn = jnp.argmax(total)
        finals = jnp.stack([
            rec[bestn].astype(jnp.float32), total[bestn],
            am[bestn], lms[bestn]])
        rec_ints = jnp.stack([recs[0], recs[1]], axis=-1)   # [T-1, E, 2]
        rec_floats = jnp.stack([recs[2], recs[3]], axis=-1)
        if cfg.records_half:
            rec_floats = rec_floats.astype(jnp.bfloat16)
        return finals, rec_ints, rec_floats

    # -- public API (mirrors BeamSearch) ----------------------------------
    def decode(self, obs, n_frames=None, sentence_start="<s>"):
        obs = jnp.asarray(obs, dtype=jnp.float32)
        if n_frames is None:
            n_frames = obs.shape[0]
        lm_init = np.atleast_1d(np.asarray(
            self.lm.initial_state(sentence_start), dtype=np.int32))
        finals, rec_i, rec_f = self._decode_jit(
            obs, jnp.int32(n_frames), jnp.asarray(lm_init))
        return self._result(np.asarray(finals), np.asarray(rec_i),
                            np.asarray(rec_f))

    def decode_batch(self, obs, n_frames, sentence_start="<s>"):
        lm_init = np.atleast_1d(np.asarray(
            self.lm.initial_state(sentence_start), dtype=np.int32))
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
                            jnp.asarray(lm_init)))
        # ONE device->host fetch per array (per-utterance slicing
        # would issue B separate transfers — dominant on remote links)
        finals = np.concatenate([np.asarray(p[0]) for p in parts])
        rec_i = np.concatenate([np.asarray(p[1]) for p in parts])
        rec_f = np.concatenate([np.asarray(p[2]) for p in parts])
        return [self._result(finals[b], rec_i[b], rec_f[b])
                for b in range(obs.shape[0])]

    def _result(self, finals, rec_i, rec_f):
        rec_f = np.asarray(rec_f, dtype=np.float32)
        return DecodeResult(
            search=self, final_ptr=int(finals[0]),
            log_prob=float(finals[1]),
            final_am=float(finals[2]), final_lms=float(finals[3]),
            rec_words=rec_i[..., 0], rec_prevs=rec_i[..., 1],
            rec_ams=rec_f[..., 0], rec_lmss=rec_f[..., 1])
