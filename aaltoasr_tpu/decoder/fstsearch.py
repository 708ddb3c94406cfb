"""FstSearch: Viterbi decoding over a precomposed WFST.

Reference: `decoder/src/FstSearch.{hh,_tmpl.hh}` + `Fst.{hh,cc}` — a
simple beam decoder over a precomposed H(C)LG network whose arc input
labels are transition indices and output labels are words
(`FstSearch.hh:4-14`), fed by LNA acoustics.

Here the FST compiles through the same arc-synchronous machinery as
training hmmnets (`models/hmmnet.compile_hmmnet`) and decodes with the
dense masked Viterbi scan — no beams needed; the best path's arc
sequence yields the output words.

Weight base: transition scores come from the acoustic model's
transition table (natural log), the convention of the aku training
pipeline whose hmmnet FSTs this shares.  FSTs produced by the
reference's `hmm2fsm` instead EMBED log10 transition weights in the
arc score field (`decoder/src/hmm2fsm.cc:70`, values from
`NowayHmmReader.cc:52`); feeding such a file here scores transitions
ln10 weaker relative to acoustics than the reference's FstSearch
would.  Our `aalto-hmm2fsm` writes transition-index arcs with zero
embedded scores, so round-trips within this framework are exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from aaltoasr_tpu.formats.fst import Fst, read_fst
from aaltoasr_tpu.formats.lna import read_lna
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.models.hmmnet import compile_hmmnet
from aaltoasr_tpu.train import estep


class FstSearch:
    """Decoder over one precomposed FST (FstSearch.hh:39-45 API)."""

    def __init__(self, fst_path_or_fst, model, table: TransitionTable
                 | None = None, acoustic_scale: float = 1.0):
        fst = (fst_path_or_fst if isinstance(fst_path_or_fst, Fst)
               else read_fst(fst_path_or_fst))
        self.fst = fst
        self.table = table or TransitionTable.from_model(model)
        self.model = model
        graph, emit = compile_hmmnet(fst, self.table,
                                     acoustic_scale=acoustic_scale)
        self.graph = {k: jnp.asarray(v) for k, v in graph.items()}
        self.positions_to_arc = emit
        # output word per position (emitting arc); epsilon-closure words
        # are attached to the target emitting arcs at compile time only
        # for emitting arcs' own out labels — collect eps out labels too
        self.out_label = [fst.arcs[a].out_label for a in emit]

    def run(self, state_log_probs: np.ndarray,
            n_frames: int | None = None):
        """Decode [T, S] state log-probs -> (words, log_prob, path)."""
        obs = jnp.asarray(state_log_probs, dtype=jnp.float32)
        if n_frames is None:
            n_frames = obs.shape[0]
        obs_pos = obs[:, self.graph["pdf"]] + self.graph["obs_const"]
        path, score = estep.masked_viterbi(
            obs_pos, self.graph, jnp.int32(n_frames))
        path = np.asarray(path)
        words = []
        prev = -1
        for t in range(n_frames):
            p = int(path[t])
            if p != prev:  # new arc traversal emits its output label
                w = self.out_label[p] if p < len(self.out_label) else ""
                if w:
                    words.append(w)
            prev = p
        return words, float(score), path

    def get_result_and_logprob(self, lna_path: str):
        """LNA file -> (result string, log prob) (FstSearch.hh:44)."""
        lp, _ = read_lna(lna_path)
        words, score, _ = self.run(lp)
        return " ".join(words), score


def _clean(s: str) -> str:
    """remove_junk (FstConfidence.cc:112-121): drop spaces, collapse
    repeated characters."""
    out = []
    prev = " "
    for c in s:
        if c == " " or c == prev:
            continue
        prev = c
        out.append(c)
    return "".join(out)


def _levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    row = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, row[0] = row[0], i
        for j in range(1, lb + 1):
            cur = min(row[j] + 1, row[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, row[j] = row[j], cur
    return row[lb]


class FstConfidence(FstSearch):
    """Confidence-scored grammar decoding (`decoder/src/FstConfidence.
    {hh,cc}`): confidence = 0.5 * (grammar-token + best-acoustic).

    * best-acoustic (`::grammar_token_and_best_acu_confidence`,
      FstConfidence.cc:8-45): 1.5 - 0.25*(sum_t max_s obs[t,s]
      - grammar_logprob)/T — how far the grammar path trails a free
      per-frame best-state path.
    * grammar-token: 0.2 - 5*(best_different_hypo - grammar_logprob)/T
      clamped to [0, 1], where best_different_hypo is the best-scoring
      hypothesis whose WORD SEQUENCE differs from the winner's.  The
      token-list reference scans its beam; the dense design carries a
      rolling word-sequence hash per position through the Viterbi scan
      and maxes over final positions with a different hash.
    """

    logprob_conf_weight = 2.0      # API parity (FstConfidence.cc:4)
    logprob_conf_hysteresis = 100.0

    def _viterbi_with_hash(self, obs, n_frames):
        import jax
        from aaltoasr_tpu.ops.logsemiring import LOG_ZERO
        g = self.graph
        obs_pos = obs[:, g["pdf"]] + g["obs_const"]
        T, P = obs_pos.shape
        in_src, in_logp = g["in_src"], g["in_logp"]
        valid = jnp.arange(T) < n_frames
        pos = jnp.arange(P, dtype=jnp.int32)
        import zlib
        wid = jnp.asarray(
            [zlib.crc32(w.encode()) % 1000003 + 1 if w else 0
             for w in self.out_label] +
            [0] * (P - len(self.out_label)), jnp.int32)

        entry = g["entry"]
        alpha0 = jnp.maximum(obs_pos[0] + entry, LOG_ZERO)
        h0 = jnp.where((entry > LOG_ZERO / 2) & (wid > 0), wid, 0)

        def step(carry, xs):
            alpha, h = carry
            obs_t, v = xs
            cand = alpha[in_src] + in_logp
            arg = jnp.argmax(cand, axis=1)
            best = jnp.max(cand, axis=1)
            src = in_src[pos, arg]
            h_src = h[src]
            entered = src != pos
            h_new = jnp.where(entered & (wid > 0),
                              h_src * 31 + wid, h_src)
            alpha_new = jnp.maximum(best + obs_t, LOG_ZERO)
            alpha_new = jnp.where(v, alpha_new, alpha)
            h_new = jnp.where(v, h_new, h)
            return (alpha_new, h_new), None

        (alpha, h), _ = jax.lax.scan(
            step, (alpha0, h0), (obs_pos[1:], valid[1:]))
        fv = alpha + g["final"]
        bestp = jnp.argmax(fv)
        grammar_lp = fv[bestp]
        best_hash = h[bestp]
        diff = jnp.where((h != best_hash) & (alpha > LOG_ZERO / 2),
                         alpha, -jnp.inf)
        best_diff_lp = jnp.max(diff)
        best_acu = jnp.sum(jnp.where(valid, jnp.max(obs, axis=1), 0.0))
        return (float(grammar_lp), float(best_diff_lp),
                float(best_acu))

    def run_with_confidence(self, state_log_probs, n_frames=None):
        obs = jnp.asarray(state_log_probs, jnp.float32)
        if n_frames is None:
            n_frames = obs.shape[0]
        words, score, _ = self.run(state_log_probs, n_frames)
        grammar_lp, best_diff_lp, best_acu = self._viterbi_with_hash(
            obs, n_frames)
        T = max(int(n_frames), 1)
        ba_conf = 1.5 - 0.25 * (best_acu - grammar_lp) / T
        if not np.isfinite(best_diff_lp):
            gt_conf = 1.0
        else:
            gt_conf = min(1.0, max(
                0.0, 0.2 - 5.0 * (best_diff_lp - grammar_lp) / T))
        self.token_conf = gt_conf
        self.best_acu_conf = ba_conf
        return words, score, 0.5 * (gt_conf + min(1.0, ba_conf))

    def result_and_confidence(self, lna_path: str):
        """(result string, confidence) (FstConfidence.hh:29-34)."""
        lp, _ = read_lna(lna_path)
        words, _, conf = self.run_with_confidence(lp)
        return " ".join(words), conf


class FstConfidenceWithPhoneLoop(FstConfidence):
    """Grammar decode judged against a free phone loop
    (`FstConfidenceWithPhoneLoop`, FstConfidence.cc:87-153):
    confidence = (ploop + 20*token + 5*edit + best_acu) / 27 with
    ploop = 1 - 0.25*(ploop_lp - grammar_lp)/T and edit = 1 -
    levenshtein(clean(grammar), clean(ploop)) / len(clean(grammar))."""

    def __init__(self, grammar_fst, phone_loop_fst, model,
                 table=None, acoustic_scale: float = 1.0):
        super().__init__(grammar_fst, model, table, acoustic_scale)
        self.phone_fst = FstSearch(phone_loop_fst, model, table,
                                   acoustic_scale)
        self.ploop_logprob_weight = 0.8     # API parity

    def result_and_confidence(self, lna_path: str):
        lp, _ = read_lna(lna_path)
        return self.result_and_confidence_from_probs(lp)

    def result_and_confidence_from_probs(self, state_log_probs,
                                         n_frames=None):
        obs = np.asarray(state_log_probs, np.float32)
        if n_frames is None:
            n_frames = obs.shape[0]
        T = max(int(n_frames), 1)
        words, grammar_lp, conf0 = self.run_with_confidence(
            obs, n_frames)
        pwords, ploop_lp, _ = self.phone_fst.run(obs, n_frames)
        ploop_conf = min(1.0, 1.0 - 0.25 * (ploop_lp - grammar_lp) / T)
        res = " ".join(words)
        ploop_s = " ".join(pwords)
        cg = _clean(res)
        edit_conf = (max(0.0, 1.0 - _levenshtein(cg, _clean(ploop_s))
                         / len(cg)) if cg else 0.0)
        self.ploop_conf = ploop_conf
        self.edit_conf = edit_conf
        conf = (min(1.0, ploop_conf) + 20.0 * min(1.0, self.token_conf)
                + 5.0 * min(1.0, edit_conf)
                + min(1.0, self.best_acu_conf)) / 27.0
        return res, conf
