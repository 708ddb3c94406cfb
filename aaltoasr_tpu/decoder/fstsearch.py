"""FstSearch: Viterbi decoding over a precomposed WFST.

Reference: `decoder/src/FstSearch.{hh,_tmpl.hh}` + `Fst.{hh,cc}` — a
simple beam decoder over a precomposed H(C)LG network whose arc input
labels are transition indices and output labels are words
(`FstSearch.hh:4-14`), fed by LNA acoustics.

Here the FST compiles through the same arc-synchronous machinery as
training hmmnets (`models/hmmnet.compile_hmmnet`) and decodes with the
dense masked Viterbi scan — no beams needed; the best path's arc
sequence yields the output words.
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
