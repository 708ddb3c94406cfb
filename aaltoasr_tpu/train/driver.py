"""Host-side E-step driver: recipes -> padded batches -> device stats.

The `stats` worker equivalent (`aku/stats.cc:309-470`): iterates a recipe
shard, builds each utterance's numerator chain, pads into shape buckets,
runs the jitted batch E-step, and reduces into reference-format
accumulators.  Sharding uses the same `-B/-I` recipe split; on-mesh
reduction replaces file-based combine_stats when multiple devices are
visible (see parallel.mesh).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from aaltoasr_tpu.formats.model_io import HmmModel
from aaltoasr_tpu.formats.phn import read_phn
from aaltoasr_tpu.formats.recipe import Recipe
from aaltoasr_tpu.frontend.audio import read_audio
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.models.hmm import (
    TransitionTable, build_chain, pad_chain)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train import estep
from aaltoasr_tpu.train.accumulators import (
    HmmStats, ML_BUF, PDF_ML_STATS)


def device_stats_to_hmm_stats(model: HmmModel, table: TransitionTable,
                              dstats, mode: int = PDF_ML_STATS) -> HmmStats:
    """Convert the device E-step pytree into host HmmStats (ML buffer)."""
    stats = HmmStats.zeros(model, table, mode)
    buf = stats.buffers[ML_BUF]
    G = model.num_gaussians
    S = model.num_states
    buf.gamma[:] = np.asarray(dstats["gamma"], dtype=np.float64)[:G]
    buf.mean_acc[:] = np.asarray(dstats["mean_acc"], dtype=np.float64)[:G]
    buf.sec_acc[:] = np.asarray(dstats["sec_acc"], dtype=np.float64)[:G]
    buf.feacount[:] = np.asarray(dstats["feacount"], dtype=np.int64)[:G]
    mix = np.asarray(dstats["mix_gamma"], dtype=np.float64)[:S]
    K = buf.mix_gamma.shape[1]
    buf.mix_gamma[:, :] = mix[:, :K]
    stats.trans_acc[:] = np.asarray(dstats["trans_acc"], dtype=np.float64)
    stats.num_ll = float(dstats["log_likelihood"])
    stats.num_frames = int(dstats["num_frames"])
    return stats


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class EStepDriver:
    """Recipe -> statistics, with shape bucketing for jit reuse."""

    def __init__(self, model: HmmModel, feature_config,
                 mode: str = "bw", time_bucket: int = 256,
                 pos_bucket: int = 64):
        self.model = model
        self.table = TransitionTable.from_model(model)
        self.fg = FeatureGenerator(feature_config)
        self.scorer = GmmScorer.from_model(model)
        self.mode = mode
        self.time_bucket = time_bucket
        self.pos_bucket = pos_bucket
        self._jit_cache = {}

    def _stats_fn(self, T_pad: int, P_pad: int, F: int):
        key = (T_pad, P_pad, F)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda f, g, n: estep.chain_stats(
                    self.scorer, f, g, n, self.table.num_slots,
                    self.mode))
        return self._jit_cache[key]

    def utterance_stats(self, samples: np.ndarray, labels: list):
        """One utterance's device stats pytree."""
        feats = self.fg.features(samples)
        T = feats.shape[0]
        chain = build_chain(self.model, self.table, labels)
        P_pad = _round_up(chain.num_positions, self.pos_bucket)
        T_pad = _round_up(T, self.time_bucket)
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, P_pad, fan=4).items()}
        feats_p = jnp.concatenate(
            [feats, jnp.zeros((T_pad - T, feats.shape[1]), feats.dtype)],
            axis=0) if T_pad > T else feats
        fn = self._stats_fn(T_pad, P_pad, 4)
        return fn(feats_p, graph, jnp.int32(T))

    def run_recipe(self, recipe: Recipe, info: int = 0) -> HmmStats:
        """Accumulate statistics over a recipe shard (transcript path)."""
        total = HmmStats.zeros(self.model, self.table)
        for rinfo in recipe:
            if info > 0:
                import sys
                print(f"Processing file: {rinfo.audio_path}",
                      file=sys.stderr)
            samples, _ = read_audio(rinfo.audio_path, self.fg.sample_rate)
            entries = read_phn(rinfo.transcript_path)
            labels = [e.label for e in entries]
            dstats = self.utterance_stats(samples, labels)
            total.add(device_stats_to_hmm_stats(
                self.model, self.table, dstats))
        return total
