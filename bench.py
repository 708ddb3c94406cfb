"""Benchmark: MFCC+GMM scoring throughput on one chip (the primary
BASELINE.json metric: frames/sec/chip).

Prints one JSON line.  vs_baseline is achieved real-time factor divided by
the 100x-real-time north-star target (BASELINE.md) — the reference itself
publishes no numbers.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    # warm up the relay's device->host path (first sizable fetch per
    # process stalls on the tunneled axon platform)
    np.asarray(jnp.zeros((128, 128)))

    from __graft_entry__ import _MFCC_CFG, _random_model
    from aaltoasr_tpu.formats.feaconf import FeatureConfig
    from aaltoasr_tpu.frontend.generator import FeatureGenerator
    from aaltoasr_tpu.ops.gmm import GmmScorer

    fg = FeatureGenerator(FeatureConfig.parse(_MFCC_CFG))
    # realistic LVCSR operating point: 10k Gaussians, 2.5k tied states
    model = _random_model(G=10000, S=2500, D=39, K=8)
    scorer = GmmScorer.from_model(model)

    B, S_LEN = 32, 16000 * 10          # 32 x 10 s utterances
    rng = np.random.default_rng(0)
    samples = jnp.asarray(rng.normal(0, 1000, (B, S_LEN)).astype(np.float32))
    n_frames_i = fg.num_frames(S_LEN)
    n_frames = jnp.full((B,), n_frames_i, jnp.int32)
    feature_fn = fg._compiled(S_LEN)
    params = fg.params

    @jax.jit
    def pipeline(s, n):
        feats = jax.vmap(lambda a, m: feature_fn(a, m, params))(s, n)
        return jax.vmap(scorer.lna_log_probs)(feats)

    out = pipeline(samples, n_frames)
    out.block_until_ready()

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = pipeline(samples, n_frames)
    out.block_until_ready()
    dt = (time.time() - t0) / iters

    frames = B * n_frames_i
    fps = frames / dt
    xrt = fps / 125.0                   # 125 frames per second of audio
    print(json.dumps({
        "metric": "mfcc_gmm_scoring_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(xrt / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
