"""Knob sweep for the exact engine at the cross-word + duration
(+ optional trigram) operating point.  One process, one task build,
many SearchConfig variants; prints one line per config.

Usage: python benchmarks/sweep_exact_xw.py [--order 2] [--frames 600]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_decode import synth_task, synth_obs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--order", type=int, default=2)
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--words", type=int, default=1000)
    p.add_argument("--configs", type=str, default="")
    args = p.parse_args()

    import jax
    from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig

    np.asarray(jax.numpy.zeros((128, 128)))
    model, tree, fsa = synth_task(num_words=args.words, order=args.order,
                                  triphone=True, durations=True)
    info = synth_task.last_info
    print(f"tree nodes: {tree.num_nodes}, lm states: {fsa.num_states}, "
          f"R: {tree.root_pair_tgt.shape}", flush=True)

    B, T = args.batch, args.frames
    obs_fn, true_words = synth_obs(model, info, B, T)
    obs = jax.jit(obs_fn)(jax.random.PRNGKey(1))
    n = np.full(B, T, np.int32)

    base = dict(lm_scale=30.0, duration_scale=3.0, num_tokens=1024,
                num_records=64, overflow_tokens=128)
    variants = [
        dict(reentry_records=8),
        dict(reentry_records=8, reentry_prewalk=16),
        dict(reentry_records=8, reentry_prewalk=8),
        dict(reentry_records=4, reentry_prewalk=8),
        dict(reentry_records=8, reentry_prewalk=16, we_prewalk=256),
        dict(reentry_records=8, reentry_prewalk=8, we_prewalk=256),
        dict(reentry_records=8, reentry_prewalk=8, we_prewalk=256,
             num_records=32),
    ]
    if args.configs:
        import json
        variants = [json.loads(s) for s in args.configs.split(";")]

    for var in variants:
      try:
        cfg = SearchConfig(**{**base, **var})
        search = BeamSearch(tree, fsa, model, cfg)
        res = search.decode_batch(obs, n, lattice=False)
        agree = tot = 0
        for b in range(8):
            ref = [f"w{i}" for i in true_words[b]]
            agree += sum(h == r for h, r in zip(res[b].words, ref))
            tot += len(ref)
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = search.decode_batch(obs, n, lattice=False)
            dt = min(dt, time.perf_counter() - t0)
        xrt = (B * T / 125.0) / dt
        print(f"{var} -> {xrt:.1f}x RT ({dt:.3f}s), "
              f"agree {agree}/{tot}", flush=True)
      except Exception as e:                     # noqa: BLE001
        print(f"{var} -> FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
