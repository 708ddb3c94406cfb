"""XLA-trace op profile of the dense decoder at a chosen task point.

Usage: python benchmarks/profile_dense.py [--words 10000] [--order 3]
       [--triphone] [--durations] [--batch 128] [--frames 1000]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from bench_decode import synth_task, synth_obs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--words", type=int, default=10000)
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--triphone", action="store_true")
    p.add_argument("--durations", action="store_true", default=True)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--records", type=int, default=32)
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    import jax
    from aaltoasr_tpu.decoder.search import SearchConfig
    from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch

    np.asarray(jax.numpy.zeros((128, 128)))
    model, tree, fsa = synth_task(
        num_words=args.words, order=args.order,
        triphone=args.triphone, durations=args.durations)
    info = synth_task.last_info
    print(f"tree nodes: {tree.num_nodes}, lm states: {fsa.num_states}",
          flush=True)
    cfg = SearchConfig(lm_scale=30.0,
                       duration_scale=3.0 if args.durations else 0.0,
                       num_records=args.records, records_half=True)
    search = DenseBeamSearch(tree, fsa, model, cfg)
    B, T = args.batch, args.frames
    obs_fn, _ = synth_obs(model, info, B, T)
    obs = jax.jit(obs_fn)(jax.random.PRNGKey(1))
    n = np.full(B, T, np.int32)
    search.decode_batch(obs, n, lattice=False)     # compile + warm

    tdir = "/tmp/jaxtrace_dense"
    with jax.profiler.trace(tdir):
        search.decode_batch(obs, n, lattice=False)
    files = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz",
                             recursive=True))
    data = json.load(gzip.open(files[-1]))
    dur = defaultdict(float)
    cnt = defaultdict(int)
    a2 = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            if e["name"] not in a2 and "args" in e:
                a2[e["name"]] = e["args"]
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:args.top]:
        aa = a2.get(name, {})
        src = aa.get("source", "")[-55:]
        long = aa.get("long_name", "")[:90]
        print(f"{d/1e3:8.2f} ms x{cnt[name]:5d} {name[:26]:26s} "
              f"{src} | {long}")


if __name__ == "__main__":
    main()
