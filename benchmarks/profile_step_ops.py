"""Trace the actual DenseBeamSearch decode and print top device ops
with their source lines.

Usage: python benchmarks/profile_step_ops.py [--triphone] [--batch 64]
       [--frames 100] [--words 1000]
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

from bench_decode import synth_task, synth_obs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--words", type=int, default=1000)
    p.add_argument("--triphone", action="store_true")
    p.add_argument("--order", type=int, default=2)
    p.add_argument("--engine", choices=["dense", "exact"],
                   default="dense")
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--overflow", type=int, default=128)
    p.add_argument("--prewalk", type=int, default=256)
    p.add_argument("--reentry", type=int, default=0)
    p.add_argument("--reentry-records", type=int, default=0)
    p.add_argument("--reentry-prewalk", type=int, default=0)
    p.add_argument("--records", type=int, default=64)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig
    from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch

    np.asarray(jnp.zeros((128, 128)))

    model, tree, fsa = synth_task(num_words=a.words, order=a.order,
                                  triphone=a.triphone,
                                  durations=a.triphone)
    info = synth_task.last_info
    print(f"nodes {tree.num_nodes} lm {fsa.num_states}", flush=True)
    if a.engine == "exact":
        cfg = SearchConfig(lm_scale=30.0,
                           duration_scale=3.0 if a.triphone else 0.0,
                           num_tokens=a.tokens, num_records=a.records,
                           overflow_tokens=a.overflow,
                           we_prewalk=a.prewalk,
                           reentry_topk=a.reentry,
                           reentry_records=a.reentry_records,
                           reentry_prewalk=a.reentry_prewalk)
        search = BeamSearch(tree, fsa, model, cfg)
    else:
        cfg = SearchConfig(lm_scale=30.0,
                           duration_scale=3.0 if a.triphone else 0.0,
                           num_records=32, records_half=True)
        search = DenseBeamSearch(tree, fsa, model, cfg)
    B, T = a.batch, a.frames
    obs_fn, _ = synth_obs(model, info, B, T)
    obs = jax.jit(obs_fn)(jax.random.PRNGKey(1))
    n = np.full((B,), T, np.int32)

    res = search.decode_batch(obs, n, lattice=False)
    del res

    tdir = "/tmp/jaxtrace2"
    with jax.profiler.trace(tdir):
        res = search.decode_batch(obs, n, lattice=False)
        del res

    files = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz",
                             recursive=True))
    data = json.load(gzip.open(files[-1]))
    dur = defaultdict(float)
    cnt = defaultdict(int)
    args = {}
    total = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            dur[name] += e["dur"]
            cnt[name] += 1
            total += e["dur"]
            if name not in args and "args" in e:
                args[name] = e["args"]
    print(f"total traced: {total/1e3:.1f} ms over {T} frames "
          f"({total/1e3/T:.3f} ms/frame)")
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:40]
    for name, d in top:
        aa = args.get(name, {})
        src = aa.get("source", "")[-60:]
        long = aa.get("long_name", "")[:110]
        print(f"{d/1e3:8.2f} ms x{cnt[name]:5d} {name[:28]:28s} "
              f"{src} | {long}")


if __name__ == "__main__":
    main()
