"""Exact token-passing engine benchmark (the reference-faithful
accuracy mode: multi-hypothesis (node, lm-state) recombination).

Usage: python benchmarks/bench_exact.py [--batch 128] [--tokens 1024]
       [--overflow 128] [--triphone] [--order 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_decode import synth_task, synth_obs  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--words", type=int, default=1000)
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--records", type=int, default=64)
    p.add_argument("--overflow", type=int, default=128)
    p.add_argument("--prewalk", type=int, default=0)
    p.add_argument("--reentry", type=int, default=0,
                   help="top-K records per entry node (0 = full [E,R])")
    p.add_argument("--reentry-records", type=int, default=0,
                   help="only top-K record slots re-enter (0 = all)")
    p.add_argument("--reentry-prewalk", type=int, default=0,
                   help="top-K flattened [E,R] re-entry candidates "
                        "(0 = all)")
    p.add_argument("--we-beam", type=float, default=0.0)
    p.add_argument("--order", type=int, default=2)
    p.add_argument("--triphone", action="store_true")
    p.add_argument("--profile", action="store_true")
    args = p.parse_args()

    import jax
    from aaltoasr_tpu.decoder.search import BeamSearch, SearchConfig

    np.asarray(jax.numpy.zeros((128, 128)))

    model, tree, fsa = synth_task(num_words=args.words, order=args.order,
                                  triphone=args.triphone,
                                  durations=args.triphone)
    info = synth_task.last_info
    print(f"tree nodes: {tree.num_nodes}, lm states: {fsa.num_states}, "
          f"R: {tree.root_pair_tgt.shape}", flush=True)
    cfg = SearchConfig(
        lm_scale=30.0, duration_scale=3.0 if args.triphone else 0.0,
        num_tokens=args.tokens, num_records=args.records,
        overflow_tokens=args.overflow, we_prewalk=args.prewalk,
        reentry_topk=args.reentry,
        reentry_records=args.reentry_records,
        reentry_prewalk=args.reentry_prewalk,
        word_end_beam=args.we_beam)
    search = BeamSearch(tree, fsa, model, cfg)

    B, T = args.batch, args.frames
    obs_fn, true_words = synth_obs(model, info, B, T)
    obs = jax.jit(obs_fn)(jax.random.PRNGKey(1))
    n = np.full(B, T, np.int32)

    res = search.decode_batch(obs, n, lattice=False)    # compile+warm
    agree = tot = 0
    for b in range(8):
        ref = [f"w{i}" for i in true_words[b]]
        agree += sum(h == r for h, r in zip(res[b].words, ref))
        tot += len(ref)
    print(f"planted-word check {agree}/{tot}", file=sys.stderr)
    if args.profile:
        tdir = "/tmp/jaxtrace_exact"
        with jax.profiler.trace(tdir):
            res = search.decode_batch(obs, n, lattice=False)
        import glob
        import gzip
        from collections import defaultdict
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
        for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:25]:
            aa = a2.get(name, {})
            src = aa.get("source", "")[-55:]
            long = aa.get("long_name", "")[:90]
            print(f"{d/1e3:8.2f} ms x{cnt[name]:5d} {name[:26]:26s} "
                  f"{src} | {long}")
        return
    dt = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        res = search.decode_batch(obs, n, lattice=False)
        run = time.perf_counter() - t0
        print(f"run {i}: {run:.3f}s", file=sys.stderr)
        dt = min(dt, run)
    xrt = (B * T / 125.0) / dt
    print(json.dumps({
        "metric": "exact_decode_realtime_factor",
        "value": round(xrt, 2), "unit": "x realtime/chip",
        "batch": B, "tokens": args.tokens, "overflow": args.overflow,
        "prewalk": args.prewalk, "wall_sec": round(dt, 3)}))


if __name__ == "__main__":
    main()
