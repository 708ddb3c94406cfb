"""Trace the actual DenseBeamSearch._decode and print top device ops
with their source lines."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_decode import synth_task  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from aaltoasr_tpu.decoder.search import SearchConfig
    from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch

    np.asarray(jnp.zeros((128, 128)))

    model, tree, fsa = synth_task(num_words=1000)
    cfg = SearchConfig(lm_scale=30.0, duration_scale=0.0,
                       num_records=32)
    search = DenseBeamSearch(tree, fsa, model, cfg)
    B, T = 64, 100
    rng = np.random.default_rng(1)
    obs = jnp.asarray(
        rng.normal(-5, 2, (B, T, model.num_states)), jnp.float32)
    n = jnp.full((B,), T, jnp.int32)
    lm_init = jnp.asarray(np.atleast_1d(np.asarray(
        search.lm.initial_state("<s>"), dtype=np.int32)))

    fn = jax.jit(jax.vmap(search._decode, in_axes=(0, 0, None)))
    out = fn(obs, n, lm_init)
    jax.block_until_ready(out)

    tdir = "/tmp/jaxtrace2"
    with jax.profiler.trace(tdir):
        out = fn(obs, n, lm_init)
        jax.block_until_ready(out)

    files = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz",
                             recursive=True))
    data = json.load(gzip.open(files[-1]))
    dur = defaultdict(float)
    cnt = defaultdict(int)
    args = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            dur[name] += e["dur"]
            cnt[name] += 1
            if name not in args and "args" in e:
                args[name] = e["args"]
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:30]
    for name, d in top:
        a = args.get(name, {})
        src = a.get("source", "")[-60:]
        long = a.get("long_name", "")[:100]
        print(f"{d/1e3:8.2f} ms x{cnt[name]:5d} {name[:24]:24s} "
              f"{src} | {long}")


if __name__ == "__main__":
    main()
