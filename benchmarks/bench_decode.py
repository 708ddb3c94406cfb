"""Batched LVCSR decode benchmark (dense mode).

Synthetic but realistically-shaped task: ~1k-word lexicon over a
25-phone 3-state inventory (~9k tree nodes), bigram backoff FSA,
batch of 10-second utterances.  Prints one JSON line with the
real-time factor per chip.

Usage: python benchmarks/bench_decode.py [--batch 64] [--frames 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_task(num_words=1000, num_phones=25, seed=0, order=2):
    from aaltoasr_tpu.decoder.lexicon import build_prefix_tree
    from aaltoasr_tpu.decoder.ngram import NGramFsa
    from aaltoasr_tpu.formats import model_io
    from aaltoasr_tpu.formats.arpa import ArpaLM

    rng = np.random.default_rng(seed)
    phones = [f"p{i}" for i in range(num_phones)] + ["_"]
    D = 39
    S = 3 * len(phones)
    means = rng.normal(0, 2, (S, D))
    model = model_io.HmmModel(
        dim=D, cov_type="diagonal_cov", means=means,
        covars=np.ones((S, D)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=[model_io.HmmPhone(p, [3 * i, 3 * i + 1, 3 * i + 2])
                for i, p in enumerate(phones)],
        transitions={i: [(0, 0.5), (1, 0.5)] for i in range(S)})

    lex_lines = ["_ _"]
    words = []
    for w in range(num_words):
        n = int(rng.integers(3, 9))
        pron = " ".join(phones[int(rng.integers(num_phones))]
                        for _ in range(n))
        words.append(f"w{w}")
        lex_lines.append(f"w{w} {pron}")

    vocab = ["<s>", "</s>"] + words
    word_index = {w: i for i, w in enumerate(vocab)}
    uni = {(word_index[v],): (float(np.log(1.0 / len(vocab))), -0.7)
           for v in vocab}
    bi = {}
    for _ in range(num_words * 10):
        a = word_index[words[int(rng.integers(num_words))]]
        b = word_index[words[int(rng.integers(num_words))]]
        bo = -0.5 if order > 2 else 0.0
        bi[(a, b)] = (float(np.log(0.01 + rng.random() * 0.05)), bo)
    grams = [{}, uni, bi]
    if order >= 3:
        tri = {}
        bikeys = list(bi)
        for _ in range(num_words * 20):
            a, b = bikeys[int(rng.integers(len(bikeys)))]
            c = word_index[words[int(rng.integers(num_words))]]
            tri[(a, b, c)] = (
                float(np.log(0.02 + rng.random() * 0.1)), 0.0)
        grams.append(tri)
    lm = ArpaLM(order=order, vocab=vocab, word_index=word_index,
                ngrams=grams)

    from aaltoasr_tpu.decoder.lexicon import read_lexicon
    tree = build_prefix_tree(model, read_lexicon("\n".join(lex_lines)))
    fsa = NGramFsa.from_arpa(lm)
    return model, tree, fsa


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--words", type=int, default=1000)
    p.add_argument("--records", type=int, default=32,
                   help="word-end records per frame (lattice richness)")
    p.add_argument("--order", type=int, default=2,
                   help="n-gram order of the synthetic LM")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aaltoasr_tpu.decoder.search import SearchConfig
    from aaltoasr_tpu.decoder.search_dense import DenseBeamSearch

    # axon relay warm-up: first sizable device->host fetch stalls
    np.asarray(jnp.zeros((128, 128)))

    model, tree, fsa = synth_task(num_words=args.words, order=args.order)
    print(f"tree nodes: {tree.num_nodes}, lm states: {fsa.num_states}",
          flush=True)
    cfg = SearchConfig(lm_scale=30.0, duration_scale=0.0,
                       num_records=args.records)
    search = DenseBeamSearch(tree, fsa, model, cfg)

    B, T = args.batch, args.frames
    rng = np.random.default_rng(1)
    # obs staged on device (production LNAs are produced on-chip by the
    # scoring pipeline; host->device upload is not part of decode)
    obs = jnp.asarray(
        rng.normal(-5, 2, (B, T, model.num_states)).astype(np.float32))
    n = np.full(B, T, np.int32)

    res = search.decode_batch(obs, n, lattice=False)   # compile+run
    t0 = time.perf_counter()
    res = search.decode_batch(obs, n, lattice=False)
    dt = time.perf_counter() - t0
    # reference operating point is 125 fps (doc/feature_configuration.
    # txt:50-56): T frames = T/125 seconds of audio
    audio_sec = B * T / 125.0
    xrt = audio_sec / dt
    print(json.dumps({
        "metric": "dense_decode_realtime_factor",
        "value": round(xrt, 2), "unit": "x realtime/chip",
        "batch": B, "frames": T, "wall_sec": round(dt, 3)}))


if __name__ == "__main__":
    main()
