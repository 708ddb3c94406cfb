"""decode_stream: raw audio on stdin -> streaming recognition
(`decoder/decode-stream.cc`).

The canonical end-to-end streaming pipeline: 16-bit raw audio arrives
in chunks, features and GMM state log-probs are computed for each new
block of frames (with the feature DAG's context window honored via
``features_range`` over the running sample buffer), and every frame is
pushed through the one-frame-acoustics token-passing search
(Toolbox::set_one_frame + run, the OneFrameAcoustics push model).
Partial hypotheses print as they improve; the final hypothesis prints
at end of stream.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="decode_stream")
    p.add_argument("-b", "--base", required=True, help="model base")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-l", "--lexicon", required=True)
    p.add_argument("-n", "--ngram", required=True)
    p.add_argument("-d", "--dur", default="")
    p.add_argument("--lm-scale", type=float, default=30.0)
    p.add_argument("--beam", type=float, default=280.0)
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--block-frames", type=int, default=32,
                   help="decode granularity in frames")
    p.add_argument("--raw-sample-rate", type=int, default=16000)
    p.add_argument("--partials", action="store_true",
                   help="print partial hypotheses per block")
    p.add_argument("--partial-every", type=int, default=0, metavar="K",
                   help="fetch+print a partial hypothesis every K "
                        "frames (pipelined consumer: pushes stay "
                        "device-only between fetches)")
    p.add_argument("file", nargs="?",
                   help="raw audio file (default stdin)")
    args = p.parse_args(argv)

    from aaltoasr_tpu.decoder.toolbox import Toolbox
    from aaltoasr_tpu.models.phone_probs import PhoneProbs
    from aaltoasr_tpu.formats.model_io import read_model

    model = read_model(args.base)
    pp = PhoneProbs(model, args.config)
    fg = pp.fg

    t = Toolbox(args.base + ".ph", args.dur)
    t.lex_read(args.lexicon)
    t.ngram_read(args.ngram)
    t.set_global_beam(args.beam)
    t.set_token_limit(args.tokens)
    t.set_lm_scale(args.lm_scale)
    stream = t.use_one_frame_acoustics()

    src = open(args.file, "rb") if args.file else sys.stdin.buffer
    buf = np.zeros(0, dtype=np.float32)
    done_frames = 0
    import jax.numpy as jnp
    from aaltoasr_tpu.ops.logsemiring import logsumexp

    last_partial = 0

    def flush_frames(upto: int):
        nonlocal done_frames, last_partial
        while done_frames < upto:
            hi = min(done_frames + args.block_frames, upto)
            feats = fg.features_range(buf, done_frames, hi)
            sll = pp.scorer.lna_log_probs(jnp.asarray(feats))
            # the whole block in ONE device dispatch (decode-stream.cc
            # pushes every frame available per audio read; the scan
            # form amortizes the remote runtime's per-dispatch floor)
            stream.push_frames(sll)
            done_frames = hi
            if args.partials:
                words = stream.result().words
                print(f"[{done_frames}] {' '.join(words)}",
                      file=sys.stderr)
            elif (args.partial_every
                  and done_frames - last_partial >= args.partial_every):
                # pipelined consumer: K frames of pure device pushes,
                # then a DEVICE traceback + one tiny id-buffer fetch
                # (StreamingDecoder.partial — no record flush)
                last_partial = done_frames
                words = stream.partial()
                print(f"[{done_frames}] {' '.join(words)}",
                      file=sys.stderr)

    chunk_bytes = args.raw_sample_rate  # half a second of s16le
    while True:
        data = src.read(chunk_bytes)
        if not data:
            break
        samples = np.frombuffer(data, dtype="<i2").astype(np.float32)
        buf = np.concatenate([buf, samples])
        # frames fully determined so far: leave the feature DAG's right
        # context worth of frames pending until more audio arrives
        total = fg.num_frames(len(buf))
        safe = max(total - 16, 0)
        flush_frames(safe)
    flush_frames(fg.num_frames(len(buf)))
    if args.file:
        src.close()

    res = stream.result()
    print(" ".join(res.words))
    return 0


if __name__ == "__main__":
    sys.exit(main())
