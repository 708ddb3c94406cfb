"""segfea: dump features grouped per tied state (`aku/segfea.cc`).

Used for model initialization: with a basebind and state-level
alignments, features of each tied state stream to per-state files (or a
single file with state tags) that an initializer consumes.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from aaltoasr_tpu.formats.phn import read_phn
from aaltoasr_tpu.formats.recipe import Recipe
from aaltoasr_tpu.frontend.audio import read_audio
from aaltoasr_tpu.frontend.generator import FeatureGenerator


def read_basebind(path) -> dict:
    """LABEL NUM_STATES IDX... -> {label: [state ids]}
    (fileformats.html Basebind)."""
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            n = int(parts[1])
            out[parts[0]] = [int(x) for x in parts[2:2 + n]]
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="segfea")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-r", "--recipe", required=True)
    p.add_argument("-B", "--basebind", required=True)
    p.add_argument("-o", "--out-dir", required=True,
                   help="directory for per-state feature dumps")
    p.add_argument("-O", "--ophn", action="store_true",
                   help="use alignment phns")
    p.add_argument("-i", "--info", type=int, default=0)
    args = p.parse_args(argv)

    fg = FeatureGenerator(args.config)
    basebind = read_basebind(args.basebind)
    os.makedirs(args.out_dir, exist_ok=True)
    spf = 16000.0 / fg.frame_rate
    files = {}

    recipe = Recipe.read(args.recipe)
    for rinfo in recipe:
        path = rinfo.alignment_path if args.ophn else rinfo.transcript_path
        if args.info > 0:
            print(f"Processing file: {rinfo.audio_path}", file=sys.stderr)
        samples, _ = read_audio(rinfo.audio_path, fg.sample_rate)
        feats = np.asarray(fg.features(samples))
        for e in read_phn(path):
            if e.start < 0 or e.label not in basebind:
                continue
            states = basebind[e.label]
            state = states[e.state] if 0 <= e.state < len(states) \
                else states[0]
            sf, ef = e.frame_span(spf)
            ef = min(ef, feats.shape[0])
            if ef <= sf:
                continue
            if state not in files:
                files[state] = open(
                    os.path.join(args.out_dir, f"state_{state}.fea"),
                    "ab")
            files[state].write(feats[sf:ef].astype("<f4").tobytes())
    for f in files.values():
        f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
