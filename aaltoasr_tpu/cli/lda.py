"""lda: LDA transform estimation -> lin_transform module (`aku/lda.cc`)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from aaltoasr_tpu.formats.feaconf import FeatureConfig
from aaltoasr_tpu.formats.model_io import read_model
from aaltoasr_tpu.formats.phn import read_phn
from aaltoasr_tpu.formats.recipe import Recipe
from aaltoasr_tpu.frontend.audio import read_audio
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.train.lda import LdaAccumulator


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lda")
    p.add_argument("-b", "--base", required=True,
                   help="model base (for tied-state classes)")
    p.add_argument("-c", "--config", required=True,
                   help="feature configuration (source features)")
    p.add_argument("-r", "--recipe", required=True)
    p.add_argument("-o", "--out", required=True,
                   help="output feature configuration")
    p.add_argument("-M", "--module", default="lda",
                   help="lin_transform module to fill")
    p.add_argument("-d", "--dim", type=int, required=True,
                   help="output dimension")
    p.add_argument("-O", "--ophn", action="store_true")
    p.add_argument("-i", "--info", type=int, default=0)
    args = p.parse_args(argv)

    model = read_model(args.base)
    cfg = FeatureConfig.load(args.config)
    fg = FeatureGenerator(cfg)
    label_states = {ph.label: ph.states for ph in model.phones}
    acc = LdaAccumulator(model.num_states, fg.dim)
    spf = 16000.0 / fg.frame_rate

    recipe = Recipe.read(args.recipe)
    for rinfo in recipe:
        path = rinfo.alignment_path if args.ophn else rinfo.transcript_path
        if args.info > 0:
            print(f"Processing file: {rinfo.audio_path}", file=sys.stderr)
        samples, _ = read_audio(rinfo.audio_path, fg.sample_rate)
        feats = np.asarray(fg.features(samples))
        for e in read_phn(path):
            if e.start < 0 or e.label not in label_states:
                continue
            sts = label_states[e.label]
            state = sts[e.state] if 0 <= e.state < len(sts) else sts[0]
            sf, ef = e.frame_span(spf)
            ef = min(ef, feats.shape[0])
            if ef > sf:
                acc.add(state, feats[sf:ef])

    W = acc.solve(args.dim)
    spec = cfg.by_name[args.module]
    spec.config.set("dim", args.dim)
    spec.config.set("matrix", [float(x) for x in W.reshape(-1)])
    cfg.save(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
