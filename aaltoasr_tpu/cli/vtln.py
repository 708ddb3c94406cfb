"""vtln: ML warp-factor grid search per speaker -> .spkc
(`aku/vtln.cc:153-260`)."""

from __future__ import annotations

import argparse
import sys

from aaltoasr_tpu.cli.phone_probs import load_model
from aaltoasr_tpu.formats.feaconf import FeatureConfig, ModuleConfig
from aaltoasr_tpu.formats.model_io import read_model
from aaltoasr_tpu.formats.phn import read_phn
from aaltoasr_tpu.formats.recipe import Recipe
from aaltoasr_tpu.formats.spkc import SpeakerConfig
from aaltoasr_tpu.frontend.audio import read_audio
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train.vtln import VtlnEstimator


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vtln")
    p.add_argument("-b", "--base")
    p.add_argument("-g", "--gk"), p.add_argument("-m", "--mc")
    p.add_argument("-p", "--ph")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-r", "--recipe", required=True)
    p.add_argument("-o", "--out", required=True, help="output .spkc")
    p.add_argument("-v", "--vtln-module", default="vtln",
                   help="name of the vtln module in the config")
    p.add_argument("-O", "--ophn", action="store_true",
                   help="use output (alignment) phns: fixed-"
                        "segmentation likelihood (vtln.cc -O)")
    p.add_argument("-S", "--speakers", help="prior speaker config")
    p.add_argument("--grid-size", type=int, default=21)
    p.add_argument("--grid-rad", type=float, default=0.1)
    p.add_argument("-B", "--batch", type=int, default=0)
    p.add_argument("-I", "--bindex", type=int, default=0)
    p.add_argument("-i", "--info", type=int, default=0)
    args = p.parse_args(argv)

    model = load_model(args)
    if isinstance(model, str):
        model = read_model(model)
    fg = FeatureGenerator(args.config)
    table = TransitionTable.from_model(model)
    scorer = GmmScorer.from_model(model)
    est = VtlnEstimator(model, table, scorer, fg, args.vtln_module,
                        radius=args.grid_rad, size=args.grid_size)

    recipe = Recipe.read(args.recipe, args.batch, args.bindex)
    by_speaker: dict = {}
    for rinfo in recipe:
        by_speaker.setdefault(rinfo.speaker_id, []).append(rinfo)

    spkc = SpeakerConfig()
    for speaker, infos in by_speaker.items():
        utts = []
        for rinfo in infos:
            samples, _ = read_audio(rinfo.audio_path, fg.sample_rate)
            if args.ophn:
                from aaltoasr_tpu.train.vtln import (
                    alignment_frame_states)
                entries = read_phn(rinfo.alignment_path)
                spf = round(fg.sample_rate / fg.frame_rate)
                utts.append((samples, alignment_frame_states(
                    model, entries, spf)))
            else:
                labels = [e.label
                          for e in read_phn(rinfo.transcript_path)]
                utts.append((samples, labels))
        warp, total, warps = est.estimate_speaker(utts,
                                                  aligned=args.ophn)
        if args.info > 0:
            print(f"{speaker or '(default)'}: warp {warp:.3f}",
                  file=sys.stderr)
        cfg = ModuleConfig()
        cfg.set("warp_factor", warp)
        spkc.speakers.setdefault(speaker or "default", {})[
            ("feature", args.vtln_module)] = cfg
    spkc.save(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
