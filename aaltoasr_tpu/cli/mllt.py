"""mllt: estimate a semi-tied (MLLT) transform and apply it.

Equivalent of `estimate --mllt` (`aku/estimate.cc:372`, HmmSet.hh:407):
accumulates full second-moment statistics over the recipe, solves the
semi-tied transform, rewrites the model into MLLT space and composes the
transform into the feature config's lin_transform module.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from aaltoasr_tpu.formats.feaconf import FeatureConfig
from aaltoasr_tpu.formats.model_io import read_model, write_model
from aaltoasr_tpu.formats.phn import read_phn
from aaltoasr_tpu.formats.recipe import Recipe
from aaltoasr_tpu.frontend.audio import read_audio
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.models.hmm import (
    TransitionTable, build_chain, pad_chain)
from aaltoasr_tpu.ops.gmm import GmmScorer
from aaltoasr_tpu.train.mllt import (
    apply_mllt, compose_into_config, full_second_moment_stats,
    solve_mllt)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mllt")
    p.add_argument("-b", "--base", required=True, help="input model base")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-r", "--recipe", required=True)
    p.add_argument("-o", "--out", required=True, help="output model base")
    p.add_argument("-C", "--out-config", required=True,
                   help="output feature configuration")
    p.add_argument("-M", "--module", default="mllt",
                   help="lin_transform module carrying the transform")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("-i", "--info", type=int, default=0)
    args = p.parse_args(argv)

    model = read_model(args.base)
    table = TransitionTable.from_model(model)
    scorer = GmmScorer.from_model(model)
    fg = FeatureGenerator(args.config)

    Gp = scorer.score_matrix.shape[1]
    gamma = np.zeros(Gp)
    m1 = np.zeros((Gp, model.dim))
    m2 = np.zeros((Gp, model.dim, model.dim))
    recipe = Recipe.read(args.recipe)
    for rinfo in recipe:
        if args.info > 0:
            print(f"Processing file: {rinfo.audio_path}", file=sys.stderr)
        samples, _ = read_audio(rinfo.audio_path, fg.sample_rate)
        feats = fg.features(samples)
        labels = [e.label for e in read_phn(rinfo.transcript_path)]
        chain = build_chain(model, table, labels)
        graph = {k: jnp.asarray(v) for k, v in
                 pad_chain(chain, chain.num_positions).items()}
        out = full_second_moment_stats(
            scorer, feats, graph, jnp.int32(feats.shape[0]), Gp)
        gamma += np.asarray(out["gamma"], dtype=np.float64)
        m1 += np.asarray(out["m1"], dtype=np.float64)
        m2 += np.asarray(out["m2_full"], dtype=np.float64)

    G = model.num_gaussians
    A = solve_mllt(gamma[:G], m1[:G], m2[:G], iters=args.iters)
    if args.info > 0:
        print(f"MLLT determinant: {np.linalg.det(A):.6f}",
              file=sys.stderr)
    write_model(args.out, apply_mllt(model, A))
    cfg = FeatureConfig.load(args.config)
    compose_into_config(cfg, A, args.module)
    cfg.save(args.out_config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
