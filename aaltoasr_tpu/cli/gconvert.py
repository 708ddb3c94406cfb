"""gconvert: convert Gaussian covariance types (`aku/gconvert.cc`).

Used by train.pl after tying to turn the full-covariance initial model
diagonal (train.pl:222-229).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from aaltoasr_tpu.formats.model_io import read_model, write_model


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gconvert")
    p.add_argument("-b", "--base", required=True, help="input model base")
    p.add_argument("-o", "--out", required=True, help="output model base")
    p.add_argument("-d", "--diagonal", action="store_true",
                   help="convert to diagonal covariances")
    p.add_argument("-f", "--full", action="store_true",
                   help="convert to full covariances")
    args = p.parse_args(argv)

    model = read_model(args.base)
    if args.diagonal:
        # covars already hold the diagonal (model_io extracts it on read)
        model.cov_type = "diagonal_cov"
        model.full_covars = {}
        model.gauss_kind = ["diag"] * model.num_gaussians
    elif args.full:
        model.cov_type = "full_cov"
        model.full_covars = {
            g: np.diag(model.covars[g])
            for g in range(model.num_gaussians)}
        model.gauss_kind = ["full"] * model.num_gaussians
    write_model(args.out, model)
    return 0


if __name__ == "__main__":
    sys.exit(main())
