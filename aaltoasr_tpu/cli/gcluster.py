"""gcluster: cluster pool Gaussians -> .gcl file (`aku/gcluster.cc`)."""

from __future__ import annotations

import argparse
import sys

from aaltoasr_tpu.formats.model_io import read_model
from aaltoasr_tpu.train.gcluster import cluster_gaussians, write_gcl


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gcluster")
    p.add_argument("-b", "--base", required=True, help="model base name")
    p.add_argument("-o", "--out", required=True, help="output .gcl file")
    p.add_argument("-C", "--clusters", type=int, default=1000)
    p.add_argument("-i", "--info", type=int, default=0)
    args = p.parse_args(argv)

    model = read_model(args.base)
    assign = cluster_gaussians(model.means, args.clusters)
    write_gcl(args.out, assign, min(args.clusters, model.num_gaussians))
    if args.info > 0:
        print(f"clustered {model.num_gaussians} Gaussians into "
              f"{min(args.clusters, model.num_gaussians)} clusters",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
