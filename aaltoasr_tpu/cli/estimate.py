"""estimate: the M-step — statistics dumps -> new model
(`aku/estimate.cc:108-430`).

Supported now: ``--ml`` with ``--minvar`` (default 0.1), ``--mixture-minweight``,
``--no-mixture-update``, ``--no-transition-update``, ``-s`` summary.
Discriminative modes (--mmi/--mpe EBW) land with train.ebw.
"""

from __future__ import annotations

import argparse
import sys

from aaltoasr_tpu.formats.model_io import read_model, write_model
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.train.accumulators import HmmStats
from aaltoasr_tpu.train.estimate import estimate_ml


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="estimate")
    p.add_argument("-b", "--base", required=True, help="input model base")
    p.add_argument("-L", "--list", required=True,
                   help="file with one statistics base name per line")
    p.add_argument("-o", "--out", required=True, help="output model base")
    p.add_argument("--ml", action="store_true", help="ML estimation")
    p.add_argument("--minvar", type=float, default=0.1,
                   help="minimum variance (default 0.1)")
    p.add_argument("--mixture-minweight", type=float, default=0.0)
    p.add_argument("--no-mixture-update", action="store_true")
    p.add_argument("--no-transition-update", action="store_true")
    p.add_argument("-s", "--summary", help="write summary file here")
    p.add_argument("-i", "--info", type=int, default=0)
    args = p.parse_args(argv)

    model = read_model(args.base)
    table = TransitionTable.from_model(model)
    stats = HmmStats.zeros(model, table)
    with open(args.list) as f:
        for line in f:
            base = line.strip()
            if base:
                stats.load(base, table)

    new_model = estimate_ml(
        model, table, stats, minvar=args.minvar,
        mixture_minweight=args.mixture_minweight,
        update_mixtures=not args.no_mixture_update,
        update_transitions=not args.no_transition_update)
    write_model(args.out, new_model)

    if args.summary:
        with open(args.summary, "a") as f:
            f.write(f"{args.out} numerator loglikelihood "
                    f"{stats.num_ll:.6g} frames {stats.num_frames}\n")
    if args.info > 0:
        print(f"Log likelihood: {stats.num_ll:.4f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
