"""feadot: dump the feature DAG as a DOT graph (`aku/feadot.cc`)."""

from __future__ import annotations

import argparse
import sys

from aaltoasr_tpu.frontend.generator import FeatureGenerator


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="feadot")
    p.add_argument("-c", "--config", required=True)
    args = p.parse_args(argv)
    FeatureGenerator(args.config).print_dot_graph(sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
