"""morph_lattice: split lattice words into morphs
(`tools/morph_lattice/morph_lattice.cc:6-27`).

Rewrites an SLF word lattice so every word arc becomes a chain of morph
arcs (AM score on the first arc, LM scores cleared for morph-LM
rescoring), optionally inserting a word-boundary morph between words.
"""

from __future__ import annotations

import argparse
import sys

from aaltoasr_tpu.decoder.morpheus import Morpheus
from aaltoasr_tpu.decoder.slf import SlfLattice
from aaltoasr_tpu.formats.arpa import read_arpa
from aaltoasr_tpu.formats.treegram_bin import read_bin


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="morph_lattice")
    p.add_argument("-l", "--lm", required=True, help="morph LM")
    p.add_argument("-b", "--binary", action="store_true")
    p.add_argument("-o", "--out", help="output SLF (default stdout)")
    p.add_argument("-w", "--word-boundary", default="<w>",
                   help="word boundary morph ('' = none)")
    p.add_argument("lattice")
    args = p.parse_args(argv)

    lm = read_bin(args.lm) if args.binary else read_arpa(args.lm)
    m = Morpheus(lm, args.word_boundary or "<w>")
    lat = SlfLattice.read(args.lattice)
    out = SlfLattice(nodes=list(lat.nodes), lm_scale=lat.lm_scale,
                     wdpenalty=lat.wdpenalty, start=lat.start,
                     end=lat.end)
    use_wb = bool(args.word_boundary) and (
        args.word_boundary in lm.word_index)

    def new_node(t):
        out.nodes.append(t)
        return len(out.nodes) - 1

    for a in lat.arcs:
        w = a["W"]
        if w == "!NULL":
            out.arcs.append(dict(a))
            continue
        try:
            morphs = m.segment(w)
        except ValueError:
            print(f"morph_lattice: can not segment {w!r}; keeping",
                  file=sys.stderr)
            out.arcs.append(dict(a))
            continue
        parts = list(morphs)
        if use_wb:
            parts.append(args.word_boundary)
        cur = a["S"]
        t = out.nodes[a["S"]] if a["S"] < len(out.nodes) else 0
        for i, piece in enumerate(parts):
            tgt = a["E"] if i == len(parts) - 1 else new_node(t)
            out.arcs.append({
                "S": cur, "E": tgt, "W": piece,
                "a": a["a"] if i == 0 else 0.0, "l": 0.0})
            cur = tgt
    if args.out:
        out.write(args.out)
    else:
        out.write(sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
