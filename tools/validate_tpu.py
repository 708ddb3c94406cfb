"""One-command hardware validation: train -> recognize -> WER on the
live chip, both engines, through the public CLI surface.

The CPU test suite covers correctness; this script proves the same
full loop on real TPU hardware (jit/dispatch/relay paths differ).
Run: python tools/validate_tpu.py   (uses a temp dir, ~2 min)
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests"))

import numpy as np  # noqa: E402


def main() -> int:
    from tests.test_e2e_wer import CFG, _init_model, _write_corpus
    from aaltoasr_tpu.cli.recognize import main as recognize_main
    from aaltoasr_tpu.cli.train import main as train_main
    from aaltoasr_tpu.cli.wer import main as wer_main

    rng = np.random.default_rng(17)
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        utts = [("u0", ["_", "a", "_"]), ("u1", ["_", "b", "_"]),
                ("u2", ["_", "a", "b", "_"]),
                ("u3", ["_", "b", "a", "_"])]
        recipe = _write_corpus(tmp, rng, utts)
        (tmp / "feats.cfg").write_text(CFG)
        init = _init_model(tmp, rng)
        rc = train_main(["-b", init, "-c", str(tmp / "feats.cfg"),
                         "-r", str(recipe), "-w", str(tmp / "work"),
                         "--id", "m", "--num-iters", "2", "-i", "0"])
        assert rc in (0, None), "train failed"
        (tmp / "lex.txt").write_text("aa a\nbee b\n_ _\n")
        arpa = ("\\data\\\nngram 1=4\n\n\\1-grams:\n" + "".join(
            f"-0.6 {w}\n" for w in ["<s>", "</s>", "aa", "bee"])
            + "\n\\end\\\n")
        (tmp / "lm.arpa").write_text(arpa)
        word_of = {"a": "aa", "b": "bee"}
        refs = [" ".join(word_of[p] for p in ph if p in word_of)
                + f" ({n}.lna)" for n, ph in utts]
        (tmp / "ref.trn").write_text("\n".join(refs) + "\n")

        ok = True
        for engine in ("exact", "dense"):
            out = io.StringIO()
            with redirect_stdout(out):
                rc = recognize_main(
                    ["-b", str(tmp / "work" / "m_2"),
                     "-c", str(tmp / "feats.cfg"),
                     "-l", str(tmp / "lex.txt"),
                     "-n", str(tmp / "lm.arpa"),
                     "-r", str(recipe),
                     "-w", str(tmp / ("ev_" + engine)),
                     "--lm-scale", "1", "--duration-scale", "0",
                     "--engine", engine])
            assert rc in (0, None), f"recognize {engine} failed"
            hyp = [ln for ln in out.getvalue().splitlines()
                   if ln.endswith(")")]
            (tmp / "hyp.trn").write_text("\n".join(hyp) + "\n")
            out = io.StringIO()
            with redirect_stdout(out):
                wer_main(["-r", str(tmp / "ref.trn"),
                          "--hyp", str(tmp / "hyp.trn")])
            line = out.getvalue().strip().splitlines()[-1]
            print(f"{engine}: {line}")
            ok &= line.startswith("WER: 0.00%")
        print("VALIDATE_TPU", "OK" if ok else "FAILED")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
