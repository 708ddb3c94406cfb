"""lattice_rescore cross parity vs the reference tool
(`tools/lattice_rescore/lattice_rescore.cc`, Rescore.hh:20-24 context
expansion), built standalone by the session fixture.

Real decoded lattices (the reference decoder's own SLF word graphs)
are rescored with a SECOND, different LM by both implementations:
the reference binary consumes the cis-binlm2 produced by OUR
`arpa2bin` (cross-format evidence, `formats/treegram_bin.py`), ours
reads the same ARPA — then the rescored lattices' best paths and
total scores must agree.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.decoder.slf import SlfLattice
from aaltoasr_tpu.formats.arpa import ArpaLM, write_arpa

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_decode import (  # noqa: E402,F401
    make_task, ref_driver, synth_lna)

REPO = os.path.join(os.path.dirname(__file__), "..")
BUILD = os.path.join(REPO, "build")
RESCORE = os.path.join(BUILD, "lattice_rescore")
REF_SRC = "/root/reference/tools/lattice_rescore"


@pytest.fixture(scope="session")
def ref_rescore():
    if os.path.exists(RESCORE):
        return RESCORE
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference lattice_rescore tree unavailable")
    os.makedirs(BUILD, exist_ok=True)
    srcs = ["lattice_rescore.cc", "Lattice.cc", "Rescore.cc",
            "TreeGram.cc", "Vocabulary.cc", "conf.cc", "io.cc",
            "str.cc", "Endian.cc"]   # TreeGramArpaReader needs headers
    try:                             # outside this tree; binary LM only
        subprocess.run(
            ["g++", "-O2", "-w", "-std=gnu++0x", "-o", RESCORE]
            + [os.path.join(REF_SRC, s) for s in srcs],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"lattice_rescore build failed: {e}")
    return RESCORE


def second_lm(tmp_path, wi, seed=5):
    """A different bigram over the same vocabulary (new scores +
    extra mass redistribution) to make rescoring change best paths."""
    rng = np.random.default_rng(seed)
    vocab = sorted(wi, key=wi.get)
    words = [w for w in vocab if w not in ("<s>", "</s>")]
    uni = {(wi[w],): (round(float(-0.5 - 2.5 * rng.random()), 4), -0.3)
           for w in vocab}
    uni[(wi["<s>"],)] = (-99.0, -0.3)
    bi = {}
    for a in ["<s>"] + words:
        for b in words + ["</s>"]:
            if rng.random() < 0.7:
                bi[(wi[a], wi[b])] = (
                    round(float(-0.1 - 2.0 * rng.random()), 4), 0.0)
    lm = ArpaLM(order=2, vocab=vocab, word_index=wi,
                ngrams=[{}, uni, bi])
    arpa = str(tmp_path / "lm2.arpa")
    write_arpa(lm, arpa)
    # our arpa2bin -> cis-binlm2 for the reference tool
    from aaltoasr_tpu.cli.arpa2bin import main as arpa2bin_main
    binp = str(tmp_path / "lm2.bin")
    arpa2bin_main([arpa, binp])
    return arpa, binp


class TestGoldenRescore:
    def test_rescore_parity_on_decoded_lattices(self, ref_driver,
                                                ref_rescore, tmp_path):
        model, lex, wi = make_task(tmp_path, seed=3)
        arpa2, bin2 = second_lm(tmp_path, wi)

        agree = 0
        checked = 0
        for i, seq in enumerate([["aba"], ["ca", "bac"],
                                 ["ab", "cab", "ca"], ["cab"],
                                 ["bac", "ab"]]):
            lna = synth_lna(tmp_path, model, lex, seq, seed=40 + i,
                            noise=1.0, name=f"r{i}.lna")
            slf = str(tmp_path / f"lat{i}.slf")
            subprocess.run(
                [ref_driver, "--ph", str(tmp_path / "m.ph"),
                 "--lex", str(tmp_path / "lex.dict"),
                 "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
                 "--beam", "400", "--token-limit", "100000",
                 "--lm-scale", "10", "--dur-scale", "0",
                 "--trans-scale", "1", "--no-crossword",
                 "--wordgraph", slf],
                check=True, capture_output=True, timeout=300)

            # reference rescore (binary LM from OUR arpa2bin)
            ref_out = str(tmp_path / f"ref_resc{i}.slf")
            subprocess.run(
                [ref_rescore, "-l", bin2, "-i", slf, "-o", ref_out,
                 "-f", "-q"],
                check=True, capture_output=True, timeout=300)

            # our rescore (same ARPA)
            from aaltoasr_tpu.cli.lattice_rescore import (
                main as rescore_main)
            our_out = str(tmp_path / f"our_resc{i}.slf")
            rescore_main(["-l", arpa2, "-o", our_out, slf])

            rl = SlfLattice.read(ref_out)
            ol = SlfLattice.read(our_out)
            # identical lm_scale conventions for comparison
            rl.lm_scale = ol.lm_scale = 10.0
            rw, rs = rl.best_path()
            ow, os_ = ol.best_path()
            strip = lambda ws: [w for w in ws if w not in
                                ("<s>", "</s>", "!NULL", "_", "__")]
            checked += 1
            if strip(rw) == strip(ow):
                agree += 1
                assert rs == pytest.approx(os_, abs=0.05), i
        assert agree == checked, f"{agree}/{checked} rescored " \
                                 f"best paths identical"

    def test_rescore_changes_ranking(self, ref_driver, ref_rescore,
                                     tmp_path):
        """Sanity: the second LM actually flips at least one best path
        vs the original lattice's (otherwise the parity above is
        vacuous)."""
        model, lex, wi = make_task(tmp_path, seed=3)
        arpa2, bin2 = second_lm(tmp_path, wi)
        flipped = 0
        for i, seq in enumerate([["aba"], ["ca", "bac"], ["cab"],
                                 ["ab", "cab", "ca"], ["bac", "ab"],
                                 ["ca"]]):
            lna = synth_lna(tmp_path, model, lex, seq, seed=90 + i,
                            noise=2.5, name=f"f{i}.lna")
            slf = str(tmp_path / f"flat{i}.slf")
            subprocess.run(
                [ref_driver, "--ph", str(tmp_path / "m.ph"),
                 "--lex", str(tmp_path / "lex.dict"),
                 "--arpa", str(tmp_path / "lm.arpa"), "--lna", lna,
                 "--beam", "400", "--token-limit", "100000",
                 "--lm-scale", "10", "--dur-scale", "0",
                 "--trans-scale", "1", "--no-crossword",
                 "--wordgraph", slf],
                check=True, capture_output=True, timeout=300)
            lat = SlfLattice.read(slf)
            before = lat.best_path()[0]
            from aaltoasr_tpu.cli.lattice_rescore import (
                main as rescore_main)
            our_out = str(tmp_path / f"our_f{i}.slf")
            rescore_main(["-l", arpa2, "-o", our_out, slf])
            after = SlfLattice.read(our_out)
            after.lm_scale = 10.0
            if after.best_path()[0] != before:
                flipped += 1
        assert flipped >= 1, "second LM never changed any best path"
