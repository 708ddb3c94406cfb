"""morph_lattice cross parity vs the reference tool
(`tools/morph_lattice/morph_lattice.cc:11-51`, `Latticer.cc:13-92`,
`MorphSet.cc:8-70`), built standalone by the session fixture.

The reference tool segments a text corpus into the lattice of ALL
possible morph paths (for morph-LM training/rescoring).  Parity here
is BYTE-level: same morph set + same text must produce identical
output from the reference binary and from
``aaltoasr_tpu.decoder.morphset.create_lattice`` / the
``morph_lattice --morphset`` CLI, across edge cases (whitespace runs,
unsegmentable characters, prefix morphs, empty input, no trailing
newline).
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.decoder.morphset import MorphSet, create_lattice

REPO = os.path.join(os.path.dirname(__file__), "..")
BUILD = os.path.join(REPO, "build")
TOOL = os.path.join(BUILD, "morph_lattice")
REF_SRC = "/root/reference/tools/morph_lattice"


@pytest.fixture(scope="session")
def ref_tool():
    if os.path.exists(TOOL):
        return TOOL
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference morph_lattice tree unavailable")
    os.makedirs(BUILD, exist_ok=True)
    srcs = ["morph_lattice.cc", "Latticer.cc", "MorphSet.cc",
            "conf.cc", "io.cc", "str.cc"]
    try:
        subprocess.run(
            ["g++", "-O2", "-w", "-std=gnu++0x", "-o", TOOL]
            + [os.path.join(REF_SRC, s) for s in srcs],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"morph_lattice build failed: {e}")
    return TOOL


def run_ref(tool, tmp_path, morphs, text, tag):
    ms = tmp_path / f"{tag}.morphs"
    ms.write_text("\n".join(morphs) + "\n", encoding="latin-1")
    txt = tmp_path / f"{tag}.txt"
    txt.write_bytes(text.encode("latin-1"))
    r = subprocess.run([tool, str(ms), str(txt)],
                       capture_output=True, timeout=60, check=True)
    return r.stdout.decode("latin-1")


def run_ours(morphs, text):
    ms = MorphSet.read("\n".join(morphs) + "\n")
    out = io.StringIO()
    create_lattice(ms, text, out)
    return out.getvalue()


# Finnish-flavoured morph inventory with deliberate prefix nesting
# (a, au, auto; t, ta, talo; ...) so the letter-tree walk emits
# several morphs per start position.
MORPHS = ["a", "au", "auto", "autoilija", "t", "ta", "talo", "talon",
          "lo", "lon", "on", "o", "ilija", "ili", "ja", "kissa", "ki",
          "issa", "ssa", "sa", "s", "koira", "koi", "ra", "ir"]

TEXTS = [
    "auto",                              # single word
    "auto talo",                         # two words
    "  auto\ttalo \n kissa\n",           # whitespace runs, tabs, NL
    "autoilija talossa",                 # 'ssa' unreachable mid-word?
    "xyz auto qqq",                      # unsegmentable words
    "talonkoira",                        # concatenation, no boundary
    "",                                  # empty corpus
    "a",                                 # shortest morph, no trailing NL
    "kissa koira talo auto " * 8,        # longer corpus
    "auto\n\n\ntalo",                    # blank lines
]


class TestMorphLatticeGolden:

    @pytest.mark.parametrize("idx", range(len(TEXTS)))
    def test_byte_parity(self, ref_tool, tmp_path, idx):
        text = TEXTS[idx]
        ref = run_ref(ref_tool, tmp_path, MORPHS, text, f"t{idx}")
        ours = run_ours(MORPHS, text)
        assert ours == ref, (
            f"text {text!r}:\nref:\n{ref}\nours:\n{ours}")

    def test_random_fuzz_parity(self, ref_tool, tmp_path):
        """Random morph sets + random texts over a small alphabet so
        trie walks collide constantly; 20 cases, byte parity."""
        rng = np.random.default_rng(7)
        alpha = "abcde"
        for case in range(20):
            nm = int(rng.integers(3, 15))
            morphs = set()
            while len(morphs) < nm:
                ln = int(rng.integers(1, 5))
                morphs.add("".join(
                    alpha[int(i)] for i in rng.integers(0, 5, ln)))
            morphs = sorted(morphs)
            nw = int(rng.integers(1, 10))
            words = []
            for _ in range(nw):
                ln = int(rng.integers(1, 9))
                words.append("".join(
                    alpha[int(i)] for i in rng.integers(0, 5, ln)))
            sep = [" ", "  ", "\n", "\t", " \n "]
            text = ""
            for w in words:
                text += w + sep[int(rng.integers(0, len(sep)))]
            if rng.random() < 0.5:
                text = text.rstrip()
            ref = run_ref(ref_tool, tmp_path, morphs, text,
                          f"f{case}")
            ours = run_ours(morphs, text)
            assert ours == ref, (case, morphs, text)

    def test_cli_matches_reference(self, ref_tool, tmp_path):
        """The installed CLI (`morph_lattice --morphset`) produces the
        reference bytes end to end, file in / file out."""
        text = "autoilija talossa on kissa"
        ref = run_ref(ref_tool, tmp_path, MORPHS, text, "cli")
        ms = tmp_path / "cli.morphs"
        ms.write_text("\n".join(MORPHS) + "\n")
        txt = tmp_path / "cli.txt"
        txt.write_text(text)
        out = tmp_path / "cli.lat"
        r = subprocess.run(
            [sys.executable, "-m", "aaltoasr_tpu.cli.morph_lattice",
             "--morphset", str(ms), "-o", str(out), str(txt)],
            capture_output=True, timeout=120)
        assert r.returncode == 0, r.stderr.decode()
        assert out.read_text(encoding="latin-1") == ref

    def test_redefine_morph_rejected(self):
        with pytest.raises(ValueError):
            MorphSet.read("auto\nauto\n")


def test_slf_splitting_mode(tmp_path):
    """The other CLI mode (--lm): SLF word arcs become morph chains
    with the AM score on the first arc and LM scores cleared (the
    rectool morph-rescoring preprocessing)."""
    arpa = tmp_path / "morph.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=7\n\n\\1-grams:\n"
        "-0.5 <s>\n-0.5 </s>\n-0.5 <w>\n"
        "-0.5 au\n-0.9 to\n-0.5 ta\n-0.9 lo\n\n\\end\\\n")
    slf = tmp_path / "in.slf"
    slf.write_text(
        "VERSION=1.0\nlmscale=30.0 wdpenalty=0.0\n"
        "N=3 L=2\n"
        "I=0 t=0\nI=1 t=10\nI=2 t=20\n"
        "J=0 S=0 E=1 W=auto a=-100.0 l=-1.0\n"
        "J=1 S=1 E=2 W=talo a=-120.0 l=-2.0\n")
    out = tmp_path / "out.slf"
    r = subprocess.run(
        [sys.executable, "-m", "aaltoasr_tpu.cli.morph_lattice",
         "--lm", str(arpa), "-o", str(out), str(slf)],
        capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    from aaltoasr_tpu.decoder.slf import SlfLattice
    lat = SlfLattice.read(str(out))
    words = [a["W"] for a in lat.arcs]
    # each word became morphs + the word-boundary morph
    assert words == ["au", "to", "<w>", "ta", "lo", "<w>"], words
    # AM score rides the first morph arc only; LM scores cleared
    auto = [a for a in lat.arcs if a["W"] in ("au", "to", "<w>")][:3]
    assert auto[0]["a"] == -100.0 and auto[1]["a"] == 0.0
    assert all(a["l"] == 0.0 for a in lat.arcs)
    # chain connectivity: start of 'au' is original S, end of last
    # piece is original E
    assert lat.arcs[0]["S"] == 0 and lat.arcs[2]["E"] == 1
