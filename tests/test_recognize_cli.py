"""recognize CLI: exact vs dense engines end-to-end on a tiny task
(WAV -> LNA -> decode), including the dense engine's lattice path."""

import os

import numpy as np

from aaltoasr_tpu.formats import model_io

from tests.test_train import three_state_model
from tests.test_train_cli import CFG, write_corpus


def _task(tmp_path):
    rng = np.random.default_rng(11)
    model = three_state_model(seed=5, D=4)
    model_io.write_model(str(tmp_path / "am"), model)
    (tmp_path / "feats.cfg").write_text(CFG)
    recipe = write_corpus(tmp_path, rng)
    (tmp_path / "lex.txt").write_text("aa a a\n_ _\n")
    arpa = ("\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
            "-0.5 <s> -0.3\n-0.5 </s> -0.3\n-0.5 aa -0.3\n-0.9 _ -0.3\n"
            "\n\\2-grams:\n-0.3 <s> aa\n-0.3 aa </s>\n\n\\end\\\n")
    (tmp_path / "lm.arpa").write_text(arpa)
    return recipe


def _run(tmp_path, recipe, capsys, extra):
    from aaltoasr_tpu.cli.recognize import main
    rc = main(["-b", str(tmp_path / "am"),
               "-c", str(tmp_path / "feats.cfg"),
               "-l", str(tmp_path / "lex.txt"),
               "-n", str(tmp_path / "lm.arpa"),
               "-r", str(recipe), "-w", str(tmp_path / "work"),
               "--lm-scale", "2", "--duration-scale", "0"] + extra)
    assert rc in (0, None)
    out = capsys.readouterr().out
    return [ln for ln in out.splitlines() if ln.endswith(")")]


class TestRecognizeEngines:
    def test_dense_matches_exact(self, tmp_path, capsys):
        recipe = _task(tmp_path)
        exact = _run(tmp_path, recipe, capsys, ["--engine", "exact"])
        dense = _run(tmp_path, recipe, capsys,
                     ["--engine", "dense", "--decode-batch", "2"])
        assert len(exact) == 3 and len(dense) == 3
        assert dense == exact

    def test_dense_lattice_path(self, tmp_path, capsys):
        recipe = _task(tmp_path)
        lines = _run(tmp_path, recipe, capsys,
                     ["--engine", "dense", "--lattices"])
        assert len(lines) == 3
        slfs = [f for f in os.listdir(tmp_path / "work" / "lna")
                if f.endswith(".slf")]
        assert len(slfs) == 3

    def test_auto_engine_selection(self, tmp_path, capsys):
        """--engine auto (the default) picks the exact engine below the
        node threshold, prints the selection notice, and matches the
        explicit --engine exact output; the split point itself routes
        large trees to the dense engine (recognize.select_engine)."""
        from aaltoasr_tpu.cli.recognize import (
            AUTO_ENGINE_NODE_THRESHOLD, select_engine)
        assert select_engine(AUTO_ENGINE_NODE_THRESHOLD - 1) == "exact"
        assert select_engine(AUTO_ENGINE_NODE_THRESHOLD) == "dense"
        assert select_engine(287_154) == "dense"
        recipe = _task(tmp_path)
        exact = _run(tmp_path, recipe, capsys, ["--engine", "exact"])
        from aaltoasr_tpu.cli.recognize import main
        rc = main(["-b", str(tmp_path / "am"),
                   "-c", str(tmp_path / "feats.cfg"),
                   "-l", str(tmp_path / "lex.txt"),
                   "-n", str(tmp_path / "lm.arpa"),
                   "-r", str(recipe), "-w", str(tmp_path / "work"),
                   "--lm-scale", "2", "--duration-scale", "0",
                   "--engine", "auto"])
        assert rc in (0, None)
        cap = capsys.readouterr()
        auto = [ln for ln in cap.out.splitlines() if ln.endswith(")")]
        assert auto == exact
        assert "engine auto:" in cap.err and "-> exact" in cap.err

    def test_morph_lm_autodetection(self, tmp_path, capsys):
        """An LM whose unigrams contain '<w>' flips on morph mode
        (rectool.py parse_lm): silence_is_word + word boundary, and
        hypotheses print as rectool-normalized text (morphs joined,
        no boundary/sentence tokens)."""
        recipe = _task(tmp_path)
        # morph lexicon: 'aa' is a morph; '<w>' is the 1-state silence
        (tmp_path / "lex.txt").write_text("aa a a\n<w> _\n")
        arpa = ("\\data\\\nngram 1=4\nngram 2=3\n\n\\1-grams:\n"
                "-0.5 <s> -0.3\n-0.5 </s> -0.3\n-0.5 aa -0.3\n"
                "-0.5 <w> -0.3\n"
                "\n\\2-grams:\n-0.3 <s> aa\n-0.3 aa <w>\n"
                "-0.3 <w> </s>\n\n\\end\\\n")
        (tmp_path / "lm.arpa").write_text(arpa)
        lines = _run(tmp_path, recipe, capsys, [])
        assert len(lines) == 3
        for ln in lines:
            text = ln[:ln.rfind("(")]
            assert "<w>" not in text and "</s>" not in text \
                and "<s>" not in text, ln
