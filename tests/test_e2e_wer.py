"""Full-loop integration: train -> recognize -> wer == 0.

Synthesizes a tone corpus (each phone a distinct frequency), trains
with the train CLI from a rough init, decodes the same corpus with the
recognize CLI (both engines), and scores with the wer CLI. Proves the
framework learns end to end through the public tool surface.
"""

import io
import wave
from contextlib import redirect_stdout

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io

CFG = """\
module
{
  name audio
  type audiofile
  sample_rate 16000
}
module
{
  name fft
  type fft
  sources audio
}
module
{
  name mel
  type mel
  sources fft
}
module
{
  name dct
  type dct
  sources mel
  dim 6
}
"""

FREQ = {"a": 350.0, "b": 1400.0, "_": 60.0}
AMP = {"a": 4000.0, "b": 4000.0, "_": 300.0}


def _tone(ph, n, rng):
    t = np.arange(n) / 16000.0
    return (AMP[ph] * np.sin(2 * np.pi * FREQ[ph] * t)
            + 150 * rng.standard_normal(n))


def _write_corpus(tmp_path, rng, utts):
    lines = []
    for name, phones in utts:
        seg = 2400                      # 150 ms per phone
        sig = np.concatenate([_tone(p, seg, rng) for p in phones])
        wav = tmp_path / f"{name}.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.astype("<i2").tobytes())
        phn = tmp_path / f"{name}.phn"
        phn.write_text("\n".join(phones) + "\n")
        lines.append(f"audio={wav} transcript={phn} lna={name}.lna")
    (tmp_path / "train.recipe").write_text("\n".join(lines) + "\n")
    return tmp_path / "train.recipe"


def _init_model(tmp_path, rng):
    """Rough init: per-phone Gaussians at the average tone features."""
    from aaltoasr_tpu.formats.feaconf import FeatureConfig
    from aaltoasr_tpu.frontend.generator import FeatureGenerator
    fg = FeatureGenerator(FeatureConfig.parse(CFG))
    D = fg.dim
    means = np.zeros((3, D))
    for i, ph in enumerate(["a", "b", "_"]):
        sig = _tone(ph, 16000, rng).astype(np.float32)
        feats = fg.features(sig)
        means[i] = np.asarray(feats).mean(axis=0)
    model = model_io.HmmModel(
        dim=D, cov_type="diagonal_cov", means=means,
        covars=np.full((3, D), 4.0),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(3)],
        phones=[model_io.HmmPhone("a", [0]), model_io.HmmPhone("b", [1]),
                model_io.HmmPhone("_", [2])],
        transitions={i: [(0, 0.7), (1, 0.3)] for i in range(3)})
    model_io.write_model(str(tmp_path / "init"), model)
    return str(tmp_path / "init")


@pytest.mark.parametrize("engine", ["exact", "dense"])
def test_train_recognize_wer_zero(tmp_path, engine):
    from aaltoasr_tpu.cli.recognize import main as recognize_main
    from aaltoasr_tpu.cli.train import main as train_main
    from aaltoasr_tpu.cli.wer import main as wer_main

    rng = np.random.default_rng(17)
    utts = [("u0", ["_", "a", "_"]),
            ("u1", ["_", "b", "_"]),
            ("u2", ["_", "a", "b", "_"]),
            ("u3", ["_", "b", "a", "_"]),
            ("u4", ["_", "a", "_", "a", "_"])]
    recipe = _write_corpus(tmp_path, rng, utts)
    (tmp_path / "feats.cfg").write_text(CFG)
    init = _init_model(tmp_path, rng)

    rc = train_main(["-b", init, "-c", str(tmp_path / "feats.cfg"),
                     "-r", str(recipe), "-w", str(tmp_path / "work"),
                     "--id", "m", "--num-iters", "3", "-i", "0"])
    assert rc in (0, None)

    (tmp_path / "lex.txt").write_text("aa a\nbee b\n_ _\n")
    vocab = ["<s>", "</s>", "aa", "bee"]
    arpa = ("\\data\\\nngram 1=4\n\n\\1-grams:\n"
            + "".join(f"-0.6 {w}\n" for w in vocab) + "\n\\end\\\n")
    (tmp_path / "lm.arpa").write_text(arpa)

    out = io.StringIO()
    with redirect_stdout(out):
        rc = recognize_main(
            ["-b", str(tmp_path / "work" / "m_3"),
             "-c", str(tmp_path / "feats.cfg"),
             "-l", str(tmp_path / "lex.txt"),
             "-n", str(tmp_path / "lm.arpa"),
             "-r", str(recipe), "-w", str(tmp_path / ("eval_" + engine)),
             "--lm-scale", "1", "--duration-scale", "0",
             "--engine", engine])
    assert rc in (0, None)
    hyp_lines = [ln for ln in out.getvalue().splitlines()
                 if ln.endswith(")")]
    assert len(hyp_lines) == len(utts)
    (tmp_path / "hyp.trn").write_text("\n".join(hyp_lines) + "\n")

    word_of = {"a": "aa", "b": "bee"}
    refs = [" ".join(word_of[p] for p in phones if p in word_of)
            + f" ({name}.lna)"
            for name, phones in utts]
    (tmp_path / "ref.trn").write_text("\n".join(refs) + "\n")

    out = io.StringIO()
    with redirect_stdout(out):
        rc = wer_main(["-r", str(tmp_path / "ref.trn"),
                       "--hyp", str(tmp_path / "hyp.trn")])
    assert rc == 0
    line = out.getvalue().strip().splitlines()[-1]
    wer = float(line.split("%")[0].split(":")[1])
    assert wer == 0.0, line


def test_wer_tool_counts():
    from aaltoasr_tpu.cli.wer import align_counts
    assert align_counts(list("abc"), list("abc")) == (0, 0, 0)
    assert align_counts(["x", "y"], ["x", "z"]) == (1, 0, 0)
    assert align_counts(["x", "y"], ["x"]) == (0, 1, 0)
    assert align_counts(["x"], ["x", "y"]) == (0, 0, 1)
    s, d, i = align_counts("kitten", "sitting")
    assert s + d + i == 3
