"""Adaptation golden parity vs the reference `vtln` and `mllr`
binaries (built offline by tools/build_aku.sh vtln mllr).

A two-speaker corpus (same harmonic content, spectrally scaled for
speaker B) is force-aligned once by the reference aligner; then:

* VTLN: both implementations grid-search warp factors over the SAME
  fixed alignment (`vtln.cc:88-117` -O path vs our
  VtlnEstimator.utterance_lls_aligned).  Asserts the chosen per-speaker
  warp factors in the .spkc are IDENTICAL grid points and the
  per-warp log-likelihood curves (reference --savesum) track ours.
* MLLR/CMLLR: both accumulate over the same alignment and solve the
  same row-iteration system (`aku/mllr.cc:126-145`,
  `MllrTrainer.cc:63-253` vs train/mllr.py) — asserts matrix/bias
  parity row by row in the emitted .spkc.
"""

import os
import re
import subprocess
import sys
import wave

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.spkc import SpeakerConfig

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_stats import aku_bins  # noqa: E402,F401

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="session")
def adapt_bins(aku_bins):
    """vtln/mllr are outside build_aku.sh's default tool list: build
    them on demand into the same build/aku."""
    missing = [t for t in ("vtln", "mllr")
               if not os.path.exists(os.path.join(aku_bins, t))]
    if missing:
        try:
            subprocess.run(
                [os.path.join(REPO, "tools", "build_aku.sh")] + missing,
                check=True, capture_output=True, timeout=600)
        except (subprocess.CalledProcessError,
                subprocess.TimeoutExpired) as e:
            pytest.skip(f"aku vtln/mllr build failed: {e}")
        still = [t for t in missing
                 if not os.path.exists(os.path.join(aku_bins, t))]
        if still:
            pytest.skip(f"aku binaries missing after build: {still}")
    return aku_bins

VTLN_CFG = """\
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
  name vtln
  type vtln
  sources fft
}
module
{
  name mel
  type mel
  sources vtln
}
module
{
  name dct
  type dct
  sources mel
  dim 4
}
"""

MLLR_CFG = """\
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
  dim 4
}
module
{
  name mllr
  type lin_transform
  sources dct
  dim 4
}
"""


def speaker_wave(rng, kind, n=6000):
    """Harmonic audio; speaker 'b' spectrally scaled (shorter vocal
    tract) by generating the same harmonics at scaled frequencies."""
    t = np.arange(n) / 16000.0
    scale = 1.0 if kind == "a" else 1.12
    sig = (2500 * np.sin(2 * np.pi * 500 * scale * t)
           + 1500 * np.sin(2 * np.pi * 1400 * scale * t)
           + 800 * np.sin(2 * np.pi * 2600 * scale * t)
           + 150 * rng.standard_normal(n))
    return np.clip(sig, -32000, 32000).astype("<i2")


def make_adapt_corpus(tmp_path, cfg_text, cfg_name):
    """Model + 2-speaker recipe; returns the recipe path."""
    rng = np.random.default_rng(11)
    from test_train import three_state_model
    model = three_state_model(seed=0, D=4)
    model_io.write_model(str(tmp_path / "am"), model)
    (tmp_path / cfg_name).write_text(cfg_text)
    lines = []
    for spk in ("spk_a", "spk_b"):
        for u in range(2):
            kind = "a" if spk == "spk_a" else "b"
            sig = speaker_wave(rng, kind, 6000 + 400 * u)
            wav = tmp_path / f"{spk}_{u}.wav"
            with wave.open(str(wav), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(sig.tobytes())
            phn = tmp_path / f"{spk}_{u}.phn"
            phn.write_text("_\na\n_\n")
            lines.append(
                f"audio={wav} transcript={phn} "
                f"alignment={tmp_path}/{spk}_{u}.ali.phn "
                f"speaker={spk}")
    (tmp_path / "recipe").write_text("\n".join(lines) + "\n")
    # minimal prior speaker config (vtln -S is mandatory)
    (tmp_path / "in.spkc").write_text(
        "speaker default\n{\n  vtln\n  {\n    warp_factor 1.0\n  }\n}\n")
    (tmp_path / "in_mllr.spkc").write_text(
        "speaker default\n{\n  mllr\n  {\n"
        "    matrix 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1\n"
        "    bias 0 0 0 0\n  }\n}\n")
    return model


def align(aku_bins, tmp_path, cfg_name):
    subprocess.run(
        [os.path.join(aku_bins, "align"), "-b", "am", "-c", cfg_name,
         "-r", "recipe"],
        cwd=tmp_path, check=True, capture_output=True, timeout=300)


def parse_savesum(path):
    """--savesum format: [speaker] then 'warp: ll' lines."""
    out = {}
    cur = None
    for line in open(path):
        m = re.match(r"\[(.+)\]", line.strip())
        if m:
            cur = m.group(1)
            out[cur] = {}
            continue
        m = re.match(r"([-\d.]+):\s*([-\d.]+)", line.strip())
        if m and cur is not None:
            out[cur][round(float(m.group(1)), 4)] = float(m.group(2))
    return out


class TestGoldenVtln:
    def test_warp_factor_and_ll_curve_parity(self, adapt_bins, tmp_path):
        make_adapt_corpus(tmp_path, VTLN_CFG, "vtln.cfg")
        align(adapt_bins, tmp_path, "vtln.cfg")

        subprocess.run(
            [os.path.join(adapt_bins, "vtln"), "-b", "am",
             "-c", "vtln.cfg", "-r", "recipe", "-O", "-v", "vtln",
             "-S", "in.spkc", "-o", "ref.spkc", "-s", "refsum.txt",
             "--grid-size", "11", "--grid-rad", "0.1"],
            cwd=tmp_path, check=True, capture_output=True, timeout=600)

        from aaltoasr_tpu.cli.vtln import main as vtln_main
        prev = os.getcwd()
        os.chdir(tmp_path)
        try:
            vtln_main(["-b", "am", "-c", "vtln.cfg", "-r", "recipe",
                       "-O", "-v", "vtln", "-o", "our.spkc",
                       "--grid-size", "11", "--grid-rad", "0.1"])
        finally:
            os.chdir(prev)

        ref = SpeakerConfig.load(str(tmp_path / "ref.spkc"))
        ours = SpeakerConfig.load(str(tmp_path / "our.spkc"))
        warps = {}
        for spk in ("spk_a", "spk_b"):
            rw = float(ref.speakers[spk][("feature", "vtln")]
                       .get_float("warp_factor"))
            ow = float(ours.speakers[spk][("feature", "vtln")]
                       .get_float("warp_factor"))
            assert rw == pytest.approx(ow, abs=1e-4), spk
            warps[spk] = rw
        # the two speakers must have picked DIFFERENT warps (otherwise
        # the corpus separation is vacuous)
        assert warps["spk_a"] != warps["spk_b"], warps

        # per-warp likelihood curves track: same shape, same argmax,
        # values within the rebuilt-reference float-noise envelope
        refsum = parse_savesum(tmp_path / "refsum.txt")
        from aaltoasr_tpu.formats.phn import read_phn
        from aaltoasr_tpu.formats.recipe import Recipe
        from aaltoasr_tpu.frontend.audio import read_audio
        from aaltoasr_tpu.frontend.generator import FeatureGenerator
        from aaltoasr_tpu.models.hmm import TransitionTable
        from aaltoasr_tpu.ops.gmm import GmmScorer
        from aaltoasr_tpu.train.vtln import (
            VtlnEstimator, alignment_frame_states)
        model = model_io.read_model(str(tmp_path / "am"))
        fg = FeatureGenerator(str(tmp_path / "vtln.cfg"))
        est = VtlnEstimator(model, TransitionTable.from_model(model),
                            GmmScorer.from_model(model), fg, "vtln",
                            radius=0.1, size=11)
        recipe = Recipe.read(str(tmp_path / "recipe"))
        by_spk = {}
        for rinfo in recipe:
            by_spk.setdefault(rinfo.speaker_id, []).append(rinfo)
        for spk, infos in by_spk.items():
            utts = []
            for rinfo in infos:
                samples, _ = read_audio(rinfo.audio_path, fg.sample_rate)
                utts.append((samples, alignment_frame_states(
                    model, read_phn(rinfo.alignment_path), 128)))
            _, total, grid = est.estimate_speaker(utts, aligned=True)
            rcurve = refsum[spk]
            for w, ll in zip(grid, total):
                rll = rcurve[round(float(w), 4)]
                assert ll == pytest.approx(rll, rel=5e-3, abs=2.0), \
                    (spk, w, ll, rll)


class TestGoldenMllr:
    def test_cmllr_transform_parity(self, adapt_bins, tmp_path):
        make_adapt_corpus(tmp_path, MLLR_CFG, "mllr.cfg")
        align(adapt_bins, tmp_path, "mllr.cfg")

        subprocess.run(
            [os.path.join(adapt_bins, "mllr"), "-b", "am",
             "-c", "mllr.cfg", "-r", "recipe", "-O", "-M", "mllr",
             "-S", "in_mllr.spkc", "-o", "refm.spkc", "-f", "10"],
            cwd=tmp_path, check=True, capture_output=True, timeout=600)

        from aaltoasr_tpu.cli.mllr import main as mllr_main
        prev = os.getcwd()
        os.chdir(tmp_path)
        try:
            mllr_main(["-b", "am", "-c", "mllr.cfg", "-r", "recipe",
                       "-O", "-M", "mllr", "--min-frames", "10",
                       "-o", "ourm.spkc"])
        finally:
            os.chdir(prev)

        ref = SpeakerConfig.load(str(tmp_path / "refm.spkc"))
        ours = SpeakerConfig.load(str(tmp_path / "ourm.spkc"))
        for spk in ("spk_a", "spk_b"):
            rc = ref.speakers[spk][("feature", "mllr")]
            oc = ours.speakers[spk][("feature", "mllr")]
            rm = np.asarray(rc.get_float_vec("matrix")).reshape(4, 4)
            om = np.asarray(oc.get_float_vec("matrix")).reshape(4, 4)
            rb = np.asarray(rc.get_float_vec("bias"))
            ob = np.asarray(oc.get_float_vec("bias"))
            # speaker B's transform must be far from identity
            assert np.max(np.abs(rm - om)) < 2e-2, spk
            assert np.max(np.abs(rb - ob)) < 5e-2, spk
        rm_b = np.asarray(ref.speakers["spk_b"][("feature", "mllr")]
                          .get_float_vec("matrix")).reshape(4, 4)
        assert np.max(np.abs(rm_b - np.eye(4))) > 0.05
