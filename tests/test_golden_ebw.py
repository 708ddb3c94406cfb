"""Discriminative (MMI/EBW) training golden parity vs the reference.

End-to-end anchor for the `train_ebw.pl` recipe
(`aku/scripts/train_ebw.pl:40-74`): numerator + denominator hmmnets →
`stats --mmi` num/den accumulation (`aku/stats.cc:605-740`
create_segmented_lattice per network, `collect_lattice_stats` into the
ML and MMI buffers at :225-306) → `estimate --mmi` EBW Gaussian/weight
updates (`aku/estimate.cc:21-60`, `Distributions.cc:416-716`) → one
more iteration, tracking the MMI objective.

Both implementations read the SAME recipe (hmmnet= + den-hmmnet=
MIT-FST files written by our `transcript_hmmnet`/`union_fst`) and, for
the M-step test, the SAME reference-produced statistics dumps — so
each stage is isolated exactly as in test_golden_estimate.

Reference quirks pinned here:
* the discriminative path never accumulates transition statistics
  (`collect_lattice_stats` has no transition branch; only the ML-only
  `simple_train` path does), so the .phs dump carries zero counts;
* `num_frames` is counted while walking the DENOMINATOR lattice
  (stats.cc:737 count_frames=true on the den pass only) — same value,
  different provenance.
"""

import os
import re
import subprocess
import sys
import wave

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.fst import write_fst
from aaltoasr_tpu.models.hmm import TransitionTable
from aaltoasr_tpu.models.hmmnet import transcript_hmmnet, union_fst

sys.path.insert(0, os.path.dirname(__file__))

from test_train import three_state_model  # noqa: E402
from test_train_cli import CFG  # noqa: E402
from test_golden_stats import aku_bins  # noqa: E402,F401
from test_golden_estimate import assert_models_close  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")

# numerator transcript and denominator alternatives (truth included —
# the standard den-hmmnet construction) per utterance
UTTS = [
    (["_", "a", "_"],
     [["_", "a", "_"], ["_", "a", "a", "_"]]),
    (["_", "a", "a", "_"],
     [["_", "a", "a", "_"], ["_", "a", "_"], ["_", "a", "a", "a", "_"]]),
    (["_", "a", "a", "a", "_"],
     [["_", "a", "a", "a", "_"], ["_", "a", "_"]]),
]


def make_mmi_corpus(tmp_path, model_seed=5):
    rng = np.random.default_rng(13)
    model = three_state_model(seed=model_seed, D=4)
    model_io.write_model(str(tmp_path / "am"), model)
    (tmp_path / "feats.cfg").write_text(CFG)
    table = TransitionTable.from_model(model)
    lines = []
    for u, (truth, alts) in enumerate(UTTS):
        n = 4000 + 250 * u
        sig = (2000 * np.sin(2 * np.pi * (280 + 110 * u)
                             * np.arange(n) / 16000)
               + 200 * rng.standard_normal(n)).astype("<i2")
        wav = tmp_path / f"u{u}.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        num = transcript_hmmnet(model, table, truth)
        write_fst(num, str(tmp_path / f"u{u}.fst"))
        den = transcript_hmmnet(model, table, alts[0])
        for alt in alts[1:]:
            den = union_fst(den, transcript_hmmnet(model, table, alt))
        write_fst(den, str(tmp_path / f"u{u}_den.fst"))
        lines.append(f"audio={wav} hmmnet={tmp_path}/u{u}.fst "
                     f"den-hmmnet={tmp_path}/u{u}_den.fst")
    (tmp_path / "recipe").write_text("\n".join(lines) + "\n")
    return model


def read_lls(path):
    out = {}
    for line in open(path):
        m = re.match(r"([^:]+):\s*(\S+)", line)
        if m:
            out[m.group(1).strip()] = float(m.group(2))
    return out


def ref_stats_mmi(aku_bins, cwd, base, out, env, mode="bw"):
    subprocess.run(
        [os.path.join(aku_bins, "stats"), "-b", base, "-c", "feats.cfg",
         "-r", "recipe", "-H", "--mmi", "-t", "-M", mode,
         "-F", "10000", "-W", "10000", "-o", out],
        cwd=cwd, check=True, capture_output=True, timeout=600, env=env)


def our_stats_mmi(cwd, base, out, mode="bw"):
    from aaltoasr_tpu.cli.stats import main as stats_main
    prev = os.getcwd()
    os.chdir(cwd)
    try:
        stats_main(["-b", base, "-c", "feats.cfg", "-r", "recipe",
                    "-H", "--mmi", "-t", "-M", mode, "-o", out])
    finally:
        os.chdir(prev)


def load_stats(base, model, mmi=True):
    from aaltoasr_tpu.train.accumulators import (
        HmmStats, PDF_ML_STATS, PDF_MMI_STATS)
    table = TransitionTable.from_model(model)
    mode = PDF_ML_STATS | (PDF_MMI_STATS if mmi else 0)
    st = HmmStats.zeros(model, table, mode)
    st.load(str(base), table)
    return st


def assert_buffer_close(rb, ob, gamma_rtol=1e-4, count_atol=1e-4):
    for name, rtol in [("gamma", gamma_rtol), ("mean_acc", 1e-4),
                       ("sec_acc", 1e-4), ("aux_gamma", gamma_rtol),
                       ("mix_gamma", gamma_rtol), ("mix_ll", 1e-3)]:
        a, b = getattr(rb, name), getattr(ob, name)
        scale = max(float(np.max(np.abs(a))), 1e-9)
        err = float(np.max(np.abs(a - b)))
        assert err <= rtol * scale, (name, err, rtol * scale)
    assert np.allclose(rb.feacount, ob.feacount, atol=count_atol), \
        (rb.feacount, ob.feacount)


@pytest.mark.parametrize("mode", ["bw", "mpv"])
def test_mmi_stats_parity(aku_bins, tmp_path, mode):  # noqa: F811
    """stats --mmi: num (ML buffer) + den (MMI buffer) dump parity and
    .lls numerator/denominator/MMI-score parity, bw and the production
    `-M mpv` segmentation (train_ebw.pl:57 STATS_MODE)."""
    from aaltoasr_tpu.train.accumulators import ML_BUF, MMI_BUF
    model = make_mmi_corpus(tmp_path)
    env = dict(os.environ)
    ref_stats_mmi(aku_bins, tmp_path, "am", f"ref_{mode}", env, mode)
    our_stats_mmi(tmp_path, "am", f"our_{mode}", mode)

    ref = load_stats(tmp_path / f"ref_{mode}", model)
    ours = load_stats(tmp_path / f"our_{mode}", model)
    assert_buffer_close(ref.buffers[ML_BUF], ours.buffers[ML_BUF])
    assert_buffer_close(ref.buffers[MMI_BUF], ours.buffers[MMI_BUF])
    assert np.allclose(ref.trans_acc, ours.trans_acc, atol=1e-4)
    assert ref.num_frames == ours.num_frames

    rl = read_lls(tmp_path / f"ref_{mode}.lls")
    ol = read_lls(tmp_path / f"our_{mode}.lls")
    for key in ("Numerator loglikelihood", "Denominator loglikelihood",
                "MMI score"):
        assert ol[key] == pytest.approx(rl[key], rel=1e-4, abs=2e-3), key
    assert ol["Number of frames"] == rl["Number of frames"]


def test_mmi_ebw_estimate_and_iteration(aku_bins, tmp_path):  # noqa: F811
    """estimate --mmi EBW M-step parity on the SAME reference dumps,
    then a second stats+estimate iteration tracking the MMI objective
    (the train_ebw.pl loop, one fold)."""
    model = make_mmi_corpus(tmp_path)
    env = dict(os.environ)

    # ---- iteration 1: reference stats; both EBW M-steps on the SAME
    # dumps -> model parity
    ref_stats_mmi(aku_bins, tmp_path, "am", "it1", env, "mpv")
    (tmp_path / "it1.lst").write_text("it1\n")
    subprocess.run(
        [os.path.join(aku_bins, "estimate"), "-b", "am", "-L", "it1.lst",
         "-o", "refnew1", "--mmi", "--minvar", "0.1"],
        cwd=tmp_path, check=True, capture_output=True, timeout=600,
        env=env)
    from aaltoasr_tpu.cli.estimate import main as estimate_main
    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        estimate_main(["-b", "am", "-L", "it1.lst", "-o", "ournew1",
                       "--mmi", "--minvar", "0.1"])
    finally:
        os.chdir(prev)
    ref1 = model_io.read_model(str(tmp_path / "refnew1"))
    our1 = model_io.read_model(str(tmp_path / "ournew1"))
    assert_models_close(ref1, our1, rtol=1e-4)

    mmi0 = read_lls(tmp_path / "it1.lls")["MMI score"]

    # ---- iteration 2: stats from each new model via the REFERENCE
    # binary (isolating the M-step difference); MMI objective must
    # track between implementations and improve over iteration 1
    ref_stats_mmi(aku_bins, tmp_path, "refnew1", "it2ref", env, "mpv")
    ref_stats_mmi(aku_bins, tmp_path, "ournew1", "it2our", env, "mpv")
    mmi1_ref = read_lls(tmp_path / "it2ref.lls")["MMI score"]
    mmi1_our = read_lls(tmp_path / "it2our.lls")["MMI score"]
    assert mmi1_our == pytest.approx(mmi1_ref, rel=1e-4, abs=2e-3)
    assert mmi1_ref > mmi0

    (tmp_path / "it2ref.lst").write_text("it2ref\n")
    (tmp_path / "it2our.lst").write_text("it2our\n")
    subprocess.run(
        [os.path.join(aku_bins, "estimate"), "-b", "refnew1",
         "-L", "it2ref.lst", "-o", "refnew2", "--mmi", "--minvar", "0.1"],
        cwd=tmp_path, check=True, capture_output=True, timeout=600,
        env=env)
    os.chdir(tmp_path)
    try:
        estimate_main(["-b", "ournew1", "-L", "it2our.lst",
                       "-o", "ournew2", "--mmi", "--minvar", "0.1"])
    finally:
        os.chdir(prev)
    ref2 = model_io.read_model(str(tmp_path / "refnew2"))
    our2 = model_io.read_model(str(tmp_path / "ournew2"))
    assert_models_close(ref2, our2, rtol=1e-3)
