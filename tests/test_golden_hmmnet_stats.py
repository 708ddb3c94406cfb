"""Hmmnet (lattice) E-step golden parity vs the reference `stats -H`.

The crown jewel of the training engine: the reference's beam-pruned
backward/forward over the training FST
(`aku/HmmNetBaumWelch.cc:817` fill_backward_probabilities, `:1079`
create_segmented_lattice) feeding `collect_lattice_stats` /
`simple_train` (`aku/stats.cc:74-186,225`) vs our epsilon-eliminated
dense position-graph forward-backward (`models/hmmnet.compile_hmmnet`
+ `train/estep.masked_forward_backward`).

One MIT-FST file per utterance — written by OUR `transcript_hmmnet`
writer — is read by BOTH implementations (`HmmNetBaumWelch::open`,
`HmmNetBaumWelch.cc:55-163`), so this also proves cross-reader
compatibility of the hmmnet convention.  Coverage:

* plain transcripts with optional-silence skips (epsilon bypass arcs);
* one utterance whose network is the UNION of two transcripts
  (`union_fst` — real alternative paths, like a den-hmmnet);
* all three segmentation modes: bw (Baum-Welch posterior), vit
  (Viterbi), mpv (multipath Viterbi).

Parity bars match test_golden_stats: feacounts and transition counts
track to 1e-4 (bw posteriors are float-accumulated in a different
order), gammas/moments to ~1e-4 relative (the rebuilt reference's
features differ from ours at ~2e-4 absolute), total LL close.
"""

import os
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

REPO = os.path.join(os.path.dirname(__file__), "..")

# transcripts per utterance; utterance 2 gets the UNION of its
# transcript and an alternative ordering (real branching paths)
TRANSCRIPTS = [
    ["_", "a", "_"],
    ["_", "a", "a", "_"],
    ["_", "a", "a", "a", "_"],
]
ALT2 = ["_", "a", "_"]


def make_hmmnet_corpus(tmp_path, n_utts=3, model_seed=5):
    rng = np.random.default_rng(7)
    model = three_state_model(seed=model_seed, D=4)
    model_io.write_model(str(tmp_path / "am"), model)
    (tmp_path / "feats.cfg").write_text(CFG)
    table = TransitionTable.from_model(model)
    lines = []
    for u in range(n_utts):
        n = 4000 + 200 * u
        sig = (2000 * np.sin(2 * np.pi * (300 + 120 * u)
                             * np.arange(n) / 16000)
               + 200 * rng.standard_normal(n)).astype("<i2")
        wav = tmp_path / f"u{u}.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.tobytes())
        fst = transcript_hmmnet(model, table, TRANSCRIPTS[u])
        if u == 2:
            fst = union_fst(fst, transcript_hmmnet(model, table, ALT2))
        net = tmp_path / f"u{u}.fst"
        write_fst(fst, str(net))
        lines.append(f"audio={wav} hmmnet={net}")
    (tmp_path / "recipe").write_text("\n".join(lines) + "\n")
    return model


def load_stats(base, model):
    from aaltoasr_tpu.train.accumulators import HmmStats
    table = TransitionTable.from_model(model)
    st = HmmStats.zeros(model, table)
    st.load(str(base), table)
    return st


def assert_stats_close(ref, ours, gamma_rtol=1e-4, count_atol=1e-4):
    from aaltoasr_tpu.train.accumulators import ML_BUF
    rb, ob = ref.buffers[ML_BUF], ours.buffers[ML_BUF]
    for name, rtol in [("gamma", gamma_rtol), ("mean_acc", 1e-4),
                       ("sec_acc", 1e-4), ("aux_gamma", gamma_rtol),
                       ("mix_gamma", gamma_rtol), ("mix_ll", 1e-3)]:
        a, b = getattr(rb, name), getattr(ob, name)
        scale = max(float(np.max(np.abs(a))), 1e-9)
        err = float(np.max(np.abs(a - b)))
        assert err <= rtol * scale, (name, err, rtol * scale)
    assert np.allclose(rb.feacount, ob.feacount, atol=count_atol), \
        (rb.feacount, ob.feacount)
    assert np.allclose(ref.trans_acc, ours.trans_acc,
                       rtol=1e-4, atol=count_atol)
    assert ref.num_frames == ours.num_frames
    assert ref.num_ll == pytest.approx(ours.num_ll, rel=1e-4)


@pytest.mark.parametrize("mode", ["bw", "vit", "mpv"])
def test_hmmnet_stats_parity(aku_bins, tmp_path, mode):  # noqa: F811
    model = make_hmmnet_corpus(tmp_path)
    env = dict(os.environ)
    subprocess.run(
        [os.path.join(aku_bins, "stats"), "-b", "am",
         "-c", "feats.cfg", "-r", "recipe", "-H", "--ml", "-t",
         "-M", mode, "-F", "10000", "-W", "10000",
         "-o", f"refstats_{mode}"],
        cwd=tmp_path, check=True, capture_output=True,
        timeout=600, env=env)

    from aaltoasr_tpu.cli.stats import main as stats_main
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        stats_main(["-b", "am", "-c", "feats.cfg", "-r", "recipe",
                    "-H", "--ml", "-t", "-M", mode,
                    "-o", f"ourstats_{mode}"])
    finally:
        os.chdir(cwd)

    ref = load_stats(tmp_path / f"refstats_{mode}", model)
    ours = load_stats(tmp_path / f"ourstats_{mode}", model)
    assert_stats_close(ref, ours)
