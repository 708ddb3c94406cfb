"""End-to-end train recipe driver (train.pl parity: EM + MLLT-in-loop
+ gconvert + splitting + durations in one command)."""

import os
import wave

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.recipe import Recipe

from tests.test_train import three_state_model

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
  dim 4
}
module
{
  name mllt
  type lin_transform
  sources dct
  dim 4
}
"""


def write_corpus(tmp_path, rng, n_utts=3):
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
        phn = tmp_path / f"u{u}.phn"
        phn.write_text("\n".join(["_", "a", "_"]) + "\n")
        lines.append(f"audio={wav} transcript={phn}")
    (tmp_path / "corpus.recipe").write_text("\n".join(lines) + "\n")
    return tmp_path / "corpus.recipe"


class TestTrainCli:
    def test_em_with_mllt_split_and_durations(self, tmp_path):
        from aaltoasr_tpu.cli.train import main as train_main
        rng = np.random.default_rng(5)
        model = three_state_model(seed=5, D=4)
        # full-covariance init model: exercises the gconvert stage
        model.cov_type = "full_cov"
        model.gauss_kind = ["full"] * model.num_gaussians
        model.full_covars = {
            g: np.diag(model.covars[g]).copy()
            for g in range(model.num_gaussians)}
        model_io.write_model(str(tmp_path / "init"), model)
        (tmp_path / "feats.cfg").write_text(CFG)
        recipe = write_corpus(tmp_path, rng)

        rc = train_main([
            "-b", str(tmp_path / "init"),
            "-c", str(tmp_path / "feats.cfg"),
            "-r", str(recipe), "-w", str(tmp_path / "work"),
            "--id", "m", "--num-iters", "4",
            "--mllt-start-iter", "3", "--mllt-frequency", "2",
            "--split-frequency", "2", "--split-stop-iter", "4",
            "--split-minocc", "0.1", "--durations", "-i", "0"])
        assert rc in (0, None)
        # gconvert stage ran
        conv = model_io.read_model(str(tmp_path / "work" / "m_0"))
        assert conv.cov_type == "diagonal_cov"
        # all iterations exist; iteration 3 wrote an MLLT config
        for it in range(1, 5):
            assert os.path.exists(tmp_path / "work" / f"m_{it}.ph")
        assert os.path.exists(tmp_path / "work" / "m_3.cfg")
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        cfg3 = FeatureConfig.load(str(tmp_path / "work" / "m_3.cfg"))
        mat = cfg3.by_name["mllt"].config.get_float_vec("matrix")
        A = np.asarray(mat).reshape(4, 4)
        assert not np.allclose(A, np.eye(4))       # a real transform
        assert abs(np.linalg.det(A)) > 1e-3
        # duration model written
        assert os.path.exists(tmp_path / "work" / "m_4.dur")
        # log-likelihood improved from iteration 1 to 4
        summary = (tmp_path / "work" / "m.summary").read_text()
        lls = [float(line.split()[3])
               for line in summary.strip().splitlines()]
        assert lls[-1] > lls[0]

    def test_resume_skips_finished_iterations(self, tmp_path):
        from aaltoasr_tpu.cli.train import main as train_main
        rng = np.random.default_rng(6)
        model = three_state_model(seed=6, D=4)
        model_io.write_model(str(tmp_path / "init"), model)
        (tmp_path / "feats.cfg").write_text(CFG)
        recipe = write_corpus(tmp_path, rng, n_utts=2)
        common = ["-b", str(tmp_path / "init"),
                  "-c", str(tmp_path / "feats.cfg"),
                  "-r", str(recipe), "-w", str(tmp_path / "work"),
                  "--id", "m", "--num-iters", "2",
                  "--mllt-start-iter", "0",
                  "--split-frequency", "0", "-i", "0"]
        assert train_main(common) in (0, None)
        mtime = os.path.getmtime(tmp_path / "work" / "m_2.ph")
        assert train_main(common) in (0, None)      # resume: no rewrite
        assert os.path.getmtime(tmp_path / "work" / "m_2.ph") == mtime
