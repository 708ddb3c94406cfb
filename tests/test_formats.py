"""Round-trip and exactness tests for the interchange-format layer."""

import io
import numpy as np
import pytest

from aaltoasr_tpu.formats.feaconf import FeatureConfig, ModuleConfig
from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.phn import parse_phn_line, read_phn, write_phn, PhnEntry
from aaltoasr_tpu.formats.recipe import Recipe
from aaltoasr_tpu.formats import lna as lna_fmt
from aaltoasr_tpu.formats.spkc import SpeakerConfig


MFCC_CFG = """\
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
}

module
{
  name delta
  type delta
  sources dct
  width 2
}

module
{
  name merge
  type merge
  sources dct delta
}
"""


class TestFeaConf:
    def test_parse_basic(self):
        cfg = FeatureConfig.parse(MFCC_CFG)
        assert [m.name for m in cfg.modules] == [
            "audio", "fft", "mel", "dct", "delta", "merge"]
        assert cfg.base.type == "audiofile"
        assert cfg.by_name["merge"].sources == ["dct", "delta"]
        assert cfg.by_name["audio"].config.get_int("sample_rate") == 16000
        assert cfg.by_name["delta"].config.get_int("width") == 2

    def test_round_trip(self):
        cfg = FeatureConfig.parse(MFCC_CFG)
        text = cfg.dump()
        cfg2 = FeatureConfig.parse(text)
        assert [m.name for m in cfg2.modules] == [m.name for m in cfg.modules]
        assert cfg2.dump() == text  # fixed point

    def test_first_module_must_be_base(self):
        bad = "module\n{\n  name x\n  type fft\n  sources y\n}\n"
        with pytest.raises(ValueError):
            FeatureConfig.parse(bad)

    def test_value_is_rest_of_line(self):
        text = ("module\n{\n  name a\n  type audiofile\n"
                "  vec 1.5 2.5 3.5\n}\n")
        cfg = FeatureConfig.parse(text)
        assert cfg.base.config.get_float_vec("vec") == [1.5, 2.5, 3.5]

    def test_redefined_key_rejected(self):
        text = "module\n{\n  name a\n  type audiofile\n  x 1\n  x 2\n}\n"
        with pytest.raises(ValueError):
            FeatureConfig.parse(text)


def tiny_model():
    """A 2-phone, 3-tied-state, 4-Gaussian diagonal model."""
    means = np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [6.0, 7.0]])
    covars = np.array([[1.0, 2.0], [0.5, 0.5], [2.0, 1.0], [1.0, 1.0]])
    mixtures = [
        (np.array([0, 1], dtype=np.int32), np.array([0.75, 0.25])),
        (np.array([2], dtype=np.int32), np.array([1.0])),
        (np.array([3, 0], dtype=np.int32), np.array([0.5, 0.5])),
    ]
    phones = [
        model_io.HmmPhone(label="a", states=[0, 1]),
        model_io.HmmPhone(label="_", states=[2]),
    ]
    transitions = {
        0: [(0, 0.8), (1, 0.2)],
        1: [(0, 0.6), (1, 0.4)],
        2: [(0, 0.9), (1, 0.1)],
    }
    return model_io.HmmModel(
        dim=2, cov_type="diagonal_cov", means=means, covars=covars,
        mixtures=mixtures, phones=phones, transitions=transitions,
        durations=np.array([[2.0, 1.5], [1.0, 2.0], [3.0, 0.5]]),
    )


class TestModelIO:
    def test_round_trip(self, tmp_path):
        model = tiny_model()
        base = str(tmp_path / "model")
        model_io.write_model(base, model)
        loaded = model_io.read_model(base, read_durations=True)
        np.testing.assert_allclose(loaded.means, model.means)
        np.testing.assert_allclose(loaded.covars, model.covars)
        assert loaded.cov_type == "diagonal_cov"
        assert [p.label for p in loaded.phones] == ["a", "_"]
        assert [p.states for p in loaded.phones] == [[0, 1], [2]]
        for s in range(3):
            got = loaded.transitions[s]
            want = model.transitions[s]
            assert len(got) == len(want)
            for (o1, p1), (o2, p2) in zip(got, want):
                assert o1 == o2
                assert abs(p1 - p2) < 1e-12
        for i in range(3):
            np.testing.assert_allclose(
                loaded.mixtures[i][1], model.mixtures[i][1])
            np.testing.assert_array_equal(
                loaded.mixtures[i][0], model.mixtures[i][0])
        np.testing.assert_allclose(loaded.durations, model.durations,
                                   atol=1e-4)

    def test_ph_exit_transition_encoding(self, tmp_path):
        # exit transition of last state must encode as target "1" (sink)
        model = tiny_model()
        base = str(tmp_path / "m")
        model_io.write_model(base, model)
        text = open(base + ".ph").read().split("\n")
        # phone 'a': 2 states; state line for s=1 (file source 3):
        # self 0->target 3, exit offset 1 -> target 1+2+... = 4 == ns+2 -> 1
        line = [l for l in text if l.startswith("3 ")][0]
        assert " 1 " in f" {line} "  # sink target present

    def test_gauss_constants_match_reference_formula(self):
        model = tiny_model()
        # C = log sqrt(prod(1/cov)) (Distributions.cc:1273-1287)
        want = [np.log(np.sqrt(np.prod(1.0 / c))) for c in model.covars]
        np.testing.assert_allclose(model.gauss_constants(), want, rtol=1e-12)

    def test_mc_weights_normalized_on_read(self, tmp_path):
        p = tmp_path / "x.mc"
        p.write_text("1\n2 0 2.0 1 6.0\n")
        mix = model_io.read_mc(p)
        np.testing.assert_allclose(mix[0][1], [0.25, 0.75])


class TestPhn:
    def test_parse_with_state(self):
        e = parse_phn_line("8448 11776 _-k+o.0 * kolme")
        assert (e.start, e.end) == (8448, 11776)
        assert e.label == "_-k+o"
        assert e.state == 0
        assert e.comment == "* kolme"

    def test_parse_without_times(self):
        e = parse_phn_line("_ some comment")
        assert e.start == -1 and e.end == -1
        assert e.label == "_"

    def test_round_trip(self, tmp_path):
        entries = [
            PhnEntry(0, 1024, "_", -1, ""),
            PhnEntry(1024, 2048, "a", 1, "* word"),
        ]
        p = tmp_path / "t.phn"
        write_phn(p, entries)
        loaded = read_phn(p)
        assert loaded == entries

    def test_frame_conversion(self):
        e = parse_phn_line("19584 19968 n")
        assert e.frame_span(128.0) == (153, 156)


class TestRecipe:
    def test_parse_fields(self):
        r = Recipe.read(["audio=a.wav transcript=t.phn speaker=spk1 "
                         "start-time=1.5 end-time=2.5 start-line=3"])
        info = r.infos[0]
        assert info.audio_path == "a.wav"
        assert info.transcript_path == "t.phn"
        assert info.speaker_id == "spk1"
        assert info.start_time == 1.5
        assert info.end_time == 2.5
        assert info.start_line == 3

    def test_sticky_key_value_map(self):
        # reference quirk: omitted keys inherit the previous line's values
        r = Recipe.read(["audio=a.wav speaker=s1", "audio=b.wav"])
        assert r.infos[1].speaker_id == "s1"

    def test_batch_split_even(self):
        lines = [f"audio={i}.wav" for i in range(10)]
        got = []
        for b in range(1, 6):
            r = Recipe.read(lines, num_batches=5, batch_index=b)
            got.append([i.audio_path for i in r.infos])
        assert got == [[f"{i}.wav", f"{i+1}.wav"] for i in range(0, 10, 2)]

    def test_batch_split_remainder(self):
        lines = [f"audio={i}.wav" for i in range(7)]
        sizes = [len(Recipe.read(lines, num_batches=3, batch_index=b))
                 for b in (1, 2, 3)]
        assert sizes == [3, 2, 2]
        assert sum(sizes) == 7

    def test_cluster_speakers(self):
        lines = ["audio=0 speaker=A", "audio=1 speaker=A",
                 "audio=2 speaker=A", "audio=3 speaker=B"]
        r1 = Recipe.read(lines, 2, 1, cluster_speakers=True)
        r2 = Recipe.read(lines, 2, 2, cluster_speakers=True)
        assert [i.audio_path for i in r1.infos] == ["0", "1", "2"]
        assert [i.audio_path for i in r2.infos] == ["3"]

    def test_comments_skipped(self):
        r = Recipe.read(["# comment", "", "audio=x.wav"])
        assert len(r) == 1


class TestLna:
    def test_2byte_exact_values(self):
        # v = int(-1820*lp + 0.5), big-endian (PhoneProbsToolbox.cc:106-124)
        lp = np.array([[0.0, -1.0, -36.5]])
        payload = lna_fmt.quantize_lna(lp, 2)
        vals = np.frombuffer(payload, dtype=">u2")
        assert vals[0] == 0
        assert vals[1] == int(1820.0 + 0.5)
        assert vals[2] == 0xFFFF  # floored below -36.008

    def test_round_trip_2byte(self, tmp_path):
        rng = np.random.default_rng(0)
        lp = -rng.uniform(0, 30, size=(7, 5)).astype(np.float32)
        p = tmp_path / "x.lna"
        lna_fmt.write_lna(p, lp, 2)
        got, nbytes = lna_fmt.read_lna(p)
        assert nbytes == 2
        assert got.shape == lp.shape
        # quantization step is 1/1820
        assert np.max(np.abs(got - lp)) < 1.0 / 1820.0

    def test_round_trip_4byte(self, tmp_path):
        lp = np.array([[-0.5, -2.25], [-1.0, -3.5]], dtype=np.float32)
        p = tmp_path / "x.lna"
        lna_fmt.write_lna(p, lp, 4)
        got, nbytes = lna_fmt.read_lna(p)
        assert nbytes == 4
        np.testing.assert_array_equal(got, lp)

    def test_header_big_endian(self, tmp_path):
        p = tmp_path / "x.lna"
        lna_fmt.write_lna(p, np.zeros((1, 258), dtype=np.float32), 2)
        data = open(p, "rb").read()
        assert data[:4] == bytes([0, 0, 1, 2])  # 258 big-endian
        assert data[4] == 2


class TestSpkc:
    TEXT = """\
speaker default
{
  vtln
  {
    warp_factor 1.0
  }
}

speaker spk1
{
  vtln
  {
    warp_factor 1.05
  }
  model cmllr
  {
    matrix 1 0 0 1
  }
}
"""

    def test_parse(self):
        sc = SpeakerConfig.parse(self.TEXT)
        p = sc.speaker_params("spk1")
        assert p[("feature", "vtln")].get_float("warp_factor") == 1.05
        assert p[("model", "cmllr")].get_float_vec("matrix") == [1, 0, 0, 1]
        # unknown speaker falls back to default
        d = sc.speaker_params("nobody")
        assert d[("feature", "vtln")].get_float("warp_factor") == 1.0

    def test_round_trip(self):
        sc = SpeakerConfig.parse(self.TEXT)
        sc2 = SpeakerConfig.parse(sc.dump())
        assert sc2.speaker_params("spk1")[("feature", "vtln")].get_float(
            "warp_factor") == 1.05
        assert sc2.default_speaker is not None
