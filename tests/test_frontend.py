"""Frontend tests: the vectorized DAG vs an independent per-frame oracle.

The oracle below re-implements the documented per-frame semantics
(`aku/doc/feature_configuration.txt`, FeatureModules.cc) directly in NumPy
with recursive pull evaluation — deliberately mirroring the reference's
frame-at-a-time structure rather than the vectorized implementation, so the
two act as independent cross-checks (the reference's own
random_feature_test.cc plays the same role, `aku/tests/Makefile:11-12`).
"""

import math

import numpy as np
import pytest

from aaltoasr_tpu.formats.feaconf import FeatureConfig
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.frontend import modules as M


# ---------------------------------------------------------------------------
# per-frame oracle
# ---------------------------------------------------------------------------

class Oracle:
    def __init__(self, config: FeatureConfig, samples: np.ndarray):
        self.config = config
        self.samples = np.asarray(samples, dtype=np.float64)
        base = config.base.config
        self.rate = base.get_int("sample_rate")
        self.frame_rate = base.get_float("frame_rate", 125.0)
        self.W = base.get_int("window_width",
                              int(2 * self.rate / self.frame_rate))
        self.adv = self.rate / self.frame_rate
        self.coef = base.get_float("pre_emph_coef", 0.97)
        self.n_frames = int((len(self.samples) - self.W - 1) / self.adv) + 1
        self.cache = {}

    def at(self, name: str, frame: int) -> np.ndarray:
        key = (name, frame)
        if key not in self.cache:
            self.cache[key] = self.gen(name, frame)
        return self.cache[key]

    def gen(self, name: str, frame: int) -> np.ndarray:
        spec = self.config.by_name[name]
        cfg = spec.config
        srcs = spec.sources

        if spec.type == "audiofile":
            f = min(max(frame, 0), self.n_frames - 1)  # copy_borders
            ws = int(f * self.adv)
            s = self.samples
            return np.array([s[ws + t + 1] - self.coef * s[ws + t]
                             for t in range(self.W)])

        if spec.type == "fft":
            x = self.at(srcs[0], frame)
            n = len(x)
            ham = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1.0))
            spec_c = np.fft.rfft(x * ham)
            p = spec_c.real ** 2 + spec_c.imag ** 2
            if cfg.get_int("magnitude", 1):
                p = np.sqrt(p)
            if cfg.get_int("log", 0):
                p = np.log(p)
            return p

        if spec.type == "mel":
            x = self.at(srcs[0], frame)
            dim = M.mel_dim(self.rate)
            edges = M.mel_bin_edges(dim, self.rate, len(x))
            out = np.zeros(dim)
            for b in range(dim):
                val = ssum = 0.0
                beg = float(edges[b]) - 1.0
                end = float(edges[b + 1])
                t = int(max(math.ceil(beg), 0.0))
                while t < end:
                    sc = (t - beg) / (end - beg)
                    val += sc * x[t]
                    ssum += sc
                    t += 1
                beg2, end2 = end, float(edges[b + 2])
                while t < end2:
                    sc = (end2 - t) / (end2 - beg2)
                    val += sc * x[t]
                    ssum += sc
                    t += 1
                if cfg.get_int("root", 0):
                    out[b] = (val / ssum) ** 0.1
                else:
                    out[b] = np.log(val / ssum + 1)
            return out

        if spec.type == "power":
            x = self.at(srcs[0], frame)
            return np.array([np.log(np.sum(x) + 1e-10)])

        if spec.type == "dct":
            x = self.at(srcs[0], frame)
            dim = cfg.get_int("dim", 12)
            zeroth = cfg.get_int("zeroth", 0)
            out = np.zeros(dim)
            bias = 0
            if zeroth:
                out[0] = np.sum(x)
                bias = 1
            for i in range(dim - bias):
                out[i + bias] = sum(
                    x[b] * math.cos((i + 1) * (b + 0.5) * math.pi / len(x))
                    for b in range(len(x)))
            return out

        if spec.type == "delta":
            w = cfg.get_int("width", 2)
            norm = cfg.get_float(
                "normalization", 2 * w * (w + 1) * (2 * w + 1) / 6)
            out = np.zeros_like(self.at(srcs[0], frame))
            for k in range(1, w + 1):
                out = out + k * (self.at(srcs[0], frame + k)
                                 - self.at(srcs[0], frame - k))
            return out / norm

        if spec.type == "normalization":
            x = self.at(srcs[0], frame)
            mean = np.array(cfg.get_float_vec("mean", [0.0] * len(x)))
            if cfg.exists("var"):
                scale = 1 / np.sqrt(np.array(cfg.get_float_vec("var")))
            else:
                scale = np.array(cfg.get_float_vec("scale", [1.0] * len(x)))
            return (x - mean) * scale

        if spec.type == "lin_transform":
            x = self.at(srcs[0], frame)
            dim = cfg.get_int("dim", len(x))
            mat = cfg.get_float_vec("matrix")
            A = (np.array(mat).reshape(dim, len(x)) if mat
                 else np.eye(dim, len(x)))
            b = np.array(cfg.get_float_vec("bias", [0.0] * dim))
            return A @ x + b

        if spec.type == "merge":
            return np.concatenate([self.at(s, frame) for s in srcs])

        if spec.type == "mean_subtractor":
            left = cfg.get_int("left", 75)
            right = cfg.get_int("right", 75)
            vals = [self.at(srcs[0], frame + i)
                    for i in range(-left, right + 1)]
            return self.at(srcs[0], frame) - np.mean(vals, axis=0)

        if spec.type == "concat":
            left = cfg.get_int("left", 0)
            right = cfg.get_int("right", 0)
            return np.concatenate([self.at(srcs[0], frame + i)
                                   for i in range(-left, right + 1)])

        if spec.type == "vtln":
            x = self.at(srcs[0], frame)
            wf = getattr(self, "warp_factor", 1.0)
            bins = M.vtln_bins(len(x), wf, bool(cfg.get_int("pwlin_vtln", 0)),
                               cfg.get_float("pwlin_turnpoint", 0.8), None)
            rad = cfg.get_int("sinc_interpolation_rad", 8)
            lanczos = cfg.get_int("lanczos_window", 1) > 0
            out = np.zeros_like(x)
            if rad > 0:
                for b in range(len(x)):
                    cent = int(bins[b] + 0.5)
                    lo, hi = max(cent - rad, 0), min(cent + rad + 1, len(x))
                    t = 0.0
                    for i in range(lo, hi):
                        c = M._sinc(float(i - bins[b]))
                        if lanczos:
                            c = (c * M._sinc(float(i - bins[b]) / rad)
                                 if abs(i - bins[b]) < rad else 0.0)
                        t += x[i] * c
                    out[b] = max(t, 0.0)
            else:
                for b in range(len(x)):
                    p = math.ceil(bins[b]) - bins[b]
                    out[b] = (p * x[int(math.floor(bins[b]))]
                              + (1 - p) * x[int(math.ceil(bins[b]))])
            return out

        raise ValueError(f"oracle: unknown type {spec.type}")

    def features(self) -> np.ndarray:
        last = self.config.last.name
        return np.stack([self.at(last, f) for f in range(self.n_frames)])


# ---------------------------------------------------------------------------
# configs under test
# ---------------------------------------------------------------------------

def cfg_mfcc_full() -> str:
    """MFCC + power, CMS, deltas + accels, merge — the standard recipe shape."""
    return """\
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
  name power
  type power
  sources fft
}
module
{
  name cat
  type merge
  sources dct power
}
module
{
  name cms
  type mean_subtractor
  sources cat
  left 10
  right 10
}
module
{
  name delta
  type delta
  sources cms
  width 2
}
module
{
  name accel
  type delta
  sources delta
  width 2
}
module
{
  name out
  type merge
  sources cms delta accel
}
"""


def make_audio(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    sig = (3000 * np.sin(2 * np.pi * 440 * t / 16000)
           + 1500 * np.sin(2 * np.pi * 1330 * t / 16000)
           + 500 * rng.standard_normal(n))
    return np.round(sig).astype(np.float32)


class TestFrontend:
    def test_mfcc_full_matches_oracle(self):
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        audio = make_audio(4000)
        fg = FeatureGenerator(cfg)
        got = np.asarray(fg.features(audio))
        want = Oracle(cfg, audio).features()
        assert got.shape == want.shape
        assert got.shape[1] == 13 * 3
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_num_frames_formula(self):
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        fg = FeatureGenerator(cfg)
        # (n - W - 1)/adv + 1 with W=256, adv=128
        assert fg.num_frames(4000) == int((4000 - 256 - 1) / 128.0) + 1
        assert fg.num_frames(257) == 1

    def test_dims(self):
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        fg = FeatureGenerator(cfg)
        assert fg.module_dim("fft") == 129
        assert fg.module_dim("mel") == 21
        assert fg.module_dim("dct") == 12
        assert fg.module_dim("cat") == 13
        assert fg.dim == 39

    def test_batch_matches_single(self):
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        fg = FeatureGenerator(cfg)
        a1 = make_audio(4000, seed=1)
        a2 = make_audio(3000, seed=2)
        pad = np.zeros((2, 4000), dtype=np.float32)
        pad[0] = a1
        pad[1, :3000] = a2
        out = np.asarray(fg.features_batch(pad, np.array([4000, 3000])))
        np.testing.assert_allclose(
            out[0], np.asarray(fg.features(a1)), rtol=1e-5, atol=1e-5)
        t2 = fg.num_frames(3000)
        np.testing.assert_allclose(
            out[1, :t2], np.asarray(fg.features(a2)), rtol=1e-5, atol=1e-5)

    def test_border_copy_semantics(self):
        # delta at frame 0 must use the frame-0 border copy on the left
        text = """\
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
  name delta
  type delta
  sources mel
  width 2
}
"""
        cfg = FeatureConfig.parse(text)
        audio = make_audio(2000)
        fg = FeatureGenerator(cfg)
        got = np.asarray(fg.features(audio))
        want = Oracle(cfg, audio).features()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_vtln_pwlin_warp(self):
        text = """\
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
  pwlin_vtln 1
}
module
{
  name mel
  type mel
  sources vtln
}
"""
        cfg = FeatureConfig.parse(text)
        audio = make_audio(2000)
        fg = FeatureGenerator(cfg)
        from aaltoasr_tpu.formats.feaconf import ModuleConfig
        pc = ModuleConfig()
        pc.set("warp_factor", 1.1)
        fg.set_parameters("vtln", pc)
        got = np.asarray(fg.features(audio))
        o = Oracle(cfg, audio)
        o.warp_factor = 1.1
        want = o.features()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        # identity warp must differ from warp 1.1
        fg2 = FeatureGenerator(cfg)
        base = np.asarray(fg2.features(audio))
        assert np.abs(base - got).max() > 1e-3

    def test_config_round_trip_same_features(self):
        # write the config back out, reload, same features
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        audio = make_audio(2000)
        f1 = np.asarray(FeatureGenerator(cfg).features(audio))
        cfg2 = FeatureConfig.parse(cfg.dump())
        f2 = np.asarray(FeatureGenerator(cfg2).features(audio))
        np.testing.assert_array_equal(f1, f2)

    def test_audio_too_short_raises(self):
        cfg = FeatureConfig.parse(cfg_mfcc_full())
        fg = FeatureGenerator(cfg)
        with pytest.raises(ValueError):
            fg.features(np.zeros(100, dtype=np.float32))


class TestPreModule:
    def test_pre_base_with_delta(self):
        text = """\
module
{
  name pre
  type pre
  dim 3
}
module
{
  name delta
  type delta
  sources pre
  width 1
}
"""
        cfg = FeatureConfig.parse(text)
        fg = FeatureGenerator(cfg)
        assert fg.dim == 3
        rng = np.random.default_rng(0)
        feats = rng.normal(0, 1, (10, 3)).astype(np.float32)
        out = np.asarray(fg.features(feats))
        assert out.shape == (10, 3)
        # delta width 1, norm = 2*1*2*3/6 = 2
        want = np.zeros_like(feats)
        padded = np.concatenate([feats[:1], feats, feats[-1:]])
        want = (padded[2:] - padded[:-2]) / 2.0
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_pre_file_round_trip(self, tmp_path):
        from aaltoasr_tpu.frontend.generator import read_pre_file
        import struct
        feats = np.arange(12, dtype="<f4").reshape(4, 3)
        p = tmp_path / "x.fea"
        p.write_bytes(struct.pack("<i", 3) + feats.tobytes())
        got = read_pre_file(str(p), 3)
        np.testing.assert_array_equal(got, feats)


class TestSRNorm:
    def _op(self, in_frames=5, out_frames=5, rate=1.0, dim=3):
        from aaltoasr_tpu.formats.feaconf import ModuleConfig
        from aaltoasr_tpu.frontend.modules import SRNormOp
        cfg = ModuleConfig([("in_frames", in_frames),
                            ("out_frames", out_frames),
                            ("speech_rate", rate)])
        return SRNormOp(cfg, [in_frames * dim])

    def test_identity_at_unit_rate(self):
        """speech_rate 1 with equal frame counts resamples at exactly
        the input positions: Lanczos kernel degenerates to identity."""
        import jax.numpy as jnp
        op = self._op()
        rng = np.random.default_rng(0)
        x = np.abs(rng.normal(1, 0.3, (4, 15))).astype(np.float32)
        y = np.asarray(op.apply([jnp.asarray(x)], op.init_params()))
        np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-5)

    def test_rate_compresses_window(self):
        """rate > 1 (fast speech) reads positions closer together:
        output frame 0 interpolates inside the window, not at frame 0."""
        import jax.numpy as jnp
        op = self._op(rate=2.0)
        W = op.init_params()["weights"]
        # output 0 targets (0-2)/2+2 = 1.0 -> peak at input frame 1
        assert np.argmax(W[:, 0]) == 1
        # center column stays centered
        assert np.argmax(W[:, 2]) == 2
        x = np.abs(np.random.default_rng(1).normal(
            1, 0.3, (2, 15))).astype(np.float32)
        y = np.asarray(op.apply([jnp.asarray(x)], op.init_params()))
        assert y.shape == (2, 15)
        assert (y >= 0).all()   # relu clamp (generate's max(t, 0))

    def test_speaker_parameter_update(self):
        from aaltoasr_tpu.formats.feaconf import ModuleConfig
        op = self._op()
        p2 = op.set_parameters(ModuleConfig([("speech_rate", 0.5)]))
        assert not np.allclose(p2["weights"],
                               op.init_params()["weights"])

    def test_config_validation(self):
        from aaltoasr_tpu.formats.feaconf import ModuleConfig
        from aaltoasr_tpu.frontend.modules import SRNormOp
        import pytest
        with pytest.raises(ValueError):
            SRNormOp(ModuleConfig([("in_frames", 4)]), [12])
        with pytest.raises(ValueError):
            SRNormOp(ModuleConfig([("in_frames", 5),
                                   ("out_frames", 5)]), [16])


class TestAllPassVtln:
    """All-pass VTLN transforms (FeatureModules.cc:1716-1904)."""

    def _ref_blin(self, dim, warp_factor):
        """Direct transcription of create_all_pass_blin_transform."""
        alpha = warp_factor - 1
        q1 = np.zeros(dim)
        q1[0] = -alpha
        temp = 1 - alpha * alpha
        for i in range(1, dim):
            q1[i] = temp
            temp *= alpha
        q = np.zeros(dim)
        q[0] = 1
        M = np.zeros((dim, dim))
        M[0, 0] = 1
        for i in range(1, dim):
            qn = np.zeros(dim)
            for j in range(dim):
                t = 0.0
                for k in range(j + 1):
                    t += q[k] * q1[j - k]
                qn[j] = t
            q = qn
            M[0, i] = 2 * q[0]
            for j in range(1, dim):
                M[j, i] = q[j]
        return M

    def test_blin_matches_reference_loops(self):
        from aaltoasr_tpu.frontend.modules import all_pass_blin_matrix
        for wf in (0.9, 1.0, 1.15):
            ours = all_pass_blin_matrix(12, wf)
            ref = self._ref_blin(12, wf)
            np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_identity_at_neutral_warp(self):
        from aaltoasr_tpu.frontend.modules import (
            all_pass_blin_matrix, all_pass_slapt_matrix,
            all_pass_vtln_matrix)
        final = all_pass_vtln_matrix(16, all_pass_blin_matrix(16, 1.0))
        np.testing.assert_allclose(final, np.eye(16), atol=1e-6)
        final = all_pass_vtln_matrix(
            16, all_pass_slapt_matrix(16, [0.0]))
        np.testing.assert_allclose(final, np.eye(16), atol=1e-6)

    def test_vtln_op_all_pass_config(self):
        from aaltoasr_tpu.formats.feaconf import ModuleConfig
        from aaltoasr_tpu.frontend.modules import VtlnOp
        cfg = ModuleConfig([("all-pass", "1")])
        op = VtlnOp(cfg, [18])
        import jax.numpy as jnp
        x = np.abs(np.random.default_rng(0).normal(
            1, 0.3, (4, 18))).astype(np.float32)
        # neutral warp: output ~ input
        out = np.asarray(op.apply([jnp.asarray(x)], op.init_params()))
        np.testing.assert_allclose(out, x, atol=1e-4)
        # warped: rows renormalize the spectrum, stay non-negative
        params = op.set_parameters(
            ModuleConfig([("warp_factor", "1.1")]))
        out = np.asarray(op.apply([jnp.asarray(x)], params))
        assert np.all(out >= 0)
        assert not np.allclose(out, x)

    def test_slapt_all_pass_op(self):
        from aaltoasr_tpu.formats.feaconf import ModuleConfig
        from aaltoasr_tpu.frontend.modules import VtlnOp
        cfg = ModuleConfig([("all-pass", "1"), ("slapt", "1")])
        op = VtlnOp(cfg, [16])
        params = op.set_parameters(
            ModuleConfig([("slapt_coef", "0.05 -0.02")]))
        import jax.numpy as jnp
        x = np.abs(np.random.default_rng(1).normal(
            1, 0.3, (3, 16))).astype(np.float32)
        out = np.asarray(op.apply([jnp.asarray(x)], params))
        assert out.shape == x.shape
        assert np.all(np.isfinite(out)) and np.all(out >= 0)
