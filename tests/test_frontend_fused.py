"""Fused MFCC-core pallas kernel: parity with the unfused module ops.

The kernel itself is exact in interpret mode (same formulas); these
tests cover the GENERATOR integration — pattern detection, context
slicing, and the power branch — by forcing the fused path on CPU with
the interpreter.
"""

import functools

import numpy as np
import pytest

import jax

from aaltoasr_tpu.formats.feaconf import FeatureConfig
from aaltoasr_tpu.frontend.generator import FeatureGenerator
from aaltoasr_tpu.ops import frontend_pallas as FP

CFG_MFCC_POWER = """\
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
  name delta
  type delta
  sources cat
  width 2
}
module
{
  name out
  type merge
  sources cat delta
}
"""

CFG_NO_POWER = CFG_MFCC_POWER.replace("""module
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
""", """module
{
  name cat
  type merge
  sources dct
}
""")


def _force_fused(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        FP, "mfcc_core", functools.partial(FP.mfcc_core,
                                           interpret=True))


@pytest.mark.parametrize("cfg_text", [CFG_MFCC_POWER, CFG_NO_POWER])
def test_fused_matches_unfused(monkeypatch, cfg_text):
    rng = np.random.default_rng(3)
    samples = rng.normal(0, 1500, 16000).astype(np.float32)

    plain = FeatureGenerator(FeatureConfig.parse(cfg_text))
    assert plain._fusion is not None        # pattern detected
    want = np.asarray(plain.features(samples))

    _force_fused(monkeypatch)
    fused = FeatureGenerator(FeatureConfig.parse(cfg_text),
                             fused_mfcc=True)
    got = np.asarray(fused.features(samples))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_non_matching_graph_not_fused():
    # fft feeding a second mel consumer breaks the pattern
    cfg = CFG_MFCC_POWER.replace("""module
{
  name power
  type power
  sources fft
}
""", """module
{
  name mel2
  type mel
  sources fft
}
module
{
  name power
  type power
  sources mel2
}
""")
    fg = FeatureGenerator(FeatureConfig.parse(cfg))
    assert fg._fusion is None
