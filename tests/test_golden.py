"""Golden parity tests against the reference's checked-in feacat outputs.

`aku/tests/` ships real 16 kHz audio (short.wav), feature configurations
and reference outputs produced by the C++ feacat (run_tests.sh).  These
tests run OUR frontend on the same inputs (reading the reference's test
DATA, not its code) and require numerical agreement with the .ref files
— true cross-implementation parity evidence.

Skipped when the reference checkout is not mounted.
"""

import os

import numpy as np
import pytest

REF_TESTS = "/root/reference/aku/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference checkout not mounted")


def load_ref(path, dim):
    """Parse a feacat ASCII .ref; scripts may run twice (config
    round-trip), so keep the first block only."""
    rows = []
    with open(path) as f:
        for line in f:
            vals = [float(x) for x in line.split()]
            if vals:
                rows.append(vals)
    arr = np.asarray(rows)
    assert arr.shape[1] == dim
    return arr


@pytest.fixture(scope="module")
def short_wav():
    from aaltoasr_tpu.frontend.audio import read_audio
    samples, rate = read_audio(os.path.join(REF_TESTS, "short.wav"))
    assert rate == 16000
    return samples


class TestGoldenFeacat:
    def test_mfcc_p_dd_matches_reference(self, short_wav):
        """MFCC+power+delta+accel, frames -10..80 inclusive — the run of
        aku/tests/mfcc_p_dd.script against its .ref."""
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from aaltoasr_tpu.frontend.generator import FeatureGenerator
        cfg = FeatureConfig.load(os.path.join(REF_TESTS,
                                              "mfcc_p_dd.feaconf"))
        fg = FeatureGenerator(cfg)
        got = np.asarray(fg.features_range(short_wav, -10, 81))
        ref = load_ref(os.path.join(REF_TESTS, "mfcc_p_dd.ref"), fg.dim)
        # the script runs feacat twice (config round trip)
        assert ref.shape[0] == 2 * got.shape[0]
        ref1, ref2 = ref[:91], ref[91:]
        np.testing.assert_array_equal(ref1, ref2)
        diff = np.abs(got - ref1)
        # .ref has 4 decimals; allow print rounding + f32 vs C double
        assert diff.max() < 0.01, diff.max()

    def test_mfcc_cms_norm_matches_reference(self, short_wav):
        """MFCC + CMS + normalization, frames -15..90."""
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from aaltoasr_tpu.frontend.generator import FeatureGenerator
        cfg = FeatureConfig.load(os.path.join(REF_TESTS,
                                              "mfcc_cms_norm.feaconf"))
        fg = FeatureGenerator(cfg)
        got = np.asarray(fg.features_range(short_wav, -15, 91))
        ref = load_ref(os.path.join(REF_TESTS, "mfcc_cms_norm.ref"),
                       fg.dim)
        assert ref.shape[0] == got.shape[0]
        assert np.abs(got - ref).max() < 0.01

    def test_config_round_trip_identical(self, short_wav):
        """Writing the config back and reloading yields identical
        features (the second half of mfcc_p_dd.script)."""
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from aaltoasr_tpu.frontend.generator import FeatureGenerator
        cfg = FeatureConfig.load(os.path.join(REF_TESTS,
                                              "mfcc_p_dd.feaconf"))
        f1 = np.asarray(FeatureGenerator(cfg).features_range(
            short_wav, -10, 81))
        cfg2 = FeatureConfig.parse(cfg.dump())
        f2 = np.asarray(FeatureGenerator(cfg2).features_range(
            short_wav, -10, 81))
        np.testing.assert_array_equal(f1, f2)


class TestGoldenPreModule:
    def test_pre_round_trip_matches_reference(self, short_wav, tmp_path):
        """pre_test.script: raw feacat output (frames 10..60, -H header)
        re-read through a 'pre' base module must match pre_test.ref."""
        import struct
        from aaltoasr_tpu.formats.feaconf import FeatureConfig
        from aaltoasr_tpu.frontend.generator import (
            FeatureGenerator, read_pre_file)
        mf = FeatureConfig.load(os.path.join(REF_TESTS,
                                             "mfcc_p_dd.feaconf"))
        fg = FeatureGenerator(mf)
        feats = np.asarray(fg.features_range(short_wav, 10, 61))
        # write like feacat -H --raw-output (int32 dim header + floats)
        tmp = tmp_path / "pre_test.tmp"
        tmp.write_bytes(struct.pack("<i", fg.dim)
                        + feats.astype("<f4").tobytes())
        # read through the 'pre' config
        pc = FeatureConfig.load(os.path.join(REF_TESTS, "pre.feaconf"))
        pre_fg = FeatureGenerator(pc)
        loaded = read_pre_file(str(tmp), pre_fg.dim)
        out = np.asarray(pre_fg.features(loaded))
        ref = load_ref(os.path.join(REF_TESTS, "pre_test.ref"), fg.dim)
        assert out.shape[0] == ref.shape[0]
        assert np.abs(out - ref).max() < 0.01
