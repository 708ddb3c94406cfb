"""M-step golden parity vs the reference `estimate` binary
(`aku/estimate.cc:108-430`, built offline by tools/build_aku.sh).

Closes the EM loop across implementations: the round-3 suite proved the
E-step (align/stats dumps, test_golden_stats.py); here BOTH M-steps
consume the SAME reference-produced statistics dumps and the resulting
models (.gk means/covars, .mc mixture weights, .ph transitions) are
compared, then the loop is iterated twice and the .lls likelihood
trajectory is asserted to track between the two implementations
(`train.pl:86-176` stats -> estimate per iteration;
`HmmSet.hh:399` estimate_parameters; `HmmSet.cc:782-815` transitions;
`Distributions.cc:2277-2283` ML mixture weights).

Corpus note: model_seed=0 is chosen so every transition accumulates
nonzero occupancy.  The reference's `dump_ph_statistics`
(`HmmSet.cc:555-578`) writes the COUNT of all transitions but lines
only for accumulated ones; when a transition has zero occupancy,
`accumulate_ph_from_dump` (`HmmSet.cc:655-695`) still attempts to read
`count` triples and — with this toolchain's failed-extraction
semantics — re-reads the last line, double-accumulating it.  We do not
emulate that platform-dependent quirk; the test pins the common path
(all transitions occupied, the only one real training ever takes).
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from aaltoasr_tpu.formats import model_io

sys.path.insert(0, os.path.dirname(__file__))

from test_golden_stats import aku_bins, make_corpus  # noqa: E402,F401

REPO = os.path.join(os.path.dirname(__file__), "..")


def read_lls(path):
    """Parse 'Numerator loglikelihood: X' / 'Number of frames: N'."""
    out = {}
    for line in open(path):
        m = re.match(r"([^:]+):\s*(\S+)", line)
        if m:
            out[m.group(1).strip()] = float(m.group(2))
    return out


def ref_stats(aku_bins, cwd, base, out, env):
    subprocess.run(
        [os.path.join(aku_bins, "stats"), "-b", base, "-c", "feats.cfg",
         "-r", "recipe.ref", "--ml", "-t", "-O", "-o", out],
        cwd=cwd, check=True, capture_output=True, timeout=300, env=env)


def ref_estimate(aku_bins, cwd, base, lst, out, env):
    subprocess.run(
        [os.path.join(aku_bins, "estimate"), "-b", base, "-L", lst,
         "-o", out, "--ml", "-t", "--minvar", "0.1"],
        cwd=cwd, check=True, capture_output=True, timeout=300, env=env)


def our_estimate(cwd, base, lst, out):
    from aaltoasr_tpu.cli.estimate import main as estimate_main
    prev = os.getcwd()
    os.chdir(cwd)
    try:
        estimate_main(["-b", base, "-L", lst, "-o", out,
                       "--ml", "--minvar", "0.1"])
    finally:
        os.chdir(prev)


def assert_models_close(ref, ours, rtol=1e-5):
    """Means/covars/mixture weights/transitions parity."""
    assert ref.dim == ours.dim and ref.num_states == ours.num_states
    scale_m = max(float(np.max(np.abs(ref.means))), 1e-9)
    assert float(np.max(np.abs(ref.means - ours.means))) <= rtol * scale_m
    scale_c = max(float(np.max(np.abs(ref.covars))), 1e-9)
    assert float(np.max(np.abs(ref.covars - ours.covars))) <= rtol * scale_c
    for s, ((ri, rw), (oi, ow)) in enumerate(
            zip(ref.mixtures, ours.mixtures)):
        assert np.array_equal(ri, oi), s
        assert np.allclose(rw, ow, rtol=rtol, atol=1e-7), s
    for s in ref.transitions:
        rt = sorted(ref.transitions[s])
        ot = sorted(ours.transitions[s])
        assert [t for t, _ in rt] == [t for t, _ in ot], s
        for (_, rp), (_, op) in zip(rt, ot):
            assert rp == pytest.approx(op, rel=1e-4, abs=1e-6), s


class TestGoldenEstimate:
    def test_mstep_parity_and_em_trajectory(self, aku_bins, tmp_path):
        make_corpus(tmp_path, model_seed=0)
        env = dict(os.environ)

        # forced alignment once (reference aligner; parity with ours is
        # already proven by test_golden_stats)
        subprocess.run(
            [os.path.join(aku_bins, "align"), "-b", "am",
             "-c", "feats.cfg", "-r", "recipe.ref"],
            cwd=tmp_path, check=True, capture_output=True,
            timeout=300, env=env)

        # ---- iteration 1: stats from the initial model -> both M-steps
        # on the SAME dumps -> model-file parity --------------------
        ref_stats(aku_bins, tmp_path, "am", "it1", env)
        (tmp_path / "it1.lst").write_text("it1\n")
        ref_estimate(aku_bins, tmp_path, "am", "it1.lst", "refnew1", env)
        our_estimate(tmp_path, "am", "it1.lst", "ournew1")

        ref1 = model_io.read_model(str(tmp_path / "refnew1"))
        our1 = model_io.read_model(str(tmp_path / "ournew1"))
        assert_models_close(ref1, our1)

        ll0 = read_lls(tmp_path / "it1.lls")["Numerator loglikelihood"]

        # ---- iteration 2: stats from each new model (both via the
        # REFERENCE stats binary, isolating the M-step difference),
        # estimate again, and track the likelihood trajectory -------
        ref_stats(aku_bins, tmp_path, "refnew1", "it2ref", env)
        ref_stats(aku_bins, tmp_path, "ournew1", "it2our", env)
        ll1_ref = read_lls(
            tmp_path / "it2ref.lls")["Numerator loglikelihood"]
        ll1_our = read_lls(
            tmp_path / "it2our.lls")["Numerator loglikelihood"]
        # same E-step code on models that match to ~1e-5: likelihoods
        # must track tightly and EM must have improved on iteration 1
        assert ll1_our == pytest.approx(ll1_ref, rel=1e-6)
        assert ll1_ref > ll0

        (tmp_path / "it2ref.lst").write_text("it2ref\n")
        (tmp_path / "it2our.lst").write_text("it2our\n")
        ref_estimate(aku_bins, tmp_path, "refnew1", "it2ref.lst",
                     "refnew2", env)
        our_estimate(tmp_path, "ournew1", "it2our.lst", "ournew2")
        ref2 = model_io.read_model(str(tmp_path / "refnew2"))
        our2 = model_io.read_model(str(tmp_path / "ournew2"))
        # inputs now differ at float-noise level; compare a bit looser
        assert_models_close(ref2, our2, rtol=1e-4)

        ref_stats(aku_bins, tmp_path, "refnew2", "it3ref", env)
        ref_stats(aku_bins, tmp_path, "ournew2", "it3our", env)
        ll2_ref = read_lls(
            tmp_path / "it3ref.lls")["Numerator loglikelihood"]
        ll2_our = read_lls(
            tmp_path / "it3our.lls")["Numerator loglikelihood"]
        assert ll2_our == pytest.approx(ll2_ref, rel=1e-6)
        assert ll2_ref >= ll1_ref - 1e-6 * abs(ll1_ref)

    def test_mstep_split_parity(self, aku_bins, tmp_path):
        """--split: both implementations split the same Gaussians and the
        resulting models agree (`HmmSet::split_gaussians`,
        `Distributions.cc` Gaussian::split)."""
        make_corpus(tmp_path, model_seed=0)
        env = dict(os.environ)
        subprocess.run(
            [os.path.join(aku_bins, "align"), "-b", "am",
             "-c", "feats.cfg", "-r", "recipe.ref"],
            cwd=tmp_path, check=True, capture_output=True,
            timeout=300, env=env)
        ref_stats(aku_bins, tmp_path, "am", "st", env)
        (tmp_path / "st.lst").write_text("st\n")

        subprocess.run(
            [os.path.join(aku_bins, "estimate"), "-b", "am",
             "-L", "st.lst", "-o", "refsplit", "--ml", "-t",
             "--minvar", "0.1", "--split", "--minocc", "1.0",
             # the reference's maxmixgauss defaults to 0, which makes
             # --split a silent no-op (HmmSet.cc:  size() >= maxg);
             # recipes always pass it, so must this test
             "--maxmixgauss", "4"],
            cwd=tmp_path, check=True, capture_output=True,
            timeout=300, env=env)
        from aaltoasr_tpu.cli.estimate import main as estimate_main
        prev = os.getcwd()
        os.chdir(tmp_path)
        try:
            estimate_main(["-b", "am", "-L", "st.lst", "-o", "oursplit",
                           "--ml", "--minvar", "0.1", "--split",
                           "--minocc", "1.0", "--maxmixgauss", "4"])
        finally:
            os.chdir(prev)

        ref = model_io.read_model(str(tmp_path / "refsplit"))
        ours = model_io.read_model(str(tmp_path / "oursplit"))
        assert ref.num_gaussians == ours.num_gaussians
        # mixture sizes must match state by state
        for s, ((ri, rw), (oi, ow)) in enumerate(
                zip(ref.mixtures, ours.mixtures)):
            assert len(ri) == len(oi), s
            assert np.allclose(np.sort(rw), np.sort(ow),
                               rtol=1e-5, atol=1e-7), s
        # each split pair: mean +- perturbation along the largest
        # variance direction; compare as SETS of Gaussians per mixture
        for s, ((ri, _), (oi, _)) in enumerate(
                zip(ref.mixtures, ours.mixtures)):
            rset = np.sort(ref.means[ri], axis=0)
            oset = np.sort(ours.means[oi], axis=0)
            assert np.allclose(rset, oset, rtol=1e-4, atol=1e-5), s
            rcv = np.sort(ref.covars[ri], axis=0)
            ocv = np.sort(ours.covars[oi], axis=0)
            assert np.allclose(rcv, ocv, rtol=1e-4, atol=1e-5), s
