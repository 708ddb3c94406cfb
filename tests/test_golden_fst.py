"""Cross-implementation FstSearch parity against the REFERENCE
decoder's WFST engine (`decoder/src/FstSearch.{hh,_tmpl.hh}`, driven by
tools/ref_fst_driver.cc over the same libdecoder build as the main
golden decode driver).

A self-contained reference-convention search FST (arc field 3 = target
node's emission pdf, embedded arc weights, `Fst.cc:10-104`), a .ph/.dur
model, and a 4-byte LNA (exact float32 round trip) are decoded by the
reference FstSearch and by `decoder/fstsearch.MitFstSearch`; 1-best
words and final logprobs must match, with and without the gamma
duration model (`FstAcoustics.cc:91-101`), plus the FstConfidence
value (`FstConfidence.cc:8-78`)."""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

from aaltoasr_tpu.decoder.fstsearch import MitFstSearch
from aaltoasr_tpu.formats import model_io
from aaltoasr_tpu.formats.lna import write_lna

REF = "/root/reference/decoder"
BUILD = os.path.join(os.path.dirname(__file__), "..", "build")
DRIVER = os.path.join(BUILD, "ref_fst_driver")


@pytest.fixture(scope="session")
def fst_driver():
    if os.path.exists(DRIVER):
        return DRIVER
    bdir = os.path.join(BUILD, "refdecoder")
    if not (os.path.isdir(REF) and shutil.which("g++")
            and os.path.exists(os.path.join(bdir, "src",
                                            "libdecoder.a"))):
        pytest.skip("reference decoder build unavailable")
    try:
        subprocess.run(
            ["g++", "-O2", "-std=gnu++0x", f"-I{REF}/src",
             f"-I{REF}/src/misc",
             os.path.join(os.path.dirname(__file__), "..", "tools",
                          "ref_fst_driver.cc"),
             "-o", DRIVER, f"-L{bdir}/src", f"-L{bdir}/src/fsalm",
             f"-L{bdir}/src/misc", "-ldecoder", "-lfsalm", "-lmisc"],
            check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError,
            subprocess.TimeoutExpired) as e:
        pytest.skip(f"ref_fst_driver build failed: {e}")
    return DRIVER


def make_model(tmp_path):
    """3 emitting states: yksi = [0, 1], kaksi = [2]; D = 1."""
    S, D = 3, 1
    model = model_io.HmmModel(
        dim=D, cov_type="diagonal_cov",
        means=np.zeros((S, D)), covars=np.ones((S, D)),
        mixtures=[(np.array([i], np.int32), np.array([1.0]))
                  for i in range(S)],
        phones=[model_io.HmmPhone("a", [0, 1]),
                model_io.HmmPhone("b", [2])],
        transitions={i: [(0, 0.6), (1, 0.4)] for i in range(S)},
        durations=np.array([[2.0, 1.5], [1.8, 2.0], [2.5, 1.2]]))
    model_io.write_ph(str(tmp_path / "m.ph"), model)
    model_io.write_dur(str(tmp_path / "m.dur"), model.durations)
    return model


def make_fst(tmp_path):
    """Word loop in the reference convention: nodes 1,2 = yksi's two
    states, node 3 = kaksi's state; word-initial arcs carry the out
    label; word-end nodes are final."""
    ln = np.log
    s, x = ln(0.6), ln(0.4)          # self / advance weights
    txt = "\n".join([
        "#FSTBasic MaxPlus",
        "I 0",
        "F 2",
        "F 3",
        f"T 0 1 0 yksi {x:.6f}",
        f"T 0 3 2 kaksi {x:.6f}",
        f"T 1 1 0 , {s:.6f}",
        f"T 1 2 1 , {x:.6f}",
        f"T 2 2 1 , {s:.6f}",
        f"T 3 3 2 , {s:.6f}",
        f"T 2 1 0 yksi {x:.6f}",
        f"T 2 3 2 kaksi {x:.6f}",
        f"T 3 1 0 yksi {x:.6f}",
    ]) + "\n"
    p = tmp_path / "task.fst"
    p.write_text(txt)
    return str(p)


def make_lna(tmp_path, name, planted=None, T=12, seed=0):
    rng = np.random.default_rng(seed)
    obs = rng.uniform(-8.5, -7.5, (T, 3)).astype(np.float32)
    if planted is not None:
        for t, st in enumerate(planted):
            obs[t, st] = rng.uniform(-0.2, 0.0)
    p = tmp_path / name
    write_lna(str(p), obs, 4)
    return str(p), obs


def run_ref(driver, fst, tmp_path, lna, dur_scale=0.0,
            confidence=False):
    args = [driver, "--fst", fst, "--ph", str(tmp_path / "m.ph"),
            "--dur", str(tmp_path / "m.dur"), "--lna", lna,
            "--dur-scale", str(dur_scale)]
    if confidence:
        args.append("--confidence")
    out = subprocess.run(args, capture_output=True, text=True,
                         timeout=120, check=True).stdout.splitlines()
    words = out[0].split()
    lp = float(re.search(r"logprob=(\S+)", out[1]).group(1))
    conf = (float(re.search(r"confidence=(\S+)", out[2]).group(1))
            if confidence else None)
    return words, lp, conf


CASES = [
    ("planted.lna", [0, 0, 0, 1, 1, 1, 2, 2, 2, 0, 0, 1], 1),
    ("noisy.lna", None, 2),
    ("planted2.lna", [2, 2, 0, 0, 1, 1, 2, 2, 2, 2, 2, 2], 3),
]


def test_mit_fst_parity(fst_driver, tmp_path):
    model = make_model(tmp_path)
    fst = make_fst(tmp_path)
    ours = MitFstSearch(fst, model, duration_scale=0.0)
    for name, planted, seed in CASES:
        lna, obs = make_lna(tmp_path, name, planted, seed=seed)
        ref_words, ref_lp, _ = run_ref(fst_driver, fst, tmp_path, lna,
                                       0.0)
        words, lp, _ = ours.run(obs)
        assert words == ref_words, name
        assert abs(lp - ref_lp) < 1e-3 + 1e-4 * abs(ref_lp), (
            name, lp, ref_lp)


def test_ref_duration_table_quirk(fst_driver, tmp_path):
    """The reference's FstAcoustics::duration_read resizes the a/b
    tables to num_states and then push_backs every entry
    (FstAcoustics.cc:77-87), leaving zeros at indices 0..n-1 -- so
    duration_logprob(pdf, d) is 0 for every real pdf and the duration
    model is effectively DISABLED in the reference FstSearch.  Assert
    that quirk (logprob invariant under dur-scale), which is why the
    duration-parity leg above runs at dur_scale=0."""
    make_model(tmp_path)
    fst = make_fst(tmp_path)
    lna, _ = make_lna(tmp_path, "planted.lna", CASES[0][1],
                      seed=CASES[0][2])
    _, lp0, _ = run_ref(fst_driver, fst, tmp_path, lna, 0.0)
    _, lp3, _ = run_ref(fst_driver, fst, tmp_path, lna, 1000.0)
    assert lp0 == lp3


def _brute_force(fst_text, model, obs, dur_scale):
    """Exhaustive (node, state_dur) token passing with the reference's
    INTENDED semantics (FstSearch_tmpl.hh:179-240 with a working
    duration table): the independent check for MitFstSearch's
    duration expansion."""
    import math
    from aaltoasr_tpu.decoder.fstsearch import MitFst
    fst = MitFst.read(fst_text)

    def dur_lp(s, d):
        a, b = model.durations[s]
        if a <= 0:
            return 0.0
        return dur_scale * ((a - 1) * math.log(d) - d / b
                            - a * math.log(b) - math.lgamma(a))

    out_arcs = {}
    for i, (s, t, o, w) in enumerate(fst.arcs):
        out_arcs.setdefault(s, []).append(i)
    toks = {(fst.initial, 0): (0.0, ())}
    for t in range(obs.shape[0]):
        new = {}
        for (node, d), (lp, words) in toks.items():
            for ai in out_arcs.get(node, []):
                src, tgt, out, w = fst.arcs[ai]
                nlp, nd = lp + w, d
                if fst.node_pdf[tgt] >= 0:
                    nlp += obs[t, fst.node_pdf[tgt]]
                if tgt != src:
                    if fst.node_pdf[src] >= 0:
                        nlp += dur_lp(fst.node_pdf[src], d)
                    nd = 1
                else:
                    nd = d + 1
                nw = words + (out,) if out else words
                key = (tgt, nd, nw)
                if key not in new or new[key][0] < nlp:
                    new[key] = (nlp, nw)
        # collapse to the best per (node, dur): the max is all the
        # 1-best needs (same granularity as the dense positions)
        best = {}
        for (n, d, w), (lp, words) in new.items():
            if (n, d) not in best or best[(n, d)][0] < lp:
                best[(n, d)] = (lp, words)
        toks = best
    finals = [(lp, words) for (n, d), (lp, words) in toks.items()
              if fst.node_end[n]]
    return max(finals)


@pytest.mark.parametrize("dur_scale", [0.0, 3.0])
def test_mit_fst_duration_vs_brute_force(tmp_path, dur_scale):
    """Our duration expansion against exhaustive token passing."""
    model = make_model(tmp_path)
    fst = make_fst(tmp_path)
    ours = MitFstSearch(fst, model, duration_scale=dur_scale,
                        max_dur=16)
    for name, planted, seed in CASES:
        _, obs = make_lna(tmp_path, name, planted, seed=seed)
        bf_lp, bf_words = _brute_force(fst, model, obs.astype(np.float64),
                                       dur_scale)
        words, lp, _ = ours.run(obs)
        assert tuple(words) == bf_words, (name, dur_scale)
        assert abs(lp - bf_lp) < 1e-3, (name, dur_scale, lp, bf_lp)


def test_mit_fst_confidence_parity(fst_driver, tmp_path):
    """FstConfidence value parity on the planted utterance.  The
    reference's plain FstConfidence::run never accumulates
    m_best_acu_score (FstConfidence.hh:21-27) so ba uses best_acu=0;
    dur scale 0 because of the reference duration-table quirk."""
    model = make_model(tmp_path)
    fst = make_fst(tmp_path)
    ours = MitFstSearch(fst, model, duration_scale=0.0)
    for name, planted, seed in CASES:
        lna, obs = make_lna(tmp_path, name, planted, seed=seed)
        ref_words, ref_lp, ref_conf = run_ref(
            fst_driver, fst, tmp_path, lna, dur_scale=0.0,
            confidence=True)
        words, lp, conf = ours.run_with_confidence(
            obs, accumulate_best_acu=False)
        assert words == ref_words, name
        assert abs(lp - ref_lp) < 1e-3 + 1e-4 * abs(ref_lp), name
        assert abs(conf - ref_conf) < 5e-3, (name, conf, ref_conf)


def test_mit_fst_lna_interface(tmp_path):
    model = make_model(tmp_path)
    fst = make_fst(tmp_path)
    ours = MitFstSearch(fst, model)
    lna, _ = make_lna(tmp_path, "x.lna",
                      [0, 0, 0, 1, 1, 1, 2, 2, 2, 0, 0, 1], seed=1)
    res, lp = ours.get_result_and_logprob(lna)
    assert res == "yksi kaksi yksi"
    assert np.isfinite(lp)
